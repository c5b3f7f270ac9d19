package graft.functions

import graft.SparkSpec
import graft.operators.{Multimodal, TextAnalysis}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property fuzzing for the byte-level kernels (E6 ByteWindowHashes /
  * ByteCdcHashes, H13 DeflateSize) — the TextFuzzSpec discipline
  * applied below the string layer: 1000 seeded adversarial blobs per
  * family, pushed through the Spark expressions in ONE job and
  * compared row-by-row against independent driver-side references.
  * Adversarial shapes: empty blobs, 1-byte blobs, all-zero and
  * all-0xff runs (degenerate rolling hashes), short-period repeats
  * (every window identical), blobs straddling the window/stride/chunk
  * boundaries, and random bytes — across a parameter grid including
  * the degenerate corners (window=1, stride>window, minSize=1,
  * targetSize at the 2^30 bits cap that used to infinite-loop).
  */
class ByteFuzzSpec extends SparkSpec {
  import sqlImplicits._

  private val N = 1000

  private def sample[A](g: Gen[Seq[A]], seed: Long): Seq[A] =
    g.apply(Gen.Parameters.default, Seed(seed))
      .getOrElse(sys.error("generator failed"))

  /** Blobs biased toward rolling-hash pathologies, lengths 0..~600. */
  private val genBlob: Gen[Array[Byte]] = Gen.frequency(
    1 -> Gen.const(Array.empty[Byte]),
    2 -> Gen.chooseNum(1, 4).map(n => Array.fill(n)(7.toByte)),
    3 -> Gen.chooseNum(1, 600).map(n => Array.fill(n)(0.toByte)),
    3 -> Gen.chooseNum(1, 600).map(n => Array.fill(n)(0xff.toByte)),
    4 -> (for {
      p <- Gen.chooseNum(1, 4); n <- Gen.chooseNum(1, 600)
    } yield Array.tabulate(n)(i => (i % p + 1).toByte)),
    4 -> Gen.oneOf(63, 64, 65, 95, 96, 97, 127, 128, 129, 511, 512, 513)
      .flatMap(n => Gen.listOfN(n, Gen.chooseNum(0, 255)).map(_.map(_.toByte).toArray)),
    6 -> Gen.chooseNum(0, 600)
      .flatMap(n => Gen.listOfN(n, Gen.chooseNum(0, 255)).map(_.map(_.toByte).toArray)))

  // ------------------------------------------------- driver references

  private def refFnv(b: Array[Byte], off: Int, len: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = off
    while (i < off + len) { h ^= (b(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
    h
  }

  private def refWindows(b: Array[Byte], w: Int, s: Int): Seq[Long] = {
    if (b.isEmpty) Seq.empty
    else if (b.length < w) Seq(refFnv(b, 0, b.length))
    else (0 to b.length - w by s).map(off => refFnv(b, off, w))
  }

  /** CDC boundaries as (start, len) — independent walk of the
    * documented rule: polynomial base-31 hash of the last `window`
    * bytes (growing from the chunk start), cut when
    * (h & mask) == mask at len >= min, or at len == max; mask from
    * bits = min(30, max(1, floor(log2(target)))).
    */
  private def refCdcBounds(b: Array[Byte], target: Int, min: Int, max: Int,
                           w: Int): Seq[(Int, Int)] = {
    if (b.isEmpty) return Seq.empty
    var bits = 1
    while (bits < 30 && (1L << (bits + 1)) <= target) bits += 1
    val mask = (1L << bits) - 1
    val pw = { var p = 1L; var j = 0; while (j < w - 1) { p *= 31; j += 1 }; p }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var start = 0; var h = 0L; var i = 0
    while (i < b.length) {
      val len0 = i - start
      h = if (len0 < w) h * 31 + (b(i) & 0xff)
          else (h - (b(i - w) & 0xff) * pw) * 31 + (b(i) & 0xff)
      val len = len0 + 1
      if ((len >= min && (h & mask) == mask) || len >= max) {
        out += ((start, len)); start = i + 1; h = 0L
      }
      i += 1
    }
    if (start < b.length) out += ((start, b.length - start))
    out.toSeq
  }

  private def refCdc(b: Array[Byte], target: Int, min: Int, max: Int,
                     w: Int): Seq[Long] =
    refCdcBounds(b, target, min, max, w).map { case (o, l) => refFnv(b, o, l) }

  // ---------------------------------------------------- window hashes

  private val windowGrid = Seq((64, 32), (1, 1), (2, 3), (7, 7), (16, 64))

  test(s"byte_window_hashes matches the driver reference on $N blobs × grid") {
    val blobs = sample(Gen.listOfN(N, genBlob), 0xb17e5L)
    val df = blobs.zipWithIndex.map { case (b, i) => (i, b) }.toDF("i", "b")
    val cols = $"i" +: windowGrid.zipWithIndex.map { case ((w, s), k) =>
      Multimodal.byteWindowHashes($"b", w, s).as(s"h$k")
    }
    val got = df.select(cols: _*).collect()
      .map(r => r.getInt(0) -> r).toMap
    blobs.zipWithIndex.foreach { case (b, i) =>
      windowGrid.zipWithIndex.foreach { case ((w, s), k) =>
        val want = refWindows(b, w, s)
        val have = got(i).getSeq[Long](k + 1)
        assert(have == want,
          s"window=$w stride=$s len=${b.length}: got $have want $want")
      }
    }
  }

  test("window hashes: appending bytes never changes existing full-window hashes") {
    val blobs = sample(Gen.listOfN(200, genBlob), 0xa99e4dL)
      .filter(_.length >= 64)
    val extras = sample(Gen.listOfN(blobs.size,
      Gen.chooseNum(1, 300).flatMap(n =>
        Gen.listOfN(n, Gen.chooseNum(0, 255)).map(_.map(_.toByte).toArray))),
      0x0ddba11L)
    blobs.zip(extras).foreach { case (b, x) =>
      val before = refWindows(b, 64, 32)
      val after = refWindows(b ++ x, 64, 32)
      assert(after.take(before.size) == before,
        s"append rewrote kept-prefix hashes at len=${b.length}+${x.length}")
    }
  }

  // ------------------------------------------------------- CDC hashes

  // last entry pins the 2^30 bits cap (used to wrap Int shifts and loop)
  private val cdcGrid =
    Seq((128, 32, 512, 16), (2, 1, 2, 1), (8, 4, 64, 3),
      (1 << 30, 1, Int.MaxValue, 16))

  test(s"byte_cdc_hashes matches the driver reference on $N blobs × grid") {
    val blobs = sample(Gen.listOfN(N, genBlob), 0xcdc0ffeeL)
    val df = blobs.zipWithIndex.map { case (b, i) => (i, b) }.toDF("i", "b")
    val cols = $"i" +: cdcGrid.zipWithIndex.map { case ((t, mn, mx, w), k) =>
      exprs.toColumn(ByteCdcHashes(exprs.toExpr($"b"), t, mn, mx, w)).as(s"h$k")
    }
    val got = df.select(cols: _*).collect()
      .map(r => r.getInt(0) -> r).toMap
    blobs.zipWithIndex.foreach { case (b, i) =>
      cdcGrid.zipWithIndex.foreach { case ((t, mn, mx, w), k) =>
        val want = refCdc(b, t, mn, mx, w)
        val have = got(i).getSeq[Long](k + 1)
        assert(have == want,
          s"cdc($t,$mn,$mx,$w) len=${b.length}: got $have want $want")
      }
    }
  }

  test("CDC bounds: chunks tile the blob, non-final ≥ min, all ≤ max") {
    val blobs = sample(Gen.listOfN(N, genBlob), 0x7113L)
    blobs.foreach { b =>
      for ((t, mn, mx, w) <- cdcGrid if mx < Int.MaxValue) {
        val bounds = refCdcBounds(b, t, mn, mx, w)
        assert(bounds.map(_._2).sum == b.length, "chunks must tile the blob")
        bounds.foreach { case (_, l) => assert(l <= mx, s"chunk $l > max $mx") }
        bounds.dropRight(1).foreach { case (_, l) =>
          assert(l >= mn, s"non-final chunk $l < min $mn")
        }
        // contiguity
        bounds.foldLeft(0) { case (expect, (o, l)) =>
          assert(o == expect, "chunks must be contiguous"); o + l
        }
      }
    }
  }

  test("CDC: append preserves every chunk hash before the last original boundary") {
    // boundaries are decided left-to-right from preceding bytes only,
    // so appending can disturb at most the final (possibly unclosed)
    // chunk — the invariant that makes CDC signatures append-robust.
    val blobs = sample(Gen.listOfN(300, genBlob), 0xfeedL).filter(_.length >= 64)
    val extras = sample(Gen.listOfN(blobs.size,
      Gen.chooseNum(1, 256).flatMap(n =>
        Gen.listOfN(n, Gen.chooseNum(0, 255)).map(_.map(_.toByte).toArray))),
      0xbeefL)
    blobs.zip(extras).foreach { case (b, x) =>
      val before = refCdc(b, 128, 32, 512, 16)
      val after = refCdc(b ++ x, 128, 32, 512, 16)
      assert(after.take(before.size - 1) == before.dropRight(1),
        s"append disturbed closed chunks at len=${b.length}+${x.length}")
    }
  }

  test("planted truncation/append/prefix-edit pairs found across the grid") {
    // end-to-end: mediaNearDups must find every planted variant pair
    // under multiple kernel parameterizations, not just the defaults.
    val rnd = new scala.util.Random(0x5eedL)
    val base = (0 until 30).map { i =>
      val b = new Array[Byte](2048 + rnd.nextInt(1024)); rnd.nextBytes(b)
      (i.toLong, b)
    }
    val variants = base.map { case (id, b) =>
      (id + 1000L, id % 3 match {
        case 0 => b.take(b.length * 3 / 4)                      // truncation
        case 1 => b ++ Array.fill(256)(0x2a.toByte)             // append
        case 2 => Array.fill(64)(0x11.toByte) ++ b              // prefix insert
      })
    }
    val df = (base ++ variants).toDF("doc_id", "blob")
    val fixedConfigs = Seq((64, 32), (128, 64), (32, 16))
    for ((w, s) <- fixedConfigs) {
      val pairs = Multimodal.mediaNearDups(df, "doc_id", "blob",
          window = w, stride = s, threshold = 0.3)
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      base.foreach { case (id, _) =>
        // prefix-insert shifts alignment: fixed windows only owe us the
        // truncation/append variants
        if (id % 3 != 2)
          assert(pairs.contains((id, id + 1000L)),
            s"fixed w=$w s=$s missed planted pair $id")
      }
    }
    for (w <- Seq(64, 128)) {
      val pairs = Multimodal.mediaNearDups(df, "doc_id", "blob",
          window = w, cdc = true, threshold = 0.3)
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      base.foreach { case (id, _) =>
        assert(pairs.contains((id, id + 1000L)),
          s"cdc w=$w missed planted pair $id (variant kind ${id % 3})")
      }
    }
  }

  // ----------------------------------------------------- deflate_size

  private val genText: Gen[String] = Gen.frequency(
    1 -> Gen.const(""),
    2 -> Gen.chooseNum(1, 2000).map(n => "a" * n),
    2 -> (for { p <- Gen.oneOf("ab", "xyz", "lorem ipsum ")
                n <- Gen.chooseNum(1, 300) } yield p * n),
    3 -> Gen.listOf(Gen.oneOf("é", "🎉", "각", "x", " ", "\n", "ß"))
      .map(_.mkString),
    4 -> Gen.chooseNum(0, 800).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(32, 126)).map(_.map(_.toChar).mkString)))

  private def refDeflate(s: String): Long = {
    val d = new java.util.zip.Deflater(
      java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    try {
      d.setInput(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }

  test(s"deflate_size equals a fresh jdk Deflater on $N fuzzed strings") {
    val cases = sample(Gen.listOfN(N, genText), 0xdef1a7eL)
    val df = cases.zipWithIndex.map { case (s, i) => (i, s) }.toDF("i", "s")
    val got = df.select($"i", TextAnalysis.deflateSize($"s").as("z"))
      .as[(Int, Long)].collect().toMap
    cases.zipWithIndex.foreach { case (s, i) =>
      val want = refDeflate(s)
      assert(got(i) == want, s"deflate_size mismatch len=${s.length}: " +
        s"got ${got(i)} want $want")
    }
  }
}
