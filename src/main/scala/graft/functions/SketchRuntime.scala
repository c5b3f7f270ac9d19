package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

/** Static runtime bodies for the sketch expressions. Kept in a
  * top-level object so generated Java can call the static forwarders
  * directly (`SketchRuntime.minhashSig(...)`) — the standard way to
  * codegen a non-trivial kernel without inlining its loop.
  */
object SketchRuntime {

  def minhashSig(arr: ArrayData, numPerm: Int): ArrayData = {
    val n = arr.numElements()
    val mins = Array.fill(numPerm)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = Sketch.contentHash(arr.getUTF8String(i))
      var p = 0
      while (p < numPerm) {
        val hp = Sketch.permA(p) * h + Sketch.permB(p)
        if (hp < mins(p)) mins(p) = hp
        p += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  def simhash64(arr: ArrayData): Long = {
    val n = arr.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = Sketch.contentHash(arr.getUTF8String(i))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** Distinct word n-gram shingles of a token array, space-joined;
    * fewer than n tokens degrade to one whole-text shingle (same
    * semantics as the composed transform/slice/concat_ws form it
    * replaces, whose generated code dominated cold plan-compile time).
    * First-occurrence order, like array_distinct.
    */
  def shingleSet(arr: ArrayData, n: Int): ArrayData = {
    import org.apache.spark.unsafe.types.UTF8String
    val cnt = arr.numElements()
    val sep = UTF8String.fromString(" ")
    def tok(i: Int): UTF8String = {
      val s = arr.getUTF8String(i)
      if (s == null) UTF8String.EMPTY_UTF8 else s
    }
    if (cnt < n) {
      val parts = new Array[UTF8String](cnt)
      var i = 0
      while (i < cnt) { parts(i) = tok(i); i += 1 }
      new GenericArrayData(Array[Any](UTF8String.concatWs(sep, parts: _*)))
    } else {
      val seen = new java.util.LinkedHashSet[UTF8String]()
      val window = new Array[UTF8String](n)
      var i = 0
      while (i <= cnt - n) {
        var j = 0
        while (j < n) { window(j) = tok(i + j); j += 1 }
        seen.add(UTF8String.concatWs(sep, window: _*))
        i += 1
      }
      new GenericArrayData(seen.toArray(new Array[AnyRef](seen.size())))
    }
  }

  /** LSH band bucket keys of a minhash signature: element b is a
    * 64-bit hash of band b's signature rows (mix64 chain, seeded by
    * the band index). Consumed via posexplode → (band = pos, key).
    */
  def lshBandKeys(sig: ArrayData, bands: Int): ArrayData = {
    val numPerm = sig.numElements()
    if (bands > numPerm || numPerm % bands != 0)
      throw new IllegalArgumentException(
        s"lsh_band_keys: bands ($bands) must divide the signature length ($numPerm)")
    val rows = numPerm / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = Sketch.mix64(0x9e3779b97f4a7c15L ^ b)
      var r = 0
      while (r < rows) {
        h = Sketch.mix64(h ^ sig.getLong(b * rows + r))
        r += 1
      }
      out(b) = h
      b += 1
    }
    new GenericArrayData(out)
  }

  def hyperplaneBucket(arr: ArrayData, planes: Int, seed: Int): Long = {
    val dim = arr.numElements()
    var bucket = 0L
    var p = 0
    while (p < planes) {
      var proj = 0.0
      var d = 0
      while (d < dim) {
        val w = (Sketch.mix64((seed.toLong * 524287L + p) * 8191L + d) & 1023L) / 1024.0 - 0.5
        proj += arr.getFloat(d) * w
        d += 1
      }
      if (proj > 0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }
}
