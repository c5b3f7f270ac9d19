package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding tokenization (SURVEY §2.H17): the subword
  * tokenizer family (Sennrich et al., "Neural Machine Translation of
  * Rare Words with Subword Units", ACL 2016) every modern LM corpus
  * pipeline runs. Training learns a ranked list of symbol-pair merges
  * from corpus word frequencies (driver-side on the capped vocabulary
  * — see TextAnalysis.bpeTrain for the Spark half); encoding applies
  * those merges greedily by rank to each whitespace word.
  *
  * The merge loop here is the reference algorithm: start from the
  * character sequence, repeatedly replace the adjacent pair with the
  * best (lowest) merge rank until no learned pair remains. Tokens of
  * different words never merge — word boundaries are hard, matching
  * the whitespace pre-tokenization used corpus-wide (TextAnalysis
  * .tokens). Deterministic everywhere: the only inputs are the text
  * and the ranked merge table.
  */
object BpeRuntime {

  /** Initial symbol sequence: one symbol per CODE POINT, not per Java
    * char — splitting a surrogate pair in half would make the lone
    * halves unrepresentable as UTF8Strings (they round-trip to
    * replacement characters), breaking the losslessness contract on
    * astral-plane text (the H15 CDC lesson, caught again by the spec's
    * planted emoji).
    */
  private def symbols(w: String): Array[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < w.length) {
      val n = Character.charCount(w.codePointAt(i))
      out += w.substring(i, i + n)
      i += n
    }
    out.toArray
  }

  /** Left-to-right non-overlapping application of one merge to a
    * symbol sequence (the classic rule both trainers and the encoder's
    * per-rank step share).
    */
  private def applyMerge(syms: Array[String], a: String, b: String,
                         joined: String): Array[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
        out += joined; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toArray
  }

  /** Classic BPE training on a (word, freq) table: `numMerges`
    * iterations of count-pairs → merge-argmax. Ties break on the pair
    * itself (lexicographic) so training is deterministic. Pure JVM,
    * driver-side: the caller bounds the vocabulary (capped word table
    * collect, the sanctioned centroid-matrix pattern).
    *
    * INCREMENTAL (r9): the r8 loop re-tokenized the entire vocabulary
    * per merge — O(numMerges · vocab · len), hours of driver time at a
    * production 32k-merge count. This is the standard incremental
    * update (what Sennrich's own learn_bpe ships): pair counts build
    * once, each merge subtracts the OLD pair contributions of only the
    * words that contain the merged pair (tracked by an occurrence
    * index), applies the merge to those words, and adds their new
    * contributions back. Per merge the work is the affected words, not
    * the vocabulary; the argmax stays a scan of the live pair map
    * (bounded by distinct adjacent pairs, shrinking as counts hit 0).
    * [[trainRescan]] keeps the naive form; the spec proves both emit
    * the IDENTICAL merge sequence.
    */
  def train(wordFreqs: Seq[(String, Long)],
            numMerges: Int): Seq[(String, String)] = {
    val words: Array[Array[String]] =
      wordFreqs.map { case (w, _) => symbols(w) }.toArray
    val freqs: Array[Long] = wordFreqs.map(_._2).toArray
    val counts = mutable.HashMap.empty[(String, String), Long]
    // pair -> word indices that contained it when last counted; may
    // hold stale members (cheap), filtered by a contains check on use
    val where = mutable.HashMap.empty[(String, String), mutable.BitSet]
    def contribute(wi: Int, sign: Long): Unit = {
      val syms = words(wi)
      val f = freqs(wi) * sign
      var i = 0
      while (i < syms.length - 1) {
        val p = (syms(i), syms(i + 1))
        val c = counts.getOrElse(p, 0L) + f
        if (c == 0L) counts.remove(p) else counts(p) = c
        if (sign > 0L) where.getOrElseUpdate(p, mutable.BitSet.empty) += wi
        i += 1
      }
    }
    words.indices.foreach(contribute(_, 1L))
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var it = 0
    while (it < numMerges && counts.nonEmpty) {
      // allocation-free argmax (count desc, then pair lexicographic):
      // this scan runs once per merge over the live pair map, so at a
      // production 32k-merge count it must not box a tuple per entry
      var best: (String, String) = null
      var bestC = Long.MinValue
      val iter = counts.iterator
      while (iter.hasNext) {
        val (p, c) = iter.next()
        if (c > bestC || (c == bestC &&
            (p._1 < best._1 || (p._1 == best._1 && p._2 < best._2)))) {
          best = p; bestC = c
        }
      }
      merges += best
      val joined = best._1 + best._2
      where.getOrElse(best, mutable.BitSet.empty).foreach { wi =>
        val syms = words(wi)
        var hit = false
        var i = 0
        while (!hit && i < syms.length - 1) {
          hit = syms(i) == best._1 && syms(i + 1) == best._2
          i += 1
        }
        if (hit) {
          contribute(wi, -1L)
          words(wi) = applyMerge(syms, best._1, best._2, joined)
          contribute(wi, 1L)
        }
      }
      where.remove(best)
      counts.remove(best)
      it += 1
    }
    merges.toSeq
  }

  /** The r8 rescan trainer, kept as the equivalence reference: the
    * spec asserts [[train]] emits the identical merge sequence on the
    * canonical and fuzz corpora, and the ≥10× speedup is measured
    * against this form.
    */
  private[graft] def trainRescan(wordFreqs: Seq[(String, Long)],
                                 numMerges: Int): Seq[(String, String)] = {
    var words: Seq[(Array[String], Long)] =
      wordFreqs.map { case (w, f) => (symbols(w), f) }
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var it = 0
    var done = false
    while (it < numMerges && !done) {
      val counts = mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts(p) = counts.getOrElse(p, 0L) + f
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val best = counts.toSeq
          .minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        val joined = best._1 + best._2
        words = words.map { case (syms, f) =>
          (applyMerge(syms, best._1, best._2, joined), f)
        }
      }
      it += 1
    }
    merges.toSeq
  }

  /** Unambiguous rank-map key for a symbol pair: the left symbol's
    * length prefix determines the split point, so NUL-containing or
    * separator-containing symbols can never collide (("a:b","c") vs
    * ("a","b:c") key differently), and the source stays plain text —
    * a raw control-byte separator made this file binary to git.
    */
  private def pairKey(a: String, b: String): String =
    a.length + ":" + a + b

  /** Encode one word with the ranked merges: repeatedly apply the
    * best-ranked applicable merge (the reference greedy-by-rank rule,
    * not left-to-right) until none applies.
    */
  def encodeWord(word: String,
                 rank: java.util.HashMap[String, Integer]): Array[String] = {
    if (word.isEmpty) return Array.empty
    var syms = symbols(word)
    var continue = syms.length > 1
    while (continue) {
      var bestRank = Int.MaxValue
      var bestAt = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = rank.get(pairKey(syms(i), syms(i + 1)))
        if (r != null && r < bestRank) { bestRank = r; bestAt = i }
        i += 1
      }
      if (bestAt < 0) continue = false
      else {
        val out = new Array[String](syms.length - 1)
        var j = 0
        var k = 0
        while (j < syms.length) {
          if (j == bestAt) { out(k) = syms(j) + syms(j + 1); j += 2 }
          else { out(k) = syms(j); j += 1 }
          k += 1
        }
        syms = out
        continue = syms.length > 1
      }
    }
    syms
  }

  /** Encode one pre-tokenized word to its subword array. The word is
    * taken verbatim — pre-tokenization (trim/lower/whitespace split)
    * stays in the Spark expression layer (TextAnalysis.tokens), so
    * the kernel never re-implements, and can never diverge from, the
    * corpus-wide normalization.
    */
  def encode(word: UTF8String,
             rank: java.util.HashMap[String, Integer]): ArrayData = {
    val s = word.toString
    if (s.isEmpty) return new GenericArrayData(Array.empty[Any])
    val out = mutable.ArrayBuffer.empty[Any]
    encodeWord(s, rank).foreach(t => out += UTF8String.fromString(t))
    new GenericArrayData(out.toArray)
  }

  /** Interned per-merges rank maps: BpeEncode instances (one per
    * task deserialization) share one map per distinct merge table.
    * BOUNDED access-order LRU (r8 ADVICE): a long-lived session
    * training many distinct tokenizers must not pin every rank map
    * for the JVM lifetime — past `MaxCachedTables` the least-recently
    * used map is dropped and simply rebuilt on next use.
    */
  private[graft] val MaxCachedTables = 64
  private val rankCache =
    new java.util.LinkedHashMap[Seq[(String, String)],
        java.util.HashMap[String, Integer]](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[Seq[(String, String)],
            java.util.HashMap[String, Integer]]): Boolean =
        size() > MaxCachedTables
    }

  def rankMap(merges: Seq[(String, String)])
      : java.util.HashMap[String, Integer] = rankCache.synchronized {
    val got = rankCache.get(merges)
    if (got != null) got
    else {
      val m = new java.util.HashMap[String, Integer](merges.length * 2)
      merges.zipWithIndex.foreach { case ((a, b), i) =>
        m.putIfAbsent(pairKey(a, b), Int.box(i))
      }
      rankCache.put(merges, m)
      m
    }
  }
}

/** bpe_encode(word) → array<string> with a bound merge table. */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string, got $other")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"

  @transient private lazy val rank = BpeRuntime.rankMap(merges)

  override protected def nullSafeEval(input: Any): Any =
    BpeRuntime.encode(input.asInstanceOf[UTF8String], rank)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val rankRef = ctx.addReferenceObj("bpeRank", rank,
      "java.util.HashMap<String, Integer>")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BpeRuntime.encode($c, $rankRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}
