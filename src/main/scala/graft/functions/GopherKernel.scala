package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass native kernel for the H16 Gopher-rule conjunction
  * (SURVEY §2.H16): the column-expression battery in
  * TextAnalysis.gopherRules evaluates `split` / higher-order filters
  * per RULE — higher-order functions sit outside whole-stage codegen's
  * subexpression elimination, so the composed predicate re-splits and
  * re-scans the document once per statistic (~50 µs/doc measured at
  * sf3). This kernel computes every statistic in ONE scan over the
  * string with no intermediate arrays, then applies the identical
  * 6-dp-rounded thresholds — the (b)-tier custom-Expression move for
  * a hot corpus filter.
  *
  * Exactness contract (spec-pinned equal to gopherRules.`pass` in
  * TextAnalysisSpec, and 1000-case fuzzed in TextFuzzSpec): words are
  * maximal runs of non-WHITESPACE chars (the Java \s class: space,
  * tab, newline, VT, FF, CR — exactly the battery's explicit-class
  * split regex), measured in code points; "..." counts non-overlapping
  * left-to-right like the replace-length trick; lines split on '\n'
  * dropping empties; bullet/ellipsis checks trim spaces only;
  * stopword presence is the padded " w " containment on the
  * lowercased text; every ratio rounds HALF_UP to 6 dp BEFORE its
  * threshold comparison, exactly as the column form does.
  */
object GopherRuntime {

  private val stopwords: Array[String] =
    Array("the", "be", "to", "of", "and", "that", "have", "with")
      .map(w => s" $w ")

  private def round6(v: Double): Double =
    // valueOf matches Spark Round's Double.toString form (r8 ADVICE);
    // Gopher's bounded-denominator ratios can't reach the divergent
    // cases, but the kernel must mirror the column battery exactly
    JBigDecimal.valueOf(v).setScale(6, RoundingMode.HALF_UP).doubleValue()

  /** Raw counters from ONE scan over the string:
    * [nWords, sumWordLen, nAlphaWords, nHash, nUell, nLines,
    *  nBulletLines, nEllipsisLines, nDots] — shared by the boolean
    * [[pass]] kernel and the struct-returning [[statsRow]] audit
    * kernel (r9).
    */
  private def rawCounts(s: String): Array[Long] = {
    val n = s.length

    var nWords = 0L
    var sumWordLen = 0L
    var nAlphaWords = 0L
    var nHash = 0L
    var nUell = 0L
    var nLines = 0L
    var nBulletLines = 0L
    var nEllipsisLines = 0L

    var i = 0
    var inWord = false
    var wordStart = 0
    var lineStart = 0
    def closeWord(end: Int): Unit = if (inWord) {
      nWords += 1
      sumWordLen += s.codePointCount(wordStart, end)
      var j = wordStart
      var alpha = false
      while (j < end && !alpha) {
        val c = s.charAt(j)
        if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')) alpha = true
        j += 1
      }
      if (alpha) nAlphaWords += 1
      inWord = false
    }
    def closeLine(end: Int): Unit = {
      if (end > lineStart) {
        nLines += 1
        // bullet: first char after leading spaces
        var a = lineStart
        while (a < end && s.charAt(a) == ' ') a += 1
        if (a < end) {
          val c = s.charAt(a)
          if (c == '-' || c == '*' || c == '•') nBulletLines += 1
        }
        // ellipsis: after trailing spaces, ends with "..." or '…'
        var b = end
        while (b > lineStart && s.charAt(b - 1) == ' ') b -= 1
        if (b > lineStart &&
            (s.charAt(b - 1) == '…' ||
              (b - lineStart >= 3 && s.charAt(b - 1) == '.' &&
                s.charAt(b - 2) == '.' && s.charAt(b - 3) == '.')))
          nEllipsisLines += 1
      }
    }
    // the whitespace CLASS that splits words — must equal the column
    // battery's [ \t\n\x0B\f\r]+ regex (Java \s) character for
    // character; line boundaries remain '\n' only
    def isWs(c: Char): Boolean =
      c == ' ' || c == '\t' || c == '\n' || c == '\u000B' ||
        c == '\f' || c == '\r'
    while (i < n) {
      val c = s.charAt(i)
      if (isWs(c)) closeWord(i)
      else {
        if (!inWord) { inWord = true; wordStart = i }
        if (c == '#') nHash += 1
        else if (c == '…') nUell += 1
      }
      if (c == '\n') { closeLine(i); lineStart = i + 1 }
      i += 1
    }
    closeWord(n)
    closeLine(n)

    // "..." non-overlapping left-to-right, like replace-length
    var nDots = 0L
    var d = s.indexOf("...")
    while (d >= 0) { nDots += 1; d = s.indexOf("...", d + 3) }

    Array(nWords, sumWordLen, nAlphaWords, nHash, nUell, nLines,
      nBulletLines, nEllipsisLines, nDots)
  }

  /** The full rule battery in one pass; returns the conjunction. */
  def pass(text: UTF8String, minWords: Long, maxWords: Long,
           minStop: Long): Boolean = {
    val c = rawCounts(text.toString)
    val nWords = c(0); val sumWordLen = c(1); val nAlphaWords = c(2)
    val nHash = c(3); val nUell = c(4); val nLines = c(5)
    val nBulletLines = c(6); val nEllipsisLines = c(7); val nDots = c(8)

    if (nWords < minWords || nWords > maxWords) return false
    if (nWords == 0L) return false // mean/symbol/alpha all 0.0 → fail
    val meanWordLen = round6(sumWordLen.toDouble / nWords)
    if (meanWordLen < 3.0 || meanWordLen > 10.0) return false
    if (round6((nHash + nDots + nUell).toDouble / nWords) > 0.1) return false
    if (round6(nAlphaWords.toDouble / nWords) < 0.8) return false
    if (nLines > 0) {
      if (round6(nBulletLines.toDouble / nLines) > 0.9) return false
      if (round6(nEllipsisLines.toDouble / nLines) > 0.3) return false
    }

    if (minStop > 0L) {
      val padded = " " + text.toLowerCase.toString + " "
      var hits = 0L
      var k = 0
      while (k < stopwords.length && hits < minStop) {
        if (padded.contains(stopwords(k))) hits += 1
        k += 1
      }
      if (hits < minStop) return false
    }
    true
  }

  /** Struct-returning audit kernel (r9): every statistic, flag, and
    * the conjunction from the SAME single scan — gopherRules'
    * column-battery output at kernel speed. Field semantics mirror the
    * battery exactly: zero-denominator ratios are 0.0, every ratio
    * rounds 6 dp BEFORE its flag comparison, n_stop counts ALL
    * distinct stopword hits (no early exit — this is the audit path),
    * and r_stop uses the battery's fixed >= 2 threshold.
    */
  def statsRow(text: UTF8String, minWords: Long,
               maxWords: Long): org.apache.spark.sql.catalyst.InternalRow = {
    val c = rawCounts(text.toString)
    val nWords = c(0); val sumWordLen = c(1); val nAlphaWords = c(2)
    val nHash = c(3); val nUell = c(4); val nLines = c(5)
    val nBulletLines = c(6); val nEllipsisLines = c(7); val nDots = c(8)

    val meanWordLen =
      if (nWords > 0) round6(sumWordLen.toDouble / nWords) else 0.0
    val symbolRatio =
      if (nWords > 0) round6((nHash + nDots + nUell).toDouble / nWords)
      else 0.0
    val alphaFrac =
      if (nWords > 0) round6(nAlphaWords.toDouble / nWords) else 0.0
    val bulletFrac =
      if (nLines > 0) round6(nBulletLines.toDouble / nLines) else 0.0
    val ellipsisFrac =
      if (nLines > 0) round6(nEllipsisLines.toDouble / nLines) else 0.0
    val padded = " " + text.toLowerCase.toString + " "
    var nStop = 0L
    var k = 0
    while (k < stopwords.length) {
      if (padded.contains(stopwords(k))) nStop += 1
      k += 1
    }

    val rWords = nWords >= minWords && nWords <= maxWords
    val rWordLen = meanWordLen >= 3.0 && meanWordLen <= 10.0
    val rSymbol = symbolRatio <= 0.1
    val rBullet = bulletFrac <= 0.9
    val rEllipsis = ellipsisFrac <= 0.3
    val rAlpha = alphaFrac >= 0.8
    val rStop = nStop >= 2L
    val allPass = rWords && rWordLen && rSymbol && rBullet &&
      rEllipsis && rAlpha && rStop
    org.apache.spark.sql.catalyst.InternalRow(
      nWords, meanWordLen, symbolRatio, alphaFrac, bulletFrac,
      ellipsisFrac, nStop, rWords, rWordLen, rSymbol, rBullet,
      rEllipsis, rAlpha, rStop, allPass)
  }
}

/** gopher_stats(text) → struct of every H16 statistic, flag, and the
  * conjunction, computed by the single-scan kernel (r9): the audit
  * path at kernel speed. Field order matches gopherRules' column
  * battery so `struct.*` expands to the identical relation.
  */
case class GopherStatsExpr(child: Expression, minWords: Long,
                           maxWords: Long) extends UnaryExpression {
  import org.apache.spark.sql.types._

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string, got $other")
  }
  override def dataType: DataType = GopherStatsExpr.schema
  override def prettyName: String = "gopher_stats"

  override protected def nullSafeEval(input: Any): Any =
    GopherRuntime.statsRow(input.asInstanceOf[UTF8String], minWords,
      maxWords)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.GopherRuntime.statsRow($c, ${minWords}L, ${maxWords}L)")

  override protected def withNewChildInternal(
      newChild: Expression): GopherStatsExpr = copy(child = newChild)
}

object GopherStatsExpr {
  import org.apache.spark.sql.types._
  val schema: StructType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("mean_word_len", DoubleType, nullable = false),
    StructField("symbol_ratio", DoubleType, nullable = false),
    StructField("alpha_frac", DoubleType, nullable = false),
    StructField("bullet_frac", DoubleType, nullable = false),
    StructField("ellipsis_frac", DoubleType, nullable = false),
    StructField("n_stop", LongType, nullable = false),
    StructField("r_words", BooleanType, nullable = false),
    StructField("r_word_len", BooleanType, nullable = false),
    StructField("r_symbol", BooleanType, nullable = false),
    StructField("r_bullet", BooleanType, nullable = false),
    StructField("r_ellipsis", BooleanType, nullable = false),
    StructField("r_alpha", BooleanType, nullable = false),
    StructField("r_stop", BooleanType, nullable = false),
    StructField("pass", BooleanType, nullable = false)))
}

/** gopher_pass(text) → boolean with bound thresholds. */
case class GopherPass(child: Expression, minWords: Long, maxWords: Long,
                      minStop: Long) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string, got $other")
  }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "gopher_pass"

  override protected def nullSafeEval(input: Any): Any =
    GopherRuntime.pass(input.asInstanceOf[UTF8String], minWords, maxWords,
      minStop)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.GopherRuntime.pass($c, ${minWords}L, ${maxWords}L, ${minStop}L)")

  override protected def withNewChildInternal(newChild: Expression): GopherPass =
    copy(child = newChild)
}
