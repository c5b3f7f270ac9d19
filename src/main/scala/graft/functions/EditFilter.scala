package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Counting-filter kernels for edit-distance candidate pruning (F8,
  * r15 optimization): a per-document 64-bucket character histogram and
  * the per-pair L1 distance over two histograms.
  *
  * Soundness (the standard q-gram/counting filter argument, Jokinen &
  * Ukkonen 1991 degenerate q=1 case): one edit operation changes the
  * character multiset by at most two units — a substitution removes
  * one code point and adds another (two bucket counts move by one
  * each), an insert/delete moves one. So for any two strings,
  * L1(hist(a), hist(b)) <= 2 * levenshtein(a, b). Bucketing collisions
  * (64 buckets, leading-byte & 0x3F) and count saturation (255 per
  * bucket) only ever DECREASE the L1, so the bound survives both:
  * l1 > 2*maxDist  ==>  dist > maxDist, with no false negatives.
  * A pair rejected by the bound is exactly a pair the banded DP would
  * have rejected — results are identical, the DP just never runs for
  * the (vast) majority of candidates whose character mix already
  * rules them out.
  */
object EditFilterRuntime {

  /** 64-byte histogram of the string's code points: each code point is
    * counted once under its UTF-8 LEADING byte & 0x3F (continuation
    * bytes 10xxxxxx are skipped), saturating at 255.
    */
  def charHist64(s: UTF8String): Array[Byte] = {
    val out = new Array[Byte](64)
    val n = s.numBytes()
    val base = s.getBaseObject
    val off = s.getBaseOffset
    var i = 0
    while (i < n) {
      val b = org.apache.spark.unsafe.Platform.getByte(base, off + i)
      if ((b & 0xC0) != 0x80) {
        val k = b & 0x3F
        if (out(k) != -1) out(k) = (out(k) + 1).toByte // -1 == 255 unsigned
      }
      i += 1
    }
    out
  }

  /** L1 distance between two histograms read as unsigned bytes; ragged
    * lengths compare the shared prefix plus the remainder's mass (never
    * arises from charHist64, defensive only).
    */
  def histL1(a: Array[Byte], b: Array[Byte]): Int = {
    val n = math.min(a.length, b.length)
    var acc = 0
    var i = 0
    while (i < n) {
      val d = (a(i) & 0xFF) - (b(i) & 0xFF)
      acc += (if (d < 0) -d else d)
      i += 1
    }
    while (i < a.length) { acc += a(i) & 0xFF; i += 1 }
    while (i < b.length) { acc += b(i) & 0xFF; i += 1 }
    acc
  }
}

/** char_hist64(string) → binary: the 64-bucket saturating character
  * histogram, computed once per row on each join side so the per-pair
  * screen is 64 byte-compares instead of an O(len·maxDist) DP.
  */
case class CharHist64(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got $other")
  }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "char_hist64"

  override protected def nullSafeEval(input: Any): Any =
    EditFilterRuntime.charHist64(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.EditFilterRuntime.charHist64($c)")

  override protected def withNewChildInternal(newChild: Expression): CharHist64 =
    copy(child = newChild)
}

/** hist_l1(binary, binary) → int: unsigned-byte L1 distance between
  * two histograms — 2·editDistance lower-bounds it (see
  * [[EditFilterRuntime]]).
  */
case class HistL1(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, binary), got ($l, $r)")
    }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "hist_l1"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    EditFilterRuntime.histL1(a.asInstanceOf[Array[Byte]],
      b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.EditFilterRuntime.histL1($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HistL1 =
    copy(left = newLeft, right = newRight)
}
