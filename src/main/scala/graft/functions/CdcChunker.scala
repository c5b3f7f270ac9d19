package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking (SURVEY §2.H15): split text at positions
  * where a rolling hash of the last `window` chars hits a boundary
  * pattern, instead of at fixed offsets. The CDC property is what a
  * dedup pipeline needs: inserting or deleting a prefix shifts every
  * fixed-window chunk (H6) but leaves all CDC chunks after the edit
  * region byte-identical, so chunk-hash dedup (F9) still recognizes
  * the shared content.
  *
  * Boundary rule: polynomial rolling hash h over a sliding
  * `window`-char context; a cut happens when (h & mask) == mask with
  * mask = 2^k − 1 chosen so 2^k ≈ targetSize (expected chunk length),
  * subject to minSize/maxSize bounds (maxSize forces a cut, minSize
  * suppresses early cuts — standard CDC normalization). Purely a
  * function of content → deterministic everywhere.
  */
object CdcRuntime {

  def chunks(text: UTF8String, targetSize: Int, minSize: Int,
             maxSize: Int, window: Int): ArrayData = {
    val s = text.toString
    if (s.isEmpty) return new GenericArrayData(Array[Any](UTF8String.EMPTY_UTF8))
    // bits capped at 30: Int shifts wrap mod 32, so an unguarded loop
    // would cycle forever for targetSize >= 2^30
    var bits = 1
    while (bits < 30 && (1 << (bits + 1)) <= targetSize) bits += 1
    val mask = (1 << bits) - 1
    // 31^(window-1) mod 2^64: the out-going char's weight in the
    // rolling update h' = (h − c_out·pw)·31 + c_in
    val pw = { var p = 1L; var j = 0; while (j < window - 1) { p *= 31; j += 1 }; p }
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var start = 0
    var h = 0L
    var i = 0
    while (i < s.length) {
      val len0 = i - start // chars already hashed in this chunk
      h =
        if (len0 < window) h * 31 + s.charAt(i)
        else (h - s.charAt(i - window) * pw) * 31 + s.charAt(i)
      val len = len0 + 1
      // never cut between the halves of a surrogate pair: the split
      // substrings would hold unpaired surrogates and corrupt on the
      // UTF-8 round-trip (found by TextFuzzSpec). Deferring one char
      // is deterministic — both copies of a shared region defer alike.
      // Consequence: when an astral char straddles the FORCED cut, a
      // chunk may reach maxSize+1 UTF-16 units (still <= maxSize code
      // points — the pair is one code point).
      val splitsSurrogate =
        Character.isHighSurrogate(s.charAt(i)) && i + 1 < s.length
      if (!splitsSurrogate &&
          ((len >= minSize && (h & mask) == mask) || len >= maxSize)) {
        out += UTF8String.fromString(s.substring(start, i + 1))
        start = i + 1
        h = 0L
      }
      i += 1
    }
    if (start < s.length) out += UTF8String.fromString(s.substring(start))
    new GenericArrayData(out.toArray)
  }
}

/** cdc_chunks(str, target, min, max[, window=16]) → array<string>. */
case class CdcChunks(child: Expression, targetSize: Int = 64,
                     minSize: Int = 16, maxSize: Int = 256,
                     window: Int = 16) extends UnaryExpression {
  require(targetSize >= 2 && minSize >= 1 && maxSize >= targetSize &&
    minSize <= targetSize && window >= 1,
    s"bad CDC params: target=$targetSize min=$minSize max=$maxSize window=$window")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string, got $other")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "cdc_chunks"

  override protected def nullSafeEval(input: Any): Any =
    CdcRuntime.chunks(input.asInstanceOf[UTF8String],
      targetSize, minSize, maxSize, window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CdcRuntime.chunks($c, $targetSize, $minSize, $maxSize, $window)")

  override protected def withNewChildInternal(newChild: Expression): CdcChunks =
    copy(child = newChild)
}
