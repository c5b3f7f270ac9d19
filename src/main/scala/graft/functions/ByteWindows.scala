package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}

/** Byte-window hashing for opaque media near-dup (SURVEY §2.E6):
  * FNV-1a hashes of fixed `window`-byte slices every `stride` bytes —
  * a decode-free signature of binary content. Two blobs sharing most
  * window hashes share most of their bytes (at window alignment), so
  * truncated/appended re-uploads of the same asset are detectable
  * without any image/audio decoding. A blob shorter than one window
  * hashes whole.
  */
object ByteWindowRuntime {
  def windowHashes(bin: Array[Byte], window: Int, stride: Int): ArrayData = {
    val n = bin.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    if (n < window) {
      out += fnv(bin, 0, n)
    } else {
      var off = 0
      while (off + window <= n) {
        out += fnv(bin, off, window)
        off += stride
      }
    }
    new GenericArrayData(out.toArray)
  }

  private def fnv(b: Array[Byte], off: Int, len: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = off
    val end = off + len
    while (i < end) {
      h ^= (b(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** FNV hashes of content-defined byte chunks (the H15 boundary rule
    * applied to raw bytes): cut where the rolling window hash matches
    * (h & mask) == mask, min/max-normalized — so a PREFIX edit shifts
    * only the chunks around it and every later chunk hashes
    * identically. The shift-robust signature fixed-stride
    * [[windowHashes]] cannot be.
    */
  def cdcHashes(bin: Array[Byte], targetSize: Int, minSize: Int,
                maxSize: Int, window: Int): ArrayData = {
    val n = bin.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    // bits capped at 30: Int shifts wrap mod 32, so an unguarded loop
    // would cycle forever for targetSize >= 2^30
    var bits = 1
    while (bits < 30 && (1 << (bits + 1)) <= targetSize) bits += 1
    val mask = (1 << bits) - 1
    val pw = { var p = 1L; var j = 0; while (j < window - 1) { p *= 31; j += 1 }; p }
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var start = 0
    var h = 0L
    var i = 0
    while (i < n) {
      val len0 = i - start
      h =
        if (len0 < window) h * 31 + (bin(i) & 0xff)
        else (h - (bin(i - window) & 0xff) * pw) * 31 + (bin(i) & 0xff)
      val len = len0 + 1
      if ((len >= minSize && (h & mask) == mask) || len >= maxSize) {
        out += fnv(bin, start, i + 1 - start)
        start = i + 1
        h = 0L
      }
      i += 1
    }
    if (start < n) out += fnv(bin, start, n - start)
    new GenericArrayData(out.toArray)
  }
}

/** byte_cdc_hashes(binary, target, min, max[, window]) → array<long>. */
case class ByteCdcHashes(child: Expression, targetSize: Int = 128,
                         minSize: Int = 32, maxSize: Int = 512,
                         window: Int = 16) extends UnaryExpression {
  require(targetSize >= 2 && minSize >= 1 && maxSize >= targetSize &&
    minSize <= targetSize && window >= 1,
    s"bad CDC params: target=$targetSize min=$minSize max=$maxSize window=$window")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "byte_cdc_hashes"

  override protected def nullSafeEval(input: Any): Any =
    ByteWindowRuntime.cdcHashes(input.asInstanceOf[Array[Byte]],
      targetSize, minSize, maxSize, window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ByteWindowRuntime.cdcHashes($c, $targetSize, $minSize, $maxSize, $window)")

  override protected def withNewChildInternal(newChild: Expression): ByteCdcHashes =
    copy(child = newChild)
}

/** byte_window_hashes(binary, window, stride) → array<long>. */
case class ByteWindowHashes(child: Expression, window: Int = 64,
                            stride: Int = 32) extends UnaryExpression {
  require(window >= 1 && stride >= 1,
    s"window/stride must be positive: $window/$stride")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "byte_window_hashes"

  override protected def nullSafeEval(input: Any): Any =
    ByteWindowRuntime.windowHashes(input.asInstanceOf[Array[Byte]],
      window, stride)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ByteWindowRuntime.windowHashes($c, $window, $stride)")

  override protected def withNewChildInternal(newChild: Expression): ByteWindowHashes =
    copy(child = newChild)
}
