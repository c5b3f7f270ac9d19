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
