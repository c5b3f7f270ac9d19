package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Compression-ratio quality signal (SURVEY §2.H13): the deflated
  * byte size of a document's text. compressed/raw is the classic
  * cheap "information density" screen (CCNet/Gopher lineage) —
  * boilerplate, template spam and degenerate repetition compress far
  * below natural prose, so a low ratio flags low-entropy documents
  * without tokenizing anything.
  *
  * Native expression: runs over 100% of corpus bytes, so it must stay
  * inside whole-stage codegen like the normalization kernel. raw
  * deflate (nowrap), fixed default level — deterministic for a given
  * input WITHIN a JVM/zlib version (deflate output is not pinned by
  * the format spec across zlib releases), so a homogeneous cluster
  * filters/splits reproducibly, but persisted ratios should not be
  * compared bit-exactly across JDK upgrades. The gate oracle is
  * therefore a contract (bounds + orderings), not an exact value.
  */
object CompressRuntime {
  // a Deflater holds native memory and costs JNI setup per
  // construction — on a kernel that runs over 100% of corpus bytes,
  // per-row construction dominates short documents. One instance per
  // task thread, reset() between rows (tasks are single-threaded).
  // The holder indirection exists so dying threads release their
  // native window buffers: when a task thread exits, its ThreadLocal
  // map entry is collected, the holder becomes unreachable, and the
  // cleaner end()s the deflater instead of pinning zlib memory for
  // the JVM lifetime. The cleanup action captures the deflater, never
  // the holder (a self-reference would defeat the cleaner).
  private val cleaner = java.lang.ref.Cleaner.create()
  private final class Holder {
    val deflater = new java.util.zip.Deflater(
      java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
  }
  private val local = new ThreadLocal[Holder] {
    override def initialValue(): Holder = {
      val h = new Holder
      val d = h.deflater
      cleaner.register(h, () => d.end())
      h
    }
  }

  def deflateSize(s: UTF8String): Long = {
    val bytes = s.getBytes
    val d = local.get().deflater
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total
  }
}

/** deflate_size(str) → bigint: deflated size of the UTF-8 bytes. */
case class DeflateSize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string, got $other")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "deflate_size"

  override protected def nullSafeEval(input: Any): Any =
    CompressRuntime.deflateSize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CompressRuntime.deflateSize($c)")

  override protected def withNewChildInternal(newChild: Expression): DeflateSize =
    copy(child = newChild)
}
