package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Static runtime for the tensor codec (see TensorPack). */
object TensorRuntime {

  def pack(row: InternalRow): Array[Byte] = {
    val shape = row.getArray(0)
    val data = row.getArray(1)
    val ndim = shape.numElements()
    val n = data.numElements()
    val buf = ByteBuffer.allocate(4 + 4 * ndim + 4 + 4 * n)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(ndim)
    var i = 0
    while (i < ndim) { buf.putInt(shape.getInt(i)); i += 1 }
    buf.putInt(n)
    i = 0
    while (i < n) { buf.putFloat(data.getFloat(i)); i += 1 }
    buf.array()
  }

  def unpack(bytes: Array[Byte]): InternalRow = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val ndim = buf.getInt
    val shape = new Array[Any](ndim)
    var i = 0
    while (i < ndim) { shape(i) = buf.getInt; i += 1 }
    val n = buf.getInt
    val data = new Array[Any](n)
    i = 0
    while (i < n) { data(i) = buf.getFloat; i += 1 }
    InternalRow(new GenericArrayData(shape): ArrayData,
      new GenericArrayData(data): ArrayData)
  }
}

/** Tensor IPC codec as native Catalyst expressions (SURVEY §2.E2).
  *
  * Layout mirrors the reference's dense-tensor message (reference:
  * cpp/src/arrow/tensor.h WriteTensor, format/Tensor.fbs): row-major,
  * self-describing — [ndim:i32][shape:i32*ndim][n:i32][data:f32*n],
  * little-endian like all arrow buffers. Codegens as a static call so
  * surrounding operators stay in whole-stage codegen.
  */
case class TensorPack(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StructType(Array(
      StructField(_, ArrayType(IntegerType, _), _, _),
      StructField(_, ArrayType(FloatType, _), _, _))) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires struct<shape:array<int>,data:array<float>>, got $other")
  }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "tensor_pack"

  override protected def nullSafeEval(input: Any): Any =
    TensorRuntime.pack(input.asInstanceOf[InternalRow])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TensorRuntime.pack($c)")

  override protected def withNewChildInternal(newChild: Expression): TensorPack =
    copy(child = newChild)
}

case class TensorUnpack(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got $other")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("shape", ArrayType(IntegerType, containsNull = false)),
    StructField("data", ArrayType(FloatType, containsNull = false))))
  override def prettyName: String = "tensor_unpack"

  override protected def nullSafeEval(input: Any): Any =
    TensorRuntime.unpack(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TensorRuntime.unpack($c)")

  override protected def withNewChildInternal(newChild: Expression): TensorUnpack =
    copy(child = newChild)
}
