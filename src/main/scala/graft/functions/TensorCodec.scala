package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Static runtime for the tensor codec (see TensorPack).
  *
  * The byte layout is the Arrow Tensor IPC *encapsulated message*
  * (reference: cpp/src/arrow/ipc/writer.h:269 WriteTensor,
  * format/Tensor.fbs, format/Message.fbs):
  *
  *   [0xFFFFFFFF continuation][int32 LE metadata size]
  *   [Message flatbuffer (header = Tensor), zero-padded to 8 bytes]
  *   [row-major float32 LE body, zero-padded to 8 bytes]
  *
  * so packed bytes interop with any Arrow implementation's
  * read_tensor, and pack itself accepts bytes those writers produce.
  * Metadata is built with the same flatbuffer classes arrow-java
  * ships (org.apache.arrow.flatbuf).
  */
object TensorRuntime {
  import com.google.flatbuffers.FlatBufferBuilder
  import org.apache.arrow.flatbuf.{Buffer => FbBuffer, FloatingPoint,
    Message, MessageHeader, MetadataVersion, Precision,
    Tensor => FbTensor, TensorDim, Type => FbType}

  private val Continuation = 0xFFFFFFFF
  private def pad8(n: Long): Long = (n + 7) & ~7L

  def pack(row: InternalRow): Array[Byte] = {
    val shape = row.getArray(0)
    val data = row.getArray(1)
    val ndim = shape.numElements()
    val n = data.numElements()
    val bodyLen = 4L * n
    val paddedBody = pad8(bodyLen)

    val b = new FlatBufferBuilder(256)
    val fpOff = FloatingPoint.createFloatingPoint(b, Precision.SINGLE)
    val dimOffs = new Array[Int](ndim)
    var i = 0
    while (i < ndim) {
      dimOffs(i) = TensorDim.createTensorDim(b, shape.getInt(i).toLong, 0)
      i += 1
    }
    val shapeVec = FbTensor.createShapeVector(b, dimOffs)
    // contiguous row-major strides in bytes, C++-writer style
    val strides = new Array[Long](ndim)
    var acc = 4L
    i = ndim - 1
    while (i >= 0) { strides(i) = acc; acc *= shape.getInt(i); i -= 1 }
    val stridesVec = FbTensor.createStridesVector(b, strides)
    FbTensor.startTensor(b)
    FbTensor.addTypeType(b, FbType.FloatingPoint)
    FbTensor.addType(b, fpOff)
    FbTensor.addShape(b, shapeVec)
    FbTensor.addStrides(b, stridesVec)
    // Buffer is a struct: must be written inline while the table is open
    FbTensor.addData(b, FbBuffer.createBuffer(b, 0L, bodyLen))
    val tOff = FbTensor.endTensor(b)
    val msgOff = Message.createMessage(
      b, MetadataVersion.V5, MessageHeader.Tensor, tOff, paddedBody, 0)
    b.finish(msgOff)
    val meta = b.sizedByteArray()
    // prefix is 8 bytes, so padding the metadata to 8 keeps the body
    // 8-byte aligned as the IPC spec requires
    val metaPadded = pad8(meta.length.toLong).toInt

    val out = ByteBuffer.allocate(8 + metaPadded + paddedBody.toInt)
      .order(ByteOrder.LITTLE_ENDIAN)
    out.putInt(Continuation)
    out.putInt(metaPadded)
    out.put(meta)
    out.position(8 + metaPadded)
    i = 0
    while (i < n) { out.putFloat(data.getFloat(i)); i += 1 }
    out.array()
  }

  def unpack(bytes: Array[Byte]): InternalRow = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(buf.getInt == Continuation,
      "not an Arrow IPC encapsulated message: missing continuation marker")
    val metaLen = buf.getInt
    val metaBuf = ByteBuffer.wrap(bytes, 8, metaLen).order(ByteOrder.LITTLE_ENDIAN)
    val msg = Message.getRootAsMessage(metaBuf)
    require(msg.headerType() == MessageHeader.Tensor,
      s"expected a Tensor message, got header type ${msg.headerType()}")
    val t = msg.header(new FbTensor()).asInstanceOf[FbTensor]
    require(t.typeType() == FbType.FloatingPoint &&
      t.`type`(new FloatingPoint()).asInstanceOf[FloatingPoint]
        .precision() == Precision.SINGLE,
      "only float32 tensors are supported")
    val ndim = t.shapeLength()
    val shape = new Array[Any](ndim)
    var i = 0
    while (i < ndim) { shape(i) = t.shape(i).size().toInt; i += 1 }
    val dataBuf = t.data()
    val bodyStart = 8 + metaLen + dataBuf.offset().toInt
    val n = (dataBuf.length() / 4).toInt
    val body = ByteBuffer.wrap(bytes, bodyStart, n * 4)
      .order(ByteOrder.LITTLE_ENDIAN)
    val data = new Array[Any](n)
    i = 0
    while (i < n) { data(i) = body.getFloat; i += 1 }
    InternalRow(new GenericArrayData(shape): ArrayData,
      new GenericArrayData(data): ArrayData)
  }
}

/** Tensor IPC codec as native Catalyst expressions (SURVEY §2.E2).
  *
  * Emits the real Arrow Tensor IPC encapsulated message (see
  * TensorRuntime for the framing) so packed bytes are readable by any
  * Arrow implementation. Codegens as a static call so surrounding
  * operators stay in whole-stage codegen.
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
