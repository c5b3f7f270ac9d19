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
  *   [row-major LE body, zero-padded to 8 bytes]
  *
  * so packed bytes interop with any Arrow implementation's
  * read_tensor, and pack itself accepts bytes those writers produce.
  * Metadata is built with the same flatbuffer classes arrow-java
  * ships (org.apache.arrow.flatbuf). The dtype is parameterized the
  * way the reference Tensor is (reference: cpp/src/arrow/tensor.h:53
  * Tensor over any fixed-width DataType): float32, float64, int32,
  * int64 — the Spark array element type picks it on pack, and the
  * message header declares it for unpack to validate.
  */
object TensorRuntime {
  import com.google.flatbuffers.FlatBufferBuilder
  import org.apache.arrow.flatbuf.{Buffer => FbBuffer, FloatingPoint,
    Int => FbInt, Message, MessageHeader, MetadataVersion, Precision,
    Tensor => FbTensor, TensorDim, Type => FbType}

  private val Continuation = 0xFFFFFFFF
  private def pad8(n: Long): Long = (n + 7) & ~7L

  private def elemSize(dtype: String): Int = dtype match {
    case "float32" | "int32" => 4
    case "float64" | "int64" => 8
    case other => throw new UnsupportedOperationException(
      s"unsupported tensor dtype '$other'")
  }

  def pack(row: InternalRow, dtype: String): Array[Byte] = {
    val shape = row.getArray(0)
    val data = row.getArray(1)
    val ndim = shape.numElements()
    val n = data.numElements()
    val esz = elemSize(dtype)
    val bodyLen = esz.toLong * n
    val paddedBody = pad8(bodyLen)

    val b = new FlatBufferBuilder(256)
    val (typeType, typeOff) = dtype match {
      case "float32" =>
        (FbType.FloatingPoint, FloatingPoint.createFloatingPoint(b, Precision.SINGLE))
      case "float64" =>
        (FbType.FloatingPoint, FloatingPoint.createFloatingPoint(b, Precision.DOUBLE))
      case "int32" => (FbType.Int, FbInt.createInt(b, 32, true))
      case "int64" => (FbType.Int, FbInt.createInt(b, 64, true))
    }
    val dimOffs = new Array[Int](ndim)
    var i = 0
    while (i < ndim) {
      dimOffs(i) = TensorDim.createTensorDim(b, shape.getInt(i).toLong, 0)
      i += 1
    }
    val shapeVec = FbTensor.createShapeVector(b, dimOffs)
    // contiguous row-major strides in bytes, C++-writer style
    val strides = new Array[Long](ndim)
    var acc = esz.toLong
    i = ndim - 1
    while (i >= 0) { strides(i) = acc; acc *= shape.getInt(i); i -= 1 }
    val stridesVec = FbTensor.createStridesVector(b, strides)
    FbTensor.startTensor(b)
    FbTensor.addTypeType(b, typeType)
    FbTensor.addType(b, typeOff)
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
    dtype match {
      case "float32" => while (i < n) { out.putFloat(data.getFloat(i)); i += 1 }
      case "float64" => while (i < n) { out.putDouble(data.getDouble(i)); i += 1 }
      case "int32" => while (i < n) { out.putInt(data.getInt(i)); i += 1 }
      case "int64" => while (i < n) { out.putLong(data.getLong(i)); i += 1 }
    }
    out.array()
  }

  def unpack(bytes: Array[Byte], dtype: String): InternalRow = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(buf.getInt == Continuation,
      "not an Arrow IPC encapsulated message: missing continuation marker")
    val metaLen = buf.getInt
    val metaBuf = ByteBuffer.wrap(bytes, 8, metaLen).order(ByteOrder.LITTLE_ENDIAN)
    val msg = Message.getRootAsMessage(metaBuf)
    require(msg.headerType() == MessageHeader.Tensor,
      s"expected a Tensor message, got header type ${msg.headerType()}")
    val t = msg.header(new FbTensor()).asInstanceOf[FbTensor]
    val declared = t.typeType() match {
      case FbType.FloatingPoint =>
        t.`type`(new FloatingPoint()).asInstanceOf[FloatingPoint].precision() match {
          case Precision.SINGLE => "float32"
          case Precision.DOUBLE => "float64"
          case p => s"float(precision=$p)"
        }
      case FbType.Int =>
        val it = t.`type`(new FbInt()).asInstanceOf[FbInt]
        s"${if (it.isSigned) "int" else "uint"}${it.bitWidth()}"
      case tt => s"type($tt)"
    }
    require(declared == dtype,
      s"tensor message holds $declared, but tensor_unpack expected $dtype")
    val esz = elemSize(dtype)
    val ndim = t.shapeLength()
    val shape = new Array[Any](ndim)
    var i = 0
    while (i < ndim) { shape(i) = t.shape(i).size().toInt; i += 1 }
    val dataBuf = t.data()
    val bodyStart = 8 + metaLen + dataBuf.offset().toInt
    val n = (dataBuf.length() / esz).toInt
    val body = ByteBuffer.wrap(bytes, bodyStart, n * esz)
      .order(ByteOrder.LITTLE_ENDIAN)
    val data = new Array[Any](n)
    i = 0
    dtype match {
      case "float32" => while (i < n) { data(i) = body.getFloat; i += 1 }
      case "float64" => while (i < n) { data(i) = body.getDouble; i += 1 }
      case "int32" => while (i < n) { data(i) = body.getInt; i += 1 }
      case "int64" => while (i < n) { data(i) = body.getLong; i += 1 }
    }
    InternalRow(new GenericArrayData(shape): ArrayData,
      new GenericArrayData(data): ArrayData)
  }
}

/** Tensor IPC codec as native Catalyst expressions (SURVEY §2.E2).
  *
  * Emits the real Arrow Tensor IPC encapsulated message (see
  * TensorRuntime for the framing) so packed bytes are readable by any
  * Arrow implementation. Codegens as a static call so surrounding
  * operators stay in whole-stage codegen. The packed dtype follows
  * the data array's element type: float→float32, double→float64,
  * int→int32, long→int64.
  */
case class TensorPack(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StructType(Array(
      StructField(_, ArrayType(IntegerType, _), _, _),
      StructField(_, ArrayType(FloatType | DoubleType | IntegerType | LongType, _),
        _, _))) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires struct<shape:array<int>,data:array<float|double|int|bigint>>, got $other")
  }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "tensor_pack"

  private lazy val dtype: String = TensorCodec.dtypeOf(
    child.dataType.asInstanceOf[StructType](1).dataType
      .asInstanceOf[ArrayType].elementType)

  override protected def nullSafeEval(input: Any): Any =
    TensorRuntime.pack(input.asInstanceOf[InternalRow], dtype)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"""graft.functions.TensorRuntime.pack($c, "$dtype")""")

  override protected def withNewChildInternal(newChild: Expression): TensorPack =
    copy(child = newChild)
}

case class TensorUnpack(child: Expression, elem: DataType = FloatType)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType if TensorCodec.supported(elem) => TypeCheckResult.TypeCheckSuccess
    case BinaryType => TypeCheckResult.TypeCheckFailure(
      s"$prettyName element type must be float, double, int or bigint, got $elem")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got $other")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("shape", ArrayType(IntegerType, containsNull = false)),
    StructField("data", ArrayType(elem, containsNull = false))))
  override def prettyName: String = "tensor_unpack"

  private lazy val dtype: String = TensorCodec.dtypeOf(elem)

  override protected def nullSafeEval(input: Any): Any =
    TensorRuntime.unpack(input.asInstanceOf[Array[Byte]], dtype)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"""graft.functions.TensorRuntime.unpack($c, "$dtype")""")

  override protected def withNewChildInternal(newChild: Expression): TensorUnpack =
    copy(child = newChild)
}

object TensorCodec {
  /** Spark element type → Arrow tensor dtype name. */
  def dtypeOf(elem: DataType): String = elem match {
    case FloatType => "float32"
    case DoubleType => "float64"
    case IntegerType => "int32"
    case LongType => "int64"
    case other => throw new UnsupportedOperationException(
      s"unsupported tensor element type $other")
  }
  def supported(elem: DataType): Boolean = elem match {
    case FloatType | DoubleType | IntegerType | LongType => true
    case _ => false
  }
  /** Tensor dtype name → Spark element type (for SQL's string arg). */
  def elemOf(dtype: String): DataType = dtype match {
    case "float32" => FloatType
    case "float64" => DoubleType
    case "int32" => IntegerType
    case "int64" => LongType
    case other => throw new IllegalArgumentException(
      s"unsupported tensor dtype '$other' (float32|float64|int32|int64)")
  }
}
