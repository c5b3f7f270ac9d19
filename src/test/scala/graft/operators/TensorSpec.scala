package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

class TensorSpec extends SparkSpec {
  import sqlImplicits._

  private lazy val df = Seq(
    (1L, Seq(2, 2), Seq(1f, 2f, 3f, 4f)),
    (2L, Seq(3), Seq(0.5f, -1f, 2f))
  ).toDF("id", "shape", "data")
    .select(col("id"), Tensor.tensor(col("shape"), col("data")).as("t"))

  test("numElements multiplies the shape") {
    val n = df.select(col("id"), Tensor.numElements(col("t")).as("n"))
      .as[(Long, Int)].collect().toMap
    assert(n == Map(1L -> 4, 2L -> 3))
  }

  test("elementwise add/mul/scale") {
    val out = df.where($"id" === 1)
      .select(Tensor.add(col("t"), col("t")).getField("data").as("s"),
        Tensor.mul(col("t"), col("t")).getField("data").as("m"),
        Tensor.scale(col("t"), lit(2.0f)).getField("data").as("k"))
      .as[(Seq[Float], Seq[Float], Seq[Float])].head()
    assert(out._1 == Seq(2f, 4f, 6f, 8f))
    assert(out._2 == Seq(1f, 4f, 9f, 16f))
    assert(out._3 == Seq(2f, 4f, 6f, 8f))
  }

  test("sumAll") {
    val s = df.where($"id" === 1).select(Tensor.sumAll(col("t"))).as[Double].head()
    assert(math.abs(s - 10.0) < 1e-6)
  }

  test("pack/unpack roundtrip preserves shape and data") {
    val rt = df.select(col("id"), Tensor.unpack(Tensor.pack(col("t"))).as("t2"))
      .select(col("id"), col("t2.shape"), col("t2.data"))
      .as[(Long, Seq[Int], Seq[Float])].collect()
      .map { case (id, sh, da) => id -> ((sh, da)) }.toMap
    val orig = df.select(col("id"), col("t.shape"), col("t.data"))
      .as[(Long, Seq[Int], Seq[Float])].collect()
      .map { case (id, sh, da) => id -> ((sh, da)) }.toMap
    assert(rt == orig)
  }

  test("packed bytes are a valid Arrow Tensor IPC message (arrow flatbuffers parse them)") {
    import org.apache.arrow.flatbuf.{FloatingPoint, Message, MessageHeader,
      Precision, Tensor => FbTensor, Type => FbType}
    val bytes = df.where($"id" === 1).select(Tensor.pack(col("t"))).as[Array[Byte]].head()
    val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    assert(buf.getInt == 0xFFFFFFFF, "continuation marker")
    val metaLen = buf.getInt
    assert(metaLen % 8 == 0, "metadata padded to 8 bytes")
    // parse the metadata with arrow-java's own flatbuffer classes
    val msg = Message.getRootAsMessage(
      java.nio.ByteBuffer.wrap(bytes, 8, metaLen).order(java.nio.ByteOrder.LITTLE_ENDIAN))
    assert(msg.headerType() == MessageHeader.Tensor)
    val t = msg.header(new FbTensor()).asInstanceOf[FbTensor]
    assert(t.typeType() == FbType.FloatingPoint)
    assert(t.`type`(new FloatingPoint()).asInstanceOf[FloatingPoint]
      .precision() == Precision.SINGLE)
    assert((0 until t.shapeLength()).map(t.shape(_).size()) == Seq(2L, 2L))
    // contiguous row-major strides in bytes
    assert((0 until t.stridesLength()).map(t.strides) == Seq(8L, 4L))
    assert(t.data().length() == 16L)
    // body: 8-byte aligned, row-major float32 LE
    val bodyStart = 8 + metaLen + t.data().offset().toInt
    val body = java.nio.ByteBuffer.wrap(bytes, bodyStart, 16)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    assert(Seq.fill(4)(body.getFloat) == Seq(1f, 2f, 3f, 4f))
  }
}
