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

  test("float64 and int32/int64 tensors roundtrip through the Tensor IPC message") {
    import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}
    val d64 = Seq((1L, Seq(2, 2), Seq(1.5, -2.25, 3.0, 4.125)))
      .toDF("id", "shape", "data")
      .select(Tensor.tensor(col("shape"), col("data")).as("t"))
    val back64 = d64.select(Tensor.unpack(Tensor.pack(col("t")), DoubleType).as("t2"))
      .select(col("t2.shape"), col("t2.data")).as[(Seq[Int], Seq[Double])].head()
    assert(back64 == ((Seq(2, 2), Seq(1.5, -2.25, 3.0, 4.125))))

    val i32 = Seq((1L, Seq(3), Seq(7, -8, 9))).toDF("id", "shape", "data")
      .select(Tensor.tensor(col("shape"), col("data")).as("t"))
    val back32 = i32.select(Tensor.unpack(Tensor.pack(col("t")), IntegerType).as("t2"))
      .select(col("t2.shape"), col("t2.data")).as[(Seq[Int], Seq[Int])].head()
    assert(back32 == ((Seq(3), Seq(7, -8, 9))))

    val i64 = Seq((1L, Seq(2), Seq(Long.MaxValue, -42L))).toDF("id", "shape", "data")
      .select(Tensor.tensor(col("shape"), col("data")).as("t"))
    val back = i64.select(Tensor.unpack(Tensor.pack(col("t")), LongType).as("t2"))
      .select(col("t2.data")).as[Seq[Long]].head()
    assert(back == Seq(Long.MaxValue, -42L))
  }

  test("unpack with a mismatched dtype fails loudly, not wrong values") {
    import org.apache.spark.sql.types.IntegerType
    // the message declares float32; asking for int32 must error, and
    // the codec-elimination rule must NOT silently bypass the check
    val e = intercept[Exception] {
      df.select(Tensor.unpack(Tensor.pack(col("t")), IntegerType)).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(m => m.contains("float32") && m.contains("int32")))
  }

  test("packed float64 tensor is readable by pyarrow (cross-implementation)") {
    val pyOk = scala.util.Try(
      scala.sys.process.Process(Seq("python3", "-c", "import pyarrow")).! == 0
    ).getOrElse(false)
    assume(pyOk, "pyarrow not available in this environment")
    import org.apache.spark.sql.types.DoubleType
    val bytes = Seq((Seq(2, 3), Seq(1.5, 2.5, 3.5, 4.5, 5.5, 6.5)))
      .toDF("shape", "data")
      .select(Tensor.pack(Tensor.tensor(col("shape"), col("data"))))
      .as[Array[Byte]].head()
    val f = java.nio.file.Files.createTempFile("graft-tensor", ".bin")
    java.nio.file.Files.write(f, bytes)
    val script =
      s"""import pyarrow as pa
         |t = pa.ipc.read_tensor(pa.memory_map('${f.toString}'))
         |assert t.type == pa.float64(), t.type
         |assert t.shape == (2, 3), t.shape
         |vals = t.to_numpy().ravel().tolist()
         |assert vals == [1.5, 2.5, 3.5, 4.5, 5.5, 6.5], vals
         |print('OK')
         |""".stripMargin
    val out = new StringBuilder
    val rc = scala.sys.process.Process(Seq("python3", "-c", script))
      .!(scala.sys.process.ProcessLogger(s => out.append(s), s => out.append(s)))
    assert(rc == 0 && out.toString.contains("OK"), s"pyarrow said: $out")

    // and the reverse: pyarrow writes, graft unpacks
    val f2 = java.nio.file.Files.createTempFile("graft-tensor-py", ".bin")
    val wr =
      s"""import pyarrow as pa, numpy as np
         |t = pa.Tensor.from_numpy(np.array([[10.0, 20.0], [30.0, 40.0]]))
         |with pa.output_stream('${f2.toString}') as s:
         |    pa.ipc.write_tensor(t, s)
         |""".stripMargin
    assert(scala.sys.process.Process(Seq("python3", "-c", wr)).! == 0)
    val pyBytes = java.nio.file.Files.readAllBytes(f2)
    val got = Seq(Tuple1(pyBytes)).toDF("b")
      .select(Tensor.unpack(col("b"), DoubleType).as("t"))
      .select(col("t.shape"), col("t.data")).as[(Seq[Int], Seq[Double])].head()
    assert(got == ((Seq(2, 2), Seq(10.0, 20.0, 30.0, 40.0))))
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
