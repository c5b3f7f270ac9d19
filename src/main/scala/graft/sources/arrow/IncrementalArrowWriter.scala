package graft.sources.arrow

import org.apache.arrow.memory.BufferAllocator
import org.apache.hadoop.conf.Configuration
import org.apache.arrow.vector.VectorSchemaRoot
import org.apache.arrow.vector.ipc.{ArrowFileWriter, ArrowStreamWriter}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

import graft.sources.ArrowTypes

/** Row-at-a-time arrow IPC writer with bounded memory: rows accumulate
  * into one VectorSchemaRoot and flush as a record batch every
  * `batchRows`. The executor never holds more than one batch — the
  * same batching contract as the reference's RecordBatchFileWriter
  * (reference: cpp/src/arrow/ipc/writer.h:90).
  */
class IncrementalArrowWriter(path: String, schema: StructType,
                             stream: Boolean, batchRows: Int = 4096 * 4,
                             conf: Configuration = HadoopFiles.local,
                             compression: Option[String] = None) {
  private val alloc: BufferAllocator = ArrowIo.rootAllocator()
  private val root = VectorSchemaRoot.create(ArrowTypes.toArrowSchema(schema), alloc)
  private val writers = schema.fields.indices.map { i =>
    AFWriter(root.getVector(i), schema.fields(i).dataType)
  }
  private val ch = HadoopFiles.createChannel(path, conf)
  // buffer-level compression (Message.fbs BodyCompression): zstd or
  // lz4 per-buffer; readers pass CommonsCompressionFactory and
  // decompress transparently
  private val codec: Option[org.apache.arrow.vector.compression.CompressionUtil.CodecType] =
    compression.map {
      case "zstd" => org.apache.arrow.vector.compression.CompressionUtil.CodecType.ZSTD
      case "lz4" => org.apache.arrow.vector.compression.CompressionUtil.CodecType.LZ4_FRAME
      case other => throw new IllegalArgumentException(
        s"ipc.compression must be zstd or lz4, got $other")
    }
  private val writer = codec match {
    case None =>
      if (stream) new ArrowStreamWriter(root, null, ch)
      else new ArrowFileWriter(root, null, ch)
    case Some(ct) =>
      val opt = org.apache.arrow.vector.ipc.message.IpcOption.DEFAULT
      val f = org.apache.arrow.compression.CommonsCompressionFactory.INSTANCE
      if (stream)
        new ArrowStreamWriter(root, null, ch, opt, f, ct)
      else
        new ArrowFileWriter(root, null, ch, null, opt, f, ct)
  }
  writer.start()

  private var inBatch = 0
  private var total = 0L
  private var closed = false

  def append(row: InternalRow): Unit = {
    var c = 0
    while (c < writers.length) { writers(c).write(row, c); c += 1 }
    inBatch += 1
    if (inBatch >= batchRows) flush()
  }

  private def flush(): Unit = if (inBatch > 0) {
    writers.foreach(_.finish())
    root.setRowCount(inBatch)
    writer.writeBatch()
    total += inBatch
    writers.foreach(_.reset())
    inBatch = 0
  }

  def finish(): Long = {
    flush()
    writer.end()
    closeQuietly()
    total
  }

  def closeQuietly(): Unit = if (!closed) {
    closed = true
    try writer.close() finally {
      try root.close() finally alloc.close()
    }
  }
}
