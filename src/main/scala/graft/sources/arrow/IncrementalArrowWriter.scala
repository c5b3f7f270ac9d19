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
                             conf: Configuration = HadoopFiles.local) {
  private val alloc: BufferAllocator = ArrowIo.rootAllocator()
  private val root = VectorSchemaRoot.create(ArrowTypes.toArrowSchema(schema), alloc)
  private val writers = schema.fields.indices.map { i =>
    AFWriter(root.getVector(i), schema.fields(i).dataType)
  }
  private val ch = HadoopFiles.createChannel(path, conf)
  private val writer = if (stream) new ArrowStreamWriter(root, null, ch)
    else new ArrowFileWriter(root, null, ch)
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
