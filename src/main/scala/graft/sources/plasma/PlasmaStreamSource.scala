package graft.sources.plasma

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sources.arrow.{ArrowInputPartition, ArrowIo, ArrowPartitionReaderFactory, SerializableHadoopConf}

/** Streaming source over a plasma store directory: each micro-batch
  * delivers the rows of objects sealed since the last batch — the
  * Structured Streaming twin of the reference's Subscribe →
  * GetNotification → Get consume loop (cpp/src/plasma/client.h:
  * 211–228). Batch reads see every currently-sealed object.
  *
  *   spark.readStream.format("plasma").option("dir", "/dev/shm/store")
  *
  * Contract: objects hold Arrow IPC stream payloads of ONE schema
  * (put there by `PlasmaStore.putDataFrame` or any Arrow writer); a
  * sealed object must not be deleted before the batch that carries
  * it is processed (the standard replayability contract a file source
  * has); and object ids are unique over the stream's lifetime —
  * offsets are id sets, so deleting an id and re-sealing new content
  * under the SAME id is not re-delivered (reference plasma ObjectIDs
  * are likewise never reused). Torn or foreign files in the directory
  * are skipped, matching `get()`'s clean-miss behavior. Like the
  * store itself this is a node-local interop surface — the driver and
  * the sealing process share the directory; point it at /dev/shm for
  * shared-page semantics.
  */
class PlasmaStreamSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "plasma"

  private def dirOf(options: CaseInsensitiveStringMap): String = {
    val d = options.get("dir")
    require(d != null, "plasma source requires a 'dir' option")
    d
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val store = new PlasmaStore(dirOf(options))
    // validObjects (footer-checked), not list(): a torn or foreign
    // file that happens to sort first must not break schema inference
    // when healthy sealed objects exist — same skip-torn contract as
    // the scan path
    val ids = store.validObjects()
    require(ids.nonEmpty,
      s"plasma source: no sealed objects at ${dirOf(options)} to infer a " +
        "schema from — seal one first or pass an explicit schema")
    ArrowIo.readSchema(store.sealedPath(ids.head))
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new PlasmaStreamTable(schema, properties.asScala.getOrElse("dir", null))

  override def supportsExternalMetadata(): Boolean = true
}

class PlasmaStreamTable(schema: StructType, dir: String)
    extends Table with SupportsRead {
  override def name(): String = s"plasma:$dir"
  override def schema(): StructType = schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val d = Option(options.get("dir")).getOrElse(dir)
    val hconf = new SerializableHadoopConf(
      org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration)
    new ScanBuilder {
      override def build(): Scan = new PlasmaScan(schema, d, hconf)
    }
  }
}

class PlasmaScan(requiredSchema: StructType, dir: String,
                 hconf: SerializableHadoopConf) extends Scan with Batch {
  private def store = new PlasmaStore(dir)

  override def readSchema(): StructType = requiredSchema
  override def description(): String = s"PlasmaScan[$dir]"

  // batch read: every currently-sealed object, one partition each
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    store.validObjects().map(id =>
      ArrowInputPartition(store.sealedPath(id)): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new ArrowPartitionReaderFactory(requiredSchema, hconf)

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new PlasmaMicroBatchStream(requiredSchema, dir, hconf)
}

/** Offset = the sorted set of object ids sealed so far. The store is
  * node-local and bounded by memory, so the id set stays small; set
  * difference between offsets gives exactly the objects a batch must
  * deliver, independent of seal timing.
  */
case class PlasmaOffset(ids: Seq[String]) extends Offset {
  override def json(): String = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    mapper.writeValueAsString(ids.sorted.asJava)
  }
}

class PlasmaMicroBatchStream(schema: StructType, dir: String,
                             hconf: SerializableHadoopConf)
    extends MicroBatchStream {
  private def store = new PlasmaStore(dir)

  override def initialOffset(): Offset = PlasmaOffset(Seq.empty)

  override def latestOffset(): Offset = PlasmaOffset(store.validObjects())

  override def deserializeOffset(json: String): Offset = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(json)
    PlasmaOffset((0 until node.size()).map(node.get(_).asText()))
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val seen = start.asInstanceOf[PlasmaOffset].ids.toSet
    val fresh = end.asInstanceOf[PlasmaOffset].ids.filterNot(seen)
    fresh.sorted.map(id =>
      ArrowInputPartition(store.sealedPath(id)): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ArrowPartitionReaderFactory(schema, hconf)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
