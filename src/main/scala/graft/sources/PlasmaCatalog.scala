package graft.sources

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Spark-native analog of the reference's Plasma shared-memory object
  * store (reference: cpp/src/plasma/client.h — Create/Get/Contains/
  * Release/Delete by ObjectID).
  *
  * In Spark the executor-shared immutable object cache *is* the block
  * manager, so "put" pins a DataFrame into distributed storage
  * (MEMORY_AND_DISK, like plasma's shared-memory-with-eviction) and
  * registers it as a temp view; "get" returns the cached handle.
  * Objects are immutable once sealed, as in plasma: put of an existing
  * id throws unless `overwrite`.
  */
object PlasmaCatalog {
  private val objects = new ConcurrentHashMap[String, DataFrame]()

  def put(id: String, df: DataFrame, overwrite: Boolean = false,
          level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    if (!overwrite && objects.containsKey(id))
      throw new IllegalStateException(s"plasma object '$id' already sealed")
    val cached = df.persist(level)
    cached.createOrReplaceTempView(s"plasma_$id")
    objects.put(id, cached)
    cached
  }

  def get(id: String): Option[DataFrame] = Option(objects.get(id))

  def contains(id: String): Boolean = objects.containsKey(id)

  def delete(id: String): Boolean = {
    val df = objects.remove(id)
    if (df != null) {
      df.unpersist(blocking = false)
      df.sparkSession.catalog.dropTempView(s"plasma_$id")
      true
    } else false
  }

  def ids(): Set[String] = {
    import scala.jdk.CollectionConverters._
    objects.keySet().asScala.toSet
  }

  def clear(): Unit = ids().foreach(delete)
}
