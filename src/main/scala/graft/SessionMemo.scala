package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-session memo for materialize-once derived datasets (the
  * persisted partsupp / LSH-pair pipelines). Keys hold the session
  * weakly: a stopped and dropped session releases its cached plans
  * (and their persisted blocks) instead of pinning them for the JVM
  * lifetime, and two sessions can never collide on a hash.
  */
private[graft] object SessionMemo {
  private val store = new java.util.WeakHashMap[
    SparkSession, scala.collection.concurrent.TrieMap[Any, DataFrame]]()

  def apply(s: SparkSession, key: Any)(build: => DataFrame): DataFrame = {
    val perSession = store.synchronized {
      var t = store.get(s)
      if (t == null) {
        t = scala.collection.concurrent.TrieMap.empty[Any, DataFrame]
        store.put(s, t)
      }
      t
    }
    perSession.getOrElseUpdate(key, build)
  }
}
