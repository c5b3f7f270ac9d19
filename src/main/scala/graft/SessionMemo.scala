package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-session memo for materialize-once derived datasets (the
  * persisted partsupp / LSH-pair pipelines). Keys hold the session
  * weakly and two sessions can never collide on a hash. Values are
  * SoftReferences: a cached DataFrame strongly references its own
  * session, so strong values would defeat the weak keys (the
  * WeakHashMap value→key warning) — soft values let the collector
  * clear a dropped session's cache under memory pressure, at the cost
  * of an occasional rebuild.
  */
private[graft] object SessionMemo {
  private val store = new java.util.WeakHashMap[
    SparkSession,
    scala.collection.concurrent.TrieMap[Any, java.lang.ref.SoftReference[DataFrame]]]()

  def apply(s: SparkSession, key: Any)(build: => DataFrame): DataFrame = {
    val perSession = store.synchronized {
      var t = store.get(s)
      if (t == null) {
        t = scala.collection.concurrent.TrieMap
          .empty[Any, java.lang.ref.SoftReference[DataFrame]]
        store.put(s, t)
      }
      t
    }
    perSession.get(key).flatMap(r => Option(r.get())) match {
      case Some(df) => df
      case None =>
        val df = build
        perSession.put(key, new java.lang.ref.SoftReference(df))
        df
    }
  }
}
