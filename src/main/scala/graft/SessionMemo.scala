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

  /** Same memo discipline for non-DataFrame training artifacts (PQ
    * codebooks, SQ quantization ranges — bounded driver-side values
    * whose builds nonetheless run Spark jobs). Kept in a separate
    * store so the DataFrame map stays monomorphic.
    */
  private val anyStore = new java.util.WeakHashMap[
    SparkSession,
    scala.collection.concurrent.TrieMap[Any, java.lang.ref.SoftReference[AnyRef]]]()

  def any[T <: AnyRef](s: SparkSession, key: Any)(build: => T): T = {
    val perSession = anyStore.synchronized {
      var t = anyStore.get(s)
      if (t == null) {
        t = scala.collection.concurrent.TrieMap
          .empty[Any, java.lang.ref.SoftReference[AnyRef]]
        anyStore.put(s, t)
      }
      t
    }
    perSession.get(key).flatMap(r => Option(r.get())) match {
      case Some(v) => v.asInstanceOf[T]
      case None =>
        val v = build
        perSession.put(key, new java.lang.ref.SoftReference[AnyRef](v))
        v
    }
  }
}
