package graft

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong
import java.util.function.{Function => JFunction}

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Resident-server facade over the [[SparkEntry]] registry: memoizes
  * each query's fully planned DataFrame AND its RDD lineage keyed by
  * (query, sfDir), so a repeated request pays neither plan
  * construction (PLANREUSE_r09 measured 12.9 s of analysis +
  * optimization + physical planning across the 22-query TPC-H suite
  * at sf0.1 — what Bench re-pays every rep) nor, on the row-serving
  * path, shuffle re-execution: repeated actions on one RDD lineage
  * serve from the already-written shuffle map outputs (skipped
  * stages), the 1.02 s hot bound the probe measured.
  *
  * This is the deployment shape the per-rep Bench protocol cannot
  * show: a long-lived session serving a repeated analytical workload.
  * Results are identical to a fresh `SparkEntry.queries(name)(spark,
  * sfDir).collect()` — ServerBench gates that per query.
  *
  * Staleness: a cached entry pins the file listing captured at plan
  * time, like any DataFrame. If the underlying table directory
  * changes (new parquet files, index republish), call
  * [[invalidate]]/[[clear]] — the same contract as Spark's own table
  * cache over external files.
  */
class GraftServer(spark: SparkSession) {

  private case class Served(df: DataFrame, rdd: RDD[InternalRow],
                            enc: ExpressionEncoder[Row])

  private val cache = new ConcurrentHashMap[(String, String), Served]()
  private val hits = new AtomicLong
  private val builds = new AtomicLong

  /** (cache hits, plan builds) since construction — server telemetry. */
  def counters: (Long, Long) = (hits.get, builds.get)

  private val buildFn: JFunction[(String, String), Served] = {
    case (name, sfDir) =>
      builds.incrementAndGet()
      val df = SparkEntry.queries(name)(spark, sfDir)
      val qe = df.queryExecution
      qe.executedPlan // settle analysis/optimization/planning ONCE
      // one stable lineage for every future request: the per-row copy
      // un-aliases local-mode UnsafeRow reuse, and keeping the SAME
      // child RDD instance preserves the ShuffleDependency objects so
      // re-serves skip the shuffle stages entirely
      val rdd = qe.toRdd.map(_.copy())
      val enc = ExpressionEncoder(RowEncoder.encoderFor(df.schema))
        .resolveAndBind()
      Served(df, rdd, enc)
  }

  private def entry(name: String, sfDir: String): Served = {
    val k = (name, sfDir)
    val pre = cache.get(k)
    if (pre != null) { hits.incrementAndGet(); pre }
    else cache.computeIfAbsent(k, buildFn)
  }

  /** The memoized, fully planned DataFrame — for composition or
    * actions that need Dataset semantics. Repeats skip planning but
    * re-execute shuffles (the t_first bound).
    */
  def serve(name: String, sfDir: String): DataFrame = entry(name, sfDir).df

  /** Collect through the memoized lineage — repeats skip planning AND
    * completed shuffle stages (the t_hot bound). Row values are the
    * ones `DataFrame.collect()` returns (same encoder machinery).
    */
  def serveRows(name: String, sfDir: String): Array[Row] = {
    val e = entry(name, sfDir)
    val deser = e.enc.createDeserializer() // not thread-safe: per call
    e.rdd.collect().map(deser(_))
  }

  def invalidate(name: String, sfDir: String): Unit =
    cache.remove((name, sfDir))

  def clear(): Unit = cache.clear()
}
