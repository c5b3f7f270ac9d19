package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** TPC-H warm-constant attribution (round 9): the gap study (TpchGap)
  * measured scale-flat per-query constants of 0.8–1.1 s that dominate
  * sf ≤ 1 totals. This probe splits that constant into what a
  * long-lived server AMORTIZES vs what it pays per request, per query:
  *
  *   t_plan  — DataFrame construction through `executedPlan`
  *             (analysis + optimization + physical planning; exactly
  *             what a plan cache removes for a repeated query text)
  *   t_first — first execution of that plan (job scheduling + codegen
  *             compile + shuffle writes + the scan itself)
  *   t_hot   — median of 3 re-executions of the SAME RDD lineage.
  *             Spark serves repeated actions on one lineage from the
  *             already-written shuffle map outputs (skipped stages),
  *             the way a resident server re-serves a repeated query —
  *             the lower bound of the per-request marginal cost.
  *
  * Bench measures t_plan + t_first every rep by construction (each rep
  * rebuilds the DataFrame); the artifact this emits says how much of
  * that a server deployment would not pay. Executions count the result
  * rows via `queryExecution.toRdd.count()` — TPC-H results are tiny
  * aggregates, so the count IS the full query execution without a
  * fresh COUNT plan wrapping (which would re-plan per call and defeat
  * the reuse being measured).
  *
  * Usage: PlanReuseProbe <sfDir> (env SPARK_GRAFT_CPUS, default 32)
  * Emits one JSON line: per-query {plan, first, hot} + sums.
  */
object PlanReuseProbe {

  private def loadavg: String = scala.util.Try(
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/proc/loadavg"))).trim
      .split(" ").take(3).mkString(",")).getOrElse("")

  def main(args: Array[String]): Unit = {
    require(args.length >= 1, "usage: PlanReuseProbe <sfDir>")
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .config("spark.sql.files.maxPartitionBytes", 32 * 1024 * 1024)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // same warmup discipline as Bench: one-time JVM setup (Janino,
    // parquet readers, exchange paths) must not be charged to q_tpch1
    locally {
      import org.apache.spark.sql.functions._
      spark.range(1000).selectExpr("sum(id)").collect()
      val nation = spark.read.parquet(s"$sfDir/nation.parquet")
      val region = spark.read.parquet(s"$sfDir/region.parquet")
      nation.join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name").count().collect()
    }

    val names = (1 to 22).map(i => s"q_tpch$i")
    val loadStart = loadavg
    val rows = names.map { name =>
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val qe = fn(spark, sfDir).queryExecution
      qe.executedPlan // force analysis + optimization + physical planning
      val tPlan = (System.nanoTime() - t0) / 1e9
      val rdd = qe.toRdd
      val t1 = System.nanoTime()
      rdd.count()
      val tFirst = (System.nanoTime() - t1) / 1e9
      val hots = (1 to 3).map { _ =>
        val t = System.nanoTime()
        rdd.count()
        (System.nanoTime() - t) / 1e9
      }.sorted
      (name, tPlan, tFirst, hots(1))
    }
    val (sp, sf, sh) = (rows.map(_._2).sum, rows.map(_._3).sum,
      rows.map(_._4).sum)
    val qs = rows.map { case (n, p, f, h) =>
      f""""$n":{"plan":$p%.3f,"first":$f%.3f,"hot":$h%.3f}"""
    }.mkString("{", ",", "}")
    val ts = java.time.Instant.now().toString
    println(f"""{"metric":"plan_reuse","unit":"sec","sf_dir":"$sfDir","sum_plan":$sp%.3f,"sum_first":$sf%.3f,"sum_hot":$sh%.3f,"cpus":"$cpus","load_start":"$loadStart","load_end":"$loadavg","utc":"$ts","queries":$qs}""")
    spark.stop()
  }
}
