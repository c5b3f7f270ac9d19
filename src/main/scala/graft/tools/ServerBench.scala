package graft.tools

import org.apache.spark.sql.SparkSession

import graft.{GraftServer, SparkEntry}

/** Server-mode measurement (round 10, closing PLANREUSE_r09's loop):
  * the 22-query TPC-H suite served three ways from one resident
  * session —
  *
  *   fresh  — SparkEntry construction + plan + execute per request
  *            (what Bench charges every rep; sum_plan + sum_first)
  *   cold   — GraftServer first request per query (same total work,
  *            but the plan+lineage are now cached)
  *   warm   — GraftServer repeat requests (median of 3): no planning,
  *            shuffle stages skipped — the bound PLANREUSE_r09 called
  *            t_hot (1.02 s suite-wide at sf0.1 vs 12.9 s planning)
  *
  * plus a correctness gate: every query's warm served rows must equal
  * a fresh `.collect()` exactly (sorted row-string multiset).
  *
  * Usage: ServerBench <sfDir>  (env SPARK_GRAFT_CPUS, default 32)
  * Emits one JSON line.
  */
object ServerBench {

  private def loadavg: String = scala.util.Try(
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/proc/loadavg"))).trim
      .split(" ").take(3).mkString(",")).getOrElse("")

  def main(args: Array[String]): Unit = {
    require(args.length >= 1, "usage: ServerBench <sfDir>")
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
    // Bench's warmup discipline: JVM one-time setup is nobody's query
    locally {
      import org.apache.spark.sql.functions._
      spark.range(1000).selectExpr("sum(id)").collect()
      val nation = spark.read.parquet(s"$sfDir/nation.parquet")
      val region = spark.read.parquet(s"$sfDir/region.parquet")
      nation.join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name").count().collect()
    }

    val names = (1 to 22).map(i => s"q_tpch$i")
    val server = new GraftServer(spark)
    val loadStart = loadavg

    def nowS = System.nanoTime() / 1e9
    val rows = names.map { name =>
      // fresh: the per-request cost of a no-cache deployment
      val t0 = nowS
      val freshRows = SparkEntry.queries(name)(spark, sfDir).collect()
      val tFresh = nowS - t0
      // cold: first request through the server (fills the cache)
      val t1 = nowS
      val coldRows = server.serveRows(name, sfDir)
      val tCold = nowS - t1
      // warm: repeats ride the cached plan + finished shuffles
      val warms = (1 to 3).map { _ =>
        val t = nowS
        server.serveRows(name, sfDir)
        nowS - t
      }.sorted
      // served rows must be the collect rows exactly
      val sig = (rs: Array[org.apache.spark.sql.Row]) =>
        rs.map(_.toString).sorted.toSeq
      require(sig(coldRows) == sig(freshRows),
        s"$name: served rows diverge from a fresh collect")
      (name, tFresh, tCold, warms(1))
    }
    val (hits, builds) = server.counters
    val (sf, sc, sw) =
      (rows.map(_._2).sum, rows.map(_._3).sum, rows.map(_._4).sum)
    val qs = rows.map { case (n, f, c, w) =>
      f""""$n":{"fresh":$f%.3f,"cold":$c%.3f,"warm":$w%.3f}"""
    }.mkString("{", ",", "}")
    val ts = java.time.Instant.now().toString
    println(f"""{"metric":"server_bench","unit":"sec","sf_dir":"$sfDir","sum_fresh":$sf%.3f,"sum_cold":$sc%.3f,"sum_warm":$sw%.3f,"speedup_warm":${sf / sw}%.2f,"cache_hits":$hits,"cache_builds":$builds,"cpus":"$cpus","load_start":"$loadStart","load_end":"$loadavg","utc":"$ts","queries":$qs}""")
    spark.stop()
  }
}
