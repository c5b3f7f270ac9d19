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

  /** `fused` mode (r13, VERDICT r12 item 3): the COMPLETE retrieval
    * serving chain — ANN index + BM25 index → RRF fusion → MMR
    * diversification, every leg over the persisted indexes — served
    * fresh/cold/warm through GraftServer with watchIndexes on both
    * index dirs, then the BM25 index is REPUBLISHED mid-stream
    * (CURRENT flips) and the next serve must reflect v2 with exactly
    * one rebuild, then go warm again. Emits one JSON line with the
    * warm/fresh ratio and the republish-rebuild cost.
    */
  def main(args: Array[String]): Unit = {
    require(args.length >= 1,
      "usage: ServerBench <sfDir> [fused|fused-concurrent]")
    val sfDir = args(0)
    if (args.length > 1 && args(1) == "fused") return fusedMain(sfDir)
    if (args.length > 1 && args(1) == "fused-concurrent")
      return fusedConcurrentMain(sfDir)
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

  private def fusedMain(sfDir: String): Unit = {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.functions._
    import graft.operators.{AnnIndex, Bm25Index, Similarity}
    import graft.Tables
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .config("spark.sql.files.maxPartitionBytes", 32 * 1024 * 1024)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect() // warm the JVM

    val emb = Tables.embeddings(spark, sfDir)
    val docs = Tables.documents(spark, sfDir)
    val root = java.nio.file.Files
      .createTempDirectory("graft-fused-serve").toString
    val (annDir, bm25Dir) = (s"$root/ann", s"$root/bm25")
    // index builds are INGEST cost, timed separately from serving
    val tb0 = System.nanoTime()
    AnnIndex.write(emb, annDir, dim = 64, nCells = 16, stride = 7,
      kmeansIters = 2, m = 8, ncodes = 16)
    Bm25Index.write(docs.where(col("doc_id") % 2 === 0), "doc_id",
      "text", bm25Dir, nBuckets = 16)
    val buildWall = (System.nanoTime() - tb0) / 1e9

    val qv = emb.where(col("vec_id") < 8)
    val qd = docs.where(col("doc_id") < 8)
    def chain(s: SparkSession, d: String): DataFrame = {
      val ann = AnnIndex.open(s, annDir)
      val lex = Bm25Index.open(s, bm25Dir)
      val dense = AnnIndex.searchAdc(ann, qv, k = 20, nprobe = 4)
        .select(col("qid"), col("nid"), col("rank"))
      val lexical = Bm25Index.search(lex, qd, "doc_id", "text", topK = 20)
        .select(col("qid"), col("nid"), col("rank"))
      Similarity.mmrRerankCandidates(
        ann.cells.select(col("vec_id"), col("embedding")),
        Similarity.rrfFuse(Seq(dense, lexical), topK = 10)
          .select(col("qid"), col("nid"), col("rrf").as("rel")),
        k = 5)
    }
    val server = new GraftServer(spark, Map("fused" -> (chain _)))
    server.watchIndexes("fused", sfDir, Seq(annDir, bm25Dir))
    def nowS = System.nanoTime() / 1e9
    def sig(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(_.toString).sorted.toSeq
    val loadStart = loadavg

    // fresh: per-request chain construction + plan + execute
    val t0 = nowS
    val freshRows = chain(spark, sfDir).collect()
    val tFresh = nowS - t0
    // cold: first request fills the (plan, lineage, fingerprint) cache
    val t1 = nowS
    val coldRows = server.serveRows("fused", sfDir)
    val tCold = nowS - t1
    require(sig(coldRows) == sig(freshRows),
      "fused: served rows diverge from a fresh chain")
    // warm: repeats ride the cached plan + finished shuffles, paying
    // only the per-request fingerprint read (two tiny files per dir)
    val warms = (1 to 5).map { _ =>
      val t = nowS; server.serveRows("fused", sfDir); nowS - t
    }.sorted
    val tWarm = warms(warms.size / 2)

    // REPUBLISH the lexical index mid-stream: full corpus, CURRENT
    // flips v1 → v2; the very next serve must rebuild ONCE and match
    // a fresh v2 chain, then go warm again
    val tr0 = nowS
    Bm25Index.write(docs, "doc_id", "text", bm25Dir, nBuckets = 16)
    val tRepub = nowS - tr0
    val (h0, b0) = server.counters
    val t2 = nowS
    val v2Rows = server.serveRows("fused", sfDir)
    val tReserve = nowS - t2
    require(sig(v2Rows) == sig(chain(spark, sfDir).collect()),
      "fused: post-republish serve diverges from a fresh v2 chain")
    require(sig(v2Rows) != sig(freshRows),
      "fused: fixture must make the republish change the chain")
    val (h1, b1) = server.counters
    require(b1 == b0 + 1, s"republish must force exactly one rebuild")
    val warms2 = (1 to 5).map { _ =>
      val t = nowS; server.serveRows("fused", sfDir); nowS - t
    }.sorted
    val tWarm2 = warms2(warms2.size / 2)
    val (hits, builds) = server.counters

    val ts = java.time.Instant.now().toString
    println(f"""{"metric":"fused_serve","unit":"sec","sf_dir":"$sfDir","build_wall":$buildWall%.3f,"fresh":$tFresh%.3f,"cold":$tCold%.3f,"warm":$tWarm%.3f,"warm_over_fresh":${tWarm / tFresh}%.4f,"republish_wall":$tRepub%.3f,"reserve_after_republish":$tReserve%.3f,"warm_after_republish":$tWarm2%.3f,"cache_hits":$hits,"cache_builds":$builds,"cpus":"$cpus","load_start":"$loadStart","load_end":"$loadavg","utc":"$ts"}""")
    spark.stop()
  }

  /** `fused-concurrent` (r14, VERDICT r13 item 4): the fused chain
    * under OVERLAPPING request batches — a real server takes
    * concurrent queries, PLANSERVE_r13 measured only the serial warm
    * path. One resident GraftServer fronts `nChains` distinct fused
    * chains (disjoint query slices — mixed traffic, not one hot key);
    * after a serial warm pass pins each chain's reference rows and
    * serial-warm median, `threads` driver threads (several per chain)
    * hammer the server concurrently from separate FAIR scheduler
    * pools, `reps` serves each. Every concurrent serve's rows are
    * compared against that chain's serial reference — a cross-request
    * plan-cache mixup (wrong entry, torn rebuild, shared-state
    * corruption) fails the require, not just the timing. Emits
    * overall p50/p95 per-request latency and per-chain medians, plus
    * the cache counters (builds must stay == nChains: concurrency
    * must never force a rebuild).
    */
  private def fusedConcurrentMain(sfDir: String): Unit = {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.functions._
    import graft.operators.{AnnIndex, Bm25Index, Similarity}
    import graft.Tables
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .config("spark.sql.files.maxPartitionBytes", 32 * 1024 * 1024)
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect() // warm the JVM

    val emb = Tables.embeddings(spark, sfDir)
    val docs = Tables.documents(spark, sfDir)
    val root = java.nio.file.Files
      .createTempDirectory("graft-fused-conc").toString
    val (annDir, bm25Dir) = (s"$root/ann", s"$root/bm25")
    val tb0 = System.nanoTime()
    AnnIndex.write(emb, annDir, dim = 64, nCells = 16, stride = 7,
      kmeansIters = 2, m = 8, ncodes = 16)
    Bm25Index.write(docs, "doc_id", "text", bm25Dir, nBuckets = 16)
    val buildWall = (System.nanoTime() - tb0) / 1e9

    val nChains = 4
    val threads = 8
    val reps = 20
    def chainFor(lo: Long)(s: SparkSession, d: String): DataFrame = {
      val ann = AnnIndex.open(s, annDir)
      val lex = Bm25Index.open(s, bm25Dir)
      val qv = emb.where(col("vec_id") >= lo && col("vec_id") < lo + 8)
      val qd = docs.where(col("doc_id") >= lo && col("doc_id") < lo + 8)
      val dense = AnnIndex.searchAdc(ann, qv, k = 20, nprobe = 4)
        .select(col("qid"), col("nid"), col("rank"))
      val lexical = Bm25Index.search(lex, qd, "doc_id", "text", topK = 20)
        .select(col("qid"), col("nid"), col("rank"))
      Similarity.mmrRerankCandidates(
        ann.cells.select(col("vec_id"), col("embedding")),
        Similarity.rrfFuse(Seq(dense, lexical), topK = 10)
          .select(col("qid"), col("nid"), col("rrf").as("rel")),
        k = 5)
    }
    val names = (0 until nChains).map(i => s"fused_$i")
    val registry = names.zipWithIndex.map { case (n, i) =>
      n -> (chainFor(i * 8L) _)
    }.toMap
    val server = new GraftServer(spark, registry)
    names.foreach(n => server.watchIndexes(n, sfDir, Seq(annDir, bm25Dir)))

    def nowS = System.nanoTime() / 1e9
    def sig(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(_.toString).sorted.toSeq
    val loadStart = loadavg

    // serial pass: fill the cache, pin reference rows, serial-warm
    // medians per chain (the PLANSERVE_r13 protocol per chain)
    names.foreach(n => server.serveRows(n, sfDir)) // cold fills
    val refs = names.map(n => n -> sig(server.serveRows(n, sfDir))).toMap
    require(refs.values.toSeq.distinct.size == nChains,
      "fixture must give each chain distinct results")
    val serialWarm = names.map { n =>
      n -> (1 to 5).map { _ =>
        val t = nowS; server.serveRows(n, sfDir); nowS - t
      }.sorted.apply(2)
    }.toMap
    val (_, buildsAfterSerial) = server.counters

    // concurrent pass: `threads` drivers, several per chain, each in
    // its own FAIR pool, all released together
    val start = new java.util.concurrent.CountDownLatch(1)
    val lats = new java.util.concurrent.ConcurrentLinkedQueue[(String, Double)]()
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val pool = (0 until threads).map { t =>
      val name = names(t % nChains)
      val th = new Thread(() => {
        spark.sparkContext.setLocalProperty("spark.scheduler.pool", s"pool_$t")
        start.await()
        var i = 0
        while (i < reps) {
          val t0 = nowS
          val rows = server.serveRows(name, sfDir)
          val dt = nowS - t0
          lats.add(name -> dt)
          if (sig(rows) != refs(name))
            errs.add(s"$name: concurrent serve diverged on thread $t rep $i")
          i += 1
        }
      })
      th.start(); th
    }
    val tc0 = nowS
    start.countDown()
    pool.foreach(_.join())
    val concWall = nowS - tc0
    require(errs.isEmpty, s"plan-cache corruption: ${errs.peek()}")
    val (hits, builds) = server.counters
    require(builds == buildsAfterSerial,
      s"concurrency forced rebuilds: $buildsAfterSerial -> $builds")

    import scala.jdk.CollectionConverters._
    val all = lats.asScala.toSeq
    def pct(xs: Seq[Double], p: Double) = {
      val s = xs.sorted; s(math.min(s.size - 1, (p * s.size).toInt))
    }
    val perChain = names.map { n =>
      val xs = all.filter(_._1 == n).map(_._2)
      f""""$n":{"p50":${pct(xs, 0.5)}%.3f,"p95":${pct(xs, 0.95)}%.3f,"serial_warm":${serialWarm(n)}%.3f}"""
    }.mkString("{", ",", "}")
    val xs = all.map(_._2)
    val ts = java.time.Instant.now().toString
    println(f"""{"metric":"fused_serve_concurrent","unit":"sec","sf_dir":"$sfDir","build_wall":$buildWall%.3f,"n_chains":$nChains,"threads":$threads,"reps_per_thread":$reps,"n_requests":${xs.size},"p50":${pct(xs, 0.5)}%.3f,"p95":${pct(xs, 0.95)}%.3f,"serial_warm_med":${serialWarm.values.toSeq.sorted.apply(nChains / 2)}%.3f,"conc_wall":$concWall%.3f,"throughput_rps":${xs.size / concWall}%.1f,"cache_hits":$hits,"cache_builds":$builds,"cpus":"$cpus","load_start":"$loadStart","load_end":"$loadavg","utc":"$ts","chains":$perChain}""")
    spark.stop()
  }
}
