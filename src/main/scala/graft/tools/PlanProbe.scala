package graft.tools

import org.apache.spark.sql.SparkSession

/** Local plan-shape probe: run one gate query by name and print the
  * final adaptive plan plus scan/exchange/reuse counts — the loop for
  * "is this the plan I'd want at 100×" iteration.
  *
  * Usage: runMain graft.tools.PlanProbe <query> [sfDir] [--full]
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.lift(1).filterNot(_.startsWith("--"))
      .getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    val t0 = System.nanoTime()
    df.collect()
    val wall = (System.nanoTime() - t0) / 1e9
    // count in the FINAL adaptive plan only (the string also embeds
    // the pre-AQE Initial Plan)
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    def n(re: String) = re.r.findAllIn(plan).length
    val spans = "\\*\\(\\d+\\)".r.findAllIn(plan).toSet.size
    println(f"[planprobe] $name wall=$wall%.2fs scans=${n("FileScan ")}" +
      s" shuffles=${n("Exchange (hash|range|Single)")}" +
      s" reused=${n("ReusedExchange")} broadcasts=${n("BroadcastExchange")}" +
      s" codegen_spans=$spans")
    if (args.contains("--full")) println(plan)
  }
}
