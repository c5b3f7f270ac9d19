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
    val names = args(0).split(",").toSeq // comma-list (r14 census)
    val sfDir = args.lift(1).filterNot(_.startsWith("--"))
      .getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val t0 = System.nanoTime()
      df.collect()
      val wall = (System.nanoTime() - t0) / 1e9
      // count in the FINAL adaptive plan only (the string also embeds
      // the pre-AQE Initial Plan), and skip ReusedExchange lines — they
      // embed the referenced exchange's text but execute nothing
      val plan = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      val lines = plan.linesIterator.toSeq
      val live = lines.filterNot(_.contains("ReusedExchange"))
      def n(re: String) = live.count(l => re.r.findFirstIn(l).isDefined)
      // codegen span ids restart per AQE stage: count runs of
      // consecutive span-marked lines, not distinct ids
      val marks = lines.map("\\*\\(\\d+\\)".r.findFirstIn(_))
      val spans = marks.zip(None +: marks.dropRight(1))
        .count { case (cur, prev) => cur.isDefined && cur != prev }
      println(f"[planprobe] $name wall=$wall%.2fs scans=${n("FileScan ")}" +
        s" shuffles=${n("Exchange (hash|range|Single)")}" +
        s" reused=${lines.count(_.contains("ReusedExchange"))}" +
        s" broadcasts=${n("BroadcastExchange")} codegen_spans=$spans")
      if (args.contains("--full")) println(plan)
    }
  }
}
