package graft.tools

import org.apache.spark.sql.DataFrame

import graft.GraftSession

/** CLI analogs of the reference's IPC utility executables
  * (reference: cpp/src/arrow/ipc/file-to-stream.cc, stream-to-file.cc,
  * json-integration-test.cc): format conversion between every
  * representation the arrow source reads, plus the integration tool's
  * ARROW_TO_JSON / JSON_TO_ARROW / VALIDATE modes.
  *
  * Usage:
  *   ArrowConvert <in-dataset> <out-dir> file|stream|feather|json
  *   ArrowIntegration ARROW_TO_JSON|JSON_TO_ARROW <in> <out>
  *   ArrowIntegration VALIDATE <arrow-dataset> <json-dataset>
  */
object ArrowTools {

  private[tools] def session() = {
    val s = GraftSession.builder("graft-arrow-tools")
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private[tools] def writeAs(df: DataFrame, out: String, format: String): Unit =
    format match {
      case "file" => df.write.format("arrow").mode("overwrite").save(out)
      case "stream" => df.write.format("arrow")
        .option("ipc.format", "stream").mode("overwrite").save(out)
      case "feather" => graft.sources.feather.FeatherV1.write(df, out)
      case "json" => graft.sources.json.ArrowJsonIntegration.write(df, out)
      case other => throw new IllegalArgumentException(
        s"unknown output format '$other' (file|stream|feather|json)")
    }

  /** Sorted-by-all-columns canonical rows for order-insensitive
    * dataset comparison (the VALIDATE contract).
    */
  private[tools] def canonical(df: DataFrame): Seq[Seq[Any]] = {
    val sorted = df.orderBy(df.columns.map(df.col).toIndexedSeq: _*)
    sorted.collect().toSeq.map(_.toSeq.map {
      case b: Array[Byte] => b.toSeq
      case x => x
    })
  }

  private[tools] def validate(spark: org.apache.spark.sql.SparkSession,
                              arrowPath: String, jsonPath: String): Boolean = {
    val a = spark.read.format("arrow").load(arrowPath)
    val j = spark.read.format("arrow").load(jsonPath)
    val schemaOk =
      a.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
        j.schema.fields.map(f => (f.name, f.dataType)).toSeq
    schemaOk && canonical(a) == canonical(j)
  }
}

object ArrowConvert {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: ArrowConvert <in> <out> file|stream|feather|json")
    val spark = ArrowTools.session()
    ArrowTools.writeAs(spark.read.format("arrow").load(args(0)), args(1), args(2))
    spark.stop()
  }
}

object ArrowIntegration {
  def main(args: Array[String]): Unit = {
    require(args.length == 3,
      "usage: ArrowIntegration ARROW_TO_JSON|JSON_TO_ARROW|VALIDATE <a> <b>")
    val spark = ArrowTools.session()
    try args(0) match {
      case "ARROW_TO_JSON" =>
        ArrowTools.writeAs(spark.read.format("arrow").load(args(1)), args(2), "json")
      case "JSON_TO_ARROW" =>
        ArrowTools.writeAs(spark.read.format("arrow").load(args(1)), args(2), "file")
      case "VALIDATE" =>
        if (!ArrowTools.validate(spark, args(1), args(2))) {
          Console.err.println(s"datasets differ: ${args(1)} vs ${args(2)}")
          spark.stop()
          sys.exit(1)
        }
      case other =>
        throw new IllegalArgumentException(s"unknown mode '$other'")
    } finally spark.stop()
  }
}
