package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Converter + integration-tool analogs (reference:
  * cpp/src/arrow/ipc/file-to-stream.cc, json-integration-test.cc):
  * every format conversion round-trips, and VALIDATE distinguishes
  * equal from unequal datasets.
  */
class ArrowToolsSpec extends SparkSpec {

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"graft-tools-$tag").toString

  private val df = graft.Tables.nation(spark, sfDir)
    .select("n_nationkey", "n_name", "n_regionkey")

  test("file → stream → feather → json conversions all preserve the data") {
    val src = tmp("src")
    df.write.format("arrow").mode("overwrite").save(src)
    var cur = src
    Seq("stream", "feather", "json", "file").foreach { fmt =>
      val next = tmp(fmt)
      ArrowTools.writeAs(spark.read.format("arrow").load(cur), next, fmt)
      cur = next
    }
    val back = spark.read.format("arrow").load(cur)
    assert(ArrowTools.canonical(back) == ArrowTools.canonical(df))
  }

  test("VALIDATE accepts matching arrow/json datasets and rejects differing ones") {
    val arrowDir = tmp("val-arrow")
    val jsonDir = tmp("val-json")
    df.write.format("arrow").mode("overwrite").save(arrowDir)
    graft.sources.json.ArrowJsonIntegration.write(df, jsonDir)
    assert(ArrowTools.validate(spark, arrowDir, jsonDir))

    val tampered = tmp("val-tampered")
    graft.sources.json.ArrowJsonIntegration.write(
      df.withColumn("n_regionkey",
        when(col("n_nationkey") === 7, col("n_regionkey") + 1)
          .otherwise(col("n_regionkey"))),
      tampered)
    assert(!ArrowTools.validate(spark, arrowDir, tampered))
  }
}
