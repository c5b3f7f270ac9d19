package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The composed end-to-end curation pipeline (quality → dedup →
  * split → decontaminate → sharded write): stage semantics on real
  * corpus data, plus the invariants PipelineBench pins at sf1.
  */
class CurationPipelineSpec extends SparkSpec {
  import sqlImplicits._

  private lazy val docs = Tables.documents(spark, sfDir)
  private lazy val out = Curation.curationPipeline(docs, "doc_id", "text")
    .persist()

  test("every surviving doc passes the quality gate") {
    val n = out.where(
      round(TextAnalysis.qualityScore($"text"), 6) < 0.5).count()
    assert(n == 0)
  }

  test("no two surviving docs share identical text (dedup kept first)") {
    val dup = out.groupBy(md5($"text")).count().where($"count" > 1).count()
    assert(dup == 0)
    // keep-first: for every surviving doc there is no smaller-id doc
    // with the same text that also passed quality
    val q = docs.where(round(TextAnalysis.qualityScore($"text"), 6) >= 0.5)
      .select($"doc_id", md5($"text").as("h"))
    val firsts = q.groupBy("h").agg(min("doc_id").as("first_id"))
    val nonFirst = out.select($"doc_id", md5($"text").as("h"))
      .join(firsts, "h").where($"doc_id" =!= $"first_id").count()
    assert(nonFirst == 0)
  }

  test("no train/val survivor shares a 5-gram with any test survivor") {
    val grams = out.select($"doc_id", $"split",
      explode(Dedup.shingles($"text", 5)).as("gram"))
    val evalGrams = grams.where($"split" === "test").select("gram").distinct()
    val leaked = grams.where($"split" =!= "test")
      .join(evalGrams, "gram").count()
    assert(leaked == 0, s"$leaked contaminated grams survived")
  }

  test("test docs are never dropped by decontamination") {
    val q = docs.where(round(TextAnalysis.qualityScore($"text"), 6) >= 0.5)
      .select($"doc_id", md5($"text").as("h"))
    val firsts = q.groupBy("h").agg(min("doc_id").as("doc_id"))
    val expectedTest = q.join(firsts.select("doc_id"), "doc_id")
      .where(Curation.splitAssign($"doc_id") === "test").count()
    assert(out.where($"split" === "test").count() == expectedTest)
  }

  test("sharded write is complete, disjoint, and deterministic") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pipe-shards").toString
    Curation.writeSharded(out, "doc_id", 16, dir)
    val back = spark.read.parquet(dir)
    assert(back.count() == out.count())
    assert(back.select("doc_id").distinct().count() == out.count())
    // membership is a pure function of the id
    val m1 = back.select($"doc_id", $"shard_id".cast("long")).as[(Long, Long)]
      .collect().toMap
    val m2 = out.select($"doc_id",
        Curation.shardAssign($"doc_id", 16).as("s")).as[(Long, Long)]
      .collect().toMap
    assert(m1 == m2)
  }
}
