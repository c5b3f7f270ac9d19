package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class IncrementalDedupSpec extends SparkSpec {
  import sqlImplicits._

  private val baseText = "the quick brown fox jumps over the lazy dog again and again"

  test("dedupBatch drops store matches and keeps first of in-batch dups") {
    val store = Seq((1L, baseText)).toDF("doc_id", "text")
    val storeSigs = graft.operators.Dedup
      .minhashSignature(store, "doc_id", "text")
    val batch = Seq(
      (10L, baseText),                       // dup of store doc 1
      (11L, "completely different content about spark engines"),
      (12L, "completely different content about spark engines"), // dup of 11
      (13L, "yet another unique document body")
    ).toDF("doc_id", "text")
    val res = IncrementalDedup.dedupBatch(batch, "doc_id", "text",
      Some(storeSigs), threshold = 0.8)
    val clean = res.clean.select("doc_id").as[Long].collect().toSet
    assert(clean == Set(11L, 13L), s"got $clean")
    val dropped = res.dropped.select("new_id", "matched_id")
      .as[(Long, Long)].collect().toSet
    assert(dropped.contains((10L, 1L)), s"got $dropped")
    assert(dropped.contains((12L, 11L)), s"got $dropped")
    val keptSigs = res.cleanSigs.select("doc_id").as[Long].collect().toSet
    assert(keptSigs == Set(11L, 13L))
  }

  test("streaming: later batches dedup against the persisted store") {
    implicit val sqlCtx = spark.sqlContext
    val storeDir = java.nio.file.Files
      .createTempDirectory("graft-incdedup").toString + "/store"
    val input = MemoryStream[(Long, String)]
    val cleaned = scala.collection.mutable.ArrayBuffer[Long]()
    val q = IncrementalDedup.start(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text", storeDir) {
      (clean, _) =>
        cleaned.synchronized {
          cleaned ++= clean.select("doc_id").as[Long](sqlImplicits.newLongEncoder)
            .collect()
        }
    }
    try {
      input.addData((1L, baseText), (2L, "unrelated first-batch text"))
      q.processAllAvailable()
      // batch 2: 3 dups doc 1 (from batch 1's store), 4 is new
      input.addData((3L, baseText), (4L, "brand new second-batch body"))
      q.processAllAvailable()
    } finally q.stop()
    assert(cleaned.toSet == Set(1L, 2L, 4L), s"got ${cleaned.toSet}")
  }
}
