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

  test("streaming: replayed partition is overwritten and retention compacts the store") {
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft-incdedup-compact")
    val storeDir = s"$root/store"
    val ckpt = s"$root/ckpt"
    val input = MemoryStream[(Long, String)]
    val cleaned = scala.collection.mutable.ArrayBuffer[Long]()
    def startQuery() = IncrementalDedup.start(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text", storeDir,
      retainBatches = Some(2), checkpointDir = Some(ckpt)) {
      (clean, _) =>
        cleaned.synchronized {
          cleaned ++= clean.select("doc_id").as[Long](sqlImplicits.newLongEncoder)
            .collect()
        }
    }
    def storePartitions(): Set[Long] =
      Option(new java.io.File(storeDir).listFiles()).getOrElse(Array.empty)
        .filter(f => f.isDirectory && f.getName.startsWith("batch_id="))
        .map(_.getName.stripPrefix("batch_id=").toLong).toSet

    val q1 = startQuery()
    try {
      input.addData((1L, baseText), (2L, "unique second document body"))
      q1.processAllAvailable() // batch 0
    } finally q1.stop()

    // forge a crashed attempt of batch 1: a partial partition whose
    // signature collides with the upcoming doc 3
    val forged = graft.operators.Dedup.minhashSignature(
      Seq((999L, "unique third document body text")).toDF("doc_id", "text"),
      "doc_id", "text")
    forged.write.parquet(s"$storeDir/batch_id=1")

    val q2 = startQuery()
    try {
      // batch 1 replays the id the forged partition claimed: doc 3 must
      // survive (a batch never reads its own partition) and the commit
      // must REPLACE the forged rows (dynamic partition overwrite)
      input.addData((3L, "unique third document body text"), (4L, baseText))
      q2.processAllAvailable() // batch 1: 4 dups batch-0 doc 1
      assert(cleaned.toSet.contains(3L),
        s"replayed batch read its own in-flight partition: ${cleaned.toSet}")
      val p1Ids = spark.read.parquet(s"$storeDir/batch_id=1")
        .select("doc_id").as[Long].collect().toSet
      assert(p1Ids == Set(3L), s"forged partial rows must be overwritten: $p1Ids")

      input.addData((5L, "unique fifth document body"))
      q2.processAllAvailable() // batch 2: minLive=0, nothing expires
      input.addData((6L, "unique sixth document body"))
      q2.processAllAvailable() // batch 3: minLive=1, partition 0 drops
      assert(storePartitions() == Set(1L, 2L, 3L),
        s"expected partition 0 compacted away: ${storePartitions()}")
      // batch 4: doc 1's signature fell off the horizon with partition
      // 0, so baseText re-enters — the documented retention trade
      input.addData((7L, baseText))
      q2.processAllAvailable()
      assert(cleaned.toSet == Set(1L, 2L, 3L, 5L, 6L, 7L), s"got ${cleaned.toSet}")
      assert(storePartitions() == Set(2L, 3L, 4L),
        s"expected partitions 0 and 1 compacted away: ${storePartitions()}")
    } finally q2.stop()
  }
}
