package graft.operators

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import sqlImplicits._

  private lazy val docs = graft.Tables.documents(spark, sfDir).limit(50)
  private lazy val media = Multimodal.fakeMediaTable(docs)

  test("fake media table has binary payload with magic header") {
    val first = media.head()
    assert(first.media.take(4).sameElements(Multimodal.MAGIC))
  }

  test("decode stub extracts typed metadata") {
    val meta = Multimodal.decodeMeta(media).collect()
    assert(meta.length == 50)
    assert(meta.forall(_.media_type == "grft"))
    assert(meta.forall(m => m.width >= 16 && m.width < 80))
    assert(meta.forall(m => m.n_bytes > 12))
  }

  test("decode stub flags unknown format instead of crashing") {
    val bogus = Seq(Multimodal.MediaRow(99L, Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12)))
      .toDS()
    val meta = Multimodal.decodeMeta(bogus).head()
    assert(meta.media_type == "unknown")
    assert(meta.width == -1)
  }

  test("feature extraction yields L2-normalized fixed-dim vectors") {
    val feats = Multimodal.extractFeatures(media, dim = 16).collect()
    assert(feats.length == 50)
    assert(feats.forall(_.embedding.length == 16))
    feats.foreach { f =>
      val norm = math.sqrt(f.embedding.map(x => x.toDouble * x).sum)
      assert(math.abs(norm - 1.0) < 1e-5, s"norm $norm for ${f.doc_id}")
    }
  }

  test("features are deterministic (same content, same vector)") {
    val a = Multimodal.extractFeatures(media).collect().map(f => f.doc_id -> f.embedding.toSeq).toMap
    val b = Multimodal.extractFeatures(media).collect().map(f => f.doc_id -> f.embedding.toSeq).toMap
    assert(a == b)
  }

  test("features compose with similarity search") {
    val featsDs = Multimodal.extractFeatures(media, dim = 16)
    val firstId = featsDs.head().doc_id
    val feats = featsDs.toDF().withColumnRenamed("doc_id", "vec_id")
    val top = Similarity.bruteForceTopK(feats, feats.where($"vec_id" === firstId), k = 3)
    assert(top.count() == 3)
  }

  test("frame sampling chunks payload with stride") {
    val frames = Multimodal.sampleFrames(media, frameBytes = 32, stride = 2)
    val perDoc = frames.groupBy("doc_id").count().collect()
    assert(perDoc.nonEmpty)
    val f = frames.where($"doc_id" === media.head().doc_id)
      .orderBy("frame_idx").collect()
    assert(f.forall(_.getAs[Int]("frame_idx") % 2 == 0))
  }

  test("dedupMediaExact groups identical blobs and picks the min id") {
    import org.apache.spark.sql.functions._
    val df = Seq(
      (1L, "aa"), (2L, "bb"), (3L, "aa"), (4L, "aa")
    ).toDF("doc_id", "s").select($"doc_id", encode($"s", "UTF-8").as("blob"))
    val out = Multimodal.dedupMediaExact(df, "doc_id", "blob")
      .select("canonical_id", "n_copies").as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 3L, 2L -> 1L))
  }

  test("mediaNearDups finds truncated/appended copies, not strangers") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(0xe6)
    def blob(seed: Int, n: Int): Array[Byte] = {
      val r = new scala.util.Random(seed); val b = new Array[Byte](n)
      r.nextBytes(b); b
    }
    val a = blob(1, 2000)
    val fixtures = Seq(
      (1L, a),
      (2L, a.dropRight(300)),          // truncated copy of 1
      (3L, a ++ blob(99, 256)),        // appended copy of 1
      (4L, blob(2, 2000)),             // unrelated
      (5L, blob(3, 1900))              // unrelated
    ).toDF("doc_id", "blob")
    val pairs = Multimodal.mediaNearDups(fixtures, "doc_id", "blob",
        threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), s"truncated copy missed: $pairs")
    assert(pairs.contains((1L, 3L)), s"appended copy missed: $pairs")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L), s"FP on 4: $pairs")
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L), s"FP on 5: $pairs")
    // variants of the same asset also pair with each other
    assert(pairs.contains((2L, 3L)), s"variant pair missed: $pairs")
    // degenerate constant blobs are capped out by maxBucket, not joined
    val zeros = (10L to 90L).map(i => (i, new Array[Byte](512))).toDF("doc_id", "blob")
    val capped = Multimodal.mediaNearDups(zeros, "doc_id", "blob",
      threshold = 0.5, maxBucket = 16).count()
    assert(capped == 0, "mega-bucket constant blobs must be capped")
  }

  test("mediaNearDups bottom-B sketch verify: exact when union <= B, " +
      "finds planted pairs when union >> B, one hashing pass") {
    import org.apache.spark.sql.functions._
    def blob(seed: Int, n: Int): Array[Byte] = {
      val r = new scala.util.Random(seed); val b = new Array[Byte](n)
      r.nextBytes(b); b
    }
    // small blobs: every pair union fits in B → estimator IS exact
    val small = Seq(
      (1L, blob(1, 2000)), (2L, blob(1, 2000).dropRight(300)),
      (3L, blob(2, 2000))).toDF("doc_id", "blob")
    def pairSet(df: org.apache.spark.sql.DataFrame) = df
      .select("id_a", "id_b", "byte_jaccard")
      .as[(Long, Long, Double)].collect().toSet
    val exact = pairSet(Multimodal.mediaNearDups(small, "doc_id", "blob",
      threshold = 0.3, verifyB = 0))
    val sketch = pairSet(Multimodal.mediaNearDups(small, "doc_id", "blob",
      threshold = 0.3, verifyB = 256))
    assert(exact == sketch,
      s"union <= B must reduce to exact Jaccard: $exact vs $sketch")
    // big blobs: ~1250 window hashes >> B=256 — the estimator path is
    // genuinely exercised and must still find the planted variants
    val a = blob(7, 40000)
    // repartition breaks ConvertToLocalRelation so the plan keeps the
    // hashing projection visible (as any real source would)
    val big = Seq(
      (1L, a), (2L, a.dropRight(4000)),      // truncated copy
      (3L, a ++ blob(8, 2000)),              // appended copy
      (4L, blob(9, 40000))).toDF("doc_id", "blob").repartition(2)
    // evaluate the opt-out plan BEFORE any persisted twin exists: the
    // session CacheManager substitutes cached subtrees into IDENTICAL
    // later plans, which would mask the opt-out
    def imtScans(df: org.apache.spark.sql.DataFrame) = {
      val s = df.queryExecution.executedPlan.toString
      s.linesIterator.count(_.contains("InMemoryTableScan"))
    }
    val none = Multimodal.mediaNearDups(big, "doc_id", "blob",
      threshold = 0.5, verifyB = 256,
      sigStorage = org.apache.spark.storage.StorageLevel.NONE)
    assert(imtScans(none) == 0,
      "StorageLevel.NONE must opt out of persistence")
    val est = Multimodal.mediaNearDups(big, "doc_id", "blob",
      threshold = 0.5, verifyB = 256)
    val estPairs = est.select("id_a", "id_b").as[(Long, Long)]
      .collect().toSet
    assert(estPairs.contains((1L, 2L)), s"trunc missed by sketch: $estPairs")
    assert(estPairs.contains((1L, 3L)), s"append missed by sketch: $estPairs")
    assert(!estPairs.exists(p => p._1 == 4L || p._2 == 4L), s"FP: $estPairs")
    // the persisted signature relation makes the blob-hashing pass run
    // ONCE: every consumer branch reads the cache through an
    // InMemoryTableScan (first materialization computes the hashes,
    // the rest replay it)
    assert(imtScans(est) >= 2,
      s"default sigStorage must persist the signature relation so all " +
        s"consumer branches read the cache: ${imtScans(est)} cache scans")
  }

  test("mediaNearDups cdc mode rejects window < 2 with a clear message") {
    val df = Seq((1L, new Array[Byte](64))).toDF("doc_id", "blob")
    val e = intercept[IllegalArgumentException] {
      Multimodal.mediaNearDups(df, "doc_id", "blob", window = 1, cdc = true)
    }
    assert(e.getMessage.contains("chunk-size scale"), e.getMessage)
  }

  test("mediaNearDups cdc mode survives a prefix edit; aligned mode does not") {
    import org.apache.spark.sql.functions._
    def blob(seed: Int, n: Int): Array[Byte] = {
      val r = new scala.util.Random(seed); val b = new Array[Byte](n)
      r.nextBytes(b); b
    }
    val a = blob(7, 4000)
    val prefixed = blob(8, 13) ++ a // 13-byte prefix: misaligns every window
    val docs = Seq((1L, a), (2L, prefixed), (3L, blob(9, 4000)))
      .toDF("doc_id", "blob")
    val aligned = Multimodal.mediaNearDups(docs, "doc_id", "blob",
      threshold = 0.3).select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(!aligned.contains((1L, 2L)),
      s"fixed windows cannot see through a prefix shift: $aligned")
    val viaCdc = Multimodal.mediaNearDups(docs, "doc_id", "blob",
        threshold = 0.3, cdc = true)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(viaCdc.contains((1L, 2L)), s"CDC mode must resync: $viaCdc")
    assert(!viaCdc.exists(p => p._1 == 3L || p._2 == 3L), s"FP on 3: $viaCdc")
  }
}
