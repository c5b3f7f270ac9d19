package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class QualityClassifierSpec extends SparkSpec {
  import sqlImplicits._

  // two disjoint vocabularies: "quality" prose vs keyboard-mash spam.
  // Deterministic synthesis (index arithmetic, no RNG) so the suite is
  // reproducible.
  private val goodVocab = Vector("the", "library", "catalogues", "every",
    "published", "survey", "with", "careful", "annotation", "and", "index")
  private val spamVocab = Vector("zxq", "wvv", "qqqq", "kpk", "zzz", "xjx",
    "vvv", "qpq", "jjj", "xxzz", "wqw")

  private def doc(vocab: Vector[String], seed: Int, len: Int): String =
    (0 until len).map(i => vocab((seed * 7 + i * 3) % vocab.size))
      .mkString(" ")

  private lazy val corpus = {
    val rows = (0 until 60).map { i =>
      val good = i % 2 == 0
      val v = if (good) goodVocab else spamVocab
      (i.toLong, doc(v, i, 12 + (i % 5)), good)
    }
    rows.toDF("doc_id", "text", "is_good")
  }

  test("separable corpus: held-out AUC is 1.0 and classes order correctly") {
    val train = corpus.where(col("doc_id") % 3 =!= 0)
    val test = corpus.where(col("doc_id") % 3 === 0)
    val model = QualityClassifier.train(train, "text", col("is_good"),
      buckets = 512, maxIter = 30)
    val scored = QualityClassifier.score(test, model, "doc_id", "text")
      .join(test.select(col("doc_id"), col("is_good")), "doc_id")
    val a = QualityClassifier.auc(scored, "is_good").collect()(0)
    assert(a.getLong(1) > 0 && a.getLong(2) > 0, "both classes held out")
    assert(a.getDouble(0) == 1.0,
      s"disjoint vocabularies must separate perfectly, got ${a.getDouble(0)}")
    val worstGood = scored.where(col("is_good"))
      .agg(min("quality_prob")).collect()(0).getDouble(0)
    val bestSpam = scored.where(!col("is_good"))
      .agg(max("quality_prob")).collect()(0).getDouble(0)
    assert(worstGood > bestSpam,
      s"every good doc must outscore every spam doc ($worstGood vs $bestSpam)")
  }

  test("auc: grouped tie-count form equals the row-level average-rank " +
      "reference on tie-heavy scores, and a constant scorer gives 0.5") {
    // 3 distinct scores over 12 rows with mixed classes inside each
    // tie group — the case where average-rank handling matters.
    val rows = Seq(
      (0.2, true), (0.2, false), (0.2, false), (0.2, true),
      (0.5, false), (0.5, true), (0.5, true),
      (0.9, true), (0.9, false), (0.9, true), (0.9, true), (0.9, false))
    val scored = rows.toDF("quality_prob", "is_good").repartition(4)
    val a = QualityClassifier.auc(scored, "is_good").collect()(0)
    // row-level Mann–Whitney reference computed locally
    val sorted = rows.sortBy(_._1)
    val byScore = sorted.groupBy(_._1)
    val avgRank = sorted.map { case (s, _) =>
      val r = sorted.indexWhere(_._1 == s) + 1
      r + (byScore(s).size - 1) / 2.0
    }
    val rs = sorted.zip(avgRank).filter(_._1._2).map(_._2).sum
    val np = rows.count(_._2); val nn = rows.size - np
    val expect = (rs - np * (np + 1) / 2.0) / (np * nn)
    assert(a.getLong(1) == np && a.getLong(2) == nn)
    assert(math.abs(a.getDouble(0) - expect) < 1e-12,
      s"grouped AUC ${a.getDouble(0)} != row-level $expect")
    // degenerate single-score model: one tie group, AUC exactly 0.5
    val const = QualityClassifier.auc(
      rows.map { case (_, g) => (0.7, g) }.toDF("quality_prob", "is_good"),
      "is_good").collect()(0)
    assert(const.getDouble(0) == 0.5, s"constant scorer: $const")
  }

  test("model persistence: save/load round-trips, scores identical " +
      "after reload") {
    // the production discipline the K32 determinism note prescribes:
    // train once, persist the bounded artifact, score from the loaded
    // model — reload must change nothing, to the full 6 dp the score
    // column carries
    val model = QualityClassifier.train(corpus, "text", col("is_good"),
      buckets = 512, maxIter = 30)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-qc-model").toString
    QualityClassifier.save(model, dir)
    val loaded = QualityClassifier.load(dir)
    assert(loaded.numFeatures == model.numFeatures)
    def scores(m: org.apache.spark.ml.classification.LogisticRegressionModel) =
      QualityClassifier.score(corpus, m, "doc_id", "text")
        .as[(Long, Double)].collect().sortBy(_._1).toSeq
    assert(scores(loaded) == scores(model),
      "reloaded model must score identically")
  }

  test("model generalizes to unseen documents from each distribution") {
    val model = QualityClassifier.train(corpus, "text", col("is_good"),
      buckets = 512, maxIter = 30)
    val unseen = Seq(
      (100L, doc(goodVocab, 97, 14)),
      (101L, doc(spamVocab, 98, 14))).toDF("doc_id", "text")
    val s = QualityClassifier.score(unseen, model, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(s(0).getDouble(1) > 0.5, s"unseen good doc scored ${s(0)}")
    assert(s(1).getDouble(1) < 0.5, s"unseen spam doc scored ${s(1)}")
  }

  test("gate shape: a length-threshold label is learnable from count features") {
    // hashed bigram counts encode document length linearly, so the
    // median-length label the oracle gate uses is structurally
    // separable — not a property of any particular corpus
    val docs = (0 until 80).map { i =>
      val len = 4 + (i % 16) * 2
      (i.toLong, doc(goodVocab, i, len))
    }.toDF("doc_id", "text")
    val med = docs.agg(expr("percentile(length(text), 0.5)"))
      .collect()(0).getDouble(0)
    val labeled = docs.withColumn("is_long", length(col("text")) > med)
    val train = labeled.where(col("doc_id") % 5 =!= 0)
    val test = labeled.where(col("doc_id") % 5 === 0)
    val model = QualityClassifier.train(train, "text", col("is_long"),
      buckets = 512, maxIter = 50)
    val scored = QualityClassifier.score(test, model, "doc_id", "text")
      .join(test.select("doc_id", "is_long"), "doc_id")
    val a = QualityClassifier.auc(scored, "is_long").collect()(0)
    assert(a.getDouble(0) >= 0.95,
      s"length label must be near-perfectly learnable, got ${a.getDouble(0)}")
  }

  test("blank and whitespace-only text scores without error") {
    val model = QualityClassifier.train(corpus, "text", col("is_good"),
      buckets = 128, maxIter = 10)
    val odd = Seq((0L, ""), (1L, "   "), (2L, "one")).toDF("doc_id", "text")
    val s = QualityClassifier.score(odd, model, "doc_id", "text").collect()
    assert(s.length == 3 && s.forall(r => !r.isNullAt(1)))
  }

  test("parameter validation") {
    intercept[IllegalArgumentException] {
      QualityClassifier.train(corpus, "text", col("is_good"), buckets = 1)
    }
    intercept[IllegalArgumentException] {
      QualityClassifier.train(corpus, "text", col("is_good"), maxIter = 0)
    }
    intercept[IllegalArgumentException] {
      QualityClassifier.train(corpus, "text", col("is_good"), regParam = -1)
    }
  }
}
