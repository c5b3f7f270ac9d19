package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import sqlImplicits._

  private def one(text: String, c: org.apache.spark.sql.Column): org.apache.spark.sql.Row =
    Seq(text).toDF("text").select(c).head()

  test("tokenCount counts whitespace tokens") {
    assert(one("the quick  brown fox", TextAnalysis.tokenCount(col("text"))).getLong(0) == 4L)
  }

  test("bpe-ish token estimate is ceil(len/4)") {
    assert(one("abcdefgh", TextAnalysis.tokenCountBpe(col("text"))).getLong(0) == 2L)
    assert(one("abcdefghi", TextAnalysis.tokenCountBpe(col("text"))).getLong(0) == 3L)
  }

  test("langId classifies by stopword markers") {
    assert(one("the cat and the dog is here", TextAnalysis.langId(col("text"))).getString(0) == "en")
    assert(one("el perro y la casa de que", TextAnalysis.langId(col("text"))).getString(0) == "es")
    assert(one("der hund und die katze das", TextAnalysis.langId(col("text"))).getString(0) == "de")
    assert(one("le chien et les chats une", TextAnalysis.langId(col("text"))).getString(0) == "fr")
    assert(one("xyzzy plugh foobar", TextAnalysis.langId(col("text"))).getString(0) == "unk")
  }

  test("paddedCount counts word occurrences") {
    assert(one("the cat the dog the", TextAnalysis.paddedCount(col("text"), "the")).getLong(0) == 3L)
    assert(one("other theory lathe", TextAnalysis.paddedCount(col("text"), "the")).getLong(0) == 0L)
  }

  test("qualityScore is within [0,1] and rewards english-like text") {
    val good = one("the quick brown fox jumps over the lazy dog " * 12,
      TextAnalysis.qualityScore(col("text"))).getDouble(0)
    val bad = one("zz zz zz", TextAnalysis.qualityScore(col("text"))).getDouble(0)
    assert(good >= 0.0 && good <= 1.0)
    assert(bad >= 0.0 && bad <= 1.0)
    assert(good > bad)
  }

  test("md5 fingerprint is stable and case-normalized") {
    val a = one("Hello World", TextAnalysis.fingerprintMd5(col("text"))).getString(0)
    val b = one("hello world", TextAnalysis.fingerprintMd5(col("text"))).getString(0)
    assert(a == b)
    assert(a == "5eb63bbbe01eeed093cb22bb8f5acdc3") // known md5("hello world")
  }

  test("rolling fingerprint: stable, order-sensitive") {
    val a = one("abc", TextAnalysis.fingerprintRolling(col("text"))).getLong(0)
    val b = one("abc", TextAnalysis.fingerprintRolling(col("text"))).getLong(0)
    val c = one("acb", TextAnalysis.fingerprintRolling(col("text"))).getLong(0)
    assert(a == b)
    assert(a != c)
    // polynomial base-31: 'a'=97,'b'=98,'c'=99 → ((97*31)+98)*31+99
    assert(a == ((97L * 31 + 98) * 31 + 99))
  }

  test("chunkDocs: overlapping fixed-size chunks with short tail") {
    val df = Seq((1L, (1 to 40).map(i => s"w$i").mkString(" "))).toDF("doc_id", "text")
    val chunks = TextAnalysis.chunkDocs(df, "doc_id", "text", chunkSize = 32, overlap = 8)
      .orderBy("chunk_idx")
      .select("chunk_idx", "n_chunk_tokens", "chunk")
      .collect()
    assert(chunks.length == 2) // starts at token 0 and 24
    assert(chunks(0).getLong(1) == 32L)
    assert(chunks(1).getLong(1) == 16L) // tokens 25..40
    assert(chunks(0).getString(2).startsWith("w1 w2"))
    assert(chunks(1).getString(2).startsWith("w25 "))
    // overlap region appears in both chunks
    assert(chunks(0).getString(2).contains("w30"))
    assert(chunks(1).getString(2).contains("w30"))
  }

  test("termFrequencies counts exploded tokens") {
    val df = Seq("a b a", "b c").toDF("text")
    val tf = TextAnalysis.termFrequencies(df, "text").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(tf == Map("a" -> 2L, "b" -> 2L, "c" -> 1L))
  }

  test("unigramSurprisal: corpus-typical text scores below token salad") {
    val df = Seq(
      (1L, "the the the the"),   // the most common token → lowest surprisal
      (2L, "the the rare rare"), // mixed
      (3L, "one of a kind salad")// all hapaxes → highest surprisal
    ).toDF("doc_id", "text")
    val out = TextAnalysis.unigramSurprisal(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out(1L)._1 == 4L && out(3L)._1 == 5L, "token counts carried through")
    assert(out(1L)._2 < out(2L)._2 && out(2L)._2 < out(3L)._2,
      s"surprisal must rank common < mixed < hapax: $out")
    // hand check: doc 1 is 4 tokens of p = 6/13 → -ln(6/13)
    assert(math.abs(out(1L)._2 - (-math.log(6.0 / 13.0))) < 1e-6)
  }

  test("unicodeNormalize composes NFC and decomposes NFD") {
    val decomposed = "Café"    // e + combining acute
    val composed = "Café"       // precomposed é
    assert(one(decomposed, TextAnalysis.unicodeNormalize(col("text"))).getString(0) == composed)
    assert(one(composed, TextAnalysis.unicodeNormalize(col("text"), "NFD")).getString(0) == decomposed)
    // NFC is idempotent; ASCII passes through untouched
    assert(one(composed, TextAnalysis.unicodeNormalize(col("text"))).getString(0) == composed)
    assert(one("plain ascii", TextAnalysis.unicodeNormalize(col("text"))).getString(0) == "plain ascii")
  }

  test("unicodeNormalize NFKC folds compatibility characters") {
    // U+2460 CIRCLED DIGIT ONE → "1"; U+FB01 LATIN SMALL LIGATURE FI → "fi"
    assert(one("①ﬁ", TextAnalysis.unicodeNormalize(col("text"), "NFKC")).getString(0) == "1fi")
    // ...but canonical NFC leaves them alone
    assert(one("①ﬁ", TextAnalysis.unicodeNormalize(col("text"))).getString(0) == "①ﬁ")
  }

  test("unicodeNormalize rejects unknown forms and passes nulls") {
    intercept[IllegalArgumentException] {
      TextAnalysis.unicodeNormalize(col("text"), "NFX")
    }
    val r = Seq[String](null).toDF("text")
      .select(TextAnalysis.unicodeNormalize(col("text"))).head()
    assert(r.isNullAt(0))
  }

  test("normalizeText collapses whitespace after NFC") {
    assert(one("  á\t b \n c  ", TextAnalysis.normalizeText(col("text")))
      .getString(0) == "á b c")
  }

  test("redactPii scrubs emails, phones and IPv4s with counts") {
    val text = "mail a.b+c@ex-mail.org or x@y.io, call 555-123-4567 / 555 987 6543, host 10.2.33.77 up"
    val df = Seq(text).toDF("text")
    val red = df.select(TextAnalysis.redactPii(col("text"))).head().getString(0)
    assert(red == "mail <EMAIL> or <EMAIL>, call <PHONE> / <PHONE>, host <IP> up", red)
    val counts = df.select(TextAnalysis.piiCounts(col("text"))
      .map { case (n, c) => c.as(n) }: _*).head()
    assert(counts.getLong(0) == 2L, "emails")
    assert(counts.getLong(1) == 1L, "ips")
    assert(counts.getLong(2) == 2L, "phones")
  }

  test("redactPii leaves clean text and version-ish numerics alone") {
    val clean = "nothing here v1.2 see 12.5 and 1.2.3 release"
    assert(one(clean, TextAnalysis.redactPii(col("text"))).getString(0) == clean)
  }

  test("canonicalizeUrl strips fragment/tracking/www/default port, lowercases scheme+host only") {
    def canon(u: String): String =
      Seq(u).toDF("text").select(TextAnalysis.canonicalizeUrl(col("text"))).head().getString(0)
    assert(canon("HTTPS://WWW.News.Example.COM:443/A/Path?utm_source=x&id=7&utm_campaign=y#top")
      == "https://news.example.com/A/Path?id=7")
    // all-tracking query vanishes entirely, :80 dropped, path case kept
    assert(canon("http://Example.org:80/Keep/Case?utm_medium=a&fbclid=zz")
      == "http://example.org/Keep/Case")
    // nothing to strip → unchanged
    assert(canon("https://a.example.net/x?id=1") == "https://a.example.net/x?id=1")
    // mid-query tracking leaves one separator
    assert(canon("https://e.io/p?id=1&gclid=g&next=2") == "https://e.io/p?id=1&next=2")
  }

  test("urlParts extracts host, two-label domain, and path") {
    val canon = TextAnalysis.canonicalizeUrl(col("text"))
    val row = Seq("https://sub.news.example.com/a/b?id=9").toDF("text")
      .select(TextAnalysis.urlParts(canon).map { case (n, c) => c.as(n) }: _*).head()
    assert(row.getString(0) == "sub.news.example.com")
    assert(row.getString(1) == "example.com")
    assert(row.getString(2) == "/a/b")
  }

  test("BigramPairs generator: row-identical to the zip_with/slice/explode form") {
    // fuzz: random token arrays incl. the edge shapes the generator
    // special-cases (empty text -> [''] single token, 1-token, long,
    // repeated tokens)
    val rnd = new scala.util.Random(42)
    val vocab = Vector("a", "bb", "ccc", "d", "e")
    val texts = Seq("", "solo", "x y") ++ (0 until 50).map { _ =>
      (0 until rnd.nextInt(12)).map(_ => vocab(rnd.nextInt(vocab.size)))
        .mkString(" ")
    }
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val t = TextAnalysis.tokens(col("text"))
    val legacy = docs
      .select(col("doc_id"), zip_with(
        slice(t, lit(1), greatest(size(t) - 1, lit(0))),
        slice(t, lit(2), greatest(size(t) - 1, lit(0))),
        (a, b) => struct(a.as("w1"), b.as("w2"))).as("ps"))
      .select(col("doc_id"), explode(col("ps")).as("p"))
      .select(col("doc_id"), col("p.w1"), col("p.w2"))
      .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    val native = docs
      .select(col("doc_id"), graft.functions.exprs.toColumn(
        graft.functions.BigramPairs(
          graft.functions.exprs.toExpr(t))).as(Seq("w1", "w2")))
      .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    assert(native == legacy)
  }

  test("bigramNextTokens ranks continuations with exact conditional probabilities") {
    // heads: "a" -> b,b,c (cnt_w1=3); "b" -> a (via "b a"), ...
    val docs = Seq("a b a b", "a c b a").toDF("text")
    // pairs: (a,b),(b,a),(a,b) ; (a,c),(c,b),(b,a)
    val out = TextAnalysis.bigramNextTokens(docs, "text", k = 2, minHeadCount = 0L)
      .orderBy("w1", "rk")
      .select("w1", "w2", "cnt", "cnt_w1", "p_next", "rk")
      .as[(String, String, Long, Long, Double, Long)].collect().toSeq
    assert(out == Seq(
      ("a", "b", 2L, 3L, 0.666667, 1L),
      ("a", "c", 1L, 3L, 0.333333, 2L),
      ("b", "a", 2L, 2L, 1.0, 1L),
      ("c", "b", 1L, 1L, 1.0, 1L)), out.toString)
    // minHeadCount prunes thin heads
    val pruned = TextAnalysis.bigramNextTokens(docs, "text", k = 2, minHeadCount = 2L)
      .select("w1").distinct().as[String].collect().toSet
    assert(pruned == Set("a", "b"))
    // single-token and empty docs produce no pairs
    assert(TextAnalysis.bigramNextTokens(Seq("one", "").toDF("text"), "text",
      k = 1, minHeadCount = 0L).count() == 0L)
  }

  /** Hand-computed Okapi BM25 term contribution (k1=1.2, b=0.75). */
  private def bm25Term(tf: Int, df: Int, dl: Int, n: Int, sumDl: Int): Double = {
    val idf = math.log(1.0 + (n.toDouble - df + 0.5) / (df + 0.5))
    val dlNorm = dl.toDouble * n / sumDl
    idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dlNorm))
  }

  private lazy val bmDocs = Seq(
    (1L, "apple banana apple"), // dl 3
    (2L, "banana cherry"), // dl 2
    (3L, "cherry cherry cherry date") // dl 4
  ).toDF("doc_id", "text")

  test("bm25Scores matches the hand-computed formula and ranks by score") {
    val out = TextAnalysis.bm25Scores(bmDocs, "doc_id", "text",
        Seq("apple", "cherry"))
      .select("doc_id", "bm25", "n_terms")
      .as[(Long, Double, Long)].collect()
    // N=3, sum_dl=9; tf: (1,apple)=2 df=1; (2,cherry)=1, (3,cherry)=3 df=2
    val exp = Map(
      1L -> bm25Term(2, 1, 3, 3, 9),
      2L -> bm25Term(1, 2, 2, 3, 9),
      3L -> bm25Term(3, 2, 4, 3, 9))
    assert(out.map(_._1).toSeq == Seq(1L, 3L, 2L), s"rank order: ${out.toSeq}")
    assert(out.forall(_._3 == 1L))
    out.foreach { case (id, s, _) =>
      assert(math.abs(s - exp(id)) < 1e-5, s"doc $id: $s vs ${exp(id)}") }
    // rare term beats common: doc 1 (unique 'apple' twice) on top
    assert(out.head._1 == 1L)
  }

  test("bm25Retrieve: query-by-example excludes self and ranks within query") {
    val out = TextAnalysis.bm25Retrieve(bmDocs,
        bmDocs.where($"doc_id" === 1), "doc_id", "text")
      .select("qid", "nid", "bm25", "rank")
      .as[(Long, Long, Double, Long)].collect()
    // query terms {apple, banana}: only doc 2 shares a term (banana,
    // corpus df=2) — doc 1 itself is excluded
    assert(out.length == 1, s"got ${out.toSeq}")
    val (qid, nid, s, rank) = out.head
    assert((qid, nid, rank) == ((1L, 2L, 1L)))
    assert(math.abs(s - bm25Term(1, 2, 2, 3, 9)) < 1e-5)
  }

  test("bigramDocScore: typical text scores below token salad; hand case exact") {
    // corpus: three docs repeating "a b", one doc of unseen-pair salad
    val docs = Seq(
      (1L, "a b a b a b"), (2L, "a b a b"), (3L, "a b"),
      (4L, "q z x w")).toDF("doc_id", "text")
    val out = TextAnalysis.bigramDocScore(docs, "doc_id", "text")
      .select("doc_id", "n_bigrams", "avg_nll")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    // heads: a(c1=6 via 'a b'), b(c1=3 via 'b a'), q,z,x (1 each) → V=5
    // doc 3 = one 'a b' bigram: p = (6+0.5)/(6+0.5*5) = 6.5/8.5
    val expect3 = BigDecimal(-math.log(6.5 / 8.5))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(out(3L)._3 - expect3) < 1e-9, s"${out(3L)._3} vs $expect3")
    // common-pair docs all score far below the all-unseen-pairs doc
    assert(Seq(1L, 2L, 3L).forall(i => out(i)._3 < out(4L)._3))
    // a doc with <2 tokens contributes no row
    val tiny = Seq((9L, "solo")).toDF("doc_id", "text")
    assert(TextAnalysis.bigramDocScore(docs.unionAll(tiny), "doc_id", "text")
      .where($"doc_id" === 9).count() == 0)
  }

  test("chunkDocsCdc: exact partition, size bounds, and shift robustness") {
    val rnd = new scala.util.Random(0xcdc)
    val text = (1 to 400).map(_ => s"w${rnd.nextInt(5000)}").mkString(" ")
    val shifted = "inserted prefix edit " + text
    val docs = Seq((1L, text), (2L, shifted)).toDF("doc_id", "text")
    val chunks = TextAnalysis.chunkDocsCdc(docs, "doc_id", "text")
      .select("doc_id", "chunk_idx", "chunk")
      .as[(Long, Long, String)].collect()
    // 1. chunks partition the text exactly, in order
    val re1 = chunks.filter(_._1 == 1L).sortBy(_._2).map(_._3).mkString
    assert(re1 == text)
    // 2. every chunk respects the max bound
    assert(chunks.forall(_._3.length <= 256))
    // 3. CDC property: after a prefix edit, most chunks are UNCHANGED
    //    (boundaries resync); fixed windows share nothing after a shift
    val c1 = chunks.filter(_._1 == 1L).map(_._3).toSet
    val c2 = chunks.filter(_._1 == 2L).map(_._3).toSet
    val sharedBytes = (c1 & c2).toSeq.map(_.length).sum
    assert(sharedBytes > text.length / 2,
      s"CDC must resync: shared $sharedBytes of ${text.length}")
    val f1 = text.grouped(64).toSet
    val f2 = shifted.grouped(64).toSet
    assert((f1 & f2).isEmpty, "fixed windows should share nothing here")
    // 4. deterministic
    val again = TextAnalysis.chunkDocsCdc(docs, "doc_id", "text")
      .select("doc_id", "chunk_idx", "chunk")
      .as[(Long, Long, String)].collect()
    assert(again.sortBy(x => (x._1, x._2)).toSeq ==
      chunks.sortBy(x => (x._1, x._2)).toSeq)
  }

  test("bigramDocScore with pretrained stats smooths unseen bigrams") {
    // the train-once/score-many path: a new doc whose bigrams the LM
    // never saw must be scored (p = k/(0 + k·V) per pair), not dropped
    val corpusA = Seq((1L, "a b a b"), (2L, "b a")).toDF("doc_id", "text")
    val st = TextAnalysis.bigramStats(corpusA, "doc_id", "text")
    val fresh = Seq((10L, "z q z q z")).toDF("doc_id", "text")
    val out = TextAnalysis.bigramDocScore(fresh, "doc_id", "text",
        stats = Some(st))
      .select("doc_id", "n_bigrams", "avg_nll")
      .as[(Long, Long, Double)].collect()
    assert(out.length == 1, s"unseen-bigram doc vanished: ${out.toSeq}")
    val (_, n, nll) = out.head
    assert(n == 4)
    // heads {a, b} → V=2; unseen pair p = 0.5/(0 + 0.5·2) = 0.5
    val expect = BigDecimal(math.log(2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(nll - expect) < 1e-9, s"$nll vs $expect")
  }

  test("bigramDocScore pretrained: seen head + novel continuation " +
      "takes c1 from the head table") {
    // the r7 ADVICE bug: a (w1,w2)-only stats join coalesced c1 to 0
    // for any unseen PAIR, even when the HEAD was seen — scoring
    // p = k/(k·V) instead of the documented k/(c1+k·V)
    val corpusA = Seq((1L, "a b a b"), (2L, "b a")).toDF("doc_id", "text")
    val st = TextAnalysis.bigramStats(corpusA, "doc_id", "text")
    // 'a z': head 'a' is seen (c1=2 via 'a b' twice), pair (a,z) is not
    val fresh = Seq((11L, "a z")).toDF("doc_id", "text")
    val out = TextAnalysis.bigramDocScore(fresh, "doc_id", "text",
        stats = Some(st))
      .select("doc_id", "n_bigrams", "avg_nll")
      .as[(Long, Long, Double)].collect()
    assert(out.length == 1, s"doc vanished: ${out.toSeq}")
    val (_, n, nll) = out.head
    assert(n == 1)
    // V=2 (heads a, b) → p = 0.5/(2 + 0.5·2) = 1/6, nll = ln 6
    val expect = BigDecimal(math.log(6.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(nll - expect) < 1e-9, s"$nll vs $expect")
    // a doc MIXING a seen pair with a seen-head/novel-continuation
    // pair blends both branches: 'a b' (p=2.5/3) and 'a z' (p=1/6)
    val mixed = Seq((12L, "a b a z")).toDF("doc_id", "text")
    val m = TextAnalysis.bigramDocScore(mixed, "doc_id", "text",
        stats = Some(st))
      .select("n_bigrams", "avg_nll").as[(Long, Double)].collect().head
    assert(m._1 == 3)
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // pairs: (a,b) seen c12=2 c1=2 → -ln(2.5/3); (b,a) seen c12=2
    // c1=2 → -ln(2.5/3); (a,z) head-only → -ln(1/6)
    val want = r6((r6(-math.log(2.5 / 3)) * 2 + r6(math.log(6.0))) / 3)
    assert(math.abs(m._2 - want) < 1e-9, s"${m._2} vs $want")
  }

  test("deflateSize/compressionRatio: repetition compresses, values match jdk") {
    val rep = "spam ham " * 200              // degenerate repetition
    val prose = (1 to 200).map(i => s"w${i * 7919 % 9973}").mkString(" ")
    val df = Seq((1L, rep), (2L, prose)).toDF("id", "t")
    val out = df.select($"id", TextAnalysis.deflateSize($"t").as("z"),
        TextAnalysis.compressionRatio($"t").as("r"))
      .as[(Long, Long, Double)].collect().map(x => x._1 -> (x._2, x._3)).toMap
    // kernel equals a direct jdk deflate of the same bytes
    assert(out(1L)._1 == graft.functions.CompressRuntime.deflateSize(
      org.apache.spark.unsafe.types.UTF8String.fromString(rep)))
    // boilerplate sits far below diverse text
    assert(out(1L)._2 < 0.05, s"repetition ratio ${out(1L)._2}")
    assert(out(2L)._2 > 3 * out(1L)._2, s"${out(2L)._2} vs ${out(1L)._2}")
    // deterministic across evaluation (codegen) and re-runs
    val again = df.select($"id", TextAnalysis.deflateSize($"t").as("z"))
      .as[(Long, Long)].collect().toMap
    assert(again(1L) == out(1L)._1 && again(2L) == out(2L)._1)
    // null-safe (SQL registration is covered in GraftExtensionsSpec)
    assert(df.select(TextAnalysis.deflateSize(org.apache.spark.sql.functions.lit(null)
      .cast("string"))).head().isNullAt(0))
  }

  test("gopherRules: each rule fires on its planted violation, clean text passes") {
    val clean = (("the quick brown fox jumps over lazy dogs near rivers " * 6)
      + "be to of and that have with done").trim          // 68 words, stopword-rich
    val docs = Seq(
      1L -> clean,
      2L -> "too short to pass",                          // r_words (4 < 50)
      3L -> (clean + " " + Seq.fill(30)("###").mkString(" ")), // symbols
      4L -> ((1 to 60).map(_.toString).mkString(" ")),    // digits: r_alpha, r_stop
      5L -> (1 to 10).map(i => s"- bullet item $i").mkString("\n"), // all bullets
      6L -> (1 to 10).map(i => s"line $i trails off...").mkString("\n"), // ellipses
      7L -> "").toDF("doc_id", "text")
    val out = TextAnalysis.gopherRules(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    def flag(id: Long, c: String) = out(id).getAs[Boolean](c)
    assert(flag(1L, "pass"), s"clean doc failed: ${out(1L)}")
    assert(!flag(2L, "r_words") && !flag(2L, "pass"))
    assert(!flag(3L, "r_symbol"), s"symbol_ratio=${out(3L).getAs[Double]("symbol_ratio")}")
    assert(!flag(4L, "r_alpha") && !flag(4L, "r_stop"))
    assert(!flag(5L, "r_bullet"),
      s"bullet_frac=${out(5L).getAs[Double]("bullet_frac")}")
    assert(!flag(6L, "r_ellipsis"),
      s"ellipsis_frac=${out(6L).getAs[Double]("ellipsis_frac")}")
    // empty text: zero counts, ratio guards hold, nothing passes
    assert(out(7L).getAs[Long]("n_words") == 0L && !flag(7L, "pass"))
    // hand-checked statistics on the planted docs
    assert(out(2L).getAs[Long]("n_words") == 4L)
    assert(out(5L).getAs[Double]("bullet_frac") == 1.0)
    assert(out(6L).getAs[Double]("ellipsis_frac") == 1.0)
    assert(out(4L).getAs[Double]("alpha_frac") == 0.0)
    // mean word length of "too short to pass" = (3+5+2+4)/4 = 3.5
    assert(out(2L).getAs[Double]("mean_word_len") == 3.5)
  }

  test("gopherPass kernel == column battery on corpus and edge cases") {
    // two independent implementations of the H16 conjunction: the
    // column-expression battery (oracle-mirrored) and the single-pass
    // native kernel the pipeline filters on. They must agree row for
    // row — on the real corpus and on adversarial boundary inputs.
    val edge = Seq(
      1000008L -> "   ", 1000009L -> "a", 1000010L -> "word\n\n\nword",
      1000011L -> "the quick…brown # fox", 1000012L -> ("x " * 49).trim,
      1000013L -> ("the be to of and that have with " * 7).trim,
      1000014L -> "line one...\n  - two\n…\nthree ...  ",
      1000015L -> (("𝄞" + "maths ") * 55).trim, // astral code points
      1000016L -> (("dot" + "." * 7 + " ") * 60).trim,
      1000017L -> ("tab\tseparated " * 50).trim)
      .toDF("doc_id", "text")
    val corpus = graft.Tables.documents(spark, sfDir)
      .select($"doc_id", $"text").unionAll(edge)
    for ((mw, ms) <- Seq((50L, 2L), (5L, 0L), (1L, 1L))) {
      val colPass = TextAnalysis.gopherRules(corpus, "doc_id", "text",
          minWords = mw)
        .select($"doc_id",
          ($"r_words" && $"r_word_len" && $"r_symbol" && $"r_bullet" &&
            $"r_ellipsis" && $"r_alpha" && $"n_stop" >= ms).as("p"))
      val kernel = corpus.select($"doc_id",
        TextAnalysis.gopherPass($"text", minWords = mw, minStop = ms).as("k"))
      val diffRows = colPass.join(kernel, "doc_id")
        .where($"p" =!= $"k" ||
          ($"p".isNull && $"k".isNotNull) || ($"p".isNotNull && $"k".isNull))
        .collect()
      assert(diffRows.isEmpty,
        s"kernel disagrees with column battery at minWords=$mw minStop=$ms: " +
          diffRows.take(5).mkString("; "))
    }
  }

  test("gopherRules(useKernel) == column battery: every statistic, " +
      "flag, and the conjunction, row for row") {
    // r9: the struct-returning audit kernel must reproduce the ENTIRE
    // column-battery relation (not just the pass boolean) on the real
    // corpus plus the adversarial boundary inputs
    val edge = Seq(
      1000008L -> "   ", 1000009L -> "a", 1000010L -> "word\n\n\nword",
      1000011L -> "the quick…brown # fox", 1000012L -> ("x " * 49).trim,
      1000013L -> ("the be to of and that have with " * 7).trim,
      1000014L -> "line one...\n  - two\n…\nthree ...  ",
      1000015L -> (("𝄞" + "maths ") * 55).trim,
      1000016L -> (("dot" + "." * 7 + " ") * 60).trim,
      1000017L -> ("tab\tseparated " * 50).trim)
      .toDF("doc_id", "text")
    val corpus = graft.Tables.documents(spark, sfDir)
      .select($"doc_id", $"text").unionAll(edge)
    for (mw <- Seq(50L, 5L)) {
      val battery = TextAnalysis.gopherRules(corpus, "doc_id", "text",
        minWords = mw)
      val kernel = TextAnalysis.gopherRules(corpus, "doc_id", "text",
        minWords = mw, useKernel = true)
      assert(kernel.columns.toSeq == battery.columns.toSeq,
        s"schemas differ: ${kernel.columns.toSeq} vs ${battery.columns.toSeq}")
      val b = battery.collect().map(r => r.getLong(0) -> r.toSeq).toMap
      val k = kernel.collect().map(r => r.getLong(0) -> r.toSeq).toMap
      val bad = k.keys.filter(id => b(id) != k(id)).take(5)
      assert(bad.isEmpty, s"minWords=$mw rows differ: " +
        bad.map(id => s"$id: kernel=${k(id)} battery=${b(id)}").mkString("; "))
    }
  }

  // Independent BPE reference for the kernel cross-check: a direct,
  // naive transcription of Sennrich et al.'s pseudocode operating on
  // space-joined symbol strings (a different representation from the
  // kernel's array walk).
  private object NaiveBpe {
    def train(freqs: Map[String, Long], n: Int): Seq[(String, String)] = {
      var vocab = freqs.map { case (w, f) => (w.mkString(" "), f) }
      (1 to n).flatMap { _ =>
        val pairs = vocab.toSeq.flatMap { case (w, f) =>
          val syms = w.split(" ")
          syms.dropRight(1).zip(syms.drop(1)).map(p => (p, f))
        }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
        if (pairs.isEmpty) None
        else {
          val best = pairs.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
          vocab = vocab.map { case (w, f) =>
            (w.replace(best._1 + " " + best._2, best._1 + best._2), f)
          }
          Some(best)
        }
      }
    }
    def encode(word: String, merges: Seq[(String, String)]): Seq[String] = {
      val rank = merges.zipWithIndex.toMap
      var syms = word.map(_.toString).toList
      var go = true
      while (go && syms.length > 1) {
        val cands = syms.dropRight(1).zip(syms.drop(1))
          .filter(rank.contains).sortBy(rank)
        cands.headOption match {
          case None => go = false
          case Some(best) =>
            val out = scala.collection.mutable.ListBuffer.empty[String]
            var rest = syms
            while (rest.nonEmpty) rest match {
              case a :: b :: tl if (a, b) == best =>
                out += a + b; rest = tl
              case h :: tl => out += h; rest = tl
              case Nil =>
            }
            syms = out.toList
        }
      }
      syms
    }
  }

  test("bpeTrain learns the classic merge sequence and bpeEncode " +
      "matches an independent reference") {
    // the canonical Sennrich toy corpus
    val corpus = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val docs = corpus.zipWithIndex
      .map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val merges = TextAnalysis.bpeTrain(docs, "text", numMerges = 6)
    val freqs = corpus.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val expect = NaiveBpe.train(freqs, 6)
    assert(merges == expect, s"kernel $merges vs reference $expect")
    // first merges on this corpus: ("e","s") 9, then ("es","t") 9
    assert(merges.take(2) == Seq(("e", "s"), ("es", "t")), s"$merges")
    // every corpus word encodes identically under kernel and reference
    val enc = docs.select(col("text"),
        TextAnalysis.bpeEncodeWord(col("text"), merges).as("t"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toSeq).toMap
    corpus.distinct.foreach { w =>
      assert(enc(w) == NaiveBpe.encode(w, merges),
        s"$w: ${enc(w)} vs ${NaiveBpe.encode(w, merges)}")
    }
    // unseen word with seen subparts still merges what it can
    val novel = Seq((0L, "lowest")).toDF("doc_id", "text")
      .select(TextAnalysis.bpeEncodeWord(col("text"), merges))
      .collect().head.getSeq[String](0).toSeq
    assert(novel == NaiveBpe.encode("lowest", merges), s"novel: $novel")
    assert(novel.contains("est") || novel.contains("lo"),
      s"expected learned subwords in $novel")
  }

  test("incremental BPE trainer: identical merge sequence to the rescan " +
      "form on canonical, fuzz, and astral corpora") {
    import graft.functions.BpeRuntime
    // canonical Sennrich corpus, run past exhaustion (50 > possible merges)
    val canon = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    assert(BpeRuntime.train(canon, 50) == BpeRuntime.trainRescan(canon, 50))
    // 300-word deterministic fuzz corpus over a 5-letter alphabet:
    // dense tie-breaks and overlapping pairs (aaa...) exercise the
    // occurrence-index bookkeeping hard
    val rnd = new scala.util.Random(12345)
    val words = (0 until 300).map { _ =>
      val len = 1 + rnd.nextInt(8)
      (0 until len).map(_ => ('a' + rnd.nextInt(5)).toChar).mkString
    }
    val wf = words.groupBy(identity).view
      .mapValues(_.size.toLong).toSeq.sortBy(_._1)
    val inc = BpeRuntime.train(wf, 200)
    val res = BpeRuntime.trainRescan(wf, 200)
    assert(inc == res, s"diverged at ${inc.zip(res).indexWhere(p => p._1 != p._2)}")
    // surrogate-pair symbols flow through the incremental path too
    val astral = Seq(("𝄞a𝄞a", 3L), ("a𝄞", 2L),
      ("aa𝄞𝄞", 1L))
    assert(BpeRuntime.train(astral, 20) == BpeRuntime.trainRescan(astral, 20))
  }

  test("BPE rank cache: two distinct tables coexist; eviction past the " +
      "cap keeps encodings correct") {
    import graft.functions.BpeRuntime
    val t1 = Seq(("a", "b"), ("ab", "c"))
    val t2 = Seq(("x", "y"))
    assert(BpeRuntime.encodeWord("abc", BpeRuntime.rankMap(t1)).toSeq
      == Seq("abc"))
    assert(BpeRuntime.encodeWord("xyz", BpeRuntime.rankMap(t2)).toSeq
      == Seq("xy", "z"))
    // flood the bounded LRU far past its cap (the r8 ADVICE scenario:
    // a session training many tokenizers), then the evicted table must
    // still encode correctly — rebuilt transparently, never stale
    (0 until BpeRuntime.MaxCachedTables + 8).foreach { i =>
      BpeRuntime.rankMap(Seq((s"q$i", s"r$i")))
    }
    assert(BpeRuntime.encodeWord("abc", BpeRuntime.rankMap(t1)).toSeq
      == Seq("abc"))
    assert(BpeRuntime.encodeWord("xyz", BpeRuntime.rankMap(t2)).toSeq
      == Seq("xy", "z"))
  }

  test("bpeEncode document level: lossless, word-bounded, and stable " +
      "on unicode/multi-space text") {
    val docs = Seq(
      (1L, "the cat  sat\n on\tthe mat"),
      (2L, "  Déjà vu — naïve café  "),
      (3L, ""),
      (4L, "日本語 テスト"),
      (5L, "astral 𝄞clef 𝄞𝄞 emoji😀mix") // surrogate-pair code points
    ).toDF("doc_id", "text")
    val merges = TextAnalysis.bpeTrain(docs, "text", numMerges = 10)
    val out = docs.select(col("doc_id"),
        concat_ws("", TextAnalysis.bpeEncode(col("text"), merges)).as("j"),
        concat_ws("",
          filter(TextAnalysis.tokens(col("text")), w => w =!= "")).as("wj"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    out.foreach { case (id, j, wj) =>
      assert(j == wj, s"doc $id: '$j' != '$wj'")
    }
  }

  test("htmlToText: scripts/styles/comments vanish, block tags become " +
      "lines, entities decode in the right order, whitespace normalizes") {
    import org.apache.spark.sql.functions._
    def clean(h: String): String =
      Seq(h).toDF("h").select(TextAnalysis.htmlToText(col("h")).as("t"))
        .as[String].head()
    // the full shape: head noise gone, headings/paragraphs/list items
    // become separate lines, inline tags become spaces
    val page = "<html><!-- nav v2 --><head><title>T</title>" +
      "<script type=\"text/javascript\">if (1<2) { x(); }</script>" +
      "<style>p > a { color: red }</style></head><body>" +
      "<h1>Title</h1><p>first &amp; <b>second</b></p>" +
      "<ul><li>alpha</li><li>beta</li></ul></body></html>"
    assert(clean(page) == "T\nTitle\nfirst & second\nalpha\nbeta",
      s"got '${clean(page)}'")
    // entity order: &amp;lt; is the literal text &lt; (never a tag);
    // numeric basics decode; unknown entities pass through
    assert(clean("a &amp;lt; b &#39;q&#39; &nbsp; c &copy;") ==
      "a &lt; b 'q' c &copy;")
    // unclosed script: tags strip, body text survives (documented)
    assert(clean("<script>var x;") == "var x;")
    // <br> variants break lines; blank lines drop; tabs/CRs collapse
    assert(clean("a<br>b<br/>c<BR >d") == "a\nb\nc\nd")
    assert(clean("  a\t b \r<p></p><p> </p>c ") == "a b\nc")
    // plain text passes through; empty stays empty
    assert(clean("plain text") == "plain text")
    assert(clean("") == "")
  }

  test("htmlToText feeds line structure to the line-dedup family") {
    import org.apache.spark.sql.functions._
    // the composition reason block tags become NEWLINES: a nav list
    // repeated across pages is droppable by F10 only if each <li> is
    // its own line after extraction
    val docs = (0 until 60).map { i =>
      (i.toLong, "<ul><li>Home</li><li>About</li></ul><p>unique body " +
        i + "</p>")
    }.toDF("doc_id", "html")
      .select(col("doc_id"), TextAnalysis.htmlToText(col("html")).as("text"))
    val out = Dedup.dropFrequentLines(docs, "doc_id", "text", minDocs = 50)
      .select("doc_id", "clean_text").as[(Long, String)].collect().toMap
    assert(out(3L) == "unique body 3", s"got ${out(3L)}")
  }
}
