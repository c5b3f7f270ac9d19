package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.{Curation, Layout, TextAnalysis}

/** Corpus-curation gate queries (SURVEY §2.K): deterministic
  * sampling/splits, benchmark decontamination, repetition scoring,
  * TF-IDF, embedding cohesion, corpus profiling. Every query is
  * deterministic (hash-keyed sampling, exact integer ratios, rounded
  * float reductions) so each carries a full DuckDB oracle.
  */
object QueriesCuration {

  /** SQL mirror of Curation.sampleKey. */
  private val sqlKey = "substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)"

  /** SQL mirror of Curation.shardAssign's 16-bit key: the first 4 hex
    * chars of md5(id) as an integer, spelled with per-nibble strpos
    * arithmetic because DuckDB has no hex-string→int cast.
    */
  private def sqlHex16(idExpr: String): String = {
    val k = s"md5(CAST($idExpr AS VARCHAR))"
    (1 to 4).map { i =>
      s"(strpos('0123456789abcdef', substr($k, $i, 1)) - 1) * ${1 << ((4 - i) * 4)}"
    }.mkString("(", " + ", ")")
  }

  /** Shared shingle CTE (mirrors Dedup.shingles semantics: distinct
    * word n-grams of the lowercased text; whole text when shorter
    * than n tokens). `n` is the shingle width; `key` is the column the
    * grams stay attached to (doc-keyed dedup vs source-keyed overlap
    * share the one fragile slice-arithmetic implementation).
    */
  private def shingleCte(n: Int, key: String = "doc_id"): String =
    s"""WITH toks AS (
         SELECT $key, string_split_regex(trim(lower(text)), '\\s+') AS t FROM documents
       ), sh AS (
         SELECT $key,
           CASE WHEN len(t) < $n THEN [array_to_string(t, ' ')]
                ELSE list_distinct(list_transform(range(1, len(t) - ${n - 2}),
                       i -> array_to_string(t[i:i+${n - 1}], ' ')))
           END AS g
         FROM toks
       ), ex AS (SELECT $key, unnest(g) AS gram FROM sh)"""

  /** SQL mirror of Layout.zValue over `bits`-bit coordinates (plain
    * >>/&/<< arithmetic, identical semantics for non-negative inputs):
    * bit i of dimension c lands at position i·N + c, like the operator.
    */
  private def sqlZValue(dims: Seq[String], bits: Int): String =
    (for { i <- 0 until bits; (d, ci) <- dims.zipWithIndex } yield
      s"(((CAST($d AS BIGINT) >> $i) & 1) << ${i * dims.size + ci})"
    ).mkString("(", " | ", ")")

  private def sqlZValue(x: String, y: String, bits: Int): String =
    sqlZValue(Seq(x, y), bits)

  val all: Seq[QueryDef] = Seq(

    // ------------------------------------------------- K1 hash sample
    // ~10% deterministic sample: reproducible across runs, engines and
    // cluster sizes — pure filter, no shuffle, trivially 100 TB-safe.
    QueryDef("q_sample_hash",
      (s, d) => Curation.hashSample(Tables.documents(s, d), "doc_id", 26)
        .select(col("doc_id"), col("lang"), col("source"))
        .orderBy("doc_id"),
      Some(s"""SELECT doc_id, lang, source FROM documents
        WHERE $sqlKey < '1a' ORDER BY doc_id""")),

    // ------------------------------------------- K2 stratified sample
    // per-stratum rates (en 50%, rest 20%) via a keyed threshold —
    // the up/down-sampling primitive behind language rebalancing.
    QueryDef("q_sample_stratified",
      (s, d) => Tables.documents(s, d)
        .where(Curation.sampleKey(col("doc_id")) <
          when(col("lang") === "en", "80").otherwise("33"))
        .select(col("doc_id"), col("lang"))
        .orderBy("doc_id"),
      Some(s"""SELECT doc_id, lang FROM documents
        WHERE $sqlKey < CASE WHEN lang = 'en' THEN '80' ELSE '33' END
        ORDER BY doc_id""")),

    // ------------------------------------------ K3 k-per-group sample
    // deterministic reservoir analog: 5 docs per source, ranked by id
    // hash. One shuffle on the group key, per-group state is O(k).
    QueryDef("q_sample_group_topk",
      (s, d) => Curation.groupSample(Tables.documents(s, d), "source", "doc_id", 5)
        .select(col("source"), col("doc_id"), col("rn"))
        .orderBy("source", "rn"),
      Some("""SELECT source, doc_id, rn FROM (
          SELECT source, doc_id,
            CAST(row_number() OVER (PARTITION BY source
              ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rn
          FROM documents)
        WHERE rn <= 5 ORDER BY source, rn""")),

    // ------------------------------------- K34 stratified exact sample
    // exactly 100 docs allocated across sources by largest-remainder
    // proportional quotas (pure integer math, mirrored in SQL), each
    // stratum filled by its quota-smallest md5(id) keys. The oracle
    // unrolls the Hamilton allocation: base = (100*n_g)//N, the
    // remainder ranking bumps the top (100 - sum(base)) strata.
    QueryDef("q_sample_stratified_exact",
      (s, d) => Curation.stratifiedExactSample(
          Tables.documents(s, d), "source", "doc_id", n = 100)
        .select(col("source"), col("doc_id"), col("rn"))
        .orderBy("source", "rn"),
      Some("""WITH c AS (
          SELECT source, count(*) AS n_g FROM documents GROUP BY source
        ), t AS (SELECT sum(n_g) AS N FROM c),
        a AS (
          SELECT source, n_g, (100 * n_g) // N AS base, (100 * n_g) % N AS rem
          FROM c, t
        ), r AS (
          SELECT *, row_number() OVER (ORDER BY rem DESC, n_g DESC, source) AS rr,
            (SELECT 100 - sum(base) FROM a) AS extra
          FROM a
        ), q AS (
          SELECT source, base + CASE WHEN rr <= extra THEN 1 ELSE 0 END AS quota
          FROM r
        ), ranked AS (
          SELECT source, doc_id,
            CAST(row_number() OVER (PARTITION BY source
              ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rn
          FROM documents)
        SELECT ranked.source, doc_id, rn FROM ranked JOIN q USING (source)
        WHERE rn <= quota ORDER BY source, rn""")),

    // ------------------------------------------- K4 train/val/test split
    // deterministic split assignment; checked as per-split profile so
    // the oracle validates both membership and stratification counts.
    QueryDef("q_split_assign",
      (s, d) => Tables.documents(s, d)
        .select(Curation.splitAssign(col("doc_id")).as("split"), col("source"))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct("source").as("n_sources"))
        .orderBy("split"),
      Some(s"""SELECT CASE WHEN k < 'cc' THEN 'train'
                    WHEN k < 'e6' THEN 'val' ELSE 'test' END AS split,
          COUNT(*) AS n_docs, COUNT(DISTINCT source) AS n_sources
        FROM (SELECT $sqlKey AS k, source FROM documents)
        GROUP BY 1 ORDER BY split""")),

    // ------------------------------------------- K5 decontamination
    // 5-gram overlap between the eval subset (doc_id % 31 = 0, the
    // stand-in for an external benchmark) and the training corpus.
    QueryDef("q_contamination",
      (s, d) => Curation.contamination(Tables.documents(s, d), "doc_id", "text",
          col("doc_id") % 31 === 0, n = 5)
        .orderBy("doc_id"),
      Some(s"""${shingleCte(5)}
        SELECT c.doc_id, COUNT(DISTINCT e.doc_id) AS n_eval_docs,
          COUNT(DISTINCT c.gram) AS n_gram_hits
        FROM ex c JOIN ex e ON c.gram = e.gram
        WHERE e.doc_id % 31 = 0 AND c.doc_id % 31 <> 0
        GROUP BY c.doc_id ORDER BY c.doc_id""")),

    // ---------------------------------- K36 fraction contamination
    // the GPT-3/PaLM decontamination statistic: the share of each
    // training doc's DISTINCT 3-gram shingles appearing anywhere in
    // the eval subset (same % 31 eval stand-in as K5). n=3 with this
    // corpus gives a real distribution (370/483 docs have some hit,
    // 3 at >= 0.25, max 0.976 at sf0.01), so the fraction math — one
    // IEEE division of two exact counts — is exercised across the
    // whole range, not just 0. The screen itself
    // (decontaminateByFraction) is the where-clause composition,
    // spec-covered in CurationSpec.
    QueryDef("q_contam_fraction",
      (s, d) => Curation.contaminationFraction(Tables.documents(s, d),
          "doc_id", "text", col("doc_id") % 31 === 0, n = 3)
        .orderBy("doc_id"),
      Some(s"""${shingleCte(3)}
        SELECT c.doc_id AS doc_id, COUNT(*) AS n_grams,
          COUNT(*) FILTER (c.gram IN
            (SELECT e.gram FROM ex e WHERE e.doc_id % 31 = 0)) AS n_hits,
          CAST(COUNT(*) FILTER (c.gram IN
            (SELECT e.gram FROM ex e WHERE e.doc_id % 31 = 0)) AS DOUBLE)
            / CAST(COUNT(*) AS DOUBLE) AS hit_frac
        FROM ex c WHERE c.doc_id % 31 <> 0
        GROUP BY c.doc_id ORDER BY c.doc_id""")),

    // ------------------------------------------- K6 repetition score
    // share of each doc's bigrams taken by its most frequent bigram
    // (Gopher-style boilerplate flag). Exact integer ratio → exact
    // cross-engine double.
    QueryDef("q_repetition",
      (s, d) => Curation.topBigramShare(Tables.documents(s, d), "doc_id", "text")
        .orderBy("doc_id"),
      Some("""WITH toks AS (
          SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t FROM documents
        ), bg AS (
          SELECT doc_id, unnest(list_transform(range(1, len(t)),
            i -> array_to_string(t[i:i+1], ' '))) AS gram
          FROM toks WHERE len(t) >= 2
        ), cnt AS (
          SELECT doc_id, gram, COUNT(*) AS c FROM bg GROUP BY 1, 2)
        SELECT doc_id, CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE)
          AS top_bigram_share
        FROM cnt GROUP BY doc_id ORDER BY doc_id""")),

    // ------------------------------------------------ K7 TF-IDF terms
    // top-scoring term per doc with the exact rational IDF (N/df):
    // bit-identical doubles cross-engine, ties broken on the term.
    QueryDef("q_tfidf_top",
      (s, d) => Curation.tfidfTopTerm(Tables.documents(s, d), "doc_id", "text")
        .orderBy("doc_id"),
      Some("""WITH toks AS (
          SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
          FROM documents
        ), tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
        dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
        n AS (SELECT COUNT(*) AS n_docs FROM documents)
        SELECT doc_id, term, tfidf FROM (
          SELECT tf.doc_id, tf.term,
            CAST(tf.tf * n.n_docs AS DOUBLE) / CAST(dfq.df AS DOUBLE) AS tfidf,
            row_number() OVER (PARTITION BY tf.doc_id
              ORDER BY CAST(tf.tf * n.n_docs AS DOUBLE) / CAST(dfq.df AS DOUBLE) DESC,
                tf.term) AS rn
          FROM tf JOIN dfq USING (term) CROSS JOIN n)
        WHERE rn = 1 ORDER BY doc_id""")),

    // ------------------------------------------ K8 embedding cohesion
    // per-label centroid cosine cohesion — the cluster-quality screen
    // over the embedded corpus; float sums surface rounded to 6 dp
    // (the established cross-engine float-reduction contract).
    QueryDef("q_embed_cohesion",
      (s, d) => Curation.labelCohesion(Tables.embeddings(s, d),
          "vec_id", "embedding", "label")
        .orderBy("label"),
      Some("""WITH ex AS (
          SELECT vec_id, label,
            unnest(embedding) AS xf,
            unnest(range(len(embedding))) AS pos
          FROM embeddings
        ), exd AS (SELECT vec_id, label, pos, CAST(xf AS DOUBLE) AS x FROM ex),
        cent AS (SELECT label, pos, AVG(x) AS c FROM exd GROUP BY 1, 2),
        cn AS (SELECT label, sqrt(SUM(c * c)) AS cn FROM cent GROUP BY 1),
        pv AS (
          SELECT e.vec_id, e.label,
            SUM(e.x * c.c) AS dv, sqrt(SUM(e.x * e.x)) AS vn
          FROM exd e JOIN cent c ON e.label = c.label AND e.pos = c.pos
          GROUP BY 1, 2)
        SELECT pv.label, COUNT(*) AS n_vecs,
          round(AVG(dv / (vn * cn.cn)), 6) AS avg_cos
        FROM pv JOIN cn ON pv.label = cn.label
        GROUP BY pv.label ORDER BY pv.label""")),

    // ---------------------------------------- K9 length histogram
    // corpus profile: 100-char doc-length buckets — the quick shape
    // check before setting chunking/packing parameters.
    QueryDef("q_length_histogram",
      (s, d) => Tables.documents(s, d)
        .groupBy(floor(col("n_chars") / lit(100)).cast(LongType).as("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          min("n_chars").as("min_chars"), max("n_chars").as("max_chars"),
          sum("n_chars").as("sum_chars"))
        .orderBy("bucket"),
      Some("""SELECT CAST(floor(n_chars / 100.0) AS BIGINT) AS bucket,
          COUNT(*) AS n_docs, MIN(n_chars) AS min_chars,
          MAX(n_chars) AS max_chars, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        FROM documents GROUP BY 1 ORDER BY bucket""")),

    // -------------------------------------------- K13 sequence packing
    // greedy token-budget packing per source: the chunk→pack prep
    // step before tokenizer batching. Checked as the per-pack profile
    // (doc count + token sum), all-integer → exact.
    QueryDef("q_pack_sequences",
      (s, d) => Curation.packSequences(Tables.documents(s, d),
          "source", "doc_id", "text", budgetTokens = 2048)
        .groupBy("source", "pack_id")
        .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("sum_tokens"))
        .orderBy("source", "pack_id"),
      Some("""WITH toks AS (
          SELECT source, doc_id,
            CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS BIGINT)
              AS n_tokens
          FROM documents
        ), c AS (
          SELECT source, doc_id, n_tokens,
            SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id) AS cum
          FROM toks)
        SELECT source, CAST(floor((cum - n_tokens) / 2048.0) AS BIGINT) AS pack_id,
          COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens
        FROM c GROUP BY 1, 2 ORDER BY source, pack_id""")),

    // ------------------------------------------------ K11 Z-order curve
    // Morton-curve histogram over (o_custkey, o_orderkey) mod-256
    // coordinates — checks the bit-interleave math cell-for-cell; the
    // layout operator built on it (Layout.zOrderBy + range partition)
    // is LayoutSpec-covered for the actual two-dimensional locality.
    QueryDef("q_zorder_curve",
      (s, d) => Tables.orders(s, d)
        .select(Layout.zValue(col("o_custkey") % 256, col("o_orderkey") % 256, 8)
          .as("z"))
        .groupBy(shiftrightunsigned(col("z"), 8).as("zbucket"))
        .agg(count(lit(1)).as("n"), min("z").as("min_z"), max("z").as("max_z"))
        .orderBy("zbucket"),
      Some(s"""SELECT (z >> 8) AS zbucket, COUNT(*) AS n,
          MIN(z) AS min_z, MAX(z) AS max_z
        FROM (SELECT ${sqlZValue("o_custkey % 256", "o_orderkey % 256", 8)} AS z
              FROM orders)
        GROUP BY 1 ORDER BY zbucket""")),

    // --------------------------------------------- K11b 3-D Z-order curve
    // round 6: the N-dimensional generalization (bit i of dim c at
    // position i·N+c), checked cell-for-cell over three coordinates.
    // LayoutSpec proves the matching 3-D row-group pruning.
    QueryDef("q_zorder3",
      (s, d) => Tables.orders(s, d)
        .select(Layout.zValue(Seq(col("o_custkey") % 64, col("o_orderkey") % 64,
            year(col("o_orderdate")).cast(LongType) % 64), 6).as("z"))
        .groupBy(shiftrightunsigned(col("z"), 9).as("zbucket"))
        .agg(count(lit(1)).as("n"), min("z").as("min_z"), max("z").as("max_z"))
        .orderBy("zbucket"),
      Some(s"""SELECT (z >> 9) AS zbucket, COUNT(*) AS n,
          MIN(z) AS min_z, MAX(z) AS max_z
        FROM (SELECT ${sqlZValue(Seq("o_custkey % 64", "o_orderkey % 64",
            "year(o_orderdate) % 64"), 6)} AS z
              FROM orders)
        GROUP BY 1 ORDER BY zbucket""")),

    // --------------------------------------------- K10 source mixing
    // uniform-target mixing weights per source: weight · observed
    // share = 1/n_sources. Exact integer ratio → exact double.
    QueryDef("q_source_mix",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val counts = docs.groupBy("source").agg(count(lit(1)).as("n_docs"))
        // scalar aggregate: bounded single row, broadcast by construction
        val totals = docs.agg(count(lit(1)).as("n_total"),
          countDistinct("source").as("n_sources"))
        counts.join(broadcast(totals))
          .select(col("source"), col("n_docs"),
            (col("n_total").cast(DoubleType) /
              (col("n_sources") * col("n_docs")).cast(DoubleType)).as("weight"))
          .orderBy("source")
      },
      Some("""WITH c AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY 1),
          t AS (SELECT COUNT(*) AS n_total, COUNT(DISTINCT source) AS n_sources
                FROM documents)
        SELECT source, n_docs,
          CAST(n_total AS DOUBLE) / CAST(n_sources * n_docs AS DOUBLE) AS weight
        FROM c CROSS JOIN t ORDER BY source""")),

    // ------------------------------------- K15 duplicated n-gram share
    // round 6: per doc, the fraction of its distinct 3-grams occurring
    // in >= 2 documents corpus-wide — the cross-document boilerplate
    // signal (within-doc twin is K6). Exact integer ratio → exact
    // cross-engine double.
    QueryDef("q_dup_ngrams",
      (s, d) => Curation.dupNgramFraction(Tables.documents(s, d),
          "doc_id", "text", n = 3, minDf = 2)
        .orderBy("doc_id"),
      Some(s"""${shingleCte(3)}, dfq AS (
          SELECT gram, COUNT(*) AS df FROM ex GROUP BY 1)
        SELECT e.doc_id, COUNT(*) AS n_grams,
          CAST(SUM(CASE WHEN dfq.df >= 2 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_dup_grams,
          CAST(SUM(CASE WHEN dfq.df >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
            / CAST(COUNT(*) AS DOUBLE) AS dup_fraction
        FROM ex e JOIN dfq USING (gram)
        GROUP BY e.doc_id ORDER BY e.doc_id""")),

    // --------------------------------------- K16 leakage-safe split
    // round 6: split keyed by the near-dup cluster id (threshold-0.5
    // LSH clusters, memoized with F6), so a cluster never straddles
    // train/test. Oracle recomputes the transitive closure with the
    // recursive CTE and applies the same hash boundaries.
    QueryDef("q_split_leakage_safe",
      (s, d) => Curation.leakageSafeSplit(Tables.documents(s, d), "doc_id",
          QueriesPipeline.lshClusters(s, d, threshold = 0.5))
        .select(col("doc_id"), col("split"))
        .orderBy("doc_id"),
      Some(s"""${QueriesPipeline.clusterGraphCte(0.5)}, lab AS (
          SELECT u AS doc_id, MIN(v) AS cluster_id FROM reach GROUP BY u
        ), keyed AS (
          SELECT d.doc_id,
            substr(md5(CAST(COALESCE(lab.cluster_id, d.doc_id) AS VARCHAR)),
              1, 2) AS k
          FROM documents d LEFT JOIN lab USING (doc_id))
        SELECT doc_id, CASE WHEN k < 'cc' THEN 'train'
            WHEN k < 'e6' THEN 'val' ELSE 'test' END AS split
        FROM keyed ORDER BY doc_id""")),

    // ------------------------------------- K17 token-budget selection
    // round 6: per source, the highest-quality docs greedily kept
    // until a 600-token budget — "best data under a fixed training
    // budget". Ranking uses the 6-dp quality score (cross-engine
    // exact per q_quality_score) with the id tiebreak.
    QueryDef("q_token_budget",
      (s, d) => Curation.tokenBudgetSelect(Tables.documents(s, d),
          "source", "doc_id", "text", budgetTokens = 600)
        .orderBy("source", "doc_id"),
      Some(s"""WITH scored AS (
          SELECT source, doc_id,
            CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS BIGINT)
              AS n_tokens,
            round(${QueriesPipeline.sqlQualityExpr}, 6) AS quality
          FROM documents
        ), c AS (
          SELECT source, doc_id, n_tokens, quality,
            SUM(n_tokens) OVER (PARTITION BY source
              ORDER BY quality DESC, doc_id) AS cum
          FROM scored)
        SELECT source, doc_id, n_tokens, quality, CAST(cum AS BIGINT) AS cum
        FROM c WHERE cum - n_tokens < 600 ORDER BY source, doc_id""")),

    // --------------------------------------- K18 weighted hash sample
    // Keep probability ∝ n_chars/400 capped at 1 — the quality-
    // weighted resampling primitive. Deterministic (16-bit md5 key vs
    // per-row threshold), so the subset is identical across engines,
    // runs and cluster sizes; docs at/over 400 chars take the
    // always-keep branch, the rest the probabilistic one.
    QueryDef("q_sample_weighted",
      (s, d) => Curation.weightedSample(Tables.documents(s, d), "doc_id",
          col("n_chars").cast(DoubleType) / 400.0)
        .select(col("doc_id"), col("n_chars"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id, n_chars FROM documents
        WHERE floor(least(n_chars / 400.0, 1.0) * 65536) >= 65536
           OR substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
              < printf('%04x', CAST(floor(least(n_chars / 400.0, 1.0) * 65536) AS INT))
        ORDER BY doc_id""")),

    // ------------------------------------------ K19 MAD outlier filter
    // Robust outliers: |n_chars − median(source)| > 2·MAD(source).
    // Medians of integer inputs are integers or .5 (exact in double),
    // so the filter boundary is engine-independent without rounding.
    QueryDef("q_mad_outliers",
      (s, d) => Curation.madOutliers(Tables.documents(s, d), "source", "n_chars", 2.0)
        .select(col("doc_id"), col("source"), col("n_chars"),
          col("med"), col("mad"))
        .orderBy("doc_id"),
      Some("""WITH stats AS (
          SELECT source, CAST(median(n_chars) AS DOUBLE) AS med,
                 CAST(mad(n_chars) AS DOUBLE) AS mad
          FROM documents GROUP BY source)
        SELECT d.doc_id, d.source, d.n_chars, s.med, s.mad
        FROM documents d JOIN stats s USING (source)
        WHERE abs(d.n_chars - s.med) > 2.0 * s.mad
        ORDER BY d.doc_id""")),

    // ------------------------------------------ K20 apply mix weights
    // K10's uniform-target weights actually applied: over-represented
    // sources are down-sampled to the per-source average, the rest
    // keep everything (weight >= 1 → exact keep-all branch). The
    // weight is an exact integer ratio and ×65536 a pure exponent
    // shift, so the kept subset is engine-exact end to end.
    QueryDef("q_mix_apply",
      (s, d) => Curation.applyMixWeights(Tables.documents(s, d), "doc_id", "source")
        .select(col("doc_id"), col("source"),
          round(col("mix_weight"), 6).as("mix_weight"))
        .orderBy("doc_id"),
      Some("""WITH c AS (SELECT source, COUNT(*) AS n_src FROM documents GROUP BY 1),
          t AS (SELECT COUNT(*) AS n_total, COUNT(DISTINCT source) AS n_sources
                FROM documents),
          w AS (SELECT source,
                  CAST(n_total AS DOUBLE) / CAST(n_sources * n_src AS DOUBLE)
                    AS mix_weight
                FROM c CROSS JOIN t)
        SELECT doc_id, source, round(mix_weight, 6) AS mix_weight
        FROM documents JOIN w USING (source)
        WHERE floor(least(mix_weight, 1.0) * 65536) >= 65536
           OR substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
              < printf('%04x', CAST(floor(least(mix_weight, 1.0) * 65536) AS INT))
        ORDER BY doc_id""")),

    // ---------------------------------- K35 UniMax epoch-capped quotas
    // closed-form waterfill on a three-band skewed key (46/151/303
    // docs at sf0.01): the tiny band hits its 4-epoch capacity cap
    // (quota 184), the surplus splits equally across the other two
    // (508 each) — both branches of the allocation fire, Σ quota =
    // budget. The oracle unrolls the same prefix-guarded boundary test
    // in SQL windows over the bounded per-source table.
    QueryDef("q_unimax_quotas",
      (s, d) => Curation.uniMaxQuotas(
          Tables.documents(s, d).withColumn("band",
            when(col("doc_id") % 11 === 0, "tiny")
              .when(col("doc_id") % 3 === 0, "mid")
              .otherwise("big")),
          "band", budget = 1200L, maxEpochs = 4)
        .orderBy("source"),
      Some("""WITH d AS (
          SELECT doc_id,
            CASE WHEN doc_id % 11 = 0 THEN 'tiny'
                 WHEN doc_id % 3 = 0 THEN 'mid'
                 ELSE 'big' END AS source
          FROM documents),
        c AS (SELECT source, COUNT(*) AS n_docs, COUNT(*) * 4 AS capacity
              FROM d GROUP BY 1),
        r AS (SELECT *, row_number() OVER (ORDER BY capacity, source) AS r,
                SUM(capacity) OVER (ORDER BY capacity, source
                  ROWS UNBOUNDED PRECEDING) AS prefix,
                COUNT(*) OVER () AS m
              FROM c),
        f AS (SELECT *,
                (CAST(1200 AS DOUBLE) - (prefix - capacity)) / (m - r + 1)
                  AS share_r
              FROM r),
        g AS (SELECT *,
                MIN(CASE WHEN capacity <= share_r THEN 1 ELSE 0 END)
                  OVER (ORDER BY r ROWS UNBOUNDED PRECEDING) = 1 AS is_capped
              FROM f),
        h AS (SELECT *,
                SUM(CASE WHEN is_capped THEN capacity ELSE 0 END) OVER ()
                  AS capped_sum,
                SUM(CASE WHEN is_capped THEN 0 ELSE 1 END) OVER ()
                  AS n_uncapped
              FROM g),
        u AS (SELECT *,
                row_number() OVER (PARTITION BY is_capped ORDER BY source)
                  AS ru,
                1200 - capped_sum AS rem
              FROM h),
        q AS (SELECT source, n_docs, capacity,
                CAST(CASE WHEN is_capped THEN capacity
                     ELSE floor(CAST(rem AS DOUBLE) / n_uncapped) +
                       (CASE WHEN ru <= rem % n_uncapped THEN 1 ELSE 0 END)
                     END AS BIGINT) AS quota
              FROM u)
        SELECT source, n_docs, capacity, quota,
          round(CAST(quota AS DOUBLE) / n_docs, 6) AS epochs
        FROM q ORDER BY source""")),

    // ------------------------------ K35 UniMax quota materialization
    // the serve half: per-document repetition counts such that every
    // source sums exactly to its waterfilled quota — full epochs for
    // everyone plus the rem smallest-md5 docs once more. The oracle
    // reuses the waterfill CTE and fills with a per-source md5-rank
    // window; the engine fills with the BoundedMinK aggregate.
    QueryDef("q_unimax_sample",
      (s, d) => Curation.uniMaxSample(
          Tables.documents(s, d).withColumn("band",
            when(col("doc_id") % 11 === 0, "tiny")
              .when(col("doc_id") % 3 === 0, "mid")
              .otherwise("big"))
            .select("doc_id", "band"),
          "band", "doc_id", budget = 1200L, maxEpochs = 4)
        .select("doc_id", "band", "n_repeats")
        .orderBy("doc_id"),
      Some("""WITH d AS (
          SELECT doc_id,
            CASE WHEN doc_id % 11 = 0 THEN 'tiny'
                 WHEN doc_id % 3 = 0 THEN 'mid'
                 ELSE 'big' END AS source
          FROM documents),
        c AS (SELECT source, COUNT(*) AS n_docs, COUNT(*) * 4 AS capacity
              FROM d GROUP BY 1),
        r AS (SELECT *, row_number() OVER (ORDER BY capacity, source) AS r,
                SUM(capacity) OVER (ORDER BY capacity, source
                  ROWS UNBOUNDED PRECEDING) AS prefix,
                COUNT(*) OVER () AS m
              FROM c),
        f AS (SELECT *,
                (CAST(1200 AS DOUBLE) - (prefix - capacity)) / (m - r + 1)
                  AS share_r
              FROM r),
        g AS (SELECT *,
                MIN(CASE WHEN capacity <= share_r THEN 1 ELSE 0 END)
                  OVER (ORDER BY r ROWS UNBOUNDED PRECEDING) = 1 AS is_capped
              FROM f),
        h AS (SELECT *,
                SUM(CASE WHEN is_capped THEN capacity ELSE 0 END) OVER ()
                  AS capped_sum,
                SUM(CASE WHEN is_capped THEN 0 ELSE 1 END) OVER ()
                  AS n_uncapped
              FROM g),
        u AS (SELECT *,
                row_number() OVER (PARTITION BY is_capped ORDER BY source)
                  AS ru,
                1200 - capped_sum AS rem_b
              FROM h),
        q AS (SELECT source, n_docs,
                CAST(CASE WHEN is_capped THEN capacity
                     ELSE floor(CAST(rem_b AS DOUBLE) / n_uncapped) +
                       (CASE WHEN ru <= rem_b % n_uncapped THEN 1 ELSE 0 END)
                     END AS BIGINT) AS quota
              FROM u),
        p AS (SELECT source, quota // n_docs AS base, quota % n_docs AS rem
              FROM q),
        rn AS (SELECT doc_id, source,
                row_number() OVER (PARTITION BY source
                  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
              FROM d)
        SELECT doc_id, source AS band,
          CAST(base + CASE WHEN rn <= rem THEN 1 ELSE 0 END AS BIGINT)
            AS n_repeats
        FROM rn JOIN p USING (source)
        WHERE base + CASE WHEN rn <= rem THEN 1 ELSE 0 END >= 1
        ORDER BY doc_id""")),

    // ------------------------------------ K33 temperature source mix
    // p_i ∝ n_i^0.5 realized as per-source keep fraction
    // (n_i/n_min)^(−0.5), rounded 6 dp before the 16-bit threshold so
    // the kept subset survives libm pow differences; smallest source
    // keeps everything by construction.
    // the gate's sf0.01 `source` groups are exactly equal (all weights
    // 1.0 — vacuous), so mix on a SKEWED derived band (~1/7 vs ~6/7 of
    // docs) to force the downsample branch to fire on both engines
    QueryDef("q_temperature_mix",
      (s, d) => Curation.temperatureMix(
          Tables.documents(s, d).withColumn("band",
            when(col("doc_id") % 7 === 0, "rare").otherwise("common")),
          "doc_id", "band", alpha = 0.5)
        .select(col("doc_id"), col("band"), col("mix_weight"))
        .orderBy("doc_id"),
      Some("""WITH d AS (
          SELECT doc_id,
            CASE WHEN doc_id % 7 = 0 THEN 'rare' ELSE 'common' END AS band
          FROM documents),
          c AS (SELECT band, COUNT(*) AS n_src FROM d GROUP BY 1),
          m AS (SELECT MIN(n_src) AS n_min FROM c),
          w AS (SELECT band,
                  round(pow(CAST(n_src AS DOUBLE) / n_min, -0.5), 6)
                    AS mix_weight
                FROM c CROSS JOIN m)
        SELECT doc_id, band, mix_weight
        FROM d JOIN w USING (band)
        WHERE floor(least(mix_weight, 1.0) * 65536) >= 65536
           OR substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
              < printf('%04x', CAST(floor(least(mix_weight, 1.0) * 65536) AS INT))
        ORDER BY doc_id""")),

    // --------------------------------------- K21 exact-size sample
    // Exact-k uniform-without-replacement via smallest md5 keys.
    // Plans as TakeOrderedAndProject (per-partition top-k + driver
    // merge of k·partitions rows) — never a full sort.
    QueryDef("q_sample_exact_k",
      (s, d) => Curation.exactKSample(Tables.documents(s, d), "doc_id", 100)
        .select(col("doc_id"), col("source"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id, source FROM (
          SELECT doc_id, source FROM documents
          ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id LIMIT 100)
        ORDER BY doc_id""")),

    // ------------------------------------ K22 cross-source overlap
    // round 6: per ordered source pair, shared distinct 3-grams and
    // the containment |grams(a) ∩ grams(b)| / |grams(a)| — the
    // "is src_b a re-crawl of src_a" composition screen. Corpus
    // shingled once, collapsed to distinct (source, gram); the join
    // fan-out is bounded by the source count. Exact integer ratio.
    QueryDef("q_source_overlap",
      (s, d) => Curation.sourceOverlap(Tables.documents(s, d), "source", "text",
          n = 3)
        .orderBy("src_a", "src_b"),
      Some(s"""${shingleCte(3, "source")},
        exd AS (SELECT DISTINCT source, gram FROM ex),
        per AS (SELECT source, COUNT(*) AS n_grams FROM exd GROUP BY 1)
        SELECT a.source AS src_a, b.source AS src_b,
          COUNT(*) AS n_shared, ANY_VALUE(p.n_grams) AS n_grams,
          CAST(COUNT(*) AS DOUBLE) / ANY_VALUE(p.n_grams) AS containment
        FROM exd a JOIN exd b ON a.gram = b.gram AND a.source <> b.source
        JOIN per p ON p.source = a.source
        GROUP BY 1, 2 ORDER BY src_a, src_b""")),

    // ----------------------------------------- K23 shard-plan profile
    // round 6: hash-range sharding (first 16 md5 bits scaled onto 16
    // shards) profiled per shard — the pre-write balance check for an
    // N-shard training-corpus output job. Pure map + one aggregate; no
    // global sort anywhere. The oracle rebuilds the 16-bit key with
    // per-nibble strpos arithmetic (DuckDB has no hex→int cast).
    QueryDef("q_shard_plan",
      (s, d) => Curation.shardPlan(Tables.documents(s, d), "doc_id", 16,
          col("n_chars"))
        .select(col("shard_id"), col("n_docs"), col("payload").as("n_chars"))
        .orderBy("shard_id"),
      Some(s"""WITH keyed AS (
          SELECT CAST(floor(${sqlHex16("doc_id")} * 16 / 65536.0) AS BIGINT)
            AS shard_id, n_chars
          FROM documents)
        SELECT shard_id, COUNT(*) AS n_docs,
          CAST(SUM(n_chars) AS BIGINT) AS n_chars
        FROM keyed GROUP BY 1 ORDER BY shard_id""")),

    // ------------------------------------- K24 curriculum buckets
    // round 6: documents cut into 4 equal-count tiers by type-token
    // ratio (distinct/total tokens — an exact integer ratio, so the
    // order key is engine-exact), per-tier profile. The exact global
    // ntile doubles as the oracle for the approxQuantile boundary
    // form production uses at scale.
    QueryDef("q_curriculum",
      (s, d) => {
        val t = TextAnalysis.tokens(col("text"))
        val scored = Tables.documents(s, d).select(col("doc_id"), col("n_chars"),
          (size(array_distinct(t)).cast(DoubleType)
            / size(t).cast(DoubleType)).as("ttr"))
        Curation.curriculumBuckets(scored, "doc_id", col("ttr"), 4)
          .groupBy("bucket")
          .agg(count(lit(1)).as("n_docs"), round(avg("ttr"), 6).as("avg_ttr"),
            sum("n_chars").as("n_chars"))
          .orderBy("bucket")
      },
      Some("""WITH toks AS (
          SELECT doc_id, n_chars,
            string_split_regex(trim(lower(text)), '\s+') AS t
          FROM documents
        ), scored AS (
          SELECT doc_id, n_chars,
            CAST(len(list_distinct(t)) AS DOUBLE) / len(t) AS ttr
          FROM toks
        ), b AS (
          -- NULLS FIRST pins DuckDB to Spark's ASC default ordering
          SELECT n_chars, ttr,
            CAST(ntile(4) OVER (ORDER BY ttr ASC NULLS FIRST, doc_id)
              AS BIGINT) AS bucket
          FROM scored)
        SELECT bucket, COUNT(*) AS n_docs, round(avg(ttr), 6) AS avg_ttr,
          CAST(SUM(n_chars) AS BIGINT) AS n_chars
        FROM b GROUP BY 1 ORDER BY bucket""")),

    // --------------------------------------- K25 corpus drift monitor
    // round 6: per source, base-2 Jensen–Shannon divergence of its
    // unigram distribution vs the rest of the corpus — the mix-shift /
    // outlier-source screen. Absent-token JS terms collapse to the
    // residual rest-mass (1 − Σ_present q), so both engines sum only
    // over existing (source, token) rows; p and q are exact integer
    // ratios and the JS is rounded to 6 dp.
    QueryDef("q_source_drift",
      (s, d) => Curation.sourceDrift(Tables.documents(s, d), "source", "text")
        .orderBy("source"),
      Some("""WITH tok AS (
          SELECT source, unnest(string_split_regex(trim(lower(text)), '\s+'))
            AS token
          FROM documents
        ), by_src AS (
          -- source IS NOT NULL mirrors the operator's explicit filter
          SELECT source, token, COUNT(*) AS cnt FROM tok
          WHERE token <> '' AND source IS NOT NULL AND token IS NOT NULL
          GROUP BY 1, 2
        ), by_tok AS (SELECT token, SUM(cnt) AS g_cnt FROM by_src GROUP BY 1),
        tot AS (SELECT source, SUM(cnt) AS n_src FROM by_src GROUP BY 1),
        n AS (SELECT SUM(cnt) AS n_all FROM by_src),
        terms AS (
          SELECT b.source, t.n_src,
            CAST(b.cnt AS DOUBLE) / t.n_src AS p,
            CAST(g.g_cnt - b.cnt AS DOUBLE) / (n.n_all - t.n_src) AS q
          FROM by_src b
          JOIN by_tok g USING (token) JOIN tot t USING (source) CROSS JOIN n)
        SELECT source, CAST(ANY_VALUE(n_src) AS BIGINT) AS n_tokens,
          round((SUM(p * log2(2 * p / (p + q)))
            + SUM(CASE WHEN q > 0 THEN q * log2(2 * q / (p + q)) ELSE 0 END)
            + (1 - SUM(q))) * 0.5, 6) AS js_divergence
        FROM terms GROUP BY source ORDER BY source""")),

    // ------------------------------------ K26 referential integrity
    // round 6: matched / dangling distinct keys between documents and
    // embeddings — the screen a multi-table pipeline runs before a
    // join silently drops rows. One full-outer join of distinct keys.
    QueryDef("q_ref_integrity",
      (s, d) => Curation.refIntegrity(
        Tables.documents(s, d), "doc_id", Tables.embeddings(s, d), "vec_id"),
      Some("""WITH l AS (SELECT DISTINCT doc_id AS k FROM documents),
        r AS (SELECT DISTINCT vec_id AS k FROM embeddings)
        SELECT
          CAST(SUM(CASE WHEN r.k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
            AS left_only,
          CAST(SUM(CASE WHEN l.k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
            AS right_only,
          CAST(SUM(CASE WHEN l.k IS NOT NULL AND r.k IS NOT NULL
            THEN 1 ELSE 0 END) AS BIGINT) AS matched
        FROM l FULL OUTER JOIN r ON l.k = r.k""")),

    // ---------------------------------------- K27 corpus snapshot diff
    // round 6: added/removed/modified/unchanged between two corpus
    // versions — the change audit before an incremental retrain. The
    // "new" snapshot is synthesized identically in both engines:
    // docs with id%7=0 removed, id%11=0 rewritten, and a %13 slice
    // re-added under shifted ids. Only (id, md5) ever shuffles.
    QueryDef("q_snapshot_diff",
      (s, d) => {
        val old = Tables.documents(s, d)
        val kept = old.where(col("doc_id") % 7 =!= 0)
          .select(col("doc_id"),
            when(col("doc_id") % 11 === 0, concat(col("text"), lit(" v2")))
              .otherwise(col("text")).as("text"))
        val added = old.where(col("doc_id") % 13 === 0)
          .select((col("doc_id") + lit(10000000L)).as("doc_id"), col("text"))
        Curation.snapshotDiff(old, kept.unionAll(added), "doc_id", "text")
      },
      Some("""WITH neu AS (
          SELECT doc_id,
            CASE WHEN doc_id % 11 = 0 THEN text || ' v2' ELSE text END AS text
          FROM documents WHERE doc_id % 7 <> 0
          UNION ALL
          SELECT doc_id + 10000000 AS doc_id, text
          FROM documents WHERE doc_id % 13 = 0),
        o AS (SELECT doc_id AS k, md5(text) AS h_old, 1 AS p_old
          FROM documents),
        n AS (SELECT doc_id AS k, md5(text) AS h_new, 1 AS p_new FROM neu)
        SELECT
          CAST(SUM(CASE WHEN p_old IS NULL THEN 1 ELSE 0 END) AS BIGINT)
            AS added,
          CAST(SUM(CASE WHEN p_new IS NULL THEN 1 ELSE 0 END) AS BIGINT)
            AS removed,
          CAST(SUM(CASE WHEN p_old = 1 AND p_new = 1
            AND h_old IS DISTINCT FROM h_new THEN 1 ELSE 0 END) AS BIGINT)
            AS modified,
          CAST(SUM(CASE WHEN p_old = 1 AND p_new = 1
            AND h_old IS NOT DISTINCT FROM h_new THEN 1 ELSE 0 END)
            AS BIGINT) AS unchanged
        FROM o FULL OUTER JOIN n USING (k)""")),

    // --------------------------------------------- K28 novelty share
    // round 6: per doc, the fraction of its distinct 3-grams it is the
    // first (by doc_id = ingestion order) to contribute — the
    // marginal-contribution screen for "does this doc/source add
    // anything new". Gram-keyed window min (one shuffle, no
    // self-join) + one doc-keyed agg; exact integer ratio.
    QueryDef("q_novelty",
      (s, d) => Curation.noveltyShare(Tables.documents(s, d),
          "doc_id", "text", n = 3)
        .orderBy("doc_id"),
      Some(s"""${shingleCte(3)},
        fs AS (SELECT gram, MIN(doc_id) AS first_id
               FROM ex GROUP BY gram)
        SELECT doc_id, COUNT(*) AS n_grams,
          CAST(SUM(CASE WHEN doc_id = first_id THEN 1 ELSE 0 END) AS BIGINT)
            AS n_novel,
          CAST(SUM(CASE WHEN doc_id = first_id THEN 1 ELSE 0 END) AS DOUBLE)
            / CAST(COUNT(*) AS DOUBLE) AS novelty
        FROM ex JOIN fs USING (gram)
        GROUP BY doc_id ORDER BY doc_id""")),

    // --------------------------------------- K29 soft-dedup weights
    // repeat-aware sampling correction: weight = 1/n_cluster over the
    // LSH near-dup clusters (memoized F6 relation), so a duplicate
    // family counts once in expectation instead of being hard-dropped.
    // Oracle recomputes the clusters from first principles (recursive
    // CTE over the exact-Jaccard graph) and the same weight tree.
    QueryDef("q_soft_dedup",
      (s, d) => Curation.softDedupWeights(Tables.documents(s, d),
          QueriesPipeline.lshClusters(s, d, threshold = 0.5), "doc_id")
        .orderBy("doc_id"),
      Some(s"""${QueriesPipeline.clusterGraphCte(0.5)},
        cl AS (SELECT u AS doc_id, MIN(v) AS cluster_id
               FROM reach GROUP BY u),
        asg AS (SELECT d.doc_id,
                  COALESCE(cl.cluster_id, d.doc_id) AS cluster_id
                FROM documents d LEFT JOIN cl USING (doc_id)),
        sz AS (SELECT cluster_id, COUNT(*) AS n_cluster
               FROM asg GROUP BY cluster_id)
        SELECT CAST(a.doc_id AS BIGINT) AS doc_id,
          CAST(a.cluster_id AS BIGINT) AS cluster_id,
          CAST(n_cluster AS BIGINT) AS n_cluster,
          round(1.0 / n_cluster, 6) AS weight
        FROM asg a JOIN sz USING (cluster_id) ORDER BY doc_id""")),

    // ------------------------------------------ K30 DSIR importance
    // hashed-bigram importance resampling toward a target domain
    // (here: English docs). The full pipeline — feature hashing,
    // smoothed per-side bucket distributions, decimal-summed per-doc
    // log ratios — is mirrored expression-for-expression; per-bucket
    // log-ratios round to 6 dp before the order-independent DECIMAL
    // sum, the H14 discipline.
    QueryDef("q_dsir_weights",
      (s, d) => Curation.dsirWeights(Tables.documents(s, d),
          "doc_id", "text", col("lang") === "en", buckets = 4096,
          exactHash = true)
        .orderBy("doc_id"),
      Some(s"""WITH toks AS (
          SELECT doc_id, (lang = 'en') AS is_target,
                 string_split_regex(trim(lower(text)), '\\s+') AS t
          FROM documents
        ), grams AS (
          SELECT doc_id, is_target, u.z[1] || ' ' || u.z[2] AS gram
          FROM toks, unnest(list_zip(t, t[2:])) AS u(z)
          WHERE len(t) >= 2 AND u.z[2] IS NOT NULL
        ), cdb AS (
          SELECT doc_id, is_target,
                 ${sqlHex16("gram")} % 4096 AS bucket,
                 COUNT(*) AS c
          FROM grams GROUP BY 1, 2, 3
        ), statd AS (
          SELECT doc_id, c,
            SUM(CASE WHEN is_target THEN c ELSE 0 END)
              OVER (PARTITION BY bucket) AS ct,
            SUM(CASE WHEN NOT is_target THEN c ELSE 0 END)
              OVER (PARTITION BY bucket) AS cr
          FROM cdb
        ), totals AS (
          SELECT
            SUM(CASE WHEN is_target AND len(t) >= 2
                THEN len(t) - 1 ELSE 0 END) AS tt,
            SUM(CASE WHEN NOT is_target AND len(t) >= 2
                THEN len(t) - 1 ELSE 0 END) AS tr
          FROM toks
        ), scored AS (
          SELECT doc_id, c,
            CAST(round(ln((ct + 1.0) / (tt + 4096.0))
                     - ln((cr + 1.0) / (tr + 4096.0)), 6)
              AS DECIMAL(28,6)) AS lr
          FROM statd CROSS JOIN totals)
        SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_grams,
          round(CAST(SUM(CAST(c AS DECIMAL(10,0)) * lr) AS DOUBLE), 6)
            AS log_weight
        FROM scored GROUP BY doc_id ORDER BY doc_id""")),

    // ------------------------------------ K31 semantic decontamination
    // the embedding-space twin of q_decontaminate: corpus vectors
    // cosine-close to ANY benchmark vector are dropped. Gate config is
    // the exact broadcast anti-join (the production plan when the eval
    // suite is MBs); cell-pruned mode is spec-covered on planted
    // leaks. Eval set: the first 30 vectors, standing in for a pinned
    // benchmark suite.
    QueryDef("q_semantic_decontam",
      (s, d) => {
        val em = Tables.embeddings(s, d)
        Curation.semanticDecontam(em, em.where(col("vec_id") < 30),
            threshold = 0.4)
          .select(col("vec_id").cast(LongType).as("vec_id"))
          .orderBy("vec_id")
      },
      Some("""SELECT CAST(c.vec_id AS BIGINT) AS vec_id
        FROM embeddings c
        WHERE NOT EXISTS (
          SELECT 1 FROM embeddings q WHERE q.vec_id < 30
            AND list_cosine_similarity(c.embedding, q.embedding) >= 0.4)
        ORDER BY vec_id""")),

    // ------------------------------------- K32 quality classifier
    // the CCNet/GPT-3 fastText-style hashed-bigram linear quality
    // filter: train on an 80% slice, score the held-out 20%. Training
    // reduces float gradients in partition order, so the gate pins
    // STRUCTURAL contracts (exact held-out class counts, an AUC floor
    // the structurally-learnable median-length label clears by a wide
    // margin — hashed counts encode length linearly) rather than raw
    // coefficients; per-doc scores and true separability are
    // spec-proven on planted vocabularies (QualityClassifierSpec).
    QueryDef("q_quality_classifier",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val med = SessionMemo.any(s, ("qcMedianLen", d))(
          java.lang.Double.valueOf(docs
            .agg(expr("percentile(length(text), 0.5)"))
            .collect()(0).getDouble(0)))
        val labeled = docs.withColumn("is_long",
          length(col("text")) > med.doubleValue())
        val model = SessionMemo.any(s, ("qualityClf", d))(
          operators.QualityClassifier.train(
            labeled.where(col("doc_id") % 5 =!= 0), "text", col("is_long"),
            buckets = 2048, maxIter = 50))
        val test = labeled.where(col("doc_id") % 5 === 0)
        val scored = operators.QualityClassifier
          .score(test, model, "doc_id", "text")
          .join(test.select("doc_id", "is_long"), "doc_id")
        // The AUC floor is 0.75, NOT the ~0.97 the model actually
        // measures: L-BFGS coefficients vary with partition-order
        // float reduction, so a tight floor on a nondeterministic
        // training run is latent flakiness (r8 ADVICE). 0.75 still
        // fails hard on a broken model (random scoring gives ~0.5),
        // while the tight separability claims live in
        // QualityClassifierSpec's deterministic planted-vocab cases.
        operators.QualityClassifier.auc(scored, "is_long")
          .select(col("np").as("n_test_pos"), col("nn").as("n_test_neg"),
            (col("auc") >= 0.75).as("auc_ok"))
      },
      Some("""WITH med AS (SELECT median(length(text)) AS m FROM documents)
        SELECT
          CAST(COUNT(CASE WHEN length(text) > m THEN 1 END) AS BIGINT)
            AS n_test_pos,
          CAST(COUNT(CASE WHEN length(text) <= m THEN 1 END) AS BIGINT)
            AS n_test_neg,
          TRUE AS auc_ok
        FROM documents, med WHERE doc_id % 5 = 0""")))
}
