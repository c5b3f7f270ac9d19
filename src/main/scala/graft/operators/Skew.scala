package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-aware join utilities (SURVEY §4).
  *
  * AQE's skew-join split handles most cases at runtime; salting is the
  * explicit fallback when one join key dominates so heavily that even
  * split partitions bottleneck (the classic power-law key problem in
  * web/training corpora).
  *
  * `saltedJoin`: the skewed (large) side gets a random salt in
  * [0, salts); the small-but-too-big-to-broadcast side is replicated
  * once per salt via explode. Join key becomes (key, salt), spreading
  * each hot key over `salts` reducers. Semantics identical to the
  * plain inner join.
  */
object Skew {

  /** `hotCap > 0` (r16, guide §2.5 "salt only demonstrably hot keys"):
    * two-path split. One map-side-combined pass counts rows per key on
    * the large side; keys with >= hotCap rows (capped at maxHot,
    * biggest first — beyond that salting stops being a targeted fix)
    * are joined salted, everything else takes the PLAIN sort-merge
    * join with no replication at all. With no hot keys the salted leg
    * is empty and the whole ×salts dim replication — the dominant cost
    * of the unconditional form — never happens. Semantics identical:
    * the two legs partition the large side by key membership, and both
    * compute the same inner join.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 salts: Int = 16, shuffleHash: Boolean = false,
                 hotCap: Long = 0, maxHot: Int = 1 << 20): DataFrame = {
    if (hotCap > 0) {
      val hot = large.groupBy(col(key)).agg(count(lit(1)).as("_cnt"))
        .where(col("_cnt") >= hotCap)
        .orderBy(col("_cnt").desc, col(key)).limit(maxHot)
        .select(col(key))
      val hotLeg = saltedJoin(
        large.join(broadcast(hot), Seq(key), "left_semi"),
        small.join(broadcast(hot), Seq(key), "left_semi"),
        key, salts, shuffleHash)
      val coldSmall = small.hint(if (shuffleHash) "shuffle_hash" else "merge")
      val coldLeg = large.join(broadcast(hot), Seq(key), "left_anti")
        .join(coldSmall, Seq(key))
      return coldLeg.unionByName(hotLeg)
    }
    val salted = large.withColumn("_salt",
      (rand(seed = 42) * salts).cast("int"))
    // Join strategy (r9 sf3 lesson): the earlier unconditional
    // shuffle_hash hint OOMed at 30× data — salting bounds each
    // (key, salt) GROUP, but a ShuffledHashJoin's build side is the
    // whole replicated-dim PARTITION SLICE, |small|·salts/partitions
    // rows, which grows linearly with the dim and cannot spill while
    // building. Leaving the choice to Spark is no better: Generate's
    // size estimate does not scale with the explode fan-out, so the
    // replicated dim under-estimates ×salts and gets BROADCAST — the
    // same map, now on one driver. The caller reached for saltedJoin
    // precisely because the dim is too big to broadcast, so the
    // default is an explicit sort-merge hint (spills gracefully at
    // any scale); pass shuffleHash = true only when the per-task
    // slice provably fits executor memory — it skips the fact sorts.
    val rep = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    val replicated = rep.hint(if (shuffleHash) "shuffle_hash" else "merge")
    salted.join(replicated,
        salted(key) === replicated(key) && salted("_salt") === replicated("_salt"))
      .drop(replicated(key)).drop("_salt")
  }

  /** Key-frequency report: find candidates for salting/broadcast.
    * One pass, map-side combined.
    */
  def keySkewReport(df: DataFrame, key: String, topN: Int = 20): DataFrame =
    df.groupBy(key).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc).limit(topN)
}
