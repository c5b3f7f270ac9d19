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

  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 salts: Int = 16): DataFrame = {
    val salted = large.withColumn("_salt",
      (rand(seed = 42) * salts).cast("int"))
    // shuffle-hash, not sort-merge: salting already bounds each
    // (key, salt) partition's build side, so hashing the replicated
    // dim skips two full sorts of the fact table
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
      .hint("shuffle_hash")
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
