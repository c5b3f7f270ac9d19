package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** One (sort-key, id) candidate flowing into [[BoundedMinK]]. */
case class MinKEntry(k: String, id: Long)

/** Bounded k-smallest aggregate: keeps the k entries with the
  * smallest (k, id) pairs — lexicographic on the string key, id as
  * the tiebreak — in a buffer that can NEVER exceed 2k elements,
  * regardless of group size.
  *
  * This is the skew-proof replacement for `row_number() OVER
  * (PARTITION BY group ORDER BY key) <= k`: the window form must
  * co-locate and sort a group's ENTIRE membership in one task (a
  * 10^9-row group is one unsplittable partition — the H12/K15
  * hot-head shape), while this aggregate reduces map-side — every
  * partition contributes at most k survivors per group, so the
  * shuffle carries O(partitions·k) rows for even the hottest group,
  * and the merge tree is associative all the way up.
  *
  * The buffer doubles k before trimming so per-row cost is amortized
  * O(1) appends + an O(k log k) sort every k rows.
  */
class BoundedMinK(k: Int) extends Aggregator[MinKEntry, Seq[MinKEntry], Seq[Long]]
    with Serializable {
  require(k > 0, s"k must be positive: $k")

  private def trim(b: Seq[MinKEntry]): Seq[MinKEntry] =
    if (b.length <= k) b
    else b.sortBy(e => (e.k, e.id)).take(k)

  override def zero: Seq[MinKEntry] = Vector.empty

  override def reduce(b: Seq[MinKEntry], a: MinKEntry): Seq[MinKEntry] = {
    val nb = b :+ a
    if (nb.length >= 2 * k) trim(nb) else nb
  }

  override def merge(b1: Seq[MinKEntry], b2: Seq[MinKEntry]): Seq[MinKEntry] =
    trim(b1 ++ b2)

  /** k smallest ids, ordered by (key, id) ascending — position i is
    * sample rank i + 1, matching the window form's row_number. */
  override def finish(b: Seq[MinKEntry]): Seq[Long] =
    b.sortBy(e => (e.k, e.id)).take(k).map(_.id)

  override def bufferEncoder: Encoder[Seq[MinKEntry]] =
    ExpressionEncoder[Seq[MinKEntry]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}

/** [[BoundedMinK]] finishing to the k smallest string KEYS instead of
  * ids — for callers whose row identity is not Long-castable (the id
  * slot is only the deterministic tiebreak, e.g. a hash of the raw
  * id). Same bounded buffer and merge algebra.
  */
class BoundedMinKeys(k: Int) extends Aggregator[MinKEntry, Seq[MinKEntry], Seq[String]]
    with Serializable {
  require(k > 0, s"k must be positive: $k")

  private def trim(b: Seq[MinKEntry]): Seq[MinKEntry] =
    if (b.length <= k) b
    else b.sortBy(e => (e.k, e.id)).take(k)

  override def zero: Seq[MinKEntry] = Vector.empty

  override def reduce(b: Seq[MinKEntry], a: MinKEntry): Seq[MinKEntry] = {
    val nb = b :+ a
    if (nb.length >= 2 * k) trim(nb) else nb
  }

  override def merge(b1: Seq[MinKEntry], b2: Seq[MinKEntry]): Seq[MinKEntry] =
    trim(b1 ++ b2)

  override def finish(b: Seq[MinKEntry]): Seq[String] =
    b.sortBy(e => (e.k, e.id)).take(k).map(_.k)

  override def bufferEncoder: Encoder[Seq[MinKEntry]] =
    ExpressionEncoder[Seq[MinKEntry]]()
  override def outputEncoder: Encoder[Seq[String]] =
    ExpressionEncoder[Seq[String]]()
}
