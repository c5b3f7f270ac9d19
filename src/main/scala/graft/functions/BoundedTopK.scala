package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** One (score, id) candidate flowing into [[BoundedTopK]]. */
case class ScoredId(score: Double, id: Long)

/** One ranked survivor: position in the finished array is rank−1. */
case class TopKHit(nid: Long, score: Double)

/** Bounded per-group top-k by numeric score: keeps the k best
  * (score, id) pairs — best-score-first per `desc`, id ascending as
  * the tiebreak — in a buffer that can NEVER exceed 2k elements,
  * regardless of group size.
  *
  * This is [[BoundedMinK]]'s numeric-score sibling, built for the
  * brute-force similarity rankers: `row_number() OVER (PARTITION BY
  * qid ORDER BY cos DESC, nid)` on the query×corpus pair relation
  * puts the ENTIRE corpus in each query's window partition — one
  * unsplittable reducer per query at 10^10 corpus rows, and AQE
  * cannot split window partitions. As an aggregate the top-k reduces
  * map-side: every partition contributes at most k survivors per
  * query, so the shuffle carries O(partitions·k) rows per qid and the
  * merge tree is associative all the way up. The finished array
  * carries the score, so winners need no re-join against the pair
  * relation (unlike BoundedMinK's id-only output).
  *
  * Score ordering matches Spark SQL's double sort ordering exactly
  * (−0.0 == 0.0 as a tie; NaN greater than everything, so NaN ranks
  * FIRST under desc — the same order the window form produced), and
  * equal scores break by id ascending.
  */
class BoundedTopK(k: Int, desc: Boolean = true)
    extends Aggregator[ScoredId, Seq[ScoredId], Seq[TopKHit]]
    with Serializable {
  require(k > 0, s"k must be positive: $k")

  /** Spark SQL double comparison (SQLOrderingUtil): -0.0 ties 0.0,
    * NaN is the greatest value and equal to itself. */
  private def cmpSql(x: Double, y: Double): Int =
    if (x < y) -1 else if (x > y) 1
    else if (x == y) 0
    else java.lang.Double.compare(x, y)

  private val ord: Ordering[ScoredId] = new Ordering[ScoredId] {
    override def compare(a: ScoredId, b: ScoredId): Int = {
      val c = if (desc) cmpSql(b.score, a.score) else cmpSql(a.score, b.score)
      if (c != 0) c else java.lang.Long.compare(a.id, b.id)
    }
  }

  private def trim(b: Seq[ScoredId]): Seq[ScoredId] =
    if (b.length <= k) b
    else b.sorted(ord).take(k)

  override def zero: Seq[ScoredId] = Vector.empty

  override def reduce(b: Seq[ScoredId], a: ScoredId): Seq[ScoredId] = {
    val nb = b :+ a
    if (nb.length >= 2 * k) trim(nb) else nb
  }

  override def merge(b1: Seq[ScoredId], b2: Seq[ScoredId]): Seq[ScoredId] =
    trim(b1 ++ b2)

  /** k best hits, best first — position i is rank i + 1, matching the
    * window form's row_number over (score desc|asc, id). */
  override def finish(b: Seq[ScoredId]): Seq[TopKHit] =
    b.sorted(ord).take(k).map(e => TopKHit(e.id, e.score))

  override def bufferEncoder: Encoder[Seq[ScoredId]] =
    ExpressionEncoder[Seq[ScoredId]]()
  override def outputEncoder: Encoder[Seq[TopKHit]] =
    ExpressionEncoder[Seq[TopKHit]]()
}
