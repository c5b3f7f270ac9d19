package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: multi-dimensional clustering for scan
  * locality. At 100 TB the dominant cost of a selective query is how
  * many files its predicate touches; Z-ordering the write keeps rows
  * close in BOTH dimensions, so min/max file statistics prune most of
  * the dataset for either predicate — the layout trick behind
  * Delta/Iceberg OPTIMIZE ZORDER, expressed as plain Spark
  * (bit-interleave expression + repartitionByRange write).
  */
object Layout {

  /** Morton (Z-curve) value of N columns, `bits` bits each,
    * round-robin interleaved: bit i of dimension c lands at position
    * i·N + c (for N = 2 this is exactly the classic x→even / y→odd
    * layout). Inputs must already be non-negative and < 2^bits
    * (callers range-encode first — see rangeBucket), and the N·bits
    * interleaved bits must fit a Long's 63 value bits — real layout
    * jobs at 3–4 dimensions split the bit budget accordingly (e.g.
    * 4 × 15 bits). Pure bit arithmetic: codegen'd, no UDF, no shuffle.
    */
  def zValue(dims: Seq[Column], bits: Int): Column = {
    val n = dims.size
    require(n >= 2, s"z-order needs at least 2 dimensions, got $n")
    require(bits >= 1 && n * bits <= 63,
      s"$n dimensions x $bits bits exceed a Long's 63 value bits")
    (for { i <- 0 until bits; (c, ci) <- dims.zipWithIndex } yield
      shiftleft(shiftrightunsigned(c.cast("long"), i).bitwiseAND(1L), i * n + ci)
    ).reduce(_.bitwiseOR(_))
  }

  /** Two-dimensional [[zValue]] (x→even positions, y→odd). */
  def zValue(x: Column, y: Column, bits: Int = 16): Column =
    zValue(Seq(x, y), bits)

  /** Equi-width range bucket of `c` into [0, 2^bits): the cheap
    * deterministic encoder for zValue over arbitrary numeric ranges.
    * (Production systems range-encode by quantiles; equi-width keeps
    * the gate oracle exact.)
    */
  def rangeBucket(c: Column, lo: Long, hi: Long, bits: Int = 16): Column = {
    require(hi > lo, "empty range")
    val buckets = 1L << bits
    // (c - lo) * buckets must not overflow Long: the widest in-range
    // offset is (hi - lo), so fail loudly instead of returning wrong
    // buckets silently for very wide ranges
    require(hi - lo <= (Long.MaxValue >> bits),
      s"range [$lo, $hi] too wide for $bits-bit buckets: " +
        s"(hi - lo) must be <= ${Long.MaxValue >> bits}")
    // out-of-range VALUES are clamped to the edge buckets before the
    // multiply: an unclamped c far outside [lo, hi] would overflow
    // (c - lo) * buckets and emit a negative bucket, which zValue's
    // bit interleave silently scrambles
    val clamped = least(lit(hi), greatest(lit(lo), c.cast("long")))
    least(lit(buckets - 1),
      ((clamped - lo) * buckets / (hi - lo + 1)).cast("long"))
  }

  /** Rewrite `df` into `numFiles` range-partitioned slices of the
    * Z-curve over N encoded dimensions — each output partition holds
    * a compact Z-range, i.e. a small bounding box in every dimension.
    * Callers write the result with one file per partition and get
    * min/max pruning on ALL the z-ordered columns.
    */
  def zOrderBy(df: DataFrame, dims: Seq[Column], numFiles: Int,
               bits: Int): DataFrame = {
    // pick a scratch name absent from the input — overwriting a real
    // "_z" column would silently drop user data on the way out.
    // Case-insensitive check: withColumn resolves case-insensitively
    // under the default spark.sql.caseSensitive=false
    val lower = df.columns.map(_.toLowerCase).toSet
    val zc = Iterator.from(0).map(i => if (i == 0) "_z" else s"_z$i")
      .find(n => !lower.contains(n)).get
    df.withColumn(zc, zValue(dims, bits))
      .repartitionByRange(numFiles, col(zc))
      .sortWithinPartitions(zc)
      .drop(zc)
  }

  /** Two-dimensional [[zOrderBy]]. */
  def zOrderBy(df: DataFrame, x: Column, y: Column, numFiles: Int,
               bits: Int = 16): DataFrame =
    zOrderBy(df, Seq(x, y), numFiles, bits)
}
