package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LayoutSpec extends SparkSpec {
  import sqlImplicits._

  test("zValue interleaves bits x-even / y-odd") {
    val out = Seq((5L, 3L)).toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y"), 3)).collect()(0).getLong(0)
    // x=101, y=011 → z = x0 + y0<<1 + x1<<2 + y1<<3 + x2<<4 + y2<<5 = 27
    assert(out == 27L)
    // identity strips: z of (x, 0) with 1-bit y is x's bits spread to even positions
    val spread = Seq((3L, 0L)).toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y"), 2)).collect()(0).getLong(0)
    assert(spread == 5L) // 11 → 0101
  }

  test("zValue generalizes to N dimensions with round-robin bit placement") {
    // (x=3, y=0, w=1) at 2 bits: x→positions 0,3; y→1,4; w→2,5
    // = 1 + 8 + 4 = 13
    val z3 = Seq((3L, 0L, 1L)).toDF("x", "y", "w")
      .select(Layout.zValue(Seq(col("x"), col("y"), col("w")), 2))
      .collect()(0).getLong(0)
    assert(z3 == 13L)
    // the 2-column overload and Seq form must agree bit-for-bit
    val pair = Seq((5L, 3L)).toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y"), 3).as("a"),
        Layout.zValue(Seq(col("x"), col("y")), 3).as("b"))
      .collect()(0)
    assert(pair.getLong(0) == pair.getLong(1))
    // bit budget enforced: 4 dims x 16 bits = 64 > 63 value bits
    intercept[IllegalArgumentException] {
      Layout.zValue(Seq(col("x"), col("y"), col("x"), col("y")), 16)
    }
  }

  test("3-D z-ordered parquet prunes row groups for a three-dimensional box") {
    // 32^3 grid; the box x<8 & y<8 & w<8 holds 512 of 32,768 rows. A
    // 3-D z-clustering keeps each row group a compact cube, so min/max
    // stats skip most groups for the box on ALL THREE columns.
    val grid = spark.range(0, 32L * 32 * 32).toDF("i")
      .select((col("i") % 32).as("x"),
        ((col("i") / 32) % 32).cast("long").as("y"),
        (col("i") / (32 * 32)).cast("long").as("w"))
    val zDir = java.nio.file.Files.createTempDirectory("graft-zprune3").toString
    spark.conf.set("spark.sql.files.maxRecordsPerFile", "2500")
    try {
      Layout.zOrderBy(grid, Seq(col("x"), col("y"), col("w")), numFiles = 16, bits = 5)
        .write.mode("overwrite")
        .option("parquet.block.size", "4096")
        .parquet(zDir)
    } finally spark.conf.unset("spark.sql.files.maxRecordsPerFile")
    val df = spark.read.parquet(zDir)
      .where(col("x") < 8 && col("y") < 8 && col("w") < 8)
    df.collect()
    val scan = df.queryExecution.executedPlan.collectLeaves().head
    val scanned = scan.metrics("numOutputRows").value
    assert(scanned < 8000, s"3-D z-order pruning ineffective: scanned $scanned of 32768")
  }

  test("rangeBucket is monotone and stays in range") {
    val out = spark.range(0, 1000).toDF("v")
      .select(Layout.rangeBucket(col("v"), 0, 999, 4).as("b"))
      .agg(min("b"), max("b"), count(lit(1))).collect()(0)
    assert(out.getLong(0) == 0L && out.getLong(1) == 15L)
  }

  test("z-ordered parquet prunes row groups for a two-dimensional box predicate") {
    // the end goal of K11: parquet keeps per-row-group min/max for x
    // AND y, so a z-clustered layout lets a box predicate skip most
    // row groups, where an x-sorted layout prunes on x only
    val grid = spark.range(0, 200L * 200).toDF("i")
      .select((col("i") % 200).as("x"), (col("i") / 200).cast("long").as("y"))
    def scannedRows(dir: String): Long = {
      val df = spark.read.parquet(dir).where(col("x") < 25 && col("y") < 25)
      df.collect()
      val scan = df.queryExecution.executedPlan.collectLeaves().head
      scan.metrics("numOutputRows").value
    }
    val zDir = java.nio.file.Files.createTempDirectory("graft-zprune").toString
    // small row groups so pruning granularity is visible
    spark.conf.set("spark.sql.files.maxRecordsPerFile", "2500")
    try {
      Layout.zOrderBy(grid, col("x"), col("y"), numFiles = 16, bits = 8)
        .write.mode("overwrite")
        .option("parquet.block.size", "4096")
        .parquet(zDir)
    } finally spark.conf.unset("spark.sql.files.maxRecordsPerFile")
    val scanned = scannedRows(zDir)
    // the box holds 625 of 40,000 rows; a z-clustered layout must scan
    // only a small neighborhood of it, never most of the dataset
    assert(scanned < 8000, s"z-order row-group pruning ineffective: scanned $scanned")
  }

  test("zOrderBy clusters BOTH dimensions; a one-column sort clusters only one") {
    // 64x64 grid of points; partition into 16 slices and measure the
    // mean per-slice bounding-box span in each dimension
    val grid = spark.range(0, 64L * 64).toDF("i")
      .select((col("i") % 64).as("x"), (col("i") / 64).cast("long").as("y"))
    def meanSpans(df: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val spans = df.withColumn("p", spark_partition_id())
        .groupBy("p")
        .agg((max("x") - min("x")).as("sx"), (max("y") - min("y")).as("sy"))
        .agg(avg("sx"), avg("sy")).collect()(0)
      (spans.getDouble(0), spans.getDouble(1))
    }
    val (zx, zy) = meanSpans(Layout.zOrderBy(grid, col("x"), col("y"), 16, bits = 6))
    val (lx, ly) = meanSpans(
      grid.repartitionByRange(16, col("x")).sortWithinPartitions("x"))
    // z-order: every 256-point slice is a compact box (≈16x16; bound
    // leaves room for range-boundary sampling straddling quadrants);
    // x-sort: x is tight but y spans the full 64
    assert(zx <= 28 && zy <= 28, s"z-order spans ($zx, $zy) not compact")
    assert(ly >= 60, s"x-sorted layout should leave y unclustered, got $ly")
    assert(zy < ly / 2, "z-order must beat single-column sort on the second dim")
  }
}
