package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.{BloomFilter, CountMinSketch}

/** Probe expressions for Spark's serialized sketches (SURVEY §2.B9/B10):
  * query a `count_min_sketch(...)` / bloom aggregate result row-by-row
  * from SQL or DataFrame code. The deserialized sketch is cached per
  * buffer reference, so probing N rows against one broadcast sketch
  * deserializes once per task, not once per row. CodegenFallback —
  * probes run over small joined relations (the sketch side is a
  * scalar aggregate), never in a fact-scan hot path.
  */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (BinaryType, StringType | IntegerType | LongType | ShortType | ByteType) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cms_estimate(sketch binary, item string|integral), got $other")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"

  @transient private var cachedBytes: Array[Byte] = _
  @transient private var cachedSketch: CountMinSketch = _

  private def sketchOf(bytes: Array[Byte]): CountMinSketch = {
    // content comparison, not reference: UnsafeRow.getBinary hands out
    // a fresh copy per eval, so a reference cache would re-parse the
    // sketch on every probed row
    if (cachedBytes == null || !java.util.Arrays.equals(cachedBytes, bytes)) {
      cachedSketch = CountMinSketch.readFrom(new ByteArrayInputStream(bytes))
      cachedBytes = bytes
    }
    cachedSketch
  }

  override protected def nullSafeEval(sk: Any, item: Any): Any = {
    val s = sketchOf(sk.asInstanceOf[Array[Byte]])
    item match {
      case u: UTF8String => s.estimateCount(u.toString)
      case n: java.lang.Number => s.estimateCount(java.lang.Long.valueOf(n.longValue()))
      case other => s.estimateCount(other)
    }
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : Expression = copy(left = l, right = r)
}

/** Membership probe of a serialized bloom filter built over LONG items
  * (feed `xxhash64(col)` to both build and probe sides, the runtime-
  * filter convention). No false negatives: a key that was added always
  * returns true.
  */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain(filter binary, item bigint), got $other")
  }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  @transient private var cachedBytes: Array[Byte] = _
  @transient private var cachedFilter: BloomFilter = _

  private def filterOf(bytes: Array[Byte]): BloomFilter = {
    // content comparison — see CmsEstimate.sketchOf
    if (cachedBytes == null || !java.util.Arrays.equals(cachedBytes, bytes)) {
      cachedFilter = BloomFilter.readFrom(new ByteArrayInputStream(bytes))
      cachedBytes = bytes
    }
    cachedFilter
  }

  override protected def nullSafeEval(f: Any, item: Any): Any =
    filterOf(f.asInstanceOf[Array[Byte]]).mightContainLong(item.asInstanceOf[Long])

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : Expression = copy(left = l, right = r)
}
