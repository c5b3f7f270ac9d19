package graft.sources

import org.apache.arrow.vector.types.pojo.ArrowType
import org.apache.arrow.vector.types.{FloatingPointPrecision, TimeUnit}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class ArrowTypesSpec extends AnyFunSuite {

  private val roundtrippable: Seq[DataType] = Seq(
    BooleanType, ByteType, ShortType, IntegerType, LongType,
    FloatType, DoubleType, StringType, BinaryType,
    DecimalType(12, 2), DecimalType(38, 10), DateType,
    TimestampType, TimestampNTZType,
    ArrayType(FloatType, containsNull = false),
    ArrayType(StringType, containsNull = true),
    StructType(Seq(StructField("a", IntegerType), StructField("b", StringType))),
    YearMonthIntervalType(), DayTimeIntervalType(), CalendarIntervalType)

  test("spark → arrow → spark roundtrips for the full Schema.fbs surface") {
    roundtrippable.foreach { dt =>
      val f = ArrowTypes.toArrowField("c", dt, nullable = true)
      val back = ArrowTypes.fromArrowField(f)
      assert(back.dataType == dt, s"for $dt got ${back.dataType}")
      assert(back.nullable)
    }
  }

  test("nullability is preserved both ways") {
    val f = ArrowTypes.toArrowField("c", IntegerType, nullable = false)
    assert(!f.isNullable)
    assert(!ArrowTypes.fromArrowField(f).nullable)
  }

  test("timestamp timezone distinguishes TZ from NTZ") {
    val tz = ArrowTypes.toArrowType(TimestampType).asInstanceOf[ArrowType.Timestamp]
    assert(tz.getTimezone == "UTC" && tz.getUnit == TimeUnit.MICROSECOND)
    val ntz = ArrowTypes.toArrowType(TimestampNTZType).asInstanceOf[ArrowType.Timestamp]
    assert(ntz.getTimezone == null)
  }

  test("unsigned arrow ints widen to signed spark types") {
    assert(ArrowTypes.fromArrowType(new ArrowType.Int(8, false)) == ShortType)
    assert(ArrowTypes.fromArrowType(new ArrowType.Int(16, false)) == IntegerType)
    assert(ArrowTypes.fromArrowType(new ArrowType.Int(32, false)) == LongType)
  }

  test("half-float widens to float on read; write side never emits HALF") {
    assert(ArrowTypes.fromArrowType(
      new ArrowType.FloatingPoint(FloatingPointPrecision.HALF)) == FloatType)
    assert(ArrowTypes.toArrowType(FloatType) ==
      new ArrowType.FloatingPoint(FloatingPointPrecision.SINGLE))
  }

  test("union fields widen to a struct of nullable members") {
    import org.apache.arrow.vector.types.UnionMode
    import org.apache.arrow.vector.types.pojo.{Field, FieldType}
    import scala.jdk.CollectionConverters._
    val f = new Field("u",
      FieldType.nullable(new ArrowType.Union(UnionMode.Sparse, Array(0, 1))),
      Seq(Field.notNullable("i", new ArrowType.Int(32, true)),
        Field.nullable("s", ArrowType.Utf8.INSTANCE)).asJava)
    val sf = ArrowTypes.fromArrowField(f)
    assert(sf.dataType == StructType(Seq(
      StructField("i", IntegerType, nullable = true),
      StructField("s", StringType, nullable = true))))
    assert(sf.nullable)
  }
}
