package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.arrow.vector.types.{DateUnit, FloatingPointPrecision, IntervalUnit, TimeUnit}
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema => ArrowSchema}
import org.apache.spark.sql.types._

/** Arrow ⇄ Spark type/schema mapping (SURVEY §2.A1).
  *
  * Covers the reference's Schema.fbs surface (reference:
  * format/Schema.fbs, cpp/src/arrow/type.h): null, bool, signed ints,
  * fp32/64, decimal, utf8, binary, fixed_size_binary, date32,
  * timestamps, intervals, list, struct, union. Unsigned ints widen to
  * the next signed Spark type. Intervals map onto Spark's ANSI
  * interval types (year_month → YearMonthIntervalType, day_time and
  * duration → DayTimeIntervalType in µs, month_day_nano →
  * CalendarIntervalType). Unions have no Spark analog and widen to a
  * struct of their members on read (exactly one member non-null per
  * row); Spark cannot produce a union, so there is no write mapping.
  */
object ArrowTypes {

  def toArrowType(dt: DataType): ArrowType = dt match {
    case BooleanType => ArrowType.Bool.INSTANCE
    case ByteType => new ArrowType.Int(8, true)
    case ShortType => new ArrowType.Int(16, true)
    case IntegerType => new ArrowType.Int(32, true)
    case LongType => new ArrowType.Int(64, true)
    case FloatType => new ArrowType.FloatingPoint(FloatingPointPrecision.SINGLE)
    case DoubleType => new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)
    case StringType => ArrowType.Utf8.INSTANCE
    case BinaryType => ArrowType.Binary.INSTANCE
    case d: DecimalType => new ArrowType.Decimal(d.precision, d.scale, 128)
    case DateType => new ArrowType.Date(DateUnit.DAY)
    // TIME writes at micro unit (the interoperable time64 flavor);
    // sub-micro digits of a TimeType(>6) value truncate on write
    case _: TimeType => new ArrowType.Time(TimeUnit.MICROSECOND, 64)
    case TimestampType => new ArrowType.Timestamp(TimeUnit.MICROSECOND, "UTC")
    case TimestampNTZType => new ArrowType.Timestamp(TimeUnit.MICROSECOND, null)
    case _: YearMonthIntervalType => new ArrowType.Interval(IntervalUnit.YEAR_MONTH)
    // Spark's own arrow bridge convention: day-time intervals are
    // µs-unit durations (a day_time interval vector only holds ms)
    case _: DayTimeIntervalType => new ArrowType.Duration(TimeUnit.MICROSECOND)
    case CalendarIntervalType => new ArrowType.Interval(IntervalUnit.MONTH_DAY_NANO)
    case _: NullType => ArrowType.Null.INSTANCE
    case other =>
      throw new UnsupportedOperationException(s"graft arrow: unsupported Spark type $other")
  }

  def toArrowField(name: String, dt: DataType, nullable: Boolean): Field = dt match {
    case ArrayType(elem, containsNull) =>
      new Field(name, if (nullable) FieldType.nullable(ArrowType.List.INSTANCE)
        else FieldType.notNullable(ArrowType.List.INSTANCE),
        List(toArrowField("element", elem, containsNull)).asJava)
    case MapType(kt, vt, valueContainsNull) =>
      // arrow maps: one non-nullable "entries" struct child with
      // non-nullable "key" and (possibly nullable) "value"
      val entries = new Field("entries",
        FieldType.notNullable(ArrowType.Struct.INSTANCE),
        List(toArrowField("key", kt, nullable = false),
          toArrowField("value", vt, valueContainsNull)).asJava)
      new Field(name,
        if (nullable) FieldType.nullable(new ArrowType.Map(false))
        else FieldType.notNullable(new ArrowType.Map(false)),
        List(entries).asJava)
    case StructType(fields) =>
      new Field(name, if (nullable) FieldType.nullable(ArrowType.Struct.INSTANCE)
        else FieldType.notNullable(ArrowType.Struct.INSTANCE),
        fields.map(f => toArrowField(f.name, f.dataType, f.nullable)).toList.asJava)
    case simple =>
      val at = toArrowType(simple)
      new Field(name, if (nullable) FieldType.nullable(at) else FieldType.notNullable(at),
        List.empty[Field].asJava)
  }

  def toArrowSchema(schema: StructType): ArrowSchema =
    new ArrowSchema(schema.fields.map(f => toArrowField(f.name, f.dataType, f.nullable)).toList.asJava)

  def fromArrowType(t: ArrowType): DataType = t match {
    case _: ArrowType.Bool => BooleanType
    case i: ArrowType.Int =>
      (i.getBitWidth, i.getIsSigned) match {
        case (8, true) => ByteType
        case (16, true) => ShortType
        case (32, true) => IntegerType
        case (64, true) => LongType
        // unsigned widens (64-bit unsigned → long, may overflow: documented)
        case (8, false) => ShortType
        case (16, false) => IntegerType
        case (32, false) => LongType
        case (64, false) => LongType
        case other => throw new UnsupportedOperationException(s"arrow int $other")
      }
    case f: ArrowType.FloatingPoint => f.getPrecision match {
      case FloatingPointPrecision.SINGLE => FloatType
      // half floats widen losslessly to float on read (reference
      // type.h:367 HalfFloatType; the JVM has no 16-bit float type);
      // the write side still maps FloatType → SINGLE, never HALF
      case FloatingPointPrecision.HALF => FloatType
      case FloatingPointPrecision.DOUBLE => DoubleType
      case p => throw new UnsupportedOperationException(s"arrow fp $p")
    }
    case _: ArrowType.Utf8 => StringType
    case _: ArrowType.LargeUtf8 => StringType
    case _: ArrowType.Binary => BinaryType
    case _: ArrowType.LargeBinary => BinaryType
    case _: ArrowType.FixedSizeBinary => BinaryType
    case d: ArrowType.Decimal => DecimalType(d.getPrecision, d.getScale)
    case d: ArrowType.Date if d.getUnit == DateUnit.DAY => DateType
    case d: ArrowType.Date if d.getUnit == DateUnit.MILLISECOND => DateType
    // time32 (sec/ms) and time64 (µs/ns) all surface as TIME(6):
    // vectors are widened to nano on load with sub-micro digits
    // truncated — the same µs convention the events table uses
    case t: ArrowType.Time => TimeType(TimeType.MICROS_PRECISION)
    case ts: ArrowType.Timestamp =>
      if (ts.getTimezone == null) TimestampNTZType else TimestampType
    case iv: ArrowType.Interval => iv.getUnit match {
      case IntervalUnit.YEAR_MONTH => YearMonthIntervalType()
      // day_time (days+ms) loses nothing in µs; vectors are widened
      // to µs-unit duration on load (ArrowIo.widen)
      case IntervalUnit.DAY_TIME => DayTimeIntervalType()
      case IntervalUnit.MONTH_DAY_NANO => CalendarIntervalType
    }
    // all duration units surface as day-time interval; non-µs vectors
    // rescale on load (sub-µs digits of a nano duration truncate)
    case _: ArrowType.Duration => DayTimeIntervalType()
    case _: ArrowType.Null => NullType
    case other =>
      throw new UnsupportedOperationException(s"graft arrow: unsupported Arrow type $other")
  }

  def fromArrowField(f: Field): StructField = f.getType match {
    case _: ArrowType.Map =>
      val entries = f.getChildren.get(0)
      val key = fromArrowField(entries.getChildren.get(0))
      val value = fromArrowField(entries.getChildren.get(1))
      StructField(f.getName,
        MapType(key.dataType, value.dataType, value.nullable), f.isNullable)
    // list, large_list (i64 offsets) and fixed_size_list all read as
    // plain arrays; non-List vectors narrow/copy to ListVector on
    // load (ArrowIo.largeListToList / fslToList)
    case _: ArrowType.List | _: ArrowType.LargeList | _: ArrowType.FixedSizeList =>
      val elem = fromArrowField(f.getChildren.get(0))
      StructField(f.getName, ArrayType(elem.dataType, elem.nullable), f.isNullable)
    case _: ArrowType.Struct =>
      StructField(f.getName,
        StructType(f.getChildren.asScala.map(fromArrowField).toArray), f.isNullable)
    case _: ArrowType.Union =>
      // unions widen to a struct of their members: per row exactly the
      // active member is populated, every other child is null — so all
      // children are nullable regardless of their declared nullability
      val members = f.getChildren.asScala.map { c =>
        val m = fromArrowField(c); m.copy(nullable = true)
      }
      StructField(f.getName, StructType(members.toArray), nullable = true)
    case t => StructField(f.getName, fromArrowType(t), f.isNullable)
  }

  def fromArrowSchema(s: ArrowSchema): StructType =
    StructType(s.getFields.asScala.map(fromArrowField).toArray)
}
