package graft.sources.feather

import org.scalacheck.{Gen, Prop, Test => SchkTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property coverage for the hand-rolled feather v1 flatbuffer codec
  * (encodeMetadata/decodeMetadata must be inverse for every legal
  * CTable — the wire format another implementation's reader sees).
  */
class FeatherMetaPropSpec extends AnyFunSuite {

  private val genArray: Gen[FeatherV1.FArray] = for {
    tpe <- Gen.choose(0, 12)
    offset <- Gen.choose(8L, 1L << 40)
    length <- Gen.choose(0L, 1L << 32)
    nullCount <- Gen.choose(0L, length)
    totalBytes <- Gen.choose(0L, 1L << 41)
  } yield FeatherV1.FArray(tpe, offset, length, nullCount, totalBytes)

  private val genColumn: Gen[FeatherV1.FColumn] = for {
    name <- Gen.alphaNumStr.suchThat(_.nonEmpty).map(_.take(40))
    values <- genArray
    metaType <- Gen.oneOf(
      FeatherV1.M.NONE, FeatherV1.M.CATEGORY, FeatherV1.M.TIMESTAMP,
      FeatherV1.M.DATE, FeatherV1.M.TIME)
    tsUnit <- Gen.choose(0, 3)
    tz <- Gen.option(Gen.oneOf("UTC", "America/New_York", "+09:00"))
    timeUnit <- Gen.choose(0, 3)
    levels <- genArray
  } yield FeatherV1.FColumn(name,
    values.copy(tpe = if (metaType == FeatherV1.M.CATEGORY) 3 else values.tpe),
    metaType,
    if (metaType == FeatherV1.M.TIMESTAMP) tsUnit else 0,
    if (metaType == FeatherV1.M.TIMESTAMP) tz else None,
    if (metaType == FeatherV1.M.TIME) timeUnit else 0,
    if (metaType == FeatherV1.M.CATEGORY) Some(levels.copy(tpe = 11)) else None)

  private val genTable: Gen[FeatherV1.FTable] = for {
    numRows <- Gen.choose(0L, 1L << 40)
    cols <- Gen.listOfN(5, genColumn).map(_.take(5))
    n <- Gen.choose(1, 5)
  } yield FeatherV1.FTable(numRows, cols.take(n))

  test("encodeMetadata/decodeMetadata are inverse on arbitrary tables") {
    val prop = Prop.forAll(genTable) { t =>
      FeatherV1.decodeMetadata(FeatherV1.encodeMetadata(t)) == t
    }
    val result = SchkTest.check(
      SchkTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(result.passed, result.status.toString)
  }
}
