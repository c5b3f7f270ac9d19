package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.{TensorPack, TensorUnpack}

/** Tensor columns (reference: cpp/src/arrow/tensor.h + format/Tensor.fbs).
  *
  * A dense row-major tensor is a struct<shape:array<int>,
  * data:array<float>> column — the same (shape, contiguous buffer)
  * model the reference serializes. Elementwise ops are
  * `zip_with`/`transform`/`aggregate` over the data array: pure
  * codegen'd column expressions that scale as a narrow map. IPC
  * (WriteTensor/ReadTensor analog) is the TensorPack/TensorUnpack
  * Catalyst expressions.
  */
object Tensor {

  val tensorType: StructType = StructType(Seq(
    StructField("shape", ArrayType(IntegerType, containsNull = false)),
    StructField("data", ArrayType(FloatType, containsNull = false))))

  /** Build a tensor column from a shape and a flat data array. */
  def tensor(shape: Column, data: Column): Column =
    struct(shape.as("shape"), data.as("data"))

  def numElements(t: Column): Column =
    aggregate(t.getField("shape"), lit(1), (acc, d) => acc * d)

  /** Elementwise binary op on equal-shape tensors. */
  def zipElementwise(a: Column, b: Column, f: (Column, Column) => Column): Column =
    tensor(a.getField("shape"),
      zip_with(a.getField("data"), b.getField("data"),
        (x, y) => f(x, y).cast(FloatType)))

  def add(a: Column, b: Column): Column = zipElementwise(a, b, _ + _)
  def mul(a: Column, b: Column): Column = zipElementwise(a, b, _ * _)

  def scale(t: Column, k: Column): Column =
    tensor(t.getField("shape"),
      transform(t.getField("data"), x => (x * k).cast(FloatType)))

  def sumAll(t: Column): Column =
    aggregate(t.getField("data"), lit(0.0), (acc, x) => acc + x)

  /** Serialize to the self-describing little-endian binary layout. */
  def pack(t: Column): Column = graft.functions.exprs.toColumn(TensorPack(graft.functions.exprs.toExpr(t)))

  /** Deserialize pack()'s output back into a tensor struct. */
  def unpack(bin: Column): Column = graft.functions.exprs.toColumn(TensorUnpack(graft.functions.exprs.toExpr(bin)))

  /** Deserialize a tensor of the given element type (float32 default;
    * float64/int32/int64 per the reference's type-parameterized Tensor).
    */
  def unpack(bin: Column, elem: org.apache.spark.sql.types.DataType): Column =
    graft.functions.exprs.toColumn(
      TensorUnpack(graft.functions.exprs.toExpr(bin), elem))
}
