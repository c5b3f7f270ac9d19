package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{MinHashSignature, SimHash64, TensorPack, TensorUnpack}

/** SparkSessionExtensions installer: exposes graft's native
  * expressions to SQL. Activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `withExtensions(new GraftExtensions)` — after which
  * `SELECT minhash_sig(shingles, 64)`, `simhash64(tokens)`,
  * `tensor_pack(t)`, `tensor_unpack(b)` work from plain SQL.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => graft.plans.CodecElimination)
    ext.injectFunction((
      FunctionIdentifier("minhash_sig"),
      info("minhash_sig", "minhash_sig(arr[, numPerm]) - minhash signature of a string array"),
      (args: Seq[Expression]) => args match {
        case Seq(a) => MinHashSignature(a, 64)
        case Seq(a, n) if n.foldable => n.eval() match {
          case i: java.lang.Number => MinHashSignature(a, i.intValue())
          case other => throw new IllegalArgumentException(
            s"minhash_sig: numPerm must be an integer literal, got $other")
        }
        case _ => throw new IllegalArgumentException(
          "minhash_sig(arr[, numPerm]) — numPerm must be a literal")
      }))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(arr) - 64-bit simhash of a string array"),
      (args: Seq[Expression]) => args match {
        case Seq(a) => SimHash64(a)
        case _ => throw new IllegalArgumentException("simhash64(arr)")
      }))
    ext.injectFunction((
      FunctionIdentifier("tensor_pack"),
      info("tensor_pack", "tensor_pack(struct<shape,data>) - serialize tensor to binary"),
      (args: Seq[Expression]) => args match {
        case Seq(a) => TensorPack(a)
        case _ => throw new IllegalArgumentException("tensor_pack(t)")
      }))
    ext.injectFunction((
      FunctionIdentifier("tensor_unpack"),
      info("tensor_unpack", "tensor_unpack(binary) - deserialize tensor binary"),
      (args: Seq[Expression]) => args match {
        case Seq(a) => TensorUnpack(a)
        case _ => throw new IllegalArgumentException("tensor_unpack(b)")
      }))
  }
}
