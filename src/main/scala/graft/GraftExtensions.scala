package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{DotProduct, HyperplaneBucket, LshBandKeys, MinHashSignature, ShingleSet, SimHash64, TensorPack, TensorUnpack, UnitNorm}

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
      FunctionIdentifier("shingle_set"),
      info("shingle_set", "shingle_set(arr[, n]) - distinct word n-gram shingles of a token array"),
      (args: Seq[Expression]) => args match {
        case Seq(a) => ShingleSet(a, 3)
        case Seq(a, n) if n.foldable => n.eval() match {
          case i: java.lang.Number => ShingleSet(a, i.intValue())
          case other => throw new IllegalArgumentException(
            s"shingle_set: n must be an integer literal, got $other")
        }
        case _ => throw new IllegalArgumentException(
          "shingle_set(arr[, n]) — n must be a literal")
      }))
    ext.injectFunction((
      FunctionIdentifier("lsh_band_keys"),
      info("lsh_band_keys", "lsh_band_keys(sig, bands) - per-band bucket hashes of a minhash signature"),
      (args: Seq[Expression]) => args match {
        case Seq(a, n) if n.foldable => n.eval() match {
          case i: java.lang.Number => LshBandKeys(a, i.intValue())
          case other => throw new IllegalArgumentException(
            s"lsh_band_keys: bands must be an integer literal, got $other")
        }
        case _ => throw new IllegalArgumentException(
          "lsh_band_keys(sig, bands) — bands must be a literal")
      }))
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      info("dot_product", "dot_product(a, b) - double dot product of two float/double arrays"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => DotProduct(a, b)
        case _ => throw new IllegalArgumentException("dot_product(a, b)")
      }))
    ext.injectFunction((
      FunctionIdentifier("unit_norm"),
      info("unit_norm", "unit_norm(a) - unit-L2-normalized copy of a float array"),
      (args: Seq[Expression]) => args match {
        case Seq(a) => UnitNorm(a)
        case _ => throw new IllegalArgumentException("unit_norm(a)")
      }))
    ext.injectFunction((
      FunctionIdentifier("hyperplane_bucket"),
      info("hyperplane_bucket", "hyperplane_bucket(vec, planes[, seed]) - LSH sign-pattern bucket of a float array"),
      (args: Seq[Expression]) => {
        def lit(e: Expression, what: String): Int =
          if (e.foldable) e.eval() match {
            case i: java.lang.Number => i.intValue()
            case other => throw new IllegalArgumentException(
              s"hyperplane_bucket: $what must be an integer literal, got $other")
          } else throw new IllegalArgumentException(
            s"hyperplane_bucket: $what must be a literal")
        args match {
          case Seq(a, p) => HyperplaneBucket(a, lit(p, "planes"))
          case Seq(a, p, s) => HyperplaneBucket(a, lit(p, "planes"), lit(s, "seed"))
          case _ => throw new IllegalArgumentException(
            "hyperplane_bucket(vec, planes[, seed])")
        }
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
      info("tensor_unpack",
        "tensor_unpack(binary[, dtype]) - deserialize tensor binary " +
          "(dtype: float32|float64|int32|int64, default float32)"),
      (args: Seq[Expression]) => args match {
        case Seq(a) => TensorUnpack(a)
        case Seq(a, d) =>
          val dtype = d match {
            case org.apache.spark.sql.catalyst.expressions.Literal(s, _)
                if s != null => s.toString
            case _ => throw new IllegalArgumentException(
              "tensor_unpack dtype must be a string literal")
          }
          TensorUnpack(a, graft.functions.TensorCodec.elemOf(dtype))
        case _ => throw new IllegalArgumentException("tensor_unpack(b[, dtype])")
      }))
  }
}
