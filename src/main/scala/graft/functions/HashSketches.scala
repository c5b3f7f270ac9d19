package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Hash-sketch expressions (SURVEY §2.F2/F3/G2 hot path).
  *
  * The composed form (explode shingles → 64 min/sum aggregates)
  * computes correct sketches but pays an explode + a shuffle per
  * document set. These expressions compute the whole sketch in one
  * narrow pass over the array — per-row, no shuffle, which is the
  * difference between a map stage and an exchange at 100 TB. They
  * codegen as a static call into SketchRuntime, so the surrounding
  * projection stays inside whole-stage codegen.
  *
  * Hashing: 64-bit FNV-1a over the token bytes, finalized with a
  * splitmix64 mix; per-permutation values derive from one content
  * hash via multiply-add (odd multiplier) — the standard one-hash
  * minhash construction.
  */
object Sketch {
  @inline final def mix64(zIn: Long): Long = {
    var z = zIn
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  final def contentHash(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h = (h ^ (bytes(i) & 0xffL)) * 0x100000001b3L
      i += 1
    }
    mix64(h)
  }

  /** Odd multiplier + offset for permutation p (derived, stateless). */
  @inline final def permA(p: Int): Long = mix64(0x9e3779b97f4a7c15L * (p + 1)) | 1L
  @inline final def permB(p: Int): Long = mix64(0x2545f4914f6cdd1dL * (p + 1))
}

/** minhash_sig(array<string>, numPerm) → array<long>: per-permutation
  * minima in a single pass. Null/empty arrays → null.
  */
case class MinHashSignature(child: Expression, numPerm: Int)
    extends UnaryExpression {
  require(numPerm > 0, s"numPerm must be positive, got $numPerm")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  // empty arrays yield null regardless of child nullability
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    if (arr.numElements() == 0) null
    else SketchRuntime.minhashSig(arr, numPerm)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      if ($c.numElements() == 0) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = graft.functions.SketchRuntime.minhashSig($c, $numPerm);
      }""")

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** hyperplane_bucket(array<float>, planes) → long: sign pattern of
  * `planes` pseudo-random hyperplane projections, packed into a long.
  * Plane weights derive deterministically from mix64(plane*8191+dim),
  * centered to [-0.5, 0.5). Replaces a planes×dim-term expression tree
  * (which Janino has to compile per query) with one tight loop.
  */
case class HyperplaneBucket(child: Expression, planes: Int, seed: Int = 0)
    extends UnaryExpression {
  require(planes >= 1 && planes <= 64,
    s"planes must be in [1, 64] (bits of the bucket key), got $planes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got $other")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_bucket"

  override protected def nullSafeEval(input: Any): Any =
    SketchRuntime.hyperplaneBucket(input.asInstanceOf[ArrayData], planes, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SketchRuntime.hyperplaneBucket($c, $planes, $seed)")

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBucket =
    copy(child = newChild)
}

/** shingle_set(array<string>, n) → array<string>: distinct space-
  * joined word n-grams in one pass (first-occurrence order); < n
  * tokens degrade to a single whole-text shingle. Replaces a
  * transform/slice/concat_ws/array_distinct subtree whose generated
  * code dominated cold plan-compile time in the dedup queries.
  */
case class ShingleSet(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got $other")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingle_set"

  override protected def nullSafeEval(input: Any): Any =
    SketchRuntime.shingleSet(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SketchRuntime.shingleSet($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShingleSet =
    copy(child = newChild)
}

/** lsh_band_keys(array<long>, bands) → array<long>: per-band bucket
  * hashes of a minhash signature (element b covers rows
  * [b·numPerm/bands, (b+1)·numPerm/bands)). Callers posexplode the
  * result: (pos, value) = (band, bucket key).
  */
case class LshBandKeys(child: Expression, bands: Int) extends UnaryExpression {
  require(bands >= 1, s"bands must be >= 1, got $bands")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<long>, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "lsh_band_keys"

  override protected def nullSafeEval(input: Any): Any =
    SketchRuntime.lshBandKeys(input.asInstanceOf[ArrayData], bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SketchRuntime.lshBandKeys($c, $bands)")

  override protected def withNewChildInternal(newChild: Expression): LshBandKeys =
    copy(child = newChild)
}

/** simhash64(array<string>) → long: sign of per-bit vote over token
  * hashes, one pass. Empty/null → null.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got $other")
  }
  override def dataType: DataType = LongType
  // empty arrays yield null regardless of child nullability
  override def nullable: Boolean = true
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    if (arr.numElements() == 0) null
    else SketchRuntime.simhash64(arr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      if ($c.numElements() == 0) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = graft.functions.SketchRuntime.simhash64($c);
      }""")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}
