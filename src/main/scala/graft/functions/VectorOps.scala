package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Vector kernels for the similarity-search operators (SURVEY §2.G).
  *
  * The composed form (`zip_with` + `aggregate`) is correct but the
  * higher-order functions evaluate a lambda per element outside
  * whole-stage codegen; at corpus × query (or corpus × centroid)
  * volume that interpretation overhead IS the job. These expressions
  * run the loop as one static call and keep the surrounding
  * projection inside codegen.
  *
  * Reference semantics: cosine over float embedding columns, double
  * accumulation (matches the reference's double-precision kernels,
  * cpp/src/arrow/compare.cc-style elementwise loops).
  */
object VectorRuntime {

  /** Double dot product; float or double element arrays. Callers
    * guarantee equal lengths (DotProduct returns null otherwise —
    * matching the zip_with/aggregate form it replaced, which
    * null-padded ragged pairs into a null result).
    */
  def dotF(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    acc
  }

  def dotD(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    acc
  }

  /** Euclidean distance, sequential accumulation of squared diffs in
    * element order — the same association DuckDB's `list_distance`
    * uses, so the oracle ranks identically.
    */
  def l2F(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = a.getFloat(i).toDouble - b.getFloat(i).toDouble
      acc += d * d
      i += 1
    }
    math.sqrt(acc)
  }

  def l2D(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = a.getDouble(i) - b.getDouble(i)
      acc += d * d
      i += 1
    }
    math.sqrt(acc)
  }

  /** Unit-normalize to a double array; zero-norm input → zero vector
    * (cosine against it is then 0, never NaN).
    */
  def unitNormF(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val out = new Array[Double](n)
    var ss = 0.0
    var i = 0
    while (i < n) { val v = a.getFloat(i).toDouble; out(i) = v; ss += v * v; i += 1 }
    if (ss > 0) {
      val inv = 1.0 / math.sqrt(ss)
      i = 0
      while (i < n) { out(i) *= inv; i += 1 }
    }
    new GenericArrayData(out)
  }

  /** Nearest product-quantization code for subspace `m` of `vec`
    * (slice [m·sub, (m+1)·sub), sub = code width of book m): argmin
    * squared L2 distance, first wins ties. Reads the slice in place —
    * no per-subspace array allocation.
    */
  def nearestPqCode(vec: ArrayData, m: Int, books: Array[Array[Array[Double]]]): Int = {
    val book = books(m)
    val sub = book(0).length
    val off = m * sub
    var best = -1
    var bestDist = Double.PositiveInfinity
    var c = 0
    while (c < book.length) {
      val code = book(c)
      var d = 0.0
      var i = 0
      while (i < sub) {
        val diff = vec.getFloat(off + i).toDouble - code(i)
        d += diff * diff
        i += 1
      }
      if (d < bestDist) { bestDist = d; best = c }
      c += 1
    }
    best
  }

  /** All M subspace codes of `vec` (PQ encoding). */
  def pqCodes(vec: ArrayData, books: Array[Array[Array[Double]]]): ArrayData = {
    val out = new Array[Int](books.length)
    var m = 0
    while (m < books.length) { out(m) = nearestPqCode(vec, m, books); m += 1 }
    new GenericArrayData(out)
  }

  /** Per-query ADC lookup table, flattened [m·ncodes + c]: the dot
    * product of query subspace m against code c of book m. One table
    * per query row; every corpus score is then M adds off this table.
    */
  def pqLut(q: ArrayData, books: Array[Array[Array[Double]]]): ArrayData = {
    val m = books.length
    val ncodes = books(0).length
    val out = new Array[Double](m * ncodes)
    var s = 0
    while (s < m) {
      val book = books(s)
      val sub = book(0).length
      val off = s * sub
      var c = 0
      while (c < ncodes) {
        val code = book(c)
        var acc = 0.0
        var i = 0
        while (i < sub) { acc += q.getFloat(off + i).toDouble * code(i); i += 1 }
        out(s * ncodes + c) = acc
        c += 1
      }
      s += 1
    }
    new GenericArrayData(out)
  }

  /** Asymmetric-distance sum: Σ_m lut[m·ncodes + codes[m]]. With a
    * dot-product LUT this approximates <q, x>; with a squared-norm LUT
    * it reconstructs ‖x‖². ncodes is inferred from the table length.
    * Degenerate shapes (no codes, lut not a multiple, code outside the
    * table) return null — pq_adc is SQL-reachable with arbitrary
    * arrays, and a silent truncation or an index crash would be worse.
    */
  def pqAdc(codes: ArrayData, lut: ArrayData): java.lang.Double = {
    val m = codes.numElements()
    if (m == 0 || lut.numElements() % m != 0) return null
    val ncodes = lut.numElements() / m
    var acc = 0.0
    var s = 0
    while (s < m) {
      val c = codes.getInt(s)
      if (c < 0 || c >= ncodes) return null
      acc += lut.getDouble(s * ncodes + c)
      s += 1
    }
    java.lang.Double.valueOf(acc)
  }

  /** Index of the centroid (row of `cents`) with the largest dot
    * product against `vec`; first wins ties (callers pass centroids
    * sorted by cent_id, matching ORDER BY score DESC, cent_id).
    * For unit centroids argmax dot == argmax cosine: |vec| is a
    * per-row constant.
    */
  def nearestCentroid(vec: ArrayData, cents: Array[Array[Double]]): Int = {
    val dim = vec.numElements()
    var best = -1
    var bestScore = Double.NegativeInfinity
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)
      val n = math.min(dim, cent.length)
      var acc = 0.0
      var i = 0
      while (i < n) { acc += vec.getFloat(i).toDouble * cent(i); i += 1 }
      if (acc > bestScore) { bestScore = acc; best = c }
      c += 1
    }
    best
  }
}

/** r15 A/B switch (VERDICT r14 item 4): when -Dgraft.vec.split=true,
  * DotProduct/L2Distance emit their loop as a SMALL PRIVATE METHOD of
  * the generated class (ctx.addNewFunction) instead of inline in the
  * fused join method. Rationale: the r12 inline emission made escape
  * analysis local, but it ties the multiply-accumulate's compiled
  * quality to the ENCLOSING method's compilation fate — a fused join
  * method large enough to degrade C2's treatment leaves the loop at
  * C1/interpreter quality for the whole launch (the surviving
  * 1.98–3.28 s cross-launch spread, EMBED_BIMODAL_r14). With the loop
  * in a ~70-bytecode same-class method, C2 compiles it on its own
  * profile regardless of caller size, and a compiled caller inlines it
  * back (far under FreqInlineSize) to exactly the r12 shape.
  * Accumulation order is identical in every path — bit-identity
  * pinned by SimilaritySpec.
  *
  * MEASURED NEGATIVE (EMBED_BIMODAL_r15): the split emission lost all
  * 5 interleaved paired launches (median-of-medians 3.39 vs 2.79 s,
  * floor 3.36 vs 2.43) and AMPLIFIED the bad-launch tail — behind a
  * call boundary the caller-allocated UnsafeArrayData wrappers only
  * scalar-replace if C2 inlines the callee into the caller, so
  * exactly the degraded launches this lever hoped to rescue pay
  * escaping-wrapper allocation instead. Inline emission (default)
  * stands as the optimum; the flag remains as the reproducible A/B.
  */
private[functions] object VecCodegen {
  def splitEnabled: Boolean = java.lang.Boolean.getBoolean("graft.vec.split")
}

/** dot_product(array<float|double>, array<float|double>) → double.
  * Both children must share the element type.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) => TypeCheckResult.TypeCheckSuccess
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<float> or two array<double>, got $l / $r")
    }
  override def dataType: DataType = DoubleType
  // ragged pairs yield null regardless of child nullability
  override def nullable: Boolean = true
  override def prettyName: String = "dot_product"

  private def getter: String = left.dataType match {
    case ArrayType(FloatType, _) => "getFloat"
    case _ => "getDouble"
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    // mismatched dimensions → null, like the zip_with null-padding
    // this kernel replaced: a silent prefix dot product would let a
    // corrupt embedding rank with a plausible score
    if (x.numElements() != y.numElements()) null
    else left.dataType match {
      case ArrayType(FloatType, _) => VectorRuntime.dotF(x, y)
      case _ => VectorRuntime.dotD(x, y)
    }
  }

  // The loop is emitted INLINE in the generated code, not as a call
  // into VectorRuntime (r12): in the pair-join hot paths the child
  // gen-code allocates a per-pair UnsafeArrayData wrapper (getArray),
  // and whether that wrapper gets scalar-replaced depended on C2
  // choosing to inline the static kernel into the (huge) generated
  // join method — a decision that flipped with ANY unrelated
  // classfile change (the r11→r12 q_embed_neardup bimodality: an 8×
  // GC-count swing from escaping wrappers, bisected to a
  // semantically-inert method addition). With the loop in the same
  // generated method the wrapper never crosses a call boundary, so
  // escape analysis is local and layout-independent. The
  // concrete-typed UnsafeArrayData branch exists for the same
  // determinism reason: against the abstract ArrayData receiver the
  // element getter devirtualizes only if the site's captured type
  // profile is narrow — a per-launch race (same build measured 1.7 s
  // or 2.9 s depending on launch) — while against the concrete static
  // type CHA devirtualizes unconditionally. Accumulation order is
  // identical in every branch and to VectorRuntime.dotF/dotD
  // (bit-identical results; the interpreted path still uses them).
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val U = "org.apache.spark.sql.catalyst.expressions.UnsafeArrayData"
      if (VecCodegen.splitEnabled) {
        // split emission (r15 A/B — see VecCodegen): same loop, own
        // small method of the generated class
        val AD = "org.apache.spark.sql.catalyst.util.ArrayData"
        val name = ctx.freshName("dotLoop")
        val fn = ctx.addNewFunction(name,
          s"""
          private double $name($AD a, $AD b) {
            int n = a.numElements();
            double acc = 0.0;
            if (a instanceof $U && b instanceof $U) {
              $U ua = ($U) a;
              $U ub = ($U) b;
              for (int i = 0; i < n; i++) {
                acc += (double) ua.$getter(i) * (double) ub.$getter(i);
              }
            } else {
              for (int i = 0; i < n; i++) {
                acc += (double) a.$getter(i) * (double) b.$getter(i);
              }
            }
            return acc;
          }""")
        s"""
        if ($a.numElements() != $b.numElements()) {
          ${ev.isNull} = true;
        } else {
          ${ev.value} = $fn($a, $b);
        }"""
      } else {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val acc = ctx.freshName("acc")
        val ua = ctx.freshName("ua")
        val ub = ctx.freshName("ub")
        s"""
        if ($a.numElements() != $b.numElements()) {
          ${ev.isNull} = true;
        } else {
          int $n = $a.numElements();
          double $acc = 0.0;
          if ($a instanceof $U && $b instanceof $U) {
            $U $ua = ($U) $a;
            $U $ub = ($U) $b;
            for (int $i = 0; $i < $n; $i++) {
              $acc += (double) $ua.$getter($i) * (double) $ub.$getter($i);
            }
          } else {
            for (int $i = 0; $i < $n; $i++) {
              $acc += (double) $a.$getter($i) * (double) $b.$getter($i);
            }
          }
          ${ev.value} = $acc;
        }"""
      }
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** l2_distance(array<float|double>, array<float|double>) → double —
  * Euclidean distance, the metric twin of dot_product for L2-indexed
  * ANN (SURVEY §2.G8). Ragged pairs → null, like dot_product.
  */
case class L2Distance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) => TypeCheckResult.TypeCheckSuccess
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<float> or two array<double>, got $l / $r")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "l2_distance"

  private def getter: String = left.dataType match {
    case ArrayType(FloatType, _) => "getFloat"
    case _ => "getDouble"
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (x.numElements() != y.numElements()) null
    else left.dataType match {
      case ArrayType(FloatType, _) => VectorRuntime.l2F(x, y)
      case _ => VectorRuntime.l2D(x, y)
    }
  }

  // inline loop + concrete-typed fast branch for the same
  // escape-analysis/devirtualization determinism reasons as
  // DotProduct (see the comment there); same accumulation order as
  // VectorRuntime.l2F/l2D, so results stay bit-identical
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val U = "org.apache.spark.sql.catalyst.expressions.UnsafeArrayData"
      if (VecCodegen.splitEnabled) {
        // split emission (r15 A/B — see VecCodegen)
        val AD = "org.apache.spark.sql.catalyst.util.ArrayData"
        val name = ctx.freshName("l2Loop")
        val fn = ctx.addNewFunction(name,
          s"""
          private double $name($AD a, $AD b) {
            int n = a.numElements();
            double acc = 0.0;
            if (a instanceof $U && b instanceof $U) {
              $U ua = ($U) a;
              $U ub = ($U) b;
              for (int i = 0; i < n; i++) {
                double d = (double) ua.$getter(i) - (double) ub.$getter(i);
                acc += d * d;
              }
            } else {
              for (int i = 0; i < n; i++) {
                double d = (double) a.$getter(i) - (double) b.$getter(i);
                acc += d * d;
              }
            }
            return java.lang.Math.sqrt(acc);
          }""")
        s"""
        if ($a.numElements() != $b.numElements()) {
          ${ev.isNull} = true;
        } else {
          ${ev.value} = $fn($a, $b);
        }"""
      } else {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val acc = ctx.freshName("acc")
        val d = ctx.freshName("d")
        val ua = ctx.freshName("ua")
        val ub = ctx.freshName("ub")
        s"""
        if ($a.numElements() != $b.numElements()) {
          ${ev.isNull} = true;
        } else {
          int $n = $a.numElements();
          double $acc = 0.0;
          if ($a instanceof $U && $b instanceof $U) {
            $U $ua = ($U) $a;
            $U $ub = ($U) $b;
            for (int $i = 0; $i < $n; $i++) {
              double $d = (double) $ua.$getter($i) - (double) $ub.$getter($i);
              $acc += $d * $d;
            }
          } else {
            for (int $i = 0; $i < $n; $i++) {
              double $d = (double) $a.$getter($i) - (double) $b.$getter($i);
              $acc += $d * $d;
            }
          }
          ${ev.value} = java.lang.Math.sqrt($acc);
        }"""
      }
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2Distance =
    copy(left = newLeft, right = newRight)
}

/** unit_norm(array<float>) → array<double>: the vector scaled to unit
  * L2 norm (zero vector passes through). Normalizing once per row
  * turns every downstream cosine into a single dot product.
  */
case class UnitNorm(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got $other")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "unit_norm"

  override protected def nullSafeEval(input: Any): Any =
    VectorRuntime.unitNormF(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VectorRuntime.unitNormF($c)")

  override protected def withNewChildInternal(newChild: Expression): UnitNorm =
    copy(child = newChild)
}

/** nearest_centroid(array<float>) → int: position of the best-cosine
  * centroid in a driver-collected, unit-normalized centroid matrix
  * (bounded at k·dim doubles — the one sanctioned collect in the IVF
  * path, SURVEY §4). Replaces a broadcast-join + per-row window
  * argmax (a corpus×k materialization and a full shuffle) with a
  * map-only projection.
  */
case class NearestCentroid(child: Expression, cents: Seq[Seq[Double]])
    extends UnaryExpression {
  require(cents.nonEmpty, "centroid matrix must be non-empty")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got $other")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "nearest_centroid"

  @transient private lazy val matrix: Array[Array[Double]] =
    cents.map(_.toArray).toArray

  override protected def nullSafeEval(input: Any): Any =
    VectorRuntime.nearestCentroid(input.asInstanceOf[ArrayData], matrix)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("centMatrix", matrix, "double[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VectorRuntime.nearestCentroid($c, $m)")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

/** pq_encode(array<float>) → array<int>: the M product-quantization
  * codes of the vector against a driver-trained codebook set
  * (M × ncodes × sub doubles — bounded, the same sanctioned-collect
  * shape as NearestCentroid's matrix). Map-only projection; the
  * encoded corpus carries M ints per row instead of dim floats —
  * the memory/bandwidth win PQ exists for.
  */
case class PqEncode(child: Expression, books: Seq[Seq[Seq[Double]]])
    extends UnaryExpression {
  require(books.nonEmpty && books.forall(_.nonEmpty),
    "codebooks must be non-empty")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got $other")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  @transient private lazy val matrix: Array[Array[Array[Double]]] =
    books.map(_.map(_.toArray).toArray).toArray

  override protected def nullSafeEval(input: Any): Any =
    VectorRuntime.pqCodes(input.asInstanceOf[ArrayData], matrix)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("pqBooks", matrix, "double[][][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorRuntime.pqCodes($c, $m)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** pq_lut(array<float>) → array<double>: the query's flattened ADC
  * lookup table [m·ncodes + c] = <q_m, book[m][c]>. Computed once per
  * query row; scoring a corpus row is then M table adds (PqAdc)
  * instead of a dim-wide dot product.
  */
case class PqLut(child: Expression, books: Seq[Seq[Seq[Double]]])
    extends UnaryExpression {
  require(books.nonEmpty && books.forall(_.nonEmpty),
    "codebooks must be non-empty")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got $other")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pq_lut"

  @transient private lazy val matrix: Array[Array[Array[Double]]] =
    books.map(_.map(_.toArray).toArray).toArray

  override protected def nullSafeEval(input: Any): Any =
    VectorRuntime.pqLut(input.asInstanceOf[ArrayData], matrix)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("pqBooks", matrix, "double[][][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorRuntime.pqLut($c, $m)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqLut =
    copy(child = newChild)
}

/** pq_adc(array<int>, array<double>) → double: Σ_m lut[m·ncodes +
  * codes[m]] — the PQ asymmetric-distance accumulation, one static
  * loop inside codegen.
  */
case class PqAdc(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<int> codes and array<double> lut, got $l / $r")
    }
  override def dataType: DataType = DoubleType
  // degenerate shapes (empty codes, lut not a multiple of codes) yield
  // null rather than a task-killing ArithmeticException or a silently
  // truncated ncodes — pq_adc is SQL-reachable with arbitrary arrays
  override def nullable: Boolean = true
  override def prettyName: String = "pq_adc"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorRuntime.pqAdc(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // fresh local: several pq_adc calls can fuse into one codegen scope
      val r = ctx.freshName("pqAdcRes")
      s"""
      java.lang.Double $r = graft.functions.VectorRuntime.pqAdc($a, $b);
      if ($r == null) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = $r.doubleValue();
      }"""
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdc =
    copy(left = newLeft, right = newRight)
}
