package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Dot product of two numeric arrays (float or double elements), accumulated
  * in double, element order left-to-right — bit-identical to the previous
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` formulation and to DuckDB's
  * `list_dot_product` over `DOUBLE[]`, including null propagation (any null
  * element nulls the result).
  *
  * A native Catalyst expression with `doGenCode` — the (b) tier of the
  * custom-operator preference order: Spark's higher-order array functions
  * evaluate interpreted (measured 24× slower than a compiled loop on the
  * shingle pipeline), and the ANN queries run millions of dot products per
  * partition, so this loop belongs inside whole-stage codegen. Accepting
  * float arrays directly also removes the per-element cast pass the HOF
  * version needed.
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  // Null ELEMENTS null the result even when both array inputs are
  // non-nullable, so the default (left.nullable || right.nullable) would
  // lie to the planner — and make nullSafeCodeGen emit an assignment to a
  // constant-false isNull.
  override def nullable: Boolean = true

  private def elemType(dt: DataType): Option[DataType] = dt match {
    case ArrayType(FloatType, _) => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elemType(left.dataType), elemType(right.dataType)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"dot_product requires array<float|double> inputs, got " +
          s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }

  @inline private def get(a: ArrayData, i: Int, t: DataType): Double =
    if (t == FloatType) a.getFloat(i).toDouble else a.getDouble(i)

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val (ta, tb) = (elemType(left.dataType).get, elemType(right.dataType).get)
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += get(a, i, ta) * get(b, i, tb)
      i += 1
    }
    java.lang.Double.valueOf(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      def getter(arr: String, t: DataType): String =
        if (t == FloatType) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
      val ga = getter(a, elemType(left.dataType).get)
      val gb = getter(b, elemType(right.dataType).get)
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; $s = 0.0; break; }
         |  $s += $ga * $gb;
         |}
         |${ev.value} = $s;
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "dot_product"
}

/** Shared shape of the SRP (signed-random-projection) expressions: one pass
  * over a vector computing its dot product against EVERY hyperplane of a
  * fixed family (`weights`, flattened planes×dim, shipped once via the
  * codegen reference table — not as per-plane literals, which at 680 planes
  * overflow Janino's constant pool / method limits and knock the whole
  * stage out of codegen).
  *
  * Null semantics mirror [[DotProduct]]: any null ELEMENT nulls the result.
  */
abstract class SrpExpression extends UnaryExpression {
  def weights: Array[Double]
  def dim: Int
  protected def planes: Int = weights.length / dim

  override def nullable: Boolean = true

  protected def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> input, got ${other.catalogString}")
  }

  @inline protected final def elem(a: ArrayData, i: Int): Double =
    if (elemIsFloat) a.getFloat(i).toDouble else a.getDouble(i)

  /** Per-plane projections, or null if any element is null. */
  protected final def projectAll(a: ArrayData): Array[Double] = {
    val n = math.min(dim, a.numElements())
    var i = 0
    while (i < n) { if (a.isNullAt(i)) return null; i += 1 }
    val out = new Array[Double](planes)
    var p = 0
    while (p < planes) {
      var s = 0.0
      var j = 0
      val base = p * dim
      while (j < n) { s += weights(base + j) * elem(a, j); j += 1 }
      out(p) = s
      p += 1
    }
    out
  }

  /** Codegen prelude: null-element scan + projection loop filling `projVar`
    * (a fresh double[] of size `planes`); returns the code and the var name.
    */
  protected final def projectionCode(
      ctx: CodegenContext, ev: ExprCode, a: String): (String, String) = {
    val w = ctx.addReferenceObj("srpWeights", weights, "double[]")
    val n = ctx.freshName("n")
    val i = ctx.freshName("i")
    val p = ctx.freshName("p")
    val j = ctx.freshName("j")
    val base = ctx.freshName("base")
    val s = ctx.freshName("s")
    val proj = ctx.freshName("proj")
    val getter = if (elemIsFloat) s"(double) $a.getFloat($j)" else s"$a.getDouble($j)"
    val code =
      s"""
         |int $n = java.lang.Math.min($dim, $a.numElements());
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |}
         |double[] $proj = null;
         |if (!${ev.isNull}) {
         |  $proj = new double[$planes];
         |  for (int $p = 0; $p < $planes; $p++) {
         |    double $s = 0.0;
         |    int $base = $p * $dim;
         |    for (int $j = 0; $j < $n; $j++) { $s += $w[$base + $j] * $getter; }
         |    $proj[$p] = $s;
         |  }
         |}
         |""".stripMargin
    (code, proj)
  }
}

/** All SRP band buckets of a vector in ONE pass: projection onto
  * `bands`×`bandBits` hyperplanes, sign bit j of band b set when plane
  * b·bandBits+j projects non-negatively. Returns array<long> of length
  * `bands` — the corpus side of the LSH index ([[graft.operators.AnnQueries]]).
  */
case class SrpBuckets(child: Expression, weights: Array[Double], dim: Int,
    bands: Int, bandBits: Int) extends SrpExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private def fold(proj: Array[Double]): Array[Long] = {
    val bk = new Array[Long](bands)
    var p = 0
    while (p < planes) {
      if (proj(p) >= 0) bk(p / bandBits) |= 1L << (p % bandBits)
      p += 1
    }
    bk
  }

  override def nullSafeEval(input: Any): Any = {
    val proj = projectAll(input.asInstanceOf[ArrayData])
    if (proj == null) null
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(fold(proj))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val (projCode, proj) = projectionCode(ctx, ev, a)
      val bk = ctx.freshName("bk")
      val p = ctx.freshName("p")
      s"""
         |$projCode
         |if (!${ev.isNull}) {
         |  long[] $bk = new long[$bands];
         |  for (int $p = 0; $p < $planes; $p++) {
         |    if ($proj[$p] >= 0) $bk[$p / $bandBits] |= 1L << ($p % $bandBits);
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($bk);
         |}
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SrpBuckets =
    copy(child = newChild)
  override def prettyName: String = "srp_buckets"
}

/** All SRP plane projections of a vector (array<double>, length
  * planes) — the query side of multi-probe LSH, which needs projection
  * MAGNITUDES to pick the least-confident bits, not just their signs.
  */
case class SrpProjections(child: Expression, weights: Array[Double], dim: Int)
  extends SrpExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val proj = projectAll(input.asInstanceOf[ArrayData])
    if (proj == null) null
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(proj)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val (projCode, proj) = projectionCode(ctx, ev, a)
      s"""
         |$projCode
         |if (!${ev.isNull}) {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($proj);
         |}
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SrpProjections =
    copy(child = newChild)
  override def prettyName: String = "srp_projections"
}

/** A double constant carried through the codegen REFERENCE table instead
  * of the generated source text. A plain `Literal(1.234)` bakes its value
  * into the generated Java, so two otherwise-identical plans differing
  * only in such a scalar produce different source and miss the codegen
  * cache — the k-means training loop re-Janino-compiled a fresh
  * literal-centroid plan EVERY Lloyd iteration for exactly this reason
  * (the centroid ARRAYS already ride the reference table; only their
  * scalar norms were source-baked). Deliberately non-foldable: constant
  * folding would collapse it right back into a source-baked literal.
  * Value semantics are exactly `lit(value)` — same double, same ops.
  */
case class RefDouble(value: Double) extends
    org.apache.spark.sql.catalyst.expressions.LeafExpression {
  override def foldable: Boolean = false // folding would re-bake the source
  override def nullable: Boolean = false
  override def dataType: DataType = DoubleType
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = value
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("refDouble",
      java.lang.Double.valueOf(value), "java.lang.Double")
    ExprCode.forNonNullValue(
      org.apache.spark.sql.catalyst.expressions.codegen.JavaCode
        .expression(s"$ref.doubleValue()", DoubleType))
  }
}

object VectorOps {
  /** Column API: codegen'd dot product of two array<float|double> columns. */
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Column API: a double constant that keeps generated source stable
    * across plans differing only in the constant — see [[RefDouble]].
    */
  def refDouble(v: Double): Column = ColumnBridge.column(RefDouble(v))

  /** Column API: all LSH band buckets of a vector in one codegen'd pass. */
  def srpBuckets(v: Column, weights: Array[Double], dim: Int,
      bands: Int, bandBits: Int): Column =
    ColumnBridge.column(SrpBuckets(ColumnBridge.expression(v), weights, dim, bands, bandBits))

  /** Column API: all SRP plane projections of a vector. */
  def srpProjections(v: Column, weights: Array[Double], dim: Int): Column =
    ColumnBridge.column(SrpProjections(ColumnBridge.expression(v), weights, dim))
}
