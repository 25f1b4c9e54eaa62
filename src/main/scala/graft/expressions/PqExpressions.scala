package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the product-quantization (PQ) hot
  * path — encode, per-query ADC table build, and ADC scoring. These are
  * exactly the per-row kernels PQ exists to make cheap (a scan over the
  * compressed corpus), so they must not box: the previous Scala-UDF
  * formulation allocated `Seq[Double]`/`Seq[Int]` per row on every scan.
  * Like [[BinaryVectorOp]]/[[HyperplaneLsh]], each participates in
  * whole-stage codegen — the generated code makes one call per row into a
  * precompiled primitive loop over `ArrayData`, and array results are
  * `UnsafeArrayData.fromPrimitiveArray` (no element boxing).
  *
  * The codebook (`centroids(j)(c)` = centroid c of subspace j) is a
  * driver-held m×k×dsub array riding the expression instance into the
  * serialized plan — tens of KB, same shipping model as a broadcast UDF
  * closure but without its per-row conversion tax.
  */
object PqExpressions {

  /** ADC score: m table lookups over the codes — static so generated code
    * links it directly (Scala object methods surface as Java static
    * forwarders).
    */
  def adcScore(codes: ArrayData, tab: ArrayData, k: Int): Double = {
    val m = codes.numElements()
    // Codes from a mismatched PqModel (wrong m or k) would otherwise index
    // past the table and silently read garbage off-heap (ADVICE r5).
    if (tab.numElements() != m * k)
      throw new IllegalArgumentException(
        s"ADC table has ${tab.numElements()} entries but codes imply m*k = ${m * k}" +
          " — codes and table come from different PQ models")
    var s = 0.0
    var j = 0
    while (j < m) { s += tab.getDouble(j * k + codes.getInt(j)); j += 1 }
    s
  }
}

/** Shared plumbing for the two codebook-carrying unary kernels.
  *
  * The codebook is validated at construction (non-empty and rectangular)
  * so a malformed model fails at plan-build time, not mid-scan; and since
  * Java array equality is reference-based, both kernels override
  * `equals`/`hashCode` with deep content comparison so Catalyst
  * canonicalization / common-subexpression elimination recognizes two
  * plans carrying semantically identical codebooks (ADVICE r5).
  */
abstract class PqCodebookExpression extends UnaryExpression {
  def centroids: Array[Array[Array[Double]]]

  /** Called from each concrete subclass body (not here: the superclass
    * constructor runs before the subclass's `centroids` field is assigned).
    */
  protected final def validateCodebook(): Unit = {
    require(
      centroids.nonEmpty && centroids(0).nonEmpty && centroids(0)(0).nonEmpty,
      "PQ codebook must be non-empty (m, k, dsub all >= 1)")
    require(
      centroids.forall(sub => sub.length == centroids(0).length &&
        sub.forall(_.length == centroids(0)(0).length)),
      "PQ codebook must be rectangular: every subspace needs the same k and dsub")
  }

  protected final def m: Int = centroids.length
  protected final def k: Int = centroids(0).length
  protected final def dsub: Int = centroids(0)(0).length

  protected final def deepCentroidsEqual(other: Array[Array[Array[Double]]]): Boolean =
    java.util.Arrays.deepEquals(
      centroids.asInstanceOf[Array[AnyRef]], other.asInstanceOf[Array[AnyRef]])
  protected final def centroidsHash: Int =
    java.util.Arrays.deepHashCode(centroids.asInstanceOf[Array[AnyRef]])

  override def checkInputDataTypes(): TypeCheckResult =
    VectorExpressions.checkVec(child.dataType, "child")
  @transient protected lazy val cf = VectorExpressions.isFloatArray(child.dataType)
}

/** `vec → array<int>` of m codes: nearest codebook centroid per subspace
  * (squared-L2, ties to the lowest code — matches the trainer and the
  * interpreted path bit-for-bit).
  */
case class PqEncode(child: Expression, centroids: Array[Array[Array[Double]]])
    extends PqCodebookExpression {
  validateCodebook()

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  def evalCodes(a: ArrayData): ArrayData = {
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      val cents = centroids(j)
      val off = j * dsub
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < cents.length) {
        val cent = cents(c)
        var s = 0.0
        var t = 0
        while (t < cent.length) {
          val d = VectorExpressions.elemAt(a, off + t, cf) - cent(t)
          s += d * d
          t += 1
        }
        if (s < bestD) { bestD = s; best = c }
        c += 1
      }
      codes(j) = best
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(codes)
  }

  override def nullSafeEval(v: Any): Any = evalCodes(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqEncode", this, classOf[PqEncode].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = (${classOf[ArrayData].getName}) $ref.evalCodes($a);")
  }

  override def equals(o: Any): Boolean = o match {
    case that: PqEncode => (that eq this) || (that.child == child && deepCentroidsEqual(that.centroids))
    case _              => false
  }
  override def hashCode(): Int = 31 * child.hashCode() + centroidsHash

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** `qvec → array<double>` of m·k asymmetric distances: entry `j·k + c` is
  * the squared-L2 distance from the query's j-th subvector to centroid c
  * of subspace j. Built once per query row; scoring a corpus vector is
  * then [[PqExpressions.adcScore]] — no float loop over d dims.
  */
case class PqAdcTable(child: Expression, centroids: Array[Array[Array[Double]]])
    extends PqCodebookExpression {
  validateCodebook()

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  def evalTable(a: ArrayData): ArrayData = {
    val tab = new Array[Double](m * k)
    var j = 0
    while (j < m) {
      val cents = centroids(j)
      val off = j * dsub
      var c = 0
      while (c < cents.length) {
        val cent = cents(c)
        var s = 0.0
        var t = 0
        while (t < cent.length) {
          val d = VectorExpressions.elemAt(a, off + t, cf) - cent(t)
          s += d * d
          t += 1
        }
        tab(j * k + c) = s
        c += 1
      }
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(tab)
  }

  override def nullSafeEval(v: Any): Any = evalTable(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqAdcTable", this, classOf[PqAdcTable].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = (${classOf[ArrayData].getName}) $ref.evalTable($a);")
  }

  override def equals(o: Any): Boolean = o match {
    case that: PqAdcTable => (that eq this) || (that.child == child && deepCentroidsEqual(that.centroids))
    case _                => false
  }
  override def hashCode(): Int = 31 * child.hashCode() + centroidsHash

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** `(codes: array<int>, table: array<double>) → double` ADC score: m table
  * lookups (`Σ_j table[j·k + codes[j]]`). `k` folds into the generated
  * code as a literal — the per-row work is the lookup loop alone.
  */
case class PqAdc(left: Expression, right: Expression, k: Int) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(IntegerType, _), ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) =>
      TypeCheckResult.TypeCheckFailure(
        s"expected (array<int>, array<double>), got (${l.simpleString(10)}, ${r.simpleString(10)})")
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    PqExpressions.adcScore(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (codes, tab) =>
      s"${ev.value} = graft.expressions.PqExpressions.adcScore($codes, $tab, $k);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}
