package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Symmetric absmax int8 vector quantization — the standard 4× (vs
  * float32) embedding compression a 100 TB vector corpus stores and
  * scans. Deterministic, RNG-free, codegen'd (one precompiled primitive
  * loop call per row — the same contract as [[BinaryVectorOp]]).
  *
  *   scale  = max_i |x_i| / 127        (0 for the zero/empty vector)
  *   code_i = clamp(floor(x_i / scale + 0.5), -127, 127)   (0 if scale=0)
  *
  * floor(x+0.5) is round-half-toward-+∞ — chosen over banker's/HALF_UP
  * because it is reproducible bit-for-bit across engines (the DuckDB
  * oracle uses the same floor formula; `round()` semantics differ
  * between engines exactly on .5 boundaries). Reconstruction error is
  * bounded per element by scale/2, which the spec asserts.
  *
  * Inputs must be FINITE: NaN/±Inf elements would quantize
  * engine-dependently (JVM NaN comparisons vs SQL NaN collation
  * disagree), so the kernel REJECTS them with an error naming the
  * offending element — gate upstream with `isnan`/`isinf` filters if
  * the source is untrusted. The check rides the existing absmax pass
  * (one comparison per element; NaN fails `v <= Double.MaxValue`,
  * +Inf fails it too, -Inf flips sign under abs).
  */
case class QuantizeInt8(child: Expression) extends UnaryExpression {
  import VectorExpressions._

  override def dataType: DataType = StructType(Seq(
    StructField("scale", DoubleType, nullable = false),
    StructField("codes", ArrayType(ByteType, containsNull = false), nullable = false)))
  override def checkInputDataTypes(): TypeCheckResult = checkVec(child.dataType, "child")
  @transient private lazy val cf = isFloatArray(child.dataType)

  def evalQuant(a: ArrayData): InternalRow = {
    val n = a.numElements()
    var amax = 0.0
    var i = 0
    while (i < n) {
      val v = math.abs(elemAt(a, i, cf))
      // NaN and ±Inf both fail v <= MaxValue (abs maps -Inf to +Inf)
      if (!(v <= Double.MaxValue)) throw new IllegalArgumentException(
        s"quantizeInt8: non-finite element ${elemAt(a, i, cf)} at index $i — " +
          "filter NaN/Inf upstream (quantization of non-finite values is engine-dependent)")
      if (v > amax) amax = v
      i += 1
    }
    val scale = amax / 127.0
    val codes = new Array[Byte](n)
    if (scale > 0) {
      i = 0
      while (i < n) {
        val q = math.floor(elemAt(a, i, cf) / scale + 0.5)
        codes(i) = math.max(-127.0, math.min(127.0, q)).toByte
        i += 1
      }
    }
    new GenericInternalRow(Array[Any](scale, UnsafeArrayData.fromPrimitiveArray(codes)))
  }

  override def nullSafeEval(v: Any): Any = evalQuant(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("quantizeInt8", this, classOf[QuantizeInt8].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = (${classOf[InternalRow].getName}) $ref.evalQuant($a);")
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** `(scale: double, codes: array<tinyint>) → array<double>`: the
  * dequantized vector (`code_i · scale`). Exact inverse of the stored
  * representation — reconstruction differs from the ORIGINAL vector by
  * at most scale/2 per element.
  */
case class DequantizeInt8(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    // containsNull = false required: evalDequant's getByte cannot
    // represent a null element (and QuantizeInt8 never produces one)
    case StructType(Array(StructField(_, DoubleType, _, _), StructField(_, ArrayType(ByteType, false), _, _))) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"expected struct<scale: double, codes: array<tinyint> (no nulls)>, got ${other.simpleString(10)}")
  }

  def evalDequant(r: InternalRow): ArrayData = {
    val scale = r.getDouble(0)
    val codes = r.getArray(1)
    val n = codes.numElements()
    val out = new Array[Double](n)
    var i = 0
    while (i < n) { out(i) = codes.getByte(i) * scale; i += 1 }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override def nullSafeEval(v: Any): Any = evalDequant(v.asInstanceOf[InternalRow])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dequantizeInt8", this, classOf[DequantizeInt8].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = (${classOf[ArrayData].getName}) $ref.evalDequant($a);")
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}
