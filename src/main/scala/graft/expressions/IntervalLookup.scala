package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, NumericType}

/** Index of the interval containing a point, by BINARY SEARCH over a
  * plan-embedded sorted boundary table — the O(log n) point-in-interval
  * lookup that replaces BroadcastNestedLoopJoin's O(n)-per-row scan for
  * joins against a small, non-overlapping interval dimension (time
  * buckets, price bands, ID ranges).
  *
  * `los`/`his` are the sorted, pairwise-disjoint interval bounds
  * ([lo, hi) semantics), captured at plan-build time (the dimension is
  * driver-resident by definition — it had to be known to build the
  * expression; the arrays ship to executors inside the serialized plan
  * like any literal). Returns the interval's index, or null when the
  * point falls in no interval (or is null) — so an inner join on the
  * result drops non-matching points exactly like the predicate join.
  */
case class IntervalLookup(child: Expression, los: Array[Double], his: Array[Double])
    extends UnaryExpression {
  require(los.length == his.length && los.nonEmpty, "empty interval table")
  require(
    los.indices.forall(i => los(i) < his(i)) &&
      (1 until los.length).forall(i => los(i) >= his(i - 1)),
    "intervals must be sorted and pairwise disjoint ([lo, hi))")

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    // DecimalType is numeric but Spark's Decimal is not a java.lang.Number
    // and `(double) p` does not compile in codegen — reject it at analysis
    // time; callers cast to double first (RangeJoin.broadcastIndexed does).
    case _: org.apache.spark.sql.types.DecimalType =>
      TypeCheckResult.TypeCheckFailure("decimal points are not supported: cast to double first")
    case _: NumericType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"expected numeric point, got ${other.simpleString(10)}")
  }

  override def nullSafeEval(v: Any): Any = {
    val p = child.dataType match {
      case DoubleType => v.asInstanceOf[Double]
      case _          => v.asInstanceOf[Number].doubleValue()
    }
    lookup(p)
  }

  /** Row kernel (also called from generated code): binary search for the
    * last interval with lo <= p, then containment check.
    */
  def lookup(p: Double): Any = {
    var lo = 0
    var hi = los.length - 1
    var found = -1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (los(mid) <= p) { found = mid; lo = mid + 1 }
      else hi = mid - 1
    }
    if (found >= 0 && p < his(found)) Integer.valueOf(found) else null
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("intervalLookup", this, classOf[IntervalLookup].getName)
    val boxed = ctx.freshName("idx")
    nullSafeCodeGen(ctx, ev, p =>
      s"""Object $boxed = $ref.lookup((double) $p);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((Integer) $boxed).intValue(); }""".stripMargin)
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}
