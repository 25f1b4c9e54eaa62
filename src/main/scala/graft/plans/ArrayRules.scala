package graft.plans

import org.apache.spark.sql.catalyst.expressions.{ArrayIntersect, ArraysOverlap, Expression, GreaterThan, LessThan, Literal, Size}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, IntegerType}

/** `size(array_intersect(a, b)) > 0`  →  `arrays_overlap(a, b)`.
  *
  * The intersect formulation materializes the full intersection (hash set
  * of the smaller side + probe of EVERY element of the other) before
  * counting; arrays_overlap short-circuits on the first common element.
  * The shape is the natural way users write "any common element" — the
  * engine's own stopword-hit scoring used it — so the rule pays for
  * itself on any text-scoring scan.
  *
  * Semantics guard: the two differ on NULL ELEMENTS — array_intersect
  * keeps a shared null (counted by size), while arrays_overlap returns
  * null when the only commonality is null / a side holds nulls without a
  * common non-null value. The rewrite therefore fires only when BOTH
  * element types are provably null-free (`containsNull = false`). Whole
  * NULL INPUTS agree already (size(null) = null with
  * legacySizeOfNull=false → predicate null; arrays_overlap(null, b) =
  * null).
  */
object IntersectNonEmptyToOverlap extends Rule[LogicalPlan] {

  private def nullFreeArrays(a: Expression, b: Expression): Boolean =
    (a.dataType, b.dataType) match {
      case (ArrayType(_, false), ArrayType(_, false)) => true
      case _                                          => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case GreaterThan(Size(ArrayIntersect(a, b), false), Literal(0, IntegerType)) if nullFreeArrays(a, b) =>
      ArraysOverlap(a, b)
    case LessThan(Literal(0, IntegerType), Size(ArrayIntersect(a, b), false)) if nullFreeArrays(a, b) =>
      ArraysOverlap(a, b)
  }
}
