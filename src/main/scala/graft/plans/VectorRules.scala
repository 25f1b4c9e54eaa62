package graft.plans

import graft.expressions.{CosineSim, L2Distance}
import org.apache.spark.sql.catalyst.expressions.{If, IsNull, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Engine optimizer rules (injected via [[GraftExtensions]]).
  *
  * SelfSimilarityFold: `cosine(x, x)` → 1.0 and `l2dist(x, x)` → 0.0 for
  * deterministic non-null x — the identity shows up in generated pipelines
  * (e.g. a similarity matrix builder that doesn't special-case the
  * diagonal) and folding it removes a full vector loop per row. The same
  * pattern-rewrite slot is where further algebraic rules (norm caching,
  * distance-to-dot rewrites over normalized columns) would land.
  */
object SelfSimilarityFold extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case CosineSim(a, b) if a.deterministic && a.semanticEquals(b) =>
      if (a.nullable) If(IsNull(a), Literal(null, DoubleType), Literal(1.0, DoubleType))
      else Literal(1.0, DoubleType)
    case L2Distance(a, b) if a.deterministic && a.semanticEquals(b) =>
      if (a.nullable) If(IsNull(a), Literal(null, DoubleType), Literal(0.0, DoubleType))
      else Literal(0.0, DoubleType)
  }
}
