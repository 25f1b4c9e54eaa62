package graft.plans

import graft.expressions.{CosineSim, L2Distance, L2Norm}
import org.apache.spark.sql.catalyst.expressions.{And, Expression, GreaterThan, If, LessThan, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.types.DoubleType

/** Engine optimizer rules (injected via [[GraftExtensions]]).
  *
  * SelfSimilarityFold: `cosine(x, x)` → 1.0 and `l2dist(x, x)` → 0.0 for
  * deterministic x — the identity shows up in generated pipelines (e.g. a
  * similarity matrix builder that doesn't special-case the diagonal) and
  * folding it replaces the 3-multiply loop with a single-norm loop per row.
  *
  * The rewrite must preserve semantics for degenerate vectors, so the fold
  * is guarded by the L2 norm rather than unconditional:
  *  - zero vector:  CosineSim returns 0.0 (denominator 0), not 1.0
  *  - NaN element:  both originals return NaN (norm is NaN → guard false)
  *  - ±Inf element: both originals return NaN (inf−inf / inf÷inf → guard
  *                  `norm < +Inf` is false)
  *  - null input:   guard is null → else-branch → original → null
  * In all degenerate cases the guard falls through to the ORIGINAL
  * expression, so the rule can never change a result — it only short-cuts
  * the common finite-nonzero path.
  */
object SelfSimilarityFold extends Rule[LogicalPlan] {

  /** Marks the original expression kept in the guarded else-branch so the
    * fixpoint optimizer batch doesn't re-wrap it forever.
    */
  private val folded = TreeNodeTag[Boolean]("graft.selfSimilarityFolded")

  private def finiteNonZeroNorm(x: Expression): Expression =
    And(
      GreaterThan(L2Norm(x), Literal(0.0, DoubleType)),
      LessThan(L2Norm(x), Literal(Double.PositiveInfinity, DoubleType)))

  private def finiteNorm(x: Expression): Expression =
    LessThan(L2Norm(x), Literal(Double.PositiveInfinity, DoubleType))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case orig @ CosineSim(a, b)
        if orig.getTagValue(folded).isEmpty && a.deterministic && a.semanticEquals(b) =>
      orig.setTagValue(folded, true)
      If(finiteNonZeroNorm(a), Literal(1.0, DoubleType), orig)
    case orig @ L2Distance(a, b)
        if orig.getTagValue(folded).isEmpty && a.deterministic && a.semanticEquals(b) =>
      // l2dist(x,x) is 0.0 for any finite x incl. the zero vector
      orig.setTagValue(folded, true)
      If(finiteNorm(a), Literal(0.0, DoubleType), orig)
  }
}
