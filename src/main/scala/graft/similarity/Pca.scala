package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic PCA (top principal component by power iteration) over
  * an embedding column — the dimensionality diagnostic / reduction step
  * of an embedding pipeline (dominant-direction removal, whitening
  * checks, ANN memory reduction).
  *
  * Determinism is the design center, exactly like
  * [[Similarity.pqRefineDeterministic]]: the mean vector and every
  * power-iteration matrix-vector product fold their contributions
  * SEQUENTIALLY in vec-id order (per component), and per-row dot
  * products fold in component order — so the learned component, and
  * every projection, is bit-reproducible across engines, partitionings,
  * and cluster layouts, which is what lets a DuckDB oracle replay the
  * whole training loop exactly ([[graft.queries.XxhSql.pcaSql]]).
  *
  * Scale trade-off (same as pqRefine vs pqRefineDeterministic): each
  * component's fold materializes its per-row contributions
  * (`collect_list` + sort) instead of streaming a float sum — per-task
  * memory is O(n) per dimension group. Train on a bounded sample at
  * corpus scale (PCA models are estimated from samples anyway); the
  * PROJECTION side is a broadcast-constant per-row kernel that scales
  * to any corpus.
  */
object Pca {

  /** `(mean, component)` — both length-d arrays. Power iteration starts
    * from the exact-binary uniform vector `1/√d … ` (d must be a power
    * of two for that to be exact; other d work, the start vector is just
    * not bit-round) and runs `iters` steps of
    * `v ← normalize(Σ_r ((x_r−μ)·v) (x_r−μ))` with id-ordered sums.
    */
  def fit(corpus: DataFrame, vecCol: String, idCol: String, iters: Int = 3): (Array[Double], Array[Double]) = {
    require(iters >= 1, s"Pca.fit: iters must be >= 1, got $iters")
    val base = corpus.select(col(idCol).as("__id"), col(vecCol).cast("array<double>").as("__v"))
    // count BEFORE head(): head() on an empty frame throws
    // NoSuchElementException and would shadow the clear empty-corpus error
    val n = base.count()
    require(n > 0, "Pca.fit: empty corpus")
    val d = base.select(size(col("__v"))).head().getInt(0)

    // mean: per-dimension id-ordered sequential fold, then / n
    val mu = foldPerDim(
      base.select(col("__id"), posexplode(col("__v")).as(Seq("__p", "__x"))), d)
      .map(_ / n.toDouble)

    var v = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
    (0 until iters).foreach { _ =>
      val dots = base.select(col("__id"), dotExpr(col("__v"), mu, v, d).as("__dot"))
      // join (not a projection chain): the per-row fold materializes once
      // before the explode — CollapseProject would otherwise inline the
      // fold into every exploded lane
      val contrib = base
        .select(col("__id"), posexplode(col("__v")).as(Seq("__p", "__x")))
        .join(dots, Seq("__id"))
        .select(col("__id"), col("__p"),
          ((col("__x") - element_at(lits(mu), col("__p") + 1)) * col("__dot")).as("__x"))
      val nv = foldPerDim(contrib, d)
      var norm2 = 0.0
      var j = 0
      while (j < d) { norm2 += nv(j) * nv(j); j += 1 }
      val norm = math.sqrt(norm2)
      require(norm > 0.0, "Pca.fit: zero-variance corpus (degenerate power iteration)")
      v = nv.map(_ / norm)
    }
    (mu, v)
  }

  /** Per-vector projection score `(x−μ)·pc` as a column (broadcast
    * constants — scan-local, no shuffle, any corpus size).
    */
  def projectColumn(vec: Column, mean: Array[Double], pc: Array[Double]): Column =
    dotExpr(vec.cast("array<double>"), mean, pc, mean.length)

  /** `(idCol, pc_score)` projections for the corpus. */
  def project(corpus: DataFrame, vecCol: String, idCol: String,
      mean: Array[Double], pc: Array[Double]): DataFrame =
    corpus.select(col(idCol), projectColumn(col(vecCol), mean, pc).as("pc_score"))

  /** Left fold `acc + (x[t]−μ[t])·w[t]` in component order — the per-row
    * dot-product spec the oracle mirrors. Native kernel
    * ([[graft.expressions.DotCentered]], optimization round 18): the same
    * IEEE add/multiply sequence as the previous `aggregate` HOF (bit-
    * identical doubles, oracle-verified), minus the interpreted
    * per-element lambda dispatch the HOF paid per row.
    */
  private def dotExpr(v: Column, mu: Array[Double], w: Array[Double], d: Int): Column = {
    val b = org.apache.spark.sql.graftbridge.Bridge
    b.column(graft.expressions.DotCentered(
      b.expression(v), b.expression(lits(mu)), b.expression(lits(w))))
  }

  private def lits(a: Array[Double]): Column = array(a.map(lit).toSeq: _*)

  /** Per-dimension id-ordered sequential fold of `(__p, __id, __x)` rows
    * → length-d array of sums (the deterministic accumulation shared by
    * mean and matrix-vector steps).
    */
  private def foldPerDim(rows: DataFrame, d: Int): Array[Double] = {
    val res = rows
      .groupBy(col("__p"))
      .agg(sort_array(collect_list(struct(col("__id"), col("__x")))).as("xs"))
      .select(col("__p"),
        aggregate(col("xs"), lit(0.0), (acc, s) => acc + s.getField("__x")).as("sum"))
      .collect()
    val out = new Array[Double](d)
    res.foreach(r => out(r.getInt(0)) = r.getDouble(1))
    out
  }
}
