package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style importance weighting for domain-matched data selection
  * (Xie et al. 2023, arXiv:2302.03169 — public paper): score every raw
  * document by how much more likely its hashed n-gram features are
  * under a TARGET domain's feature distribution than under the raw
  * pool's, then keep the top-weighted slice. This is the
  * classifier-free cousin of quality filtering — no model, just two
  * smoothed count distributions over a fixed feature space.
  *
  * Features are word unigrams + bigrams hashed into `dim` md5-derived
  * buckets ([[TfVectors.bucket]] — reproducible across engines), counted
  * by the fused [[TfVectors.termVector]] kernel (one codegen'd pass per
  * document per n; text never shuffles). The weight of a document is
  * `Σ_b tf_b · λ_b` with
  * `λ_b = ln((tgt_b + α)/(T + α·dim)) − ln((raw_b + α)/(R + α·dim))`
  * (add-α smoothing; T, R = total target/raw feature occurrences).
  *
  * Scale shape (100 TB): the feature-count table is bounded by `dim`
  * rows — it aggregates with map-side combine on a uniform hash key and
  * the λ table BROADCASTS to the scoring join; per-document weights then
  * need one (id)-keyed aggregation. Nothing quadratic, nothing
  * collected but two scalar totals and the dim-bounded λ table.
  *
  * Determinism: feature hashing and all counts are integer-exact across
  * engines; λ and the weight sum are floats whose accumulation order is
  * partition-dependent, so gates round weights (the q_perplexity
  * precedent) — rankings tie-break on doc id after rounding.
  */
object Dsir {

  /** Per-bucket smoothed log-likelihood-ratio table `(bucket, raw_cnt,
    * tgt_cnt, lam)` over unigram+bigram features of `textCol`, with
    * `isTarget` marking the target-domain rows. At most `dim` rows.
    */
  def featureLogRatios(docs: DataFrame, textCol: String, isTarget: Column,
      dim: Int = 2048, alpha: Double = 1.0): DataFrame = {
    require(alpha > 0.0, s"featureLogRatios: alpha must be > 0, got $alpha")
    val cnt = bucketTfs(docs, textCol, lit(0L), isTarget, dim)
      .groupBy(col("bucket"))
      .agg(sum(col("tf")).as("raw_cnt"),
        sum(when(col("__tgt"), col("tf")).otherwise(0L)).as("tgt_cnt"))
    val tot = cnt.agg(coalesce(sum(col("raw_cnt")), lit(0L)),
      coalesce(sum(col("tgt_cnt")), lit(0L))).head()
    val r = tot.getLong(0)
    val t = tot.getLong(1)
    cnt.withColumn("lam",
      log((col("tgt_cnt") + lit(alpha)) / lit(t + alpha * dim)) -
        log((col("raw_cnt") + lit(alpha)) / lit(r + alpha * dim)))
  }

  /** `(id, __tgt, bucket, tf)` hashed-feature counts — the fused kernel
    * per n-gram order, unioned (a bucket hit by both a unigram and a
    * bigram keeps two rows; downstream sums don't care).
    */
  private def bucketTfs(docs: DataFrame, textCol: String, idCol: Column,
      isTarget: Column, dim: Int): DataFrame = {
    def one(n: Int) = docs
      .select(idCol.as("id"), isTarget.as("__tgt"),
        TfVectors.termVector(col(textCol), n, dim).as("__v"))
      .select(col("id"), col("__tgt"), explode(col("__v.pairs")).as("p"))
      .select(col("id"), col("__tgt"), col("p.bucket").as("bucket"), col("p.tf").cast("long").as("tf"))
    one(1).unionAll(one(2))
  }

  /** Per-document importance profile `(idCol, n_terms, weight)`:
    * `n_terms` = total feature occurrences (unigrams + bigrams),
    * `weight` = Σ tf·λ against the `isTarget` domain. Documents with no
    * tokens produce no row (no features to score).
    */
  def importanceWeights(docs: DataFrame, textCol: String, idCol: String,
      isTarget: Column, dim: Int = 2048, alpha: Double = 1.0): DataFrame = {
    val lam = featureLogRatios(docs, textCol, isTarget, dim, alpha)
    bucketTfs(docs, textCol, col(idCol), isTarget, dim)
      .join(broadcast(lam.select(col("bucket"), col("lam"))), Seq("bucket"))
      .groupBy(col("id").as(idCol))
      .agg(sum(col("tf")).as("n_terms"), sum(col("tf") * col("lam")).as("weight"))
  }

  /** Top-`k` raw-pool documents by importance weight (target-domain rows
    * are excluded — they're the reference, not candidates). Rounds the
    * weight to 6 BEFORE ranking so the selection is reproducible across
    * engines; ties break on id.
    */
  def selectTopK(docs: DataFrame, textCol: String, idCol: String,
      isTarget: Column, k: Int, dim: Int = 2048, alpha: Double = 1.0): DataFrame = {
    val w = importanceWeights(docs, textCol, idCol, isTarget, dim, alpha)
    val candidates = docs.where(!isTarget).select(col(idCol))
      .join(w, Seq(idCol))
      .withColumn("weight", round(col("weight"), 6))
    candidates
      .orderBy(col("weight").desc, col(idCol))
      .limit(k)
  }
}
