package graft.dedup

import graft.functions.{VectorFunctions => V}
import graft.similarity.Similarity
import graft.similarity.Similarity.PqModel
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SemDeDup-style semantic deduplication (Abbas et al. 2023,
  * arXiv:2303.09540 — public paper): k-means-cluster the embedding
  * space, then prune near-duplicate pairs by exact cosine WITHIN each
  * cluster only. The cluster bound turns the corpus-quadratic pair
  * problem into k × (n/k)² local work — the same complexity-taming as
  * LSH banding (see [[Dedup.lshVerifiedPairs]]) but driven by the dense
  * embedding geometry instead of hash buckets, which catches semantic
  * duplicates that share no shingles.
  *
  * Scale shape (the 100 TB story): centroids are a driver-held k×d
  * array shipped inside the codegen'd assignment kernel (no join for
  * assignment); vectors shuffle ONCE on the cluster id; each cluster's
  * quadratic verification is local to its partition. Choose k ∝ corpus
  * size to cap cluster cardinality (the paper uses ~10⁴–10⁵ clusters at
  * billion-doc scale); a pathologically hot cluster is handled the same
  * way as any skewed key — raise k or salt that cluster's pair join.
  *
  * Determinism: training is [[Similarity.pqRefineDeterministic]] with
  * m = 1 (the whole vector is the one subspace), i.e. id-seeded
  * centroids + id-ordered sequential Lloyd folds — bit-reproducible
  * across partitionings and engines, which is what lets a DuckDB oracle
  * replay clustering AND pruning exactly
  * ([[graft.queries.XxhSql.semDedupSql]]).
  */
object SemDedup {

  /** Deterministic full-vector k-means: the `k` lowest-id vectors seed
    * the centroids, then `iters` Lloyd steps with id-ordered sequential
    * component folds (assignment ties break to the lowest centroid,
    * empty cells keep their previous centroid). Returns k×d centroids.
    */
  def kmeansDeterministic(corpus: DataFrame, vecCol: String, idCol: String,
      k: Int, iters: Int = 1): Array[Array[Double]] = {
    val seed = Similarity.pqTrain(corpus, vecCol, idCol, m = 1, k = k)
    Similarity.pqRefineDeterministic(corpus, vecCol, idCol, seed, iters).centroids(0)
  }

  /** Nearest-centroid assignment via the codegen'd PQ encode kernel
    * (squared-L2 argmin, ties to the lowest id — no join, no shuffle):
    * adds a `cluster` column.
    */
  def assignClusters(corpus: DataFrame, vecCol: String, centroids: Array[Array[Double]]): DataFrame =
    Similarity.pqEncode(corpus, vecCol, PqModel(Array(centroids)))
      .withColumn("cluster", element_at(col("pq_codes"), 1))
      .drop("pq_codes")

  /** Semantic dedup verdict per vector: `(idCol, cluster, kept)` where
    * `kept = false` iff some SAME-CLUSTER vector with a smaller id has
    * rounded cosine ≥ `tau` (lowest id survives — deterministic stand-in
    * for the paper's keep-one-per-group). Cosine is rounded to 6 before
    * the threshold so the verdict is reproducible across engines and
    * platforms (last-ulp differences cannot flip it).
    */
  def semDedup(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int = 16, iters: Int = 1, tau: Double = 0.9): DataFrame = {
    require(tau > -1.0 && tau <= 1.0, s"semDedup: tau must be in (-1, 1], got $tau")
    val cents = kmeansDeterministic(corpus, vecCol, idCol, k, iters)
    // materialize the assignment once: it feeds both pair-join sides AND
    // the verdict join — without the checkpoint the scan + encode kernel
    // would run three times (deterministically, but wastefully)
    val asg = assignClusters(corpus, vecCol, cents)
      .select(col(idCol), col(vecCol), col("cluster"))
      .localCheckpoint(true)
    val a = asg.select(col("cluster"), col(idCol).as("__a_id"), col(vecCol).as("__va"))
    val b = asg.select(col("cluster"), col(idCol).as("__b_id"), col(vecCol).as("__vb"))
    // ids-only artifact out of the pair join — vectors never leave their
    // cluster partition, and the dropped set is the small thing
    val dropped = a.join(b, Seq("cluster"))
      .where(col("__a_id") < col("__b_id"))
      .where(round(V.cosine(col("__va"), col("__vb")), 6) >= tau)
      .select(col("__b_id").as("__dropped_id")).distinct()
    asg.join(dropped, col(idCol) === col("__dropped_id"), "left_outer")
      .select(col(idCol), col("cluster"), col("__dropped_id").isNull.as("kept"))
  }

  /** Survivors only — the corpus rows whose id is `kept`. */
  def semDedupSurvivors(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int = 16, iters: Int = 1, tau: Double = 0.9): DataFrame = {
    val verdict = semDedup(corpus, idCol, vecCol, k, iters, tau)
      .where(col("kept")).select(col(idCol))
    corpus.join(verdict, Seq(idCol), "left_semi")
  }
}
