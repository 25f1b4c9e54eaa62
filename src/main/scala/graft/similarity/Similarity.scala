package graft.similarity

import graft.functions.{VectorFunctions => V}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`).
  *
  * Scale design: queries are assumed small relative to the corpus (the
  * typical 100 TB case: ~10²–10⁵ probes against ~10⁹⁺ vectors), so the
  * query side is always broadcast — brute force is then ONE narrow pass
  * over the corpus (no corpus shuffle) followed by a top-k aggregation
  * whose intermediate is k rows per partition per query. The IVF variant
  * cuts the scanned fraction to ~nprobe/nlist by pre-assigning corpus
  * vectors to centroid cells (a one-off partitioned build, amortized
  * across queries), which is the standard inverted-file ANN layout
  * (Jégou et al., IVF; public FAISS design).
  */
object Similarity {

  /** Brute-force cosine top-k: for every query vector, the k most similar
    * corpus vectors. Output: (query_id, neighbor_id, cosine_sim, rank).
    */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      vecCol: String,
      idCol: String,
      k: Int
  ): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
    val scored = c
      .join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine_sim", round(V.cosine(col("qvec"), col("cvec")), 6))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine_sim").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine_sim"), col("rank"))
  }

  /** IVF (inverted-file) index: deterministic centroids (the `nlist`
    * lowest-id corpus vectors — reproducible without an RNG; a kmeans
    * refinement can replace the seeding without changing the layout),
    * corpus pre-assigned to its nearest centroid cell.
    * Returns the corpus with a `cell` column — write it partitioned by
    * `cell` for pruned probes at scale.
    */
  def ivfBuild(corpus: DataFrame, vecCol: String, idCol: String, nlist: Int): DataFrame = {
    val centroids = corpus
      .select(col(idCol).as("cell"), col(vecCol).as("centroid"))
      .orderBy(col("cell"))
      .limit(nlist)
    // Nearest-cell assignment via max_by aggregation, NOT a window: the
    // broadcast join fans each row out nlist× locally, and the partial
    // (map-side) max_by collapses it back to one row per id before any
    // shuffle — so the exchange carries corpus-sized data, never
    // corpus×nlist, and there is no per-partition sort.
    val cols = corpus.columns.toSeq
    corpus
      .join(broadcast(centroids))
      .withColumn("sim", V.cosine(col(vecCol), col("centroid")))
      .groupBy(col(idCol).as("__gid"))
      .agg(max_by(
        struct((cols :+ "cell").map(col): _*),
        struct(col("sim"), (-col("cell")).cast("long").as("tb"))).as("s"))
      .select(col("s.*"))
  }

  /** Sketch-prefiltered top-k with exact re-rank: a 64-bit
    * random-hyperplane sketch (Charikar bits — cosine-preserving) scores
    * every corpus vector with ONE xor+popcount instead of a d-dim float
    * loop; the per-query shortlist of `k × oversample` best sketch matches
    * is then re-ranked by exact cosine. At 10⁹+ vectors this is the cheap
    * first pass that makes the exact math affordable: the full-dimension
    * loop runs on k×oversample rows per query, not the whole corpus (or
    * the whole probed cell). Compose with IVF by passing a cell-pruned
    * corpus. Sketches would be precomputed and stored at scale
    * (`withSketch`).
    */
  def withSketch(corpus: DataFrame, vecCol: String, nBits: Int = 64): DataFrame =
    corpus.withColumn("__sketch", V.lshBits(col(vecCol), nBits))

  def sketchTopK(
      corpus: DataFrame,
      queries: DataFrame,
      vecCol: String,
      idCol: String,
      k: Int,
      nBits: Int = 64,
      oversample: Int = 4
  ): DataFrame = {
    val c = withSketch(corpus, vecCol, nBits)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"), col("__sketch").as("csk"))
    val q = withSketch(queries, vecCol, nBits)
      .select(col(idCol).as("query_id"), col(vecCol).as("qvec"), col("__sketch").as("qsk"))
    // pass 1: hamming shortlist (xor+popcount per pair — codegen'd)
    val wSketch = Window.partitionBy(col("query_id"))
      .orderBy(col("ham").asc, col("neighbor_id"))
    val shortlist = c
      .join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("ham", bit_count(col("csk").bitwiseXOR(col("qsk"))))
      .withColumn("srn", row_number().over(wSketch))
      .where(col("srn") <= k * oversample)
    // pass 2: exact cosine over the shortlist only
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine_sim").desc, col("neighbor_id"))
    shortlist
      .withColumn("cosine_sim", round(V.cosine(col("qvec"), col("cvec")), 6))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine_sim"), col("rank"))
  }

  /** IVF probe: search only the `nprobe` cells nearest to each query —
    * scans ~nprobe/nlist of the corpus instead of all of it.
    */
  def ivfTopK(
      indexedCorpus: DataFrame,
      queries: DataFrame,
      vecCol: String,
      idCol: String,
      k: Int,
      nlist: Int,
      nprobe: Int
  ): DataFrame = {
    val centroids = indexedCorpus
      .where(col(idCol) === col("cell"))
      .select(col("cell"), col(vecCol).as("centroid"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
    val wq = Window.partitionBy(col("query_id")).orderBy(col("csim").desc, col("cell"))
    val probeCells = q
      .join(broadcast(centroids))
      .withColumn("csim", V.cosine(col("qvec"), col("centroid")))
      .withColumn("rn", row_number().over(wq))
      .where(col("rn") <= nprobe)
      .select(col("query_id"), col("qvec"), col("cell"))
    val scored = indexedCorpus
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"), col("cell"))
      .join(broadcast(probeCells), Seq("cell"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine_sim", round(V.cosine(col("qvec"), col("cvec")), 6))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine_sim").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine_sim"), col("rank"))
  }
}
