package graft.text

import graft.functions.{TextFunctions => T}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sparse term-frequency vectors via the hashing trick, and the sparse
  * cosine KNN join over them — text similarity search with NO model and
  * NO dense embeddings: vector = {md5-bucket(token) → tf}, similarity =
  * Σ tf_a·tf_b / √(‖a‖²·‖b‖²).
  *
  * Everything is relational: explode → count (one uniform-key shuffle per
  * side), then an equi-join on the bucket id — so Catalyst/AQE plan it
  * like any join, and the DuckDB oracle reproduces it bit-for-bit (md5
  * bucketing, integer tf products, one sqrt + one division per pair).
  *
  * Scale notes (100 TB): the bucket join's cost is Σ_b df(b)² —
  * dominated by stopword-grade buckets (Zipf). `maxDf` drops buckets
  * that appear in more than that many documents (the standard df-pruning
  * of sparse-similarity pipelines; high-df terms carry ~no cosine signal
  * and all the join fan-out). The query side stays small → AQE broadcasts
  * it; norms are one extra tiny aggregate per side.
  */
object TfVectors {

  /** md5-derived feature bucket for a token (reproducible across engines
    * and runs — unlike hashCode or xxhash seeds DuckDB lacks).
    */
  def bucket(token: Column, dim: Int): Column =
    (conv(substring(md5(token), 1, 8), 16, 10).cast("long") % dim).cast("int")

  /** (id, bucket, tf) sparse vectors; `maxDf` drops buckets present in
    * more than that many documents (None = keep all).
    */
  def bucketCounts(docs: DataFrame, textCol: String, idCol: String, dim: Int, maxDf: Option[Long] = None): DataFrame = {
    val counts = docs
      .select(col(idCol).as("id"), explode(T.tokenize(col(textCol))).as("token"))
      .select(col("id"), bucket(col("token"), dim).as("bucket"))
      .groupBy(col("id"), col("bucket"))
      .agg(count(lit(1)).as("tf"))
    maxDf match {
      case Some(cap) =>
        val df_ = counts.groupBy(col("bucket")).agg(count(lit(1)).as("__df"))
        counts.join(df_.where(col("__df") <= cap).select(col("bucket")), Seq("bucket"))
      case None => counts
    }
  }

  /** Top-`k` most-similar corpus docs per query doc by hashed-TF cosine
    * (self-matches excluded; ties broken by corpus id). Output:
    * (query_id, neighbor_id, cosine_sim, rank).
    */
  def cosineTopK(
      corpus: DataFrame,
      queries: DataFrame,
      textCol: String,
      idCol: String,
      dim: Int = 256,
      k: Int = 5,
      maxDf: Option[Long] = None
  ): DataFrame = {
    // df-pruning is defined by CORPUS document frequency and must drop the
    // same buckets from BOTH sides (one-sided pruning deflates query norms
    // and skews every cosine); norms are computed AFTER pruning so the
    // metric is the exact cosine of the pruned vector space
    val cAll = bucketCounts(corpus, textCol, idCol, dim)
    val qAll = bucketCounts(queries, textCol, idCol, dim)
    val (cPlan, qPlan) = maxDf match {
      case Some(cap) =>
        val hot = cAll.groupBy(col("bucket")).agg(count(lit(1)).as("__df"))
          .where(col("__df") > cap).select(col("bucket"))
        (cAll.join(hot, Seq("bucket"), "left_anti"), qAll.join(hot, Seq("bucket"), "left_anti"))
      case None => (cAll, qAll)
    }
    // each side feeds TWO consumers (dot products + its own norms):
    // persist the pruned sparse vectors so tokenize/explode/count runs
    // once per side, and release the cache once the (small) top-k result
    // is materialized
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val c = cPlan.persist(lvl)
    val q = qPlan.persist(lvl)
    def norms(v: DataFrame) = v.groupBy(col("id")).agg(sum(col("tf") * col("tf")).as("n2"))
    val dots = q.select(col("id").as("query_id"), col("bucket"), col("tf").as("tf_q"))
      .join(c.select(col("id").as("neighbor_id"), col("bucket"), col("tf").as("tf_c")), Seq("bucket"))
      .where(col("query_id") =!= col("neighbor_id"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(sum(col("tf_q") * col("tf_c")).as("dot"))
    val sim = dots
      .join(norms(q).select(col("id").as("query_id"), col("n2").as("n2_q")), Seq("query_id"))
      .join(norms(c).select(col("id").as("neighbor_id"), col("n2").as("n2_c")), Seq("neighbor_id"))
      // ONE sqrt + ONE division over exact integer inputs: bitwise
      // reproducible across engines (oracle-parity rule)
      .withColumn("cosine_sim", round(col("dot").cast("double") / sqrt((col("n2_q") * col("n2_c")).cast("double")), 6))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine_sim").desc, col("neighbor_id"))
    val out = sim
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine_sim"), col("rank"))
      .localCheckpoint(true)
    c.unpersist(); q.unpersist()
    out
  }
}
