package graft.text

import graft.functions.{TextFunctions => T}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sparse term-frequency vectors via the hashing trick, and the sparse
  * cosine KNN join over them — text similarity search with NO model and
  * NO dense embeddings: vector = {md5-bucket(term) → tf}, similarity =
  * Σ tf_a·tf_b / √(‖a‖²·‖b‖²). Terms are word n-grams (n=1 → tokens;
  * n=2 → bigrams, which turn even a tiny vocabulary into a realistically
  * sparse feature space and capture phrase structure).
  *
  * The vectors come out of a fused native kernel
  * (graft.expressions.TermBucketTfs): one codegen'd pass per document
  * emits `(n2, [(bucket, tf)…])`, so the corpus text never shuffles, no
  * aggregation runs before the similarity join, and the per-document
  * norm needs no separate pass or join. The similarity itself stays
  * relational — an equi-join on the bucket id that Catalyst/AQE plan like
  * any join — and the DuckDB oracle reproduces it bit-for-bit (md5
  * bucketing, integer tf products, one sqrt + one division per pair).
  *
  * Scale notes (100 TB): the bucket join's cost is Σ_b df_q(b)·df_c(b) —
  * linear in the corpus for a small query set, but dominated (and for
  * all-pairs workloads made quadratic) by stopword-grade buckets (Zipf).
  * df-pruning drops buckets present in more than a fraction of corpus
  * docs — the standard trick of sparse-similarity pipelines: high-df
  * terms carry ~no cosine signal and all of the join fan-out. The pruned
  * bucket set is bounded by `dim`, so it folds into the kernel as a
  * driver-side array; the query side stays small → AQE broadcasts it.
  */
object TfVectors {

  /** md5-derived feature bucket for a term (reproducible across engines
    * and runs — unlike hashCode or xxhash seeds DuckDB lacks).
    */
  def bucket(term: Column, dim: Int): Column =
    (conv(substring(md5(term), 1, 8), 16, 10).cast("long") % dim).cast("int")

  /** Word n-gram terms WITH multiplicity (unlike `TextFunctions.shingles`,
    * which is distinct-ified for set-based MinHash). Same zip_with shape —
    * each interpreted lambda touches only its lambda variables, so the
    * tokenize chain is evaluated O(n) times per row, not O(len) (see the
    * CollapseProject note on `TextFunctions.zipShingles`).
    */
  def terms(c: Column, n: Int): Column = {
    require(n >= 1, s"term n-gram size must be >= 1, got $n")
    val toks = T.tokenize(c)
    if (n == 1) toks
    else {
      val shifted = (0 until n).map(i => slice(toks, lit(i + 1), greatest(size(toks) - i, lit(0))))
      val zipped = shifted.reduce((a, b) => zip_with(a, b, (x, y) => concat(x, lit(" "), y)))
      filter(zipped, x => x.isNotNull)
    }
  }

  /** (id, bucket, tf) sparse vectors over word `n`-gram terms; `maxDf`
    * drops buckets present in more than that many documents (None = keep
    * all).
    */
  def bucketCounts(docs: DataFrame, textCol: String, idCol: String, dim: Int,
      maxDf: Option[Long] = None, n: Int = 1): DataFrame = {
    val counts = docs
      .select(col(idCol).as("id"), explode(terms(col(textCol), n)).as("term"))
      .select(col("id"), bucket(col("term"), dim).as("bucket"))
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
    *
    * df-pruning is ON by default (`maxDfFraction = Some(0.1)`): buckets
    * present in more than 10% of corpus docs are dropped from BOTH sides.
    * Without it the bucket join cost concentrates in stopword buckets —
    * for all-pairs query sets that is effectively quadratic in corpus
    * size, the one shape that does not survive a 100× scale-up. Callers
    * that need the exact unpruned cosine (tiny corpora, unit tests) pass
    * `maxDfFraction = None`. An absolute `maxDf` cap overrides the
    * fraction. The fraction resolves to `max(1, floor(|corpus| * f))` — a
    * single count(*) over the corpus (parquet-stats-cheap) that the DuckDB
    * oracle reproduces bit-for-bit via `floor(count(*) * f)`.
    */
  private def e2col(e: org.apache.spark.sql.catalyst.expressions.Expression) =
    org.apache.spark.sql.graftbridge.Bridge.column(e)
  private def col2e(c: Column) = org.apache.spark.sql.graftbridge.Bridge.expression(c)

  /** Fused per-document sparse vector: `struct(n2, pairs)` with hot
    * buckets excluded inside the kernel (graft.expressions.TermBucketTfs).
    */
  def termVector(text: Column, n: Int, dim: Int, hot: Seq[Int] = Nil): Column =
    e2col(graft.expressions.TermBucketTfs(col2e(text), n, dim, hot))

  /** (id, n2, bucket, tf) rows from the fused kernel — the per-document
    * squared norm rides every row, so no per-id aggregate is ever needed.
    */
  private def fusedVecs(docs: DataFrame, textCol: String, idCol: String,
      n: Int, dim: Int, hot: Seq[Int]): DataFrame =
    docs
      .select(col(idCol).as("id"), termVector(col(textCol), n, dim, hot).as("__v"))
      .select(col("id"), col("__v.n2").as("n2"), explode(col("__v.pairs")).as("p"))
      .select(col("id"), col("n2"), col("p.bucket").as("bucket"), col("p.tf").as("tf"))

  def cosineTopK(
      corpus: DataFrame,
      queries: DataFrame,
      textCol: String,
      idCol: String,
      dim: Int = 2048,
      k: Int = 5,
      maxDf: Option[Long] = None,
      maxDfFraction: Option[Double] = Some(0.1),
      ngramN: Int = 1
  ): DataFrame = {
    // df-pruning is defined by CORPUS document frequency and must drop the
    // same buckets from BOTH sides (one-sided pruning deflates query norms
    // and skews every cosine). The hot-bucket set is bounded by `dim`, so
    // it is driver-collected and folded into the vector kernel — per-row
    // n2 is then exact over the PRUNED vector space and the main plan has
    // zero pruning joins. Costs one extra corpus scan (stopping at a
    // dim-sized aggregate); pass maxDf/maxDfFraction = None to skip it.
    //
    // API note (changed in r4): maxDfFraction's denominator is
    // corpus.count() — ALL corpus rows, including null/empty-text docs —
    // not "documents with ≥1 surviving term" as before. count() is
    // metadata-only (row-group stats) when `corpus` is a bare Parquet
    // scan; for a filtered/derived frame it is a real job, so callers on
    // hot paths should pass an absolute maxDf instead. The `> cap` filter
    // runs inside the aggregate job, so only the hot buckets (≤ dim rows)
    // ever reach the driver.
    val hot: Seq[Int] =
      if (maxDf.isEmpty && maxDfFraction.isEmpty) Nil
      else {
        val cap: Long = maxDf.getOrElse(
          math.max(1L, (corpus.count() * maxDfFraction.get).toLong))
        fusedVecs(corpus, textCol, idCol, ngramN, dim, Nil)
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("__df"))
          .where(col("__df") > cap)
          .select(col("bucket"))
          .collect()
          .map(_.getInt(0)).toSeq
      }
    val c = fusedVecs(corpus, textCol, idCol, ngramN, dim, hot)
    val q = fusedVecs(queries, textCol, idCol, ngramN, dim, hot)
    // n2 is functionally dependent on the id, so it rides the group-by as
    // an extra key instead of a post-aggregation norm join
    val dots = q.select(col("id").as("query_id"), col("n2").as("n2_q"), col("bucket"), col("tf").as("tf_q"))
      .join(c.select(col("id").as("neighbor_id"), col("n2").as("n2_c"), col("bucket"), col("tf").as("tf_c")),
        Seq("bucket"))
      .where(col("query_id") =!= col("neighbor_id"))
      .groupBy(col("query_id"), col("neighbor_id"), col("n2_q"), col("n2_c"))
      .agg(sum(col("tf_q") * col("tf_c")).as("dot"))
    // ONE sqrt + ONE division over exact integer inputs: bitwise
    // reproducible across engines (oracle-parity rule)
    val sim = dots.withColumn("cosine_sim",
      round(col("dot").cast("double") / sqrt((col("n2_q") * col("n2_c")).cast("double")), 6))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine_sim").desc, col("neighbor_id"))
    sim
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine_sim"), col("rank"))
  }
}
