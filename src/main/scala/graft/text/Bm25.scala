package graft.text

import graft.functions.{TextFunctions => T}
import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BM25 lexical retrieval (Robertson–Spärck Jones; the public Okapi
  * formula) — the inverted-index complement to [[TfVectors]]' hashed
  * cosine KNN: exact terms, document-frequency IDF, and the standard
  * length-normalized saturation
  * `idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·len/avgLen))`.
  *
  * Scale shape (100 TB): the per-(doc, term) tf table IS the inverted
  * index — one explode + one uniform-key aggregation; the df/IDF table
  * is vocabulary-sized and BROADCASTS; queries broadcast; scoring joins
  * the query terms against the tf table on the term key. `maxDfFraction`
  * drops stopword-grade terms from both sides (same floor(count·f)
  * formula as [[TfVectors.cosineTopK]], oracle-reproducible): their IDF
  * is near zero but their join fan-out is the whole corpus — for
  * all-pairs workloads that's the quadratic trap, so pruning defaults
  * ON at 0.5.
  *
  * Determinism: tf/df/lengths are integer-exact; IDF and the score sum
  * are floats whose accumulation order is partition-dependent, so
  * callers rank on the ROUNDED score (ties to doc id) — the
  * q_perplexity precedent, and what [[topK]] does.
  */
object Bm25 {

  /** Top-`k` corpus docs per query doc. Queries are rows of `queries`
    * (same schema as `corpus`); a query never matches itself. Output:
    * (query_id, doc_id, score, rank) with `score` rounded to 4.
    */
  def topK(corpus: DataFrame, queries: DataFrame, textCol: String, idCol: String,
      k: Int = 5, k1: Double = 1.2, b: Double = 0.75,
      maxDfFraction: Option[Double] = Some(0.5)): DataFrame = {
    val toks = corpus.select(col(idCol).as("doc_id"), T.tokenize(col(textCol)).as("toks"))
    // N and avgLen: two scalar aggregates
    val stats = toks.select(size(col("toks")).as("len"))
      .agg(count(lit(1)).as("n"), sum(col("len")).as("s")).head()
    val nDocs = stats.getLong(0)
    require(nDocs > 0, "Bm25.topK: empty corpus")
    val avgLen = stats.getLong(1).toDouble / nDocs.toDouble
    // inverted index: (doc_id, term, tf) with the doc length riding each
    // row (constant per doc — max() is a free map-side carry, and it
    // avoids a corpus-sized join or broadcast later)
    val tf = toks.select(col("doc_id"), size(col("toks")).as("len"), explode(col("toks")).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"), max(col("len")).as("len"))
    // df + idf: vocabulary-sized, broadcast
    val dfCap = maxDfFraction.map(f => math.max(1L, math.floor(nDocs * f).toLong))
    val dfTab0 = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val dfTab = dfCap.fold(dfTab0)(cap => dfTab0.where(col("df") <= cap))
    val idf = dfTab.select(col("term"),
      log(((lit(nDocs) - col("df") + lit(0.5)) / (col("df") + lit(0.5))) + lit(1.0)).as("idf"))
    // query terms: DISTINCT terms per query doc
    val qTerms = queries.select(col(idCol).as("query_id"), T.tokenize(col(textCol)).as("qt"))
      .select(col("query_id"), explode(col("qt")).as("term")).distinct()
    val contrib = qTerms
      .join(tf, Seq("term"))
      .where(col("doc_id") =!= col("query_id"))
      .join(broadcast(idf), Seq("term"))
      .select(col("query_id"), col("doc_id"),
        (col("idf") * (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("len") / lit(avgLen)))).as("c"))
    val scored = contrib.groupBy(col("query_id"), col("doc_id"))
      .agg(round(sum(col("c")), 4).as("score"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("doc_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("doc_id"), col("score"), col("rank"))
  }
}
