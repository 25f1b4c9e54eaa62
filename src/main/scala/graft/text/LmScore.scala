package graft.text

import graft.functions.{TextFunctions => T}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram language-model scoring — the deterministic stand-in for the
  * KenLM-perplexity quality filter of public curation pipelines (CCNet
  * shape): train a unigram LM over the corpus token stream (add-one
  * smoothing), score each document by perplexity, drop the tail.
  *
  * Scale shape: the "model" is the vocabulary count table — KBs, it
  * BROADCASTS; scoring is explode → broadcast-join → per-doc aggregate
  * (one uniform-key shuffle). Swapping in a real KenLM changes only the
  * per-token log-probability source.
  */
object LmScore {

  /** (token, logp) with add-one smoothing over the corpus:
    * p(t) = (count(t) + 1) / (total + |V|). Exact integer inputs → the
    * log-probabilities are bitwise reproducible.
    */
  def unigramModel(docs: DataFrame, textCol: String): DataFrame = {
    val toks = docs.select(explode(T.tokenize(col(textCol))).as("token"))
    val counts = toks.groupBy(col("token")).agg(count(lit(1)).as("cnt"))
    val totals = counts.agg(sum(col("cnt")), count(lit(1))).head()
    // empty/token-less corpus: sum aggregates to null — the model is
    // empty and the smoothed mass degenerates to p=1 (logp 0), so
    // downstream perplexity is 1 for everything instead of crashing
    val total = if (totals.isNullAt(0)) 0L else totals.getLong(0)
    val vSize = totals.getLong(1)
    val denom = math.max(total + vSize, 1L).toDouble
    counts.select(
      col("token"),
      log((col("cnt") + 1).cast("double") / lit(denom)).as("logp"))
      .withColumn("__oov_logp", log(lit(1.0) / lit(denom)))
  }

  /** Per-document perplexity against `model` ([[unigramModel]] output):
    * ppl = exp(−mean log p(token)), OOV tokens take the smoothed
    * 1/(total+|V|) mass. Documents with no tokens produce no row.
    */
  def perplexity(docs: DataFrame, textCol: String, idCol: String, model: DataFrame): DataFrame = {
    // empty model (empty corpus): every token is OOV with p=1 → ppl 1
    val oovLogp = model.select(col("__oov_logp")).head(1).headOption
      .map(_.getDouble(0)).getOrElse(0.0)
    docs
      .select(col(idCol).as("id"), explode(T.tokenize(col(textCol))).as("token"))
      .join(broadcast(model.select(col("token"), col("logp"))), Seq("token"), "left")
      .groupBy(col("id"))
      .agg(
        count(lit(1)).as("n_tokens"),
        exp(-avg(coalesce(col("logp"), lit(oovLogp)))).as("perplexity"))
  }
}
