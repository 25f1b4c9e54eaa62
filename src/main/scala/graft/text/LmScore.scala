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

  /** Bigram LM with add-one smoothing: p(w₂|w₁) =
    * (c(w₁w₂)+1) / (c(w₁)+|V|), where c(w₁) counts w₁ as a bigram
    * CONTEXT (so the conditional sums to 1 over the vocab) and |V| is
    * the training corpus' distinct-token count. Counts are stored, not
    * log-probs — scoring applies ONE uniform formula with
    * coalesce(c,0), so out-of-model transitions need no branch.
    *
    * Scale shape: both tables are model-sized (distinct bigrams /
    * contexts), broadcast at score time; a production KenLM would prune
    * low-count n-grams first — that's a `where(c >= minCount)` on
    * `bigrams` and changes nothing else.
    */
  final case class BigramModel(bigrams: DataFrame, contexts: DataFrame, vocabSize: Long)

  /** Consecutive-token pairs of a `toks` array column, as a zipped
    * struct array — codegen'd slice/zip, no higher-order lambdas.
    */
  private def zippedPairs(toks: org.apache.spark.sql.Column) = arrays_zip(
    slice(toks, lit(1), greatest(size(toks) - 1, lit(0))).as("w1"),
    slice(toks, lit(2), greatest(size(toks) - 1, lit(0))).as("w2"))

  private def bigramPairs(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs
      .select(col(idCol).as("doc_id"), T.tokenize(col(textCol)).as("toks"))
      .select(col("doc_id"), explode(zippedPairs(col("toks"))).as("p"))
      .select(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"))

  def bigramModel(docs: DataFrame, textCol: String): BigramModel = {
    val bg = docs.select(T.tokenize(col(textCol)).as("toks"))
      .select(explode(zippedPairs(col("toks"))).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
    val c12 = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("__c12"))
    val c1 = c12.groupBy(col("w1")).agg(sum(col("__c12")).as("__c1"))
    val v = docs.select(explode(T.tokenize(col(textCol))).as("token"))
      .agg(countDistinct(col("token"))).head().getLong(0)
    BigramModel(c12, c1, v)
  }

  /** Per-document bigram perplexity: exp(−mean log p(w₂|w₁)) over the
    * document's len−1 transitions. Documents with fewer than 2 tokens
    * have no transitions and produce no row. Transitions outside the
    * model take the smoothed 1/(c(w₁)+|V|) (or 1/|V|) mass via the same
    * formula. Output: (id, n_transitions, perplexity).
    */
  def bigramPerplexity(docs: DataFrame, textCol: String, idCol: String,
      model: BigramModel): DataFrame = {
    val logp = log((coalesce(col("__c12"), lit(0L)) + lit(1L)).cast("double") /
      (coalesce(col("__c1"), lit(0L)) + lit(model.vocabSize)).cast("double"))
    bigramPairs(docs, textCol, idCol)
      .join(broadcast(model.bigrams), Seq("w1", "w2"), "left")
      .join(broadcast(model.contexts), Seq("w1"), "left")
      .groupBy(col("doc_id").as("id"))
      .agg(
        count(lit(1)).as("n_transitions"),
        exp(-avg(logp)).as("perplexity"))
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
