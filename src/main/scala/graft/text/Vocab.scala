package graft.text

import graft.functions.{TextFunctions => T}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus vocabulary operators: frequency tables and out-of-vocabulary
  * rates — the tokenizer-coverage diagnostics a pretraining pipeline runs
  * before committing to a vocab.
  *
  * Scale shape: the vocabulary itself is small (top-N cutoff) and
  * BROADCASTS; the corpus explodes to (id, token) pairs exactly once and
  * aggregates back per document — one uniform-key shuffle for the count,
  * none for the join side. Head-word skew (Zipf) is absorbed by map-side
  * partial aggregation (counts, never token payload concentration).
  */
object Vocab {

  /** Top-`n` tokens by corpus frequency, ties broken lexicographically —
    * deterministic across engines and runs.
    */
  def topTokens(docs: DataFrame, textCol: String, n: Int): DataFrame =
    docs
      .select(explode(T.tokenize(col(textCol))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token"))
      .limit(n)

  /** Per-document out-of-vocabulary profile against `vocab` (a one-column
    * `token` table, e.g. [[topTokens]]): token count, OOV count, OOV
    * ratio. Documents with zero tokens produce no row (no token stream to
    * measure). The vocab side is broadcast (top-N vocabularies are KBs).
    */
  def oovStats(docs: DataFrame, textCol: String, idCol: String, vocab: DataFrame): DataFrame =
    docs
      .select(col(idCol).as("id"), explode(T.tokenize(col(textCol))).as("token"))
      // distinct: an externally-loaded vocab with repeated tokens would
      // otherwise MULTIPLY matching token rows through the join
      .join(broadcast(vocab.select(col("token")).distinct().withColumn("__iv", lit(1))), Seq("token"), "left")
      .groupBy(col("id"))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("__iv").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_ratio", round(col("n_oov").cast("double") / col("n_tokens"), 6))
}
