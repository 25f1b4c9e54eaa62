package graft.text

import graft.functions.{TextFunctions => T}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Model-based quality scoring — the logistic-classifier shape of the
  * public curation pipelines (a fastText/CCNet-style quality model
  * reduced to its inference step): a fixed weight vector over cheap
  * per-document features, a sigmoid, and a keep verdict. Training is
  * out of scope by design (weights arrive as a config artifact, exactly
  * like a downloaded classifier); what the engine owns is DISTRIBUTED
  * INFERENCE, and that is one narrow codegen'd expression — no UDF, no
  * shuffle, no model state beyond broadcast literals.
  *
  * Features (all exact-integer ratios before the single float chain):
  * token count (scaled /100), mean token length (nospace chars /
  * tokens), type-token ratio (distinct / total). The logit is a FIXED
  * left-to-right multiply-add chain and the sigmoid is rounded to 4 at
  * the edge (the q_perplexity exp-parity precedent), so scores are
  * reproducible across engines; the keep verdict thresholds the
  * ROUNDED score.
  */
object QualityLr {

  /** Fixed classifier weights: logit = bias + wTokens·(n/100) +
    * wAvgLen·avgLen + wTtr·ttr.
    */
  final case class Weights(bias: Double, wTokens: Double, wAvgLen: Double, wTtr: Double)

  /** A hand-set default favoring longer docs with diverse, word-length
    * tokens — the shape (not the values) is what production models have.
    */
  val defaultWeights: Weights = Weights(bias = -3.0, wTokens = 1.2, wAvgLen = 0.4, wTtr = 1.5)

  /** Per-document scores: (id, [passthrough...,] n_tokens, avg_len,
    * ttr, score, keep). Token-less documents are excluded (their ratio
    * features are undefined — the upstream length gate owns that
    * verdict). `passthrough` columns of `docs` ride along unchanged so
    * downstream group-wise filters ([[keepTopPerSource]]) need no
    * re-join against the corpus.
    */
  def score(docs: DataFrame, textCol: String, idCol: String,
      w: Weights = defaultWeights, threshold: Double = 0.5,
      passthrough: Seq[String] = Nil): DataFrame = {
    val toks = T.tokenize(col(textCol))
    val pt = passthrough.map(col)
    val scored = docs
      .select(Seq(col(idCol).as("id"), toks.as("__toks"),
        // translate (char-map delete), not regexp_replace: the last
        // regex in an operator hot path — java.util.regex serializes
        // across threads on this VM class (SCALE.md round 10)
        length(translate(T.normalizeText(col(textCol)), " ", "")).as("__chars")) ++ pt: _*)
      .where(size(col("__toks")) > 0)
      .select(Seq(col("id"),
        size(col("__toks")).cast("long").as("n_tokens"),
        (col("__chars").cast("double") / size(col("__toks")).cast("double")).as("avg_len"),
        (size(array_distinct(col("__toks"))).cast("double") / size(col("__toks")).cast("double")).as("ttr")) ++ pt: _*)
    val logit = lit(w.bias) +
      lit(w.wTokens) * (col("n_tokens").cast("double") / lit(100.0)) +
      lit(w.wAvgLen) * col("avg_len") +
      lit(w.wTtr) * col("ttr")
    scored
      .withColumn("score", round(lit(1.0) / (lit(1.0) + exp(-logit)), 4))
      .withColumn("keep", col("score") >= threshold)
  }

  /** Per-domain percentile filter (the CCNet shape): keep each source's
    * top `frac` of documents by classifier score — a per-domain
    * threshold, so a uniformly weaker domain is not wiped out by a
    * global cutoff. The kept count is ⌈frac · n_source⌉ exactly (ties
    * break by score desc, id), making the verdict a pure function of
    * (ids, scores, frac). Output: (id, sourceCol, score, rank).
    *
    * Scale shape: one shuffle on the bounded source dimension; the
    * rank and the per-source count share that single window exchange.
    * A pathologically hot domain sorts within its partitions like any
    * skewed window — salt the source key upstream if one domain is
    * most of the corpus.
    */
  def keepTopPerSource(docs: DataFrame, textCol: String, idCol: String,
      sourceCol: String, frac: Double, w: Weights = defaultWeights): DataFrame = {
    require(frac > 0.0 && frac <= 1.0, s"frac must be in (0, 1], got $frac")
    import org.apache.spark.sql.expressions.Window
    val scored = score(docs, textCol, idCol, w, passthrough = Seq(sourceCol))
    val win = Window.partitionBy(col(sourceCol)).orderBy(col("score").desc, col("id"))
    scored
      .withColumn("__rn", row_number().over(win).cast("long"))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(col(sourceCol))))
      .where(col("__rn") <= ceil(lit(frac) * col("__n").cast("double")))
      .select(col("id"), col(sourceCol), col("score"), col("__rn").as("rank"))
  }
}
