package graft.text

import graft.functions.{TextFunctions => T}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Temperature-based domain-mixture sampling — the data-mixing pass of a
  * training-data pipeline: given a corpus tagged with a source/domain
  * column and a total token budget, allocate the budget across sources
  * by TEMPERATURE-FLATTENED token shares (w_s ∝ p_s^(1/T); T=2 i.e.
  * √p_s here — the public multilingual-sampling rule from the mBERT /
  * XLM-R line of work), then keep each document via a deterministic
  * per-id hash threshold at its source's sampling rate.
  *
  * Scale shape (100 TB): pass 1 is ONE map-side-combined aggregation to
  * source granularity (output rows = #sources, a bounded dimension —
  * require'd here); the rate table is computed on the driver and
  * broadcast; pass 2 is a scan-local hash filter — the corpus is never
  * shuffled and no row is materialized twice.
  *
  * Determinism: token counts are integer-exact; the normalizer
  * Z = Σ_s √p_s is a DRIVER-SIDE left fold over sources in ascending
  * source order, so its bits are independent of partitioning and
  * reproducible by the oracle's `list_reduce(list(… ORDER BY source))`
  * fold; √ is IEEE-correctly-rounded in both engines, and the remaining
  * ops are single +,*,/,min applications in a fixed order. The keep
  * decision hashes the document ID (md5 16-bit fraction, the
  * q_weighted_sample idiom) — stable under re-partitioning, re-runs,
  * and engine choice.
  */
object Mixture {

  /** Per-source sampling rate: `tokens` from pass 1, `rate` =
    * min(1, budget·w_s / tokens_s) with w_s = √p_s / Z.
    */
  final case class SourceRate(source: String, tokens: Long, rate: Double)

  private val MaxSources = 100000

  /** Rate computation from per-source token totals — the pure driver-side
    * core, shared by [[sourceRates]] (one-shot batch) and
    * [[graft.streaming.StreamingMixture]] (refreeze from accumulated
    * per-batch stats: token totals are sums, so merge ≡ recompute).
    */
  def ratesFromTokenCounts(perSource: Seq[(String, Long)], budgetFraction: Double,
      capAtOne: Boolean = true): Seq[SourceRate] = {
    require(budgetFraction > 0, "Mixture: budgetFraction must be positive")
    require(perSource.length <= MaxSources,
      s"Mixture: ${perSource.length} sources exceed the bounded-dimension cap $MaxSources")
    val bySource = perSource.sortBy(_._1)
    val total = bySource.iterator.map(_._2).sum
    require(total > 0, "Mixture: corpus has no tokens")
    // Z: ascending-source left fold, mirrored exactly by the oracle
    val z = bySource.foldLeft(0.0) { case (acc, (_, tk)) =>
      acc + math.sqrt(tk.toDouble / total.toDouble)
    }
    val budget = budgetFraction * total.toDouble
    bySource.map { case (s, tk) =>
      val raw =
        if (tk == 0L) 0.0
        else budget * (math.sqrt(tk.toDouble / total.toDouble) / z) / tk.toDouble
      SourceRate(s, tk, if (capAtOne) math.min(1.0, raw) else raw)
    }
  }

  /** Pass 1 + driver-side rate computation. `budgetFraction` is the
    * target total-token budget as a fraction of the corpus (0.25 = keep
    * about a quarter of all tokens, redistributed toward small sources).
    */
  def sourceRates(docs: DataFrame, textCol: String, sourceCol: String,
      budgetFraction: Double, capAtOne: Boolean = true): Seq[SourceRate] = {
    val perSource = docs
      .groupBy(col(sourceCol).cast("string").as("source"))
      .agg(sum(T.tokenCount(col(textCol)).cast("long")).as("tokens"))
      .collect()
      .map { case Row(s: String, t: Long) => (s, t) }.toSeq
    ratesFromTokenCounts(perSource, budgetFraction, capAtOne)
  }

  /** md5 16-bit id fraction in [0,1) — the shared deterministic-sampling
    * hash (q_weighted_sample / q_train_test_split idiom).
    */
  private def hashFrac(id: org.apache.spark.sql.Column) =
    conv(substring(md5(id.cast("string")), 1, 4), 16, 10).cast("int").cast("double") / 65536.0

  /** Apply a GIVEN rate table — the epoch-frozen path: keep decisions
    * depend only on (id, source, rates), so any slice of the corpus —
    * a micro-batch, a backfill, the whole table — filters identically
    * no matter when it arrives. Sources absent from the rate table are
    * dropped (the mixture admits only budgeted sources).
    */
  def applyRates(docs: DataFrame, idCol: String, sourceCol: String,
      rates: Seq[SourceRate]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val rateDf = rates.map(r => (r.source, r.rate)).toDF("__mix_source", "__mix_rate")
    docs
      .join(broadcast(rateDf), col(sourceCol).cast("string") === col("__mix_source"), "inner")
      .where(hashFrac(col(idCol)) < col("__mix_rate"))
      .drop("__mix_source", "__mix_rate")
  }

  /** Pass 2: the sampled corpus (all original columns), kept iff
    * hashFrac(id) < rate(source).
    */
  def temperatureSample(docs: DataFrame, textCol: String, idCol: String,
      sourceCol: String, budgetFraction: Double): DataFrame =
    applyRates(docs, idCol, sourceCol, sourceRates(docs, textCol, sourceCol, budgetFraction))

  /** Expand by UNCAPPED rates — real temperature mixing UPSAMPLES
    * under-represented sources (rate > 1 → each doc repeats): a doc
    * gets `floor(rate)` guaranteed copies plus one more iff
    * hashFrac(id) < frac(rate), so expected copies = rate exactly and
    * the whole expansion is a pure function of (id, source, rates).
    * Output: all original columns plus `copy` (0-based repeat index);
    * rate < 1 downsamples as in [[applyRates]] (n_copies ∈ {0, 1}).
    *
    * Scale shape: the rate table is broadcast and the repeat is a
    * narrow explode — ≤ ⌈rate⌉ output rows per input row, no shuffle;
    * the per-source aggregation of pass 1 is the only exchange.
    */
  def expandWithRates(docs: DataFrame, idCol: String, sourceCol: String,
      rates: Seq[SourceRate]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val rateDf = rates
      .map(r => (r.source, math.floor(r.rate).toLong, r.rate - math.floor(r.rate)))
      .toDF("__mix_source", "__mix_base", "__mix_frac")
    val n = (col("__mix_base") +
      when(hashFrac(col(idCol)) < col("__mix_frac"), 1L).otherwise(0L)).cast("int")
    val out = docs.columns.map(col)
    docs
      .join(broadcast(rateDf), col(sourceCol).cast("string") === col("__mix_source"), "inner")
      .select(out :+ posexplode(array_repeat(lit(true), n)): _*)
      .select(out :+ col("pos").as("copy"): _*)
  }

  /** [[expandWithRates]] with rates computed from `docs` itself. */
  def temperatureExpand(docs: DataFrame, textCol: String, idCol: String,
      sourceCol: String, budgetFraction: Double): DataFrame =
    expandWithRates(docs, idCol, sourceCol,
      sourceRates(docs, textCol, sourceCol, budgetFraction, capAtOne = false))

  /** Gate-friendly per-source summary of a [[temperatureSample]] run:
    * (source, tokens, rate, n_kept, tokens_kept) — every source appears
    * even if nothing survived its rate.
    */
  def sampleSummary(docs: DataFrame, textCol: String, idCol: String,
      sourceCol: String, budgetFraction: Double): DataFrame =
    summaryWithRates(docs, textCol, idCol, sourceCol,
      sourceRates(docs, textCol, sourceCol, budgetFraction))

  /** [[sampleSummary]] against a GIVEN rate table (the epoch-frozen
    * path): `tokens` reports the rate table's token stat — the snapshot
    * the rates were frozen from, not necessarily `docs`.
    */
  def summaryWithRates(docs: DataFrame, textCol: String, idCol: String,
      sourceCol: String, rates: Seq[SourceRate]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val rateDf = rates.map(r => (r.source, r.tokens, r.rate)).toDF("source", "tokens", "rate")
    val kept = applyRates(docs, idCol, sourceCol, rates)
      .groupBy(col(sourceCol).cast("string").as("source"))
      .agg(count(lit(1)).as("n_kept"), sum(T.tokenCount(col(textCol)).cast("long")).as("tokens_kept"))
    rateDf.join(kept, Seq("source"), "left_outer")
      .select(col("source"), col("tokens"), col("rate"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("tokens_kept"), lit(0L)).as("tokens_kept"))
  }
}
