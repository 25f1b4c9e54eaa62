package graft.dedup

import graft.functions.{TextFunctions => T}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-data curation: the composition a 100 TB pretraining
  * pipeline actually runs, in dependency order chosen for cost:
  *
  *  1. quality gate   — scan-local expression filter (cheapest first: cuts
  *                      volume before anything shuffles),
  *  2. repetition gate — optional scan-local Gopher-style repetition caps
  *                      (fused per-row n-gram stats, zero shuffles),
  *  3. perplexity gate — optional CCNet-shape unigram-LM tail drop (one
  *                      broadcast-model scoring pass),
  *  4. language gate  — optional scan-local stopword language ID,
  *  5. exact dedup    — one fingerprint aggregation (removes the mass of
  *                      byte-identical copies so near-dup LSH buckets stay
  *                      small),
  *  6. near dedup     — MinHash+LSH with exact-Jaccard verification and
  *                      min-label-propagation cluster collapse,
  *  7. passage gate   — optional: drop documents whose w-token spans are
  *                      mostly duplicated elsewhere in the corpus
  *                      (boilerplate-heavy survivors of 5-6),
  *  8. decontamination — optional: drop documents sharing any w-token span
  *                      with a held-out eval set (test-set leakage guard;
  *                      last because it must see the final candidate set
  *                      and the eval side is tiny/broadcast).
  *
  * Each stage only shrinks the data, so the expensive stages see the
  * minimum corpus. Returns the surviving rows plus per-stage counts for
  * observability (the reference's observe/progress analog).
  */
object CurationPipeline {

  /** Repetition-signal caps (Gopher table A1 spirit: docs exceeding any
    * cap are dropped). Defaults are the public thresholds' ballpark.
    */
  final case class RepetitionGate(
      maxTopWordFrac: Double = 0.3,
      maxTopBigramCharFrac: Double = 0.2,
      maxDupTrigramFrac: Double = 0.6)

  final case class StageCounts(
      input: Long,
      afterQuality: Long,
      afterRepetition: Long,
      afterPerplexity: Long,
      afterLang: Long,
      afterExact: Long,
      afterNear: Long,
      afterPassage: Long,
      afterDecontaminate: Long)

  final case class Result(survivors: DataFrame, counts: StageCounts)

  /** @param collectStats when true, count every stage (extra jobs that
    *   re-evaluate the gate lineage — observability mode); when false the
    *   pipeline stays one lazy plan until the caller's action (production
    *   mode: stage counts come back as -1).
    */
  def run(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      minQuality: Double = 0.5,
      maxRepetition: Option[RepetitionGate] = None,
      maxPerplexity: Option[Double] = None,
      keepLangs: Option[Seq[String]] = None,
      nearThreshold: Double = 0.7,
      maxDupSpanRatio: Option[Double] = None,
      spanLen: Int = 8,
      evalSet: Option[DataFrame] = None,
      collectStats: Boolean = false
  ): Result = {
    def n(df: DataFrame): Long = if (collectStats) df.count() else -1L

    val qualityGated = docs.where(T.qualityScore(col(textCol)) >= minQuality)
    val repetitionGated = maxRepetition match {
      case Some(gate) =>
        // Gopher-style repetition caps — still scan-local (the signals are
        // fused per-row expressions, so this stage adds zero shuffles)
        val sig = T.repetitionSignals(col(textCol)).toMap
        qualityGated.where(
          sig("top_word_frac") <= gate.maxTopWordFrac &&
            sig("top_bigram_char_frac") <= gate.maxTopBigramCharFrac &&
            sig("dup_trigram_frac") <= gate.maxDupTrigramFrac)
      case None => qualityGated
    }
    val perplexityGated = maxPerplexity match {
      case Some(maxPpl) =>
        // CCNet-shape LM gate: unigram model over the (already gated)
        // corpus, drop the high-perplexity tail. One extra count agg for
        // the model (broadcasts) + one uniform-key scoring shuffle.
        // the gated corpus feeds three consumers here (model count agg,
        // scoring pass, anti-join left side) — materialize it once
        // instead of re-running the quality/repetition scans per consumer
        val gated = repetitionGated.localCheckpoint(true)
        val model = graft.text.LmScore.unigramModel(gated, textCol)
        // anti-join on the DROP set: token-less docs (unscorable — no
        // perplexity row exists) pass through rather than vanish
        val drop = graft.text.LmScore.perplexity(gated, textCol, idCol, model)
          .where(col("perplexity") > maxPpl)
          .select(col("id").as(idCol))
        gated.join(drop, Seq(idCol), "left_anti")
      case None => repetitionGated
    }
    val langGated = keepLangs match {
      case Some(langs) => perplexityGated.where(T.langId(col(textCol)).isin(langs: _*))
      case None        => perplexityGated
    }
    // materialize the gated corpus once: the near-dedup stage consumes it
    // several times (signatures + anti-join back). localCheckpoint, NOT
    // cache(): blocks release when the result goes unreferenced
    // (ContextCleaner), so the pipeline never leaks a CacheManager entry
    // (the r2 cache-hygiene test enforces this for all dedup paths) —
    // and near-dedup already materializes eagerly, so no laziness is lost
    val exactDeduped = Dedup.exact(langGated, textCol, idCol).localCheckpoint(true)
    val nearDeduped = Dedup.minHashDedup(exactDeduped, textCol, idCol, threshold = nearThreshold)
    val passageGated = maxDupSpanRatio match {
      case Some(maxRatio) =>
        // keep docs below the duplicated-span threshold; docs too short to
        // have any w-token span produce no stats row and are kept
        val flagged = Dedup.spanDupStats(nearDeduped, textCol, idCol, w = spanLen)
          .where(col("dup_ratio") > maxRatio)
          .select(col("id").as(idCol))
        nearDeduped.join(flagged, Seq(idCol), "left_anti")
      case None => nearDeduped
    }
    val survivors = evalSet match {
      case Some(ev) => Decontaminate.clean(passageGated, ev, textCol, idCol, w = spanLen)
      case None     => passageGated
    }

    Result(
      survivors,
      StageCounts(
        n(docs), n(qualityGated), n(repetitionGated), n(perplexityGated), n(langGated),
        n(exactDeduped), n(nearDeduped), n(passageGated), n(survivors)))
  }
}
