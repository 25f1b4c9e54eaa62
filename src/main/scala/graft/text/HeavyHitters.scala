package graft.text

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** EXACT frequent-item mining at corpus scale — "which tokens / URLs /
  * hosts / n-grams exceed θ of the corpus" is the first question asked
  * of any 100 TB crawl, and the naive answer (group-by over every
  * occurrence) shuffles the whole token stream to count items that are
  * almost all below threshold.
  *
  * Two corpus scans, neither shuffling raw occurrences:
  *
  *  1. CANDIDATES: each partition streams through a Misra–Gries summary
  *     of `ceil(1/θ)` counters (`mapPartitions`, O(1/θ) memory) and
  *     emits at most `1/θ` survivors plus its row count. Guarantee: an
  *     item with global count > θ·n has, in at least one partition
  *     (averaging argument), local count > θ·n_p ≥ n_p/(m+1), which
  *     Misra–Gries with m counters never evicts — so the union of
  *     partition summaries is a SUPERSET of the true heavy hitters.
  *     The summary (≤ partitions·⌈1/θ⌉ rows) is persisted — it is the
  *     only state this pass keeps.
  *  2. EXACT COUNTS: occurrences semi-join the BROADCAST candidate set
  *     (a scan-local filter — no shuffle of non-candidates), then only
  *     candidate occurrences aggregate (map-side partials over ≤
  *     partitions·⌈1/θ⌉ distinct keys) and the exact `count > θ·n`
  *     filter keeps precisely the true heavy hitters.
  *
  * The result is EXACT — the sketch only bounds the candidate set, every
  * reported count is a real count — which is what makes the operator
  * oracle-checkable (q_heavy_hitters) unlike a lossy-counting estimate.
  *
  * Scale shape: candidate traffic is partitions × ⌈1/θ⌉ rows (100k
  * partitions at θ = 1e-3 → 100M summary rows, still a shuffle of ids
  * not occurrences; at the θ ≥ 1% of vocabulary analyses it is
  * thousands). Null items are ignored (not counted toward n).
  */
object HeavyHitters {

  /** All items of `items(itemCol)` (cast to string) whose exact
    * occurrence count strictly exceeds `theta * n`, where n = number of
    * non-null occurrences. Output columns: (`itemCol`, "cnt"), exact
    * counts, unordered.
    */
  def frequent(items: DataFrame, itemCol: String, theta: Double): DataFrame = {
    require(theta > 0 && theta < 1, s"theta must be in (0, 1), got $theta")
    val spark = items.sparkSession
    import spark.implicits._
    val m = math.ceil(1.0 / theta).toInt
    val src = items
      .select(col(itemCol).cast("string").as("item"))
      .where(col("item").isNotNull)
    // pass 1: per-partition Misra–Gries summaries + row counts (the null
    // item marks a partition's total — itemCol rows are never null here)
    val summary: Dataset[(String, Long)] = src.as[String].mapPartitions { it =>
      val counts = new java.util.HashMap[String, java.lang.Long]()
      var total = 0L
      while (it.hasNext) {
        val x = it.next()
        total += 1
        val c = counts.get(x)
        if (c != null) counts.put(x, c + 1)
        else if (counts.size < m) counts.put(x, 1L)
        else {
          // MG step: the new item and every counter lose one; zeros evict
          val e = counts.entrySet().iterator()
          while (e.hasNext) {
            val en = e.next()
            if (en.getValue == 1L) e.remove() else en.setValue(en.getValue - 1)
          }
        }
      }
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
      counts.forEach((k, v) => out += ((k, v.longValue())))
      out += ((null, total))
      out.iterator
    }
    // the summary is tiny (≤ partitions·m rows) and consumed twice (n +
    // candidate set) — eager localCheckpoint so pass 1 runs once; the
    // summary-sized pin is left for GC per the family discipline
    // (releasing before the returned plan materializes breaks it), and a
    // checkpoint never pollutes the session CacheManager
    val sdf = summary.toDF("item", "w").localCheckpoint(true)
    val nRow = sdf.where(col("item").isNull).agg(sum(col("w"))).head()
    val n = if (nRow.isNullAt(0)) 0L else nRow.getLong(0)
    if (n == 0L)
      return src.groupBy(col("item").as(itemCol)).agg(count(lit(1)).as("cnt")).limit(0)
    val candidates = sdf.where(col("item").isNotNull).select(col("item")).distinct()
    src
      .join(broadcast(candidates), Seq("item"), "left_semi")
      .groupBy(col("item"))
      .agg(count(lit(1)).as("cnt"))
      .where(col("cnt") > lit(theta) * lit(n))
      .withColumnRenamed("item", itemCol)
  }

  /** Per-KEY exact heavy hitters: for every key k, all items whose count
    * within k strictly exceeds `theta * n_k` (n_k = k's non-null
    * occurrence count). Same two-scan shape as [[frequent]] with one
    * Misra–Gries summary per key per partition — the per-key averaging
    * argument gives the same superset guarantee key-by-key, and the
    * exact recount joins on (key, item).
    *
    * Memory contract: a partition holds `distinct keys in partition ×
    * ⌈1/θ⌉` counters — sized for LOW-cardinality keys (language, source,
    * shard). For high-cardinality keys pre-partition by key so each
    * partition sees few, or use plain group-by (the key already shards
    * the shuffle). Null keys are ignored along with null items.
    *
    * Output columns: (`keyCol`, `itemCol`, "cnt"), exact, unordered.
    */
  def frequentPerKey(items: DataFrame, keyCol: String, itemCol: String,
      theta: Double): DataFrame = {
    require(theta > 0 && theta < 1, s"theta must be in (0, 1), got $theta")
    val spark = items.sparkSession
    import spark.implicits._
    val m = math.ceil(1.0 / theta).toInt
    val src = items
      .select(col(keyCol).cast("string").as("key"), col(itemCol).cast("string").as("item"))
      .where(col("key").isNotNull && col("item").isNotNull)
    val summary: Dataset[(String, String, Long)] =
      src.as[(String, String)].mapPartitions { it =>
        val perKey = new java.util.HashMap[String, java.util.HashMap[String, java.lang.Long]]()
        val totals = new java.util.HashMap[String, java.lang.Long]()
        while (it.hasNext) {
          val (k, x) = it.next()
          totals.merge(k, 1L, (a, b) => a + b)
          val counts = perKey.computeIfAbsent(k, _ => new java.util.HashMap[String, java.lang.Long]())
          val c = counts.get(x)
          if (c != null) counts.put(x, c + 1)
          else if (counts.size < m) counts.put(x, 1L)
          else {
            val e = counts.entrySet().iterator()
            while (e.hasNext) {
              val en = e.next()
              if (en.getValue == 1L) e.remove() else en.setValue(en.getValue - 1)
            }
          }
        }
        val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
        perKey.forEach((k, counts) => counts.forEach((x, v) => out += ((k, x, v.longValue()))))
        totals.forEach((k, t) => out += ((k, null, t.longValue())))
        out.iterator
      }
    val sdf = summary.toDF("key", "item", "w").localCheckpoint(true)
    // per-key totals are a tiny frame (one row per key); they join back
    // broadcast so the threshold is evaluated per key
    val totals = sdf.where(col("item").isNull)
      .groupBy(col("key")).agg(sum(col("w")).as("__n"))
    val candidates = sdf.where(col("item").isNotNull).select(col("key"), col("item")).distinct()
    src
      .join(broadcast(candidates), Seq("key", "item"), "left_semi")
      .groupBy(col("key"), col("item"))
      .agg(count(lit(1)).as("cnt"))
      .join(broadcast(totals), Seq("key"))
      .where(col("cnt") > lit(theta) * col("__n"))
      .select(col("key").as(keyCol), col("item").as(itemCol), col("cnt"))
  }
}
