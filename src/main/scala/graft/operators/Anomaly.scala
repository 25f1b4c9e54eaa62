package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ingestion-rate anomaly detection — per-key bucketed event counts
  * z-scored against that key's own rate history, the monitoring pass an
  * always-on ingestion pipeline runs ahead of training-data selection
  * (a crawler going into a loop, a source going dark, a bot burst —
  * all show up as rate spikes/droughts long before content checks see
  * them).
  *
  * Determinism contract: the mean/variance inputs are EXACT integer
  * aggregates (Σn and Σn² over per-bucket counts — Long addition is
  * exactly commutative, so partitioning cannot change a bit), and the
  * float tail is a fixed-order expression over those exact values:
  * μ = S₁/m, var = (S₂ − S₁·S₁/m)/(m−1), σ = √var (IEEE sqrt is
  * correctly rounded — the HyperBall lesson: sqrt is portable, pow/ln
  * are not), z = (n − μ)/σ. DuckDB replays the identical expression
  * tree, so even the z DOUBLES are hash-exact. Degenerate lanes are
  * pinned: fewer than 2 buckets or zero variance ⇒ z = 0.
  *
  * Scale shape: one map-side-combined count to (key, bucket)
  * granularity, one key-level rollup of three integers, one broadcast-
  * friendly join back — the corpus is touched once, nothing is
  * quadratic. Σn² needs n ≤ ~3·10⁹ per (key, bucket) to stay inside a
  * signed 64-bit — at that rate per bucket, shorten the bucket.
  */
object Anomaly {

  /** Per-(key, bucket) event counts with the key-history z-score.
    * `bucket` is a `date_trunc` unit (`"hour"`, `"day"`, …). Returns
    * `(keyCol, bucket, n, z, is_anomaly)`.
    */
  def rateZ(events: DataFrame, keyCol: String, tsCol: String, bucket: String,
      zThreshold: Double = 3.0): DataFrame =
    zFromCounts(
      events.groupBy(col(keyCol), date_trunc(bucket, col(tsCol)).as("bucket"))
        .agg(count(lit(1)).as("n")),
      keyCol, zThreshold)

  /** Robust variant of [[rateZ]]: median/MAD instead of mean/σ — a
    * single extreme spike inflates the mean AND the variance enough to
    * mask itself (and its neighbors) in the classic z; the median and
    * the median absolute deviation ignore it. `z_robust` =
    * (n − median) / (1.4826 · MAD), the standard normal-consistency
    * scaling.
    *
    * Determinism: bucket counts are integers; `percentile(·, 0.5)` is
    * the exact sorted R-7 interpolated median in BOTH engines, and on
    * integer inputs every interpolation is a half — exactly
    * representable, so medians, |n − med| deviations, the MAD, and the
    * final fixed-order division are all bit-portable. Zero MAD (over
    * half the buckets identical) pins `z_robust = 0`.
    */
  def robustRateZ(events: DataFrame, keyCol: String, tsCol: String, bucket: String,
      zThreshold: Double = 3.5): DataFrame = {
    require(zThreshold > 0, s"Anomaly.robustRateZ: zThreshold $zThreshold <= 0")
    val counts = events
      .groupBy(col(keyCol), date_trunc(bucket, col(tsCol)).as("bucket"))
      .agg(count(lit(1)).as("n"))
    val med = counts.groupBy(col(keyCol))
      .agg(expr("percentile(n, 0.5)").as("__med"))
    val withDev = counts.join(med, Seq(keyCol))
      .withColumn("__dev", abs(col("n").cast("double") - col("__med")))
    val mad = withDev.groupBy(col(keyCol))
      .agg(expr("percentile(__dev, 0.5)").as("__mad"))
    withDev.join(mad, Seq(keyCol))
      .withColumn("z_robust",
        when(col("__mad") === 0.0, lit(0.0))
          .otherwise((col("n").cast("double") - col("__med")) / (lit(1.4826) * col("__mad"))))
      .select(col(keyCol), col("bucket"), col("n"), col("__med").as("med"),
        col("z_robust"), (abs(col("z_robust")) > zThreshold).as("is_anomaly"))
  }

  /** Seasonal variant of [[rateZ]]: each bucket is scored against the
    * key's SAME-SEASON history (season = hour-of-day here) instead of
    * its whole history — traffic with a strong diurnal cycle flags 3 am
    * as anomalous all night under the flat baseline, and hides a real
    * 3 am burst inside the daytime variance; comparing hour-of-day to
    * hour-of-day fixes both. Same exact integer Σn/Σn² machinery as
    * [[rateZ]], grouped by (key, season); same pinned degenerate lanes.
    * Returns `(keyCol, bucket, season, n, z, is_anomaly)`.
    */
  def rateZSeasonal(events: DataFrame, keyCol: String, tsCol: String,
      zThreshold: Double = 3.0): DataFrame = {
    require(zThreshold > 0, s"Anomaly.rateZSeasonal: zThreshold $zThreshold <= 0")
    val counts = events
      .groupBy(col(keyCol), date_trunc("hour", col(tsCol)).as("bucket"))
      .agg(count(lit(1)).as("n"))
      .withColumn("season", hour(col("bucket")).cast("long"))
    val stats = counts.groupBy(col(keyCol), col("season")).agg(
      count(lit(1)).as("__m"),
      sum(col("n")).as("__s1"),
      sum(col("n") * col("n")).as("__s2"))
    val mu = col("__s1").cast("double") / col("__m").cast("double")
    val variance =
      (col("__s2").cast("double") -
        col("__s1").cast("double") * col("__s1").cast("double") / col("__m").cast("double")) /
        (col("__m") - 1).cast("double")
    counts.join(stats, Seq(keyCol, "season"))
      .withColumn("__mu", mu)
      .withColumn("__var", when(col("__m") < 2, lit(0.0)).otherwise(variance))
      .withColumn("__sigma",
        when(col("__m") < 2 || col("__var") <= 0.0, lit(0.0)).otherwise(sqrt(col("__var"))))
      .withColumn("z",
        when(col("__sigma") === 0.0, lit(0.0))
          .otherwise((col("n").cast("double") - col("__mu")) / col("__sigma")))
      .select(col(keyCol), col("bucket"), col("season"), col("n"), col("z"),
        (abs(col("z")) > zThreshold).as("is_anomaly"))
  }

  /** Rate DRIFT per key: the least-squares slope of bucket counts over
    * bucket INDEX (0, 1, 2, … in bucket order) — the trend companion to
    * the spike detectors ([[rateZ]]/[[robustRateZ]] catch bursts; a
    * crawler slowly dying or a source quietly ramping shows up as slope,
    * not spikes). Returns one row per key:
    * `(keyCol, m, first_bucket, last_bucket, total, slope)` where
    * `slope` is events-per-bucket change.
    *
    * Determinism: x is a dense integer index, y an integer count, so
    * Σx, Σy, Σxy, Σx² are exact Long aggregates; the closed form
    * `(m·Σxy − Σx·Σy) / (m·Σx² − Σx·Σx)` is evaluated in that exact
    * order on doubles cast from those longs (every input < 2⁵³ for any
    * corpus whose Σ n·x fits 64-bit — at 10⁶ buckets keep per-bucket
    * counts under ~10⁷, or widen the bucket). Keys with < 2 buckets pin
    * `slope = 0`.
    */
  def rateTrend(events: DataFrame, keyCol: String, tsCol: String, bucket: String): DataFrame =
    trendFromCounts(
      events.groupBy(col(keyCol), date_trunc(bucket, col(tsCol)).as("bucket"))
        .agg(count(lit(1)).as("n")),
      keyCol)

  /** Robust variant of [[rateTrend]]: the THEIL–SEN slope — the median
    * of all pairwise bucket-to-bucket slopes. Least squares lets one
    * corrupted bucket (an outage logged as zero, a replayed burst) drag
    * the fitted slope arbitrarily; the pairwise-slope median tolerates
    * up to ~29% corrupted points. Cost is m² slope pairs PER KEY where
    * m is the BUCKET count (a bounded dimension — 10⁵ buckets = years
    * of hours; `maxBuckets` fail-fasts anything larger, same pattern as
    * every other quadratic guard here). Each slope is exact-int
    * differences and one IEEE division; the median interpolation is one
    * add + halve — all bit-portable. Returns
    * `(keyCol, m, total, slope_ts)` with < 2 buckets pinned to 0.
    */
  def rateTrendRobust(events: DataFrame, keyCol: String, tsCol: String, bucket: String,
      maxBuckets: Long = 100000L): DataFrame = {
    require(maxBuckets >= 2, s"Anomaly.rateTrendRobust: maxBuckets $maxBuckets < 2")
    val counts = events
      .groupBy(col(keyCol), date_trunc(bucket, col(tsCol)).as("bucket"))
      .agg(count(lit(1)).as("n"))
    import org.apache.spark.sql.expressions.Window
    val indexed = counts.withColumn("__x",
        row_number().over(Window.partitionBy(col(keyCol)).orderBy(col("bucket"))).cast("long") - 1L)
      .localCheckpoint(true) // self-joined below; and the guard reads it
    val worst = indexed.groupBy(col(keyCol)).agg(count(lit(1)).as("__m"))
      .agg(max(col("__m"))).head() match {
      case r if r.isNullAt(0) => 0L
      case r => r.getLong(0)
    }
    if (worst > maxBuckets) throw new IllegalArgumentException(
      s"Anomaly.rateTrendRobust: $worst buckets for one key means ${worst * worst} " +
        s"pairwise slopes, over maxBuckets $maxBuckets - widen the bucket or raise " +
        "maxBuckets explicitly to accept the quadratic cost.")
    val a = indexed.select(col(keyCol), col("__x").as("__xa"), col("n").as("__na"))
    val bb = indexed.select(col(keyCol), col("__x").as("__xb"), col("n").as("__nb"))
    val slopes = a.join(bb, Seq(keyCol)).where(col("__xa") < col("__xb"))
      .select(col(keyCol),
        ((col("__nb") - col("__na")).cast("double") /
          (col("__xb") - col("__xa")).cast("double")).as("__s"))
    val med = slopes.groupBy(col(keyCol))
      .agg(expr("percentile(__s, 0.5)").as("slope_ts"))
    indexed.groupBy(col(keyCol))
      .agg(count(lit(1)).as("m"), sum(col("n")).as("total"))
      .join(med, Seq(keyCol), "left")
      .select(col(keyCol), col("m"), col("total"),
        coalesce(col("slope_ts"), lit(0.0)).as("slope_ts"))
  }

  /** The regression tail over an already-aggregated `(keyCol, bucket, n)`
    * count table — shared with the streaming monitor (summed integer
    * deltas land in exactly this shape).
    */
  def trendFromCounts(counts: DataFrame, keyCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val indexed = counts.withColumn("__x",
      row_number().over(Window.partitionBy(col(keyCol)).orderBy(col("bucket"))).cast("long") - 1L)
    val num = col("__m").cast("double") * col("__sxy").cast("double") -
      col("__sx").cast("double") * col("__sy").cast("double")
    val den = col("__m").cast("double") * col("__sxx").cast("double") -
      col("__sx").cast("double") * col("__sx").cast("double")
    indexed.groupBy(col(keyCol)).agg(
        count(lit(1)).as("__m"),
        min(col("bucket")).as("first_bucket"),
        max(col("bucket")).as("last_bucket"),
        sum(col("__x")).as("__sx"),
        sum(col("n")).as("__sy"),
        sum(col("__x") * col("n")).as("__sxy"),
        sum(col("__x") * col("__x")).as("__sxx"))
      .select(col(keyCol), col("__m").as("m"), col("first_bucket"), col("last_bucket"),
        col("__sy").as("total"),
        when(col("__m") < 2, lit(0.0)).otherwise(num / den).as("slope"))
  }

  /** One-row-per-key ingestion HEALTH REPORT — the composite a pipeline
    * dashboard reads: bucket count, total volume, worst spike
    * (max |z|, order-independent over the bit-exact z doubles), anomaly
    * count at the threshold, and the drift slope. One shared
    * (key, bucket) count aggregation feeds both tails.
    */
  def healthReport(events: DataFrame, keyCol: String, tsCol: String, bucket: String,
      zThreshold: Double = 3.0): DataFrame = {
    val counts = events
      .groupBy(col(keyCol), date_trunc(bucket, col(tsCol)).as("bucket"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(true) // consumed by both tails
    val spikes = zFromCounts(counts, keyCol, zThreshold)
      .groupBy(col(keyCol)).agg(
        max(abs(col("z"))).as("max_abs_z"),
        sum(when(col("is_anomaly"), 1L).otherwise(0L)).as("n_anomalies"))
    trendFromCounts(counts, keyCol)
      .join(spikes, Seq(keyCol))
      .select(col(keyCol), col("m").as("n_buckets"), col("total"),
        col("max_abs_z"), col("n_anomalies"), col("slope"))
  }

  /** The z-score tail over an already-aggregated `(keyCol, bucket, n)`
    * count table — shared by [[rateZ]] and the streaming twin
    * ([[graft.streaming.StreamingAnomaly]] sums per-batch integer deltas
    * into exactly this shape, so both paths serve identical bits).
    */
  def zFromCounts(counts: DataFrame, keyCol: String, zThreshold: Double = 3.0): DataFrame = {
    require(zThreshold > 0, s"Anomaly.zFromCounts: zThreshold $zThreshold <= 0")
    val stats = counts.groupBy(col(keyCol)).agg(
      count(lit(1)).as("__m"),
      sum(col("n")).as("__s1"),
      sum(col("n") * col("n")).as("__s2"))
    val mu = col("__s1").cast("double") / col("__m").cast("double")
    val variance =
      (col("__s2").cast("double") -
        col("__s1").cast("double") * col("__s1").cast("double") / col("__m").cast("double")) /
        (col("__m") - 1).cast("double")
    counts.join(stats, Seq(keyCol))
      .withColumn("__mu", mu)
      // the m < 2 pin must wrap the DIVISION, not just the consumer:
      // ANSI mode throws DIVIDE_BY_ZERO for doubles too
      .withColumn("__var", when(col("__m") < 2, lit(0.0)).otherwise(variance))
      .withColumn("__sigma",
        when(col("__m") < 2 || col("__var") <= 0.0, lit(0.0)).otherwise(sqrt(col("__var"))))
      .withColumn("z",
        when(col("__sigma") === 0.0, lit(0.0))
          .otherwise((col("n").cast("double") - col("__mu")) / col("__sigma")))
      .select(col(keyCol), col("bucket"), col("n"), col("z"),
        (abs(col("z")) > zThreshold).as("is_anomaly"))
  }
}
