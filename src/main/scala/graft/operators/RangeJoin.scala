package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scalable interval (range) join: points `v` against intervals
  * `[lo, hi)`.
  *
  * Spark's native plan for a non-equi join condition is
  * BroadcastNestedLoopJoin — fine while one side fits the broadcast
  * threshold, quadratic disaster for fact×fact. This operator makes the
  * join an EQUI-join on a derived bucket key so it hash-partitions:
  * intervals explode to every `bucketWidth`-sized bucket they overlap,
  * points map to their single bucket, both sides shuffle once on the
  * uniform bucket id, and the original predicate re-checks candidates
  * inside the bucket (no false negatives: an interval covers a point only
  * if it overlaps the point's bucket).
  *
  * Cost model at 100 TB: shuffle volume = points×1 + intervals×(avg
  * interval length / bucketWidth). Pick bucketWidth ≈ the median interval
  * length so interval amplification stays O(1–2×). Degenerate wide
  * intervals (≫ bucketWidth) amplify — cap them by splitting the interval
  * table by length and broadcasting the wide tail if it is small, which
  * is the standard hybrid. Skew: a hot bucket means many intervals
  * overlap one value range; AQE skew-join splits it since this is a
  * plain sort-merge/hash join after the rewrite.
  */
object RangeJoin {

  /** Inner-join `points` to `intervals` where
    * `points(pointCol) ∈ [intervals(loCol), intervals(hiCol))`.
    * Output columns: all point columns then all interval columns.
    */
  def bucketed(
      points: DataFrame,
      intervals: DataFrame,
      pointCol: String,
      loCol: String,
      hiCol: String,
      bucketWidth: Double
  ): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val shared = points.columns.toSet.intersect(intervals.columns.toSet)
    require(shared.isEmpty, s"column name collision between sides: ${shared.mkString(", ")}")
    val b = "__graft_bucket"
    val p = points.withColumn(b, floor(col(pointCol) / bucketWidth).cast("long"))
    // interval [lo, hi) overlaps buckets floor(lo/w) .. floor(hi/w); the
    // last bucket is superfluous when hi lands exactly on a boundary, but
    // the residual predicate filters those candidates — correctness never
    // depends on the bucket arithmetic's edge cases
    val iv = intervals.withColumn(
      b,
      explode(sequence(
        floor(col(loCol) / bucketWidth).cast("long"),
        floor(col(hiCol) / bucketWidth).cast("long"))))
    p.join(iv, Seq(b))
      .where(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop(b)
  }

  /** Point-in-interval join against a SMALL, sorted, non-overlapping
    * interval dimension via a plan-embedded binary-search index
    * ([[graft.expressions.IntervalLookup]]): each point row does ONE
    * O(log n) codegen'd lookup — no join operator in the plan at all, so
    * it beats BroadcastNestedLoopJoin's per-row interval scan AND skips
    * the shuffle of [[bucketed]]. The interval table is collected to the
    * driver (require it dimension-sized; the engine's 64 MB broadcast
    * regime applies conceptually) and the intervals must be disjoint —
    * use [[bucketed]] for overlapping or fact-sized interval tables.
    * Inner-join semantics: points outside every interval are dropped.
    */
  def broadcastIndexed(
      points: DataFrame,
      intervals: DataFrame,
      pointCol: String,
      loCol: String,
      hiCol: String
  ): DataFrame = {
    import org.apache.spark.sql.graftbridge.Bridge
    val rows = intervals.select(col(loCol).cast("double"), col(hiCol).cast("double"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).sortBy(_._1)
    val idxCol = "__graft_iv_idx"
    val lookup = Bridge.column(graft.expressions.IntervalLookup(
      Bridge.expression(col(pointCol)), rows.map(_._1), rows.map(_._2)))
    // attach the interval payload by index: the lookup gives each point
    // its interval ordinal, a broadcast equi-join on that tiny int key
    // brings in the payload — a BroadcastHashJoin, never a nested loop
    val sortedIv = intervals.orderBy(col(loCol))
    val ivWithIdx = graft.table.RowId.withRowIndex(sortedIv, idxCol + "_l")
      .withColumn(idxCol, col(idxCol + "_l").cast("int")).drop(idxCol + "_l")
    points
      .withColumn(idxCol, lookup)
      .where(col(idxCol).isNotNull)
      .join(org.apache.spark.sql.functions.broadcast(ivWithIdx), Seq(idxCol))
      .drop(idxCol)
  }
}
