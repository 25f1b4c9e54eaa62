package graft.text

import graft.table.RowId
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Balanced output sharding — the final layout pass of a training-data
  * pipeline: assign each document (or packed sequence) to one of N
  * output shards so per-shard token totals are near-equal, keeping
  * data-parallel loaders in lockstep (a hash-mod shard is only
  * balanced in expectation; long-document skew routinely leaves one
  * shard 10%+ heavy, and every other loader waits for it each epoch).
  *
  * Strategy: SORTED ROUND-ROBIN — rank items by (weight desc, id),
  * shard = rank mod N. Descending interleave gives the classic bound
  * max(shard) − min(shard) ≤ max single weight (each round of N
  * consecutive ranks spreads near-equal weights across all shards;
  * spec-checked), which is optimal up to the largest item without any
  * driver-side bin-packing state. Deterministic: a pure function of
  * (ids, weights, N) — re-runs and engines agree bit-for-bit.
  *
  * Scale shape (100 TB): only (id, weight) pairs — ~16 B/item — enter
  * the rank's range exchange ([[graft.table.RowId]] offsets pattern, no
  * single-partition window); the assignment itself is a narrow
  * projection. The subsequent physical write repartitions by `shard`,
  * shuffling each row once — the unavoidable placement shuffle.
  */
object Sharding {

  /** Per-item shard assignment: (idCol, weight, shard) with shard in
    * [0, nShards). Ties on weight break by id, so equal-weight corpora
    * still shard deterministically.
    */
  def assignShards(df: DataFrame, idCol: String, weight: Column, nShards: Int): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    val pairs = df.select(col(idCol), weight.cast(LongType).as("weight"))
    val (ranked, _) = RowId.withRowIndexCounted(
      pairs.orderBy(col("weight").desc, col(idCol)), "__rank0")
    ranked.select(col(idCol), col("weight"),
      pmod(col("__rank0"), lit(nShards.toLong)).cast(IntegerType).as("shard"))
  }

  /** Per-shard balance report over an [[assignShards]] result:
    * (shard, n_items, total_weight, max_weight).
    */
  def shardSummary(assigned: DataFrame): DataFrame =
    assigned.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("weight")).as("total_weight"),
        max(col("weight")).as("max_weight"))
}
