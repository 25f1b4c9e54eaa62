package graft

import graft.text.Sharding
import org.apache.spark.sql.functions._

class ShardingSpec extends SparkSpec {
  import spark.implicits._

  test("sorted round-robin: spread bounded by the largest weight, hash-mod is not") {
    // adversarial skew: a few huge docs + a long tail
    val items = (1L to 200L).map(i => (i, if (i <= 5) 5000L else (i * 13 % 97) + 1))
    val assigned = Sharding.assignShards(items.toDF("id", "w"), "id", col("w"), nShards = 8)
    val totals = Sharding.shardSummary(assigned)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(totals.map(_._1).toSeq == (0 to 7), "every shard must be populated")
    val maxW = items.map(_._2).max
    val spread = totals.map(_._3).max - totals.map(_._3).min
    assert(spread <= maxW, s"spread $spread exceeds the max-item bound $maxW")
    // item counts differ by at most one (round robin)
    assert(totals.map(_._2).max - totals.map(_._2).min <= 1)
  }

  test("assignment is deterministic and partition-independent") {
    val items = (1L to 100L).map(i => (i, i * 7 % 31)).toDF("id", "w")
    val a = Sharding.assignShards(items, "id", col("w"), nShards = 4)
      .collect().map(r => (r.getLong(0), r.getInt(2))).sortBy(_._1).toSeq
    val b = Sharding.assignShards(items.repartition(13), "id", col("w"), nShards = 4)
      .collect().map(r => (r.getLong(0), r.getInt(2))).sortBy(_._1).toSeq
    assert(a == b)
    // equal weights: ties broken by id, still a full round robin
    val ties = Sharding.assignShards(
      (1L to 12L).map((_, 5L)).toDF("id", "w"), "id", col("w"), nShards = 3)
      .collect().map(r => (r.getLong(0), r.getInt(2))).sortBy(_._1).toSeq
    assert(ties == (1L to 12L).map(i => (i, ((i - 1) % 3).toInt)).toSeq)
  }
}
