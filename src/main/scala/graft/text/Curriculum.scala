package graft.text

import graft.table.RowId
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

/** Curriculum ordering — the epoch-construction pass of a training-data
  * pipeline: bucket documents by a difficulty/quality score, then build
  * per-epoch orderings where early epochs see only the easiest buckets
  * and each later epoch widens the admitted set (the classic
  * easy-to-hard curriculum schedule), with a reproducible per-epoch
  * shuffle inside the admitted set.
  *
  * Determinism end to end: the bucket is the exact SQL `ntile(b)` over
  * the total order (score, id) — computed HERE from the global rank via
  * the ntile size formula, not a window function — and the per-epoch
  * position ranks `md5("epoch<e>:" || id)` (the q_shuffle_order idiom:
  * new epoch = new salt = a different but reproducible permutation).
  * Every step is a pure function of (ids, scores, b, epochs).
  *
  * Scale shape (100 TB): only (id, score) pairs — ~16 B/doc — enter any
  * exchange; the text never moves. The global rank is the
  * [[graft.table.RowId]] offsets pattern (range exchange + per-partition
  * counts to the driver, O(#partitions)); the per-epoch position reuses
  * the same pattern generalized to restart per epoch: one range
  * repartition by (epoch, hash), per-(partition, epoch) counts to the
  * driver, offsets broadcast back. No global single-partition window
  * anywhere — both ranks stay fully parallel.
  */
object Curriculum {

  /** Bucket assignment: (idCol, bucket) with bucket = ntile(nBuckets)
    * over ascending (scoreCol, idCol) — bucket 1 holds the LOWEST
    * scores (the "easiest" end under a difficulty score; pass a negated
    * column for quality-descending curricula). The bucket is computed
    * from the global rank via the exact SQL ntile size formula — the
    * first `n % b` buckets take `n/b + 1` rows, the rest `n/b` — with
    * integral `div` arithmetic (no float quotients), so it equals any
    * engine's `ntile(b) OVER (ORDER BY score, id)` bit-for-bit without
    * a single-partition global window.
    */
  def qualityBuckets(docs: DataFrame, idCol: String, scoreCol: Column, nBuckets: Int): DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    val pairs = docs.select(col(idCol), scoreCol.as("__score"))
    val (ranked, n) = RowId.withRowIndexCounted(
      pairs.orderBy(col("__score"), col(idCol)), "__rank0")
    require(n > 0, "Curriculum: no documents")
    val base = n / nBuckets
    val rem = n % nBuckets
    val cut = rem * (base + 1) // ranks 1..cut live in the wide buckets
    val bucket =
      if (base == 0) "__rank" // n < b: rank r IS bucket r
      else s"CASE WHEN __rank <= $cut THEN (__rank - 1) div ${base + 1} + 1" +
        s" ELSE $rem + (__rank - 1 - $cut) div $base + 1 END"
    ranked
      .select(col(idCol), (col("__rank0") + 1).as("__rank"))
      .select(col(idCol), expr(s"CAST(($bucket) AS INT)").as("bucket"))
  }

  /** Per-epoch curriculum order. Epoch e ∈ 1..epochs admits buckets
    * 1..⌈e·nBuckets/epochs⌉ (so the last epoch always admits every
    * bucket) and orders its admitted documents by the epoch-salted hash.
    * Output: (idCol, bucket, epoch, pos) with pos contiguous 1..n_e
    * inside each epoch.
    */
  def epochOrder(docs: DataFrame, idCol: String, scoreCol: Column,
      nBuckets: Int, epochs: Int): DataFrame = {
    require(epochs >= 1, s"epochs must be >= 1, got $epochs")
    val spark = docs.sparkSession
    import spark.implicits._
    val buckets = qualityBuckets(docs, idCol, scoreCol, nBuckets)
    // admitted-bucket schedule: tiny (epochs rows), broadcast
    val sched = (1 to epochs)
      .map(e => (e, ((e.toLong * nBuckets + epochs - 1) / epochs).toInt))
      .toDF("epoch", "__max_bucket")
    val admitted = buckets
      .join(broadcast(sched), col("bucket") <= col("__max_bucket"))
      .drop("__max_bucket")
      .withColumn("__hash",
        md5(concat(lit("epoch"), col("epoch").cast("string"), lit(":"), col(idCol).cast("string"))))
    // per-epoch global position, offsets pattern restarted per epoch:
    // range-partition by (epoch, hash) and pin the sampled boundaries so
    // the counts job and the apply job see identical partitions
    val pid = "__graft_pid"
    val off = "__graft_offset"
    val parts = admitted
      .repartitionByRange(col("epoch"), col("__hash"), col(idCol))
      .localCheckpoint(true)
      .withColumn(pid, spark_partition_id())
    val counts = parts.groupBy(col(pid), col("epoch")).agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
      .sortBy(t => (t._2, t._1)) // by (epoch, partition): cumulate in epoch-major order
    val offsets = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Long)]
    var curEpoch = Integer.MIN_VALUE
    var acc = 0L
    counts.foreach { case (p, e, c) =>
      if (e != curEpoch) { curEpoch = e; acc = 0L }
      offsets += ((p, e, acc)); acc += c
    }
    val offsetsDf = spark.createDataFrame(
      spark.sparkContext.parallelize(offsets.toSeq.map { case (p, e, o) => Row(p, e, o) }, 1),
      StructType(Seq(StructField(pid, IntegerType, nullable = false),
        StructField("epoch", IntegerType, nullable = false),
        StructField(off, LongType, nullable = false))))
    val w = Window.partitionBy(col(pid), col("epoch")).orderBy(col("__hash"), col(idCol))
    parts
      .join(broadcast(offsetsDf), Seq(pid, "epoch"))
      .withColumn("pos", col(off) + row_number().over(w).cast(LongType))
      .select(col(idCol), col("bucket"), col("epoch"), col("pos"))
  }
}
