package graft.text

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, IntegerType, StringType, StructField, StructType}

/** Sequence packing — the pre-training data-prep step that concatenates a
  * document stream into one token stream and splits it into fixed-length
  * training sequences ("concat-and-chunk"). The output is the SPAN table:
  * one row per (document, sequence) intersection, which is all a loader
  * needs to assemble sequences (and all a lineage audit needs to trace a
  * training token back to its source document).
  *
  * Deterministic by construction: documents concatenate in ascending
  * `idCol` order, so the packing is a pure function of (ids, token
  * counts, seqLen) — independent of partitioning (spec-audited), and
  * exactly replicable by a SQL oracle (q_pack_sequences).
  *
  * Scale shape (the reason this is not a window over a global ORDER BY,
  * which would funnel 100 TB through ONE partition): only (id, n_toks)
  * pairs — ~16 B/doc — enter the shuffle, never text. One range
  * repartition by id defines the global order; per-partition token
  * subtotals collect to the driver (O(#partitions), the [[graft.table.RowId]]
  * offset pattern); the running prefix within each partition is a window
  * over that partition's (id, n) pairs; span expansion is a narrow
  * explode (≤ n/seqLen + 1 rows per doc). The localCheckpoint pins the
  * range boundaries (sampled, hence nondeterministic across executions)
  * so the offsets job and the apply job see identical partitions.
  */
object Packing {

  /** Pack `docs` into `seqLen`-token sequences.
    *
    * @param idCol unique, totally-ordered document id — uniqueness IS the
    *              determinism guarantee (equal ids would make the
    *              concatenation order, and thus the packing, ambiguous)
    * @param tokenCount token count expression evaluated against `docs`
    * @return spans: (idCol, n_toks, seq_id, doc_offset, seq_offset,
    *         span_len) — `seq_id` is the global sequence index, the span
    *         covers doc tokens [doc_offset, doc_offset + span_len) and
    *         sequence positions [seq_offset, seq_offset + span_len).
    *         Zero-token documents produce no spans.
    */
  def packSequences(docs: DataFrame, idCol: String, tokenCount: Column, seqLen: Int): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    val pid = "__graft_pid"
    val off = "__graft_offset"
    require(!Seq(pid, off, "n_toks", "seq_id").exists(c => c == idCol),
      s"reserved column name collision with $idCol")
    val spark = docs.sparkSession
    // tiny rows only: the text never enters the shuffle
    val pairs = docs.select(col(idCol), tokenCount.cast(LongType).as("n_toks"))
      .where(col("n_toks") > 0)
      .repartitionByRange(col(idCol))
      .sortWithinPartitions(idCol)
      .localCheckpoint(true) // pin sampled range boundaries across the two jobs
    val tagged = pairs.withColumn(pid, spark_partition_id())
    val sums = tagged.groupBy(col(pid)).agg(sum(col("n_toks")).as("s"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = sums.map { case (p, s) => val o = acc; acc += s; (p, o) }
    val offsetsDf = spark.createDataFrame(
      spark.sparkContext.parallelize(offsets.map { case (p, o) => org.apache.spark.sql.Row(p, o) }.toSeq, 1),
      StructType(Seq(StructField(pid, IntegerType, nullable = false), StructField(off, LongType, nullable = false))))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(pid)).orderBy(col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val prev = coalesce(sum(col("n_toks")).over(w), lit(0L)) + col(off)
    val L = lit(seqLen.toLong)
    tagged
      .join(broadcast(offsetsDf), Seq(pid))
      .withColumn("__prev", prev)
      // `div` = integral division (Column./ would be DOUBLE division)
      .withColumn("seq_id",
        explode(sequence(expr(s"__prev div $seqLen"), expr(s"(__prev + n_toks - 1) div $seqLen"))))
      .select(
        col(idCol),
        col("n_toks"),
        col("seq_id"),
        greatest(lit(0L), col("seq_id") * L - col("__prev")).as("doc_offset"),
        greatest(lit(0L), col("__prev") - col("seq_id") * L).as("seq_offset"),
        (least(col("n_toks"), (col("seq_id") + 1) * L - col("__prev")) -
          greatest(lit(0L), col("seq_id") * L - col("__prev"))).as("span_len"))
  }

  /** Packing-efficiency report — the numbers that decide a seqLen before
    * committing a corpus to it. Each group's documents (groups = sources
    * in practice: per-source streams are packed independently so mixture
    * weights stay adjustable at sequence granularity) are concatenated in
    * ascending `idCol` order and chunked at `seqLen`, exactly as
    * [[packSequences]] would; the report aggregates what that packing
    * costs, per group:
    *
    *  - `n_sequences` = ceil(n_tokens/seqLen), `pad_tokens` = the
    *    unfilled tail of the group's last sequence, `utilization` =
    *    n_tokens/(n_sequences·seqLen) — the padding-waste axis;
    *  - `n_split_docs` / `split_ratio` = documents crossing a sequence
    *    boundary — the fragmentation/attention-contamination axis.
    *    Larger seqLen wastes less padding but splits more documents; this
    *    report is the trade-off curve's sample at one seqLen.
    *
    * Zero-token documents pack to nothing and are excluded (as in
    * [[packSequences]]). All lanes are exact integers or ratios of exact
    * integers ≤ 2^53, so the doubles are engine-portable bit-for-bit.
    *
    * Scale shape: only (group, id, n_toks) triples enter the one range
    * exchange; per-(partition, group) subtotals collect to the driver —
    * groups are CONTIGUOUS under the (group, id) range partitioning, so
    * that table is O(#partitions + #groups) rows regardless of corpus
    * size — and come back as a broadcast offset join + per-partition
    * window (the [[packSequences]] offsets pattern, grouped). No
    * single-partition window, no per-group driver loop.
    */
  def packEfficiency(docs: DataFrame, idCol: String, tokenCount: Column,
      groupCol: String, seqLen: Int): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    val pid = "__graft_pid"
    val off = "__graft_offset"
    val spark = docs.sparkSession
    val pairs = docs
      .select(col(groupCol).cast(StringType).as("__grp"), col(idCol).as("__id"),
        tokenCount.cast(LongType).as("n_toks"))
      .where(col("n_toks") > 0)
      .repartitionByRange(col("__grp"), col("__id"))
      .sortWithinPartitions("__grp", "__id")
      .localCheckpoint(true) // pin sampled range boundaries across the two jobs
    val tagged = pairs.withColumn(pid, spark_partition_id())
    val sums = tagged.groupBy(col(pid), col("__grp")).agg(sum(col("n_toks")).as("s"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    // per-group running prefix in partition order = each (partition, group)
    // cell's global token offset within its group's stream
    val acc = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    val offsets = sums.sortBy(t => (t._2, t._1)).map { case (p, g, s) =>
      val o = acc(g); acc(g) = o + s; (p, g, o)
    }
    val offsetsDf = spark.createDataFrame(
      spark.sparkContext.parallelize(offsets.map { case (p, g, o) => Row(p, g, o) }.toSeq, 1),
      StructType(Seq(
        StructField(pid, IntegerType, nullable = false),
        StructField("__grp", StringType, nullable = false),
        StructField(off, LongType, nullable = false))))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(pid), col("__grp")).orderBy(col("__id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val prev = coalesce(sum(col("n_toks")).over(w), lit(0L)) + col(off)
    val L = lit(seqLen.toLong)
    tagged
      .join(broadcast(offsetsDf), Seq(pid, "__grp"))
      .withColumn("__prev", prev)
      .withColumn("__split",
        (expr(s"__prev div $seqLen") =!= expr(s"(__prev + n_toks - 1) div $seqLen")).cast(LongType))
      .groupBy(col("__grp"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("n_tokens"),
        sum(col("__split")).as("n_split_docs"))
      .withColumn("n_sequences", expr(s"(n_tokens + ${seqLen - 1}) div $seqLen"))
      .select(
        col("__grp").as(groupCol),
        col("n_docs"),
        col("n_tokens"),
        col("n_sequences"),
        (col("n_sequences") * L - col("n_tokens")).as("pad_tokens"),
        (col("n_tokens").cast("double") / (col("n_sequences") * L).cast("double"))
          .as("utilization"),
        col("n_split_docs"),
        (col("n_split_docs").cast("double") / col("n_docs").cast("double")).as("split_ratio"))
  }
}
