package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, IntegerType, StructField, StructType}

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
}
