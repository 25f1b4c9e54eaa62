package graft.table

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}

/** RowID + exact row-index semantics.
  *
  * The reference keeps a String RowID as column 0 of every table and supports
  * (a) appending an exact, contiguous Long row index
  *     (RowIndexTransformSpec — reference
  *     org.knime.core.data.columnar/.../table/virtual/ColumnarVirtualTable.java:432-436),
  * (b) regenerating RowIDs as "Row0","Row1",...
  *     (reference ColumnarConcatenater.java:186-215), and
  * (c) uniquifying duplicate RowIDs by appending "_dup" suffixes in a retry
  *     loop (reference ColumnarConcatenater.java:237-292).
  *
  * Spark's `monotonically_increasing_id()` is NOT contiguous across
  * partitions, so exactness needs a per-partition count job first, then a
  * per-partition offset add (the zipWithIndex strategy, kept in pure SQL so
  * the data path never leaves Tungsten). At 100 TB this is a metadata pass
  * (one count row per partition) plus a narrow map — the cheapest exact-index
  * strategy available on a distributed engine.
  */
object RowId {

  val RowIdCol = "row_id"

  /** Append an exact contiguous 0-based Long row index in the DataFrame's
    * current partition order. Narrow (no shuffle); one extra job to count
    * partition sizes.
    */
  def withRowIndex(df: DataFrame, name: String = "row_index"): DataFrame =
    withRowIndexCounted(df, name)._1

  /** [[withRowIndex]] plus the total row count — the count-partitions job
    * that exact indexing needs anyway yields the total for free, so
    * callers that must validate sizes (append-by-position's equal-row
    * check) don't pay a third pass over the data.
    *
    * Strategy: stays entirely inside Tungsten/codegen (no `df.rdd`, which
    * would decode every row to external `Row` objects and re-encode them).
    * `monotonically_increasing_id()` is `partitionId * 2^33 + posInPartition`,
    * so the exact contiguous index is `offset(partition) + posInPartition`
    * where the per-partition offsets come from one tiny aggregation job
    * (shuffles one row per partition) and rejoin via broadcast-hash-join —
    * narrow on the data path, O(#partitions) driver memory, scales to any
    * partition count (no giant literal map in the plan).
    */
  def withRowIndexCounted(df: DataFrame, name: String = "row_index"): (DataFrame, Long) = {
    require(!df.columns.contains(name), s"column $name already exists")
    val pid = "__graft_pid"
    val mid = "__graft_mid"
    val off = "__graft_offset"
    require(
      !Seq(pid, mid, off).exists(df.columns.contains),
      s"reserved column name collision: ${Seq(pid, mid, off).filter(df.columns.contains).mkString(", ")}")
    // The offsets are derived in one execution and applied in a second, so
    // the partitioning must be identical across the two. Scan-only
    // (exchange-free) plans repartition deterministically from the file
    // listing; anything with a shuffle can be replanned by AQE between the
    // two jobs → pin it with an eager localCheckpoint first (which also
    // means the heavy upstream plan executes once, not twice). ADVICE r2.
    val src = if (narrowDeterministic(df)) df else df.localCheckpoint(true)
    val tagged = src
      .withColumn(pid, spark_partition_id())
      .withColumn(mid, monotonically_increasing_id())
    val counts = tagged.groupBy(col(pid)).agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsetByPid = counts.map { case (p, c) => val o = acc; acc += c; (p, o) }.toMap
    val total = acc
    val maxPid = counts.lastOption.map(_._1).getOrElse(-1)
    // posInPartition = mid - pid * 2^33 (MonotonicallyIncreasingID layout)
    val pos = col(mid) - col(pid).cast(LongType) * lit(1L << 33)
    val indexed = if (maxPid < 4096) {
      // offsets as a dense plan literal indexed by partition id (gaps from
      // empty partitions carry the running offset; never evaluated): a
      // narrow projection with NO join stage — the fast path at any
      // realistic local/executor partition count
      var run = 0L
      val dense = (0 to maxPid).map { p => run = offsetByPid.getOrElse(p, run); run }
      tagged
        .withColumn(name, element_at(typedLit(dense), col(pid) + 1) + pos)
        .drop(pid, mid)
    } else {
      // degenerate partition counts: broadcast-join the offsets instead of
      // inlining an enormous literal into the plan/codegen
      val spark = df.sparkSession
      val offsetsDf = spark.createDataFrame(
        spark.sparkContext.parallelize(counts.map { p => Row(p._1, offsetByPid(p._1)) }.toSeq, 1),
        StructType(Seq(StructField(pid, IntegerType, nullable = false), StructField(off, LongType, nullable = false))))
      tagged
        .join(broadcast(offsetsDf), Seq(pid))
        .withColumn(name, col(off) + pos)
        .drop(pid, mid, off)
    }
    (indexed, total)
  }

  /** True only when the optimized plan is a provably narrow chain over
    * leaf scans — the cases where partitioning is deterministic across
    * re-executions (file listing → fixed splits → narrow maps), so the
    * offsets job and the indexing job are guaranteed to see identical
    * partitions. Everything else (joins, aggregates, typed group ops,
    * repartitions, limits — and any operator this allowlist does not
    * recognize) is pinned with a localCheckpoint first, because AQE or
    * recomputation may re-plan its partitioning between the two jobs.
    * Allowlist-inverted per ADVICE r3: unknown operators default to the
    * safe (checkpointed) path instead of the fast one.
    */
  private def narrowDeterministic(df: DataFrame): Boolean = {
    import org.apache.spark.sql.catalyst.catalog.HiveTableRelation
    import org.apache.spark.sql.catalyst.plans.logical._
    import org.apache.spark.sql.execution.datasources.LogicalRelation
    import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
    df.queryExecution.optimizedPlan.collect { case p => p }.forall { p =>
      val shapeOk = p match {
        case _: Project | _: Filter | _: Generate | _: Expand |
             _: SubqueryAlias | _: Union | _: Sample |
             _: DeserializeToObject | _: SerializeFromObject | _: MapElements |
             _: LocalRelation | _: OneRowRelation | _: Range |
             _: LogicalRelation | _: DataSourceV2ScanRelation | _: HiveTableRelation => true
        case r: Repartition => !r.shuffle // coalesce: narrow, deterministic
        case _ => false
      }
      // Shape alone is not enough: a nondeterministic expression (rand(),
      // a UDF marked .asNondeterministic()) inside an otherwise-narrow
      // Filter/Generate/Project selects or produces different rows between
      // the offsets job and the indexing job → duplicated or gapped
      // indices. TypedFilter is excluded from the allowlist outright: its
      // predicate is an uninspectable closure (MapElements stays — 1:1 and
      // count-stable regardless of what the closure computes). ADVICE r4.
      shapeOk && p.expressions.forall(_.deterministic)
    }
  }

  /** Exact-order variant: sort by the given columns first, then index.
    * This is the deterministic path used when a canonical order exists
    * (the engine's ordering invariant — SURVEY.md §7 "hard parts").
    */
  def withRowIndexOrdered(df: DataFrame, orderBy: Seq[Column], name: String = "row_index"): DataFrame =
    withRowIndex(df.orderBy(orderBy: _*), name)

  /** Regenerate RowIDs "Row0","Row1",… in current order, as column 0.
    * Mirrors concatenateWithNewRowIDs (reference
    * ColumnarTableBackend.java:206-215).
    */
  def regenerateRowIds(df: DataFrame): DataFrame = {
    val tmp = "__graft_row_index"
    val indexed = withRowIndex(dropRowId(df), tmp)
    val cols = concat(lit("Row"), col(tmp).cast(StringType)).as(RowIdCol) +:
      indexed.columns.filterNot(_ == tmp).map(col).toSeq
    indexed.select(cols: _*)
  }

  /** Ensure a row_id column exists (as column 0); synthesize from an exact
    * index when absent.
    */
  def ensureRowId(df: DataFrame): DataFrame =
    if (df.columns.contains(RowIdCol)) {
      df.select(col(RowIdCol) +: df.columns.filterNot(_ == RowIdCol).map(col).toSeq: _*)
    } else regenerateRowIds(df)

  def dropRowId(df: DataFrame): DataFrame =
    if (df.columns.contains(RowIdCol)) df.drop(RowIdCol) else df

  /** Distributed RowID duplicate check (reference async disk-backed
    * DuplicateCheckWritable.java:69,87-110 → one hash aggregation).
    * Returns offending keys (empty = pass). Scales: shuffle on the key,
    * partial aggregation map-side.
    */
  def duplicateKeys(df: DataFrame, keyCol: String = RowIdCol): DataFrame =
    df.groupBy(col(keyCol)).count().where(col("count") > 1).select(col(keyCol))

  def assertUniqueRowIds(df: DataFrame, keyCol: String = RowIdCol): Unit = {
    val dups = duplicateKeys(df, keyCol).limit(10).collect()
    require(dups.isEmpty, s"duplicate RowIDs: ${dups.map(_.get(0)).mkString(", ")}")
  }

  /** Uniquify duplicate RowIDs by suffixing "_dup", "_dup_dup", … like the
    * reference's retry loop (ColumnarConcatenater.java:275-281). Each pass
    * is distributed: the n-th occurrence of a key gets n-1 "_dup" suffixes
    * (window shuffle on the key; skew-safe for realistic duplication
    * factors). A single pass can itself COLLIDE with pre-existing
    * "_dup"-suffixed keys (rows "A","A","A_dup" → two "A_dup"), so — like
    * the reference — we re-check and re-suffix until no duplicates remain.
    * The common case (no pre-existing "_dup" keys) converges after one
    * pass + one empty-check job.
    */
  def uniquifyRowIds(df: DataFrame, keyCol: String = RowIdCol): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // fail fast on null RowIDs: concat(null, "_dup") stays null, so a null
    // duplicate group could never be suffixed apart and the retry loop
    // would spin forever (ADVICE r2). The reference never produces null
    // RowIDs either — this is invalid input, not a case to paper over.
    require(df.where(col(keyCol).isNull).limit(1).isEmpty,
      s"uniquifyRowIds: null values in RowID column '$keyCol'")
    val tmp = "__graft_occurrence"
    val ord = "__graft_order"
    var cur = withRowIndex(df, ord)
    var iters = 0
    var done = false
    // superseded periodic checkpoints release for real (graft.Pins —
    // Dataset.unpersist is a no-op for checkpoint blocks); the LAST pin
    // stays live for the returned plan
    var prevPinned: Option[org.apache.spark.sql.DataFrame] = None
    while (!done) {
      val w = Window.partitionBy(col(keyCol)).orderBy(col(ord))
      cur = cur
        .withColumn(tmp, row_number().over(w) - 1)
        .withColumn(keyCol, concat(col(keyCol), repeat(lit("_dup"), col(tmp).cast("int"))))
        .drop(tmp)
      iters += 1
      done = duplicateKeys(cur, keyCol).isEmpty
      // each pass strictly shrinks the duplicate set (first occurrence of
      // every key is untouched), so termination is guaranteed; the bound
      // only guards pathological inputs from unbounded plan growth
      if (!done && iters >= 20) {
        cur = cur.localCheckpoint(true)
        prevPinned.foreach(graft.Pins.release)
        prevPinned = Some(cur)
        iters = 0
      }
    }
    cur.orderBy(col(ord)).drop(ord)
  }
}
