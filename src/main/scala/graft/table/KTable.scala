package graft.table

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, Metadata, StructField, StructType}

/** The engine's lazy virtual-table algebra: a thin, immutable wrapper over
  * `DataFrame` exposing the reference's table-transform surface
  * (reference org.knime.core.data.columnar/.../table/virtual/ColumnarVirtualTable.java —
  * select/drop/keep :178-202, slice :211-214, filterRows :254-257,
  * map/appendMap/replaceMap :447-541, appendRowIndex :432-436,
  * appendMissingValueColumns :266-270, append :222-237,
  * concatenate :344-390, replaceSchema :272-281).
  *
  * Design stance (SURVEY.md §7): every operation compiles to a DataFrame
  * transformation, so the "TableTransform DAG + GraphVirtualTableExecutor"
  * role of the reference is played by Catalyst — plan composition, column
  * pruning, predicate/limit pushdown, and whole-stage codegen are inherited,
  * not re-implemented. All index-based addressing below is positional, as in
  * the reference (columns are identified by index, not name).
  */
final class KTable private (val df: DataFrame) extends Serializable {

  def spark: SparkSession = df.sparkSession
  def schema: StructType = df.schema
  def columnNames: Seq[String] = df.columns.toSeq

  private def colAt(i: Int): Column = col(df.columns(i))

  // ---- projections (reference ColumnarVirtualTable.java:178-202) ----

  /** Project + permute + duplicate by column index. Duplicated columns get a
    * disambiguated name (Spark requires unique output names).
    */
  def selectColumns(indices: Int*): KTable = {
    val seen = scala.collection.mutable.Map.empty[Int, Int]
    val cols = indices.map { i =>
      val n = seen.getOrElse(i, 0)
      seen(i) = n + 1
      if (n == 0) colAt(i) else colAt(i).as(s"${df.columns(i)}_$n")
    }
    KTable(df.select(cols: _*))
  }

  def dropColumns(indices: Int*): KTable = {
    val drop = indices.toSet
    KTable(df.select(df.columns.zipWithIndex.collect { case (c, i) if !drop(i) => col(c) }.toSeq: _*))
  }

  def keepOnlyColumns(indices: Int*): KTable = selectColumns(indices: _*)

  // ---- slice (reference ColumnarVirtualTable.java:211-214) ----

  /** Row-range [from, until) in the table's current order.
    * When the range fits in Int it compiles to Offset+Limit, which Spark
    * pushes into the scan where possible; beyond 2^31 (row positions past
    * ~2.1 B — real at 100 TB) it falls back to an exact row-index filter
    * (narrow zipWithIndex pass, no shuffle). Exact slice semantics require
    * a defined order — callers at the API edge order by row_id / an
    * explicit key (ordering invariant, SURVEY.md §7).
    */
  def slice(from: Long, until: Long): KTable = {
    require(from >= 0 && until >= from, s"bad slice [$from,$until)")
    if (until <= Int.MaxValue) KTable(df.offset(from.toInt).limit((until - from).toInt))
    else {
      val tmp = "__graft_slice_index"
      KTable(
        RowId.withRowIndex(df, tmp)
          .where(col(tmp) >= from && col(tmp) < until)
          .drop(tmp))
    }
  }

  // ---- filter (reference ColumnarVirtualTable.java:254-257) ----

  def filterRows(predicate: Column): KTable = KTable(df.filter(predicate))

  // ---- map family (reference ColumnarVirtualTable.java:447-541) ----

  /** Output-only map: result has exactly the mapper's output columns. */
  def map(outputs: (String, Column)*): KTable =
    KTable(df.select(outputs.map { case (n, c) => c.as(n) }: _*))

  /** map + keep input columns (reference appendMap :478-501). Outputs
    * land in DECLARED order (a `.toMap` here once hash-ordered them past
    * 4 entries — silently rebinding every downstream positional op — and
    * collapsed duplicate names; review-found, both now impossible).
    * Outputs apply SEQUENTIALLY: a later output may reference an earlier
    * output's column (incl. a replaced value) — declared order is
    * evaluation order, pinned by KTableSpec. BEHAVIORAL CHANGE vs the
    * pre-r15 simultaneous evaluation: a replace-then-reference pair sees
    * the NEW value, so `appendMap("a" -> col("b"), "b" -> col("a"))`
    * yields (b, b), not a swap — express a swap with [[map]]/select over
    * the input frame. The sequential contract is also what the persisted
    * plan format ([[graft.plans.PlanSpec.AppendMap]]) pins.
    */
  def appendMap(outputs: (String, Column)*): KTable = {
    // duplicate detection under the SESSION'S resolver: with default
    // case-insensitive analysis, "x" and "X" are the same column to
    // withColumn (the second would silently REPLACE the first — the
    // very collapse this guard exists to prevent)
    val caseSensitive =
      df.sparkSession.conf.get("spark.sql.caseSensitive", "false").toBoolean
    val names = outputs.map(_._1)
    val resolved = if (caseSensitive) names else names.map(_.toLowerCase)
    require(resolved.distinct.size == resolved.size,
      s"appendMap: duplicate output names ${resolved.diff(resolved.distinct).distinct.mkString(", ")}")
    KTable(outputs.foldLeft(df) { case (d, (n, c)) => d.withColumn(n, c) })
  }

  /** Replace exactly one column in place via a 1-in/1-out expression
    * (reference replaceMap :513-541). Position is preserved.
    */
  def replaceMap(index: Int, output: Column): KTable = {
    val name = df.columns(index)
    KTable(df.withColumn(name, output))
  }

  /** Map with absolute row index: expression receives a Long index column
    * (reference WrappedColumnarMapperWithRowIndexFactory :309-342). Exact
    * contiguous index via zipWithIndex (see [[RowId.withRowIndex]]).
    */
  def mapWithRowIndex(indexCol: String)(f: DataFrame => DataFrame): KTable =
    KTable(f(RowId.withRowIndex(df, indexCol)).drop(indexCol))

  /** Append an exact contiguous Long row-index column (reference
    * RowIndexTransformSpec, ColumnarVirtualTable.java:432-436).
    */
  def appendRowIndex(name: String): KTable = KTable(RowId.withRowIndex(df, name))

  /** Multi-output mapper evaluated ONCE per row — the cell-factory analog
    * (reference ColumnarRearranger.java:468-527: one CellFactory producing
    * k columns, computed once then column-selected; SURVEY.md §4.1
    * "evaluate-multi-output-factory-once"). Pass a struct-producing column
    * (for Scala UDFs call `.asNondeterministic()` on the udf so Catalyst
    * may not duplicate the call when collapsing projects); its fields are
    * star-expanded into top-level columns.
    */
  def appendMultiOutput(structCol: Column): KTable = {
    val tmp = "__graft_multi"
    val withS = df.withColumn(tmp, structCol)
    val fields = withS.schema(tmp).dataType.asInstanceOf[StructType].fieldNames
    KTable(withS.select(df.columns.map(col) ++ fields.map(f => col(s"$tmp.`$f`").as(f)): _*))
  }

  // ---- missing-value columns (reference ColumnarVirtualTable.java:266-270) ----

  def appendMissingValueColumns(fields: (String, DataType)*): KTable =
    KTable(fields.foldLeft(df) { case (d, (n, t)) => d.withColumn(n, lit(null).cast(t)) })

  // ---- cast / schema replace (reference TableCasterFactory.java:97-118,
  //      ColumnarVirtualTable.java:272-281) ----

  /** Value-level cast of one column (UPCAST/DOWNCAST both map to Catalyst
    * Cast; Spark needs no materialization distinction).
    */
  def castColumn(index: Int, to: DataType): KTable = {
    val name = df.columns(index)
    KTable(df.withColumn(name, col(name).cast(to)))
  }

  /** Metadata-only rename of all columns (reference replaceSchema — no data
    * touch; in Spark a pure projection, zero cost after codegen).
    */
  def renameColumns(names: String*): KTable = {
    require(names.length == df.columns.length)
    KTable(df.toDF(names: _*))
  }

  /** Attach logical-type metadata to a column — the analog of the
    * reference's Arrow extension-type annotations (reference
    * org.knime.core.columnar.arrow/.../extensiontypes/LogicalTypeExtensionType.java:59).
    */
  def withColumnMetadata(index: Int, metadata: Metadata): KTable = {
    val name = df.columns(index)
    KTable(df.withColumn(name, col(name).as(name, metadata)))
  }

  // ---- observe (reference ObserverTransformSpec, ColumnarVirtualTable.java:543-563) ----

  /** Side-effect-free observation: named aggregates computed during the next
    * action without an extra pass (Spark `Dataset.observe`). The reference's
    * per-row progress observer becomes metric collection — cancellation maps
    * to `sparkContext.cancelJobGroup`.
    */
  def observe(name: String, exprs: Column*): KTable =
    KTable(df.observe(name, exprs.head, exprs.tail: _*))

  // ---- table combination (delegated, see Combine.scala) ----

  /** Column-wise append by position (reference AppendTransformSpec). */
  def appendByPosition(other: KTable): KTable = KTable(Combine.appendByPosition(df, other.df))

  /** Row-wise concatenation with union-schema merge (reference
    * ColumnarConcatenater).
    */
  def concatenate(others: KTable*): KTable =
    KTable(Combine.concatenate(df +: others.map(_.df)))

  // ---- persistence policy (reference multi-level cache hierarchy,
  //      SURVEY.md §4.2 — Spark's unified memory manager + explicit hints) ----

  /** Pin this table for reuse across several downstream queries (the
    * reference's read-data/small-table cache analog; MEMORY_AND_DISK so
    * eviction degrades to recompute-free disk reads, never OOM).
    */
  def cached(): KTable = KTable(df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  def uncache(): KTable = KTable(df.unpersist())

  /** Hint this (small) table as the broadcast side of subsequent joins —
    * the small-table-cache analog at join time.
    */
  def broadcastHint(): KTable = KTable(broadcast(df))

  override def toString: String = s"KTable(${df.schema.simpleString})"
}

object KTable {
  def apply(df: DataFrame): KTable = new KTable(df)

  /** Read a stored table (Parquet = our batch store: columnar, compressed,
    * footer-indexed row groups — replacing the reference's LZ4 Arrow IPC
    * files, reference org.knime.core.columnar.arrow/.../offheap/OffHeapArrowBatchStore.java:67).
    */
  def read(spark: SparkSession, path: String): KTable = KTable(spark.read.parquet(path))

  /** Materialize to the store (any action ends laziness — reference
    * ColumnarVirtualTableMaterializer.java:131-147).
    */
  def write(t: KTable, path: String): Unit = t.df.write.mode("overwrite").parquet(path)
}
