package graft.table

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-column domain/statistics computation — the reference's only
  * aggregation machinery, rebuilt as one Spark aggregation job.
  *
  * Reference semantics (org.knime.core.data.columnar/.../domain/):
  *  - numeric min/max ignoring nulls (ColumnarDoubleDomainCalculator.java:68-96,
  *    Int/Long variants),
  *  - boolean possible-values domain (ColumnarBooleanDomainCalculator.java:68),
  *  - nominal (distinct-value) domain with a cap: the domain is DROPPED when
  *    the distinct count exceeds maxNumValues
  *    (ColumnarStringDomainCalculator.java:67, default cap 60),
  *  - type→calculator dispatch (DefaultDomainWritableConfig.java:88-185),
  *  - computed incrementally during write, async per batch
  *    (DomainWritable.java:90-137).
  *
  * Spark design: the whole per-batch async pipeline collapses into ONE
  * aggregation with partial (map-side) combine — every statistic below is a
  * single-pass agg expression, so a domain pass over 100 TB is one scan with
  * no shuffle beyond the final 1-row reduce. The capped nominal domain uses
  * a size-bounded collect_set: `slice(sort_array(collect_set), 1, cap+1)`
  * would lose the drop signal, so we keep cap+1 values and null the domain
  * out when it overflows — same observable semantics as the reference's
  * drop-on-overflow, but in a distributed-safe expression. (collect_set's
  * intermediate state is bounded per group by the true distinct count;
  * callers with adversarial cardinality should first gate with
  * approx_count_distinct, which we expose too.)
  */
object Domains {

  val DefaultNominalCap = 60

  final case class ColumnDomain(
      column: String,
      dataType: DataType,
      min: Option[Any],
      max: Option[Any],
      nominal: Option[Seq[Any]],
      nullCount: Long,
      approxDistinct: Long,
      /** Mergeable HLL sketch bytes (DataSketches, via `hll_sketch_agg`)
        * for int/long/string/binary columns — the artifact that makes
        * distinct counts EXACTLY mergeable across ingests ([[merge]]);
        * None for types `hll_sketch_agg` doesn't take.
        */
      distinctSketch: Option[Array[Byte]] = None,
      /** Mergeable KLL quantile sketch bytes
        * ([[graft.functions.KllQuantileAgg]]) for numeric columns —
        * closes the last non-mergeable gap in the incremental domain
        * story: [[merge]] unions them with preserved rank-error bounds,
        * so per-ingest quantile summaries combine without a rescan.
        */
      quantileSketch: Option[Array[Byte]] = None
  ) {
    /** Quantile readout — None without a sketch (non-numeric column) or
      * when the sketch saw no values (all-null column / empty table).
      */
    def quantile(q: Double): Option[Double] =
      quantileSketch.flatMap(graft.functions.KllQuantileAgg.quantile(_, q))
  }

  private def sketchable(dt: DataType): Boolean = dt match {
    case IntegerType | LongType | StringType | BinaryType => true
    case _                                                => false
  }

  private def isBounded(dt: DataType): Boolean = dt match {
    case _: NumericType | DateType | TimestampType => true
    case _                                         => false
  }

  private def isNominal(dt: DataType): Boolean = dt match {
    case StringType | BooleanType => true
    case _                        => false
  }

  /** Aggregate expressions for one column's domain. */
  def domainExprs(f: StructField, nominalCap: Int): Seq[Column] = {
    val c = col(f.name)
    val base = Seq(
      count(when(c.isNull, 1)).as(s"${f.name}__nulls"),
      approx_count_distinct(c).as(s"${f.name}__approx_distinct")
    ) ++ (if (sketchable(f.dataType)) Seq(hll_sketch_agg(c).as(s"${f.name}__hll")) else Seq.empty) ++
      (if (f.dataType.isInstanceOf[NumericType])
         Seq(graft.functions.KllQuantileAgg.kllSketch(c).as(s"${f.name}__kll"))
       else Seq.empty)
    val bounds =
      if (isBounded(f.dataType))
        Seq(min(c).as(s"${f.name}__min"), max(c).as(s"${f.name}__max"))
      else Seq.empty
    val nominal =
      if (isNominal(f.dataType))
        // keep cap+1 values so overflow is detectable, then drop (null) the
        // domain — reference drop-when-exceeded semantics.
        Seq(slice(sort_array(collect_set(c)), 1, nominalCap + 1).as(s"${f.name}__nominal"))
      else Seq.empty
    base ++ bounds ++ nominal
  }

  /** Compute all column domains in a single aggregation job. */
  def compute(df: DataFrame, nominalCap: Int = DefaultNominalCap): Seq[ColumnDomain] =
    computeWithRowCount(df, nominalCap)._1

  /** [[compute]] plus the table row count from the SAME single
    * aggregation — writers need both and must not pay a second scan.
    */
  def computeWithRowCount(df: DataFrame, nominalCap: Int = DefaultNominalCap): (Seq[ColumnDomain], Long) = {
    val exprs = df.schema.fields.flatMap(domainExprs(_, nominalCap)) :+
      count(lit(1)).as("__graft_rowcount")
    val row: Row = df.agg(exprs.head, exprs.tail: _*).head()
    val rowCount = row.getLong(row.fieldIndex("__graft_rowcount"))
    def get(n: String): Option[Any] = {
      val i = row.fieldIndex(n)
      if (row.isNullAt(i)) None else Some(row.get(i))
    }
    df.schema.fields.toSeq.map { f =>
      val nominal: Option[Seq[Any]] =
        if (isNominal(f.dataType))
          get(s"${f.name}__nominal")
            .map(_.asInstanceOf[scala.collection.Seq[Any]].toSeq)
            .filter(_.length <= nominalCap)
        else None
      ColumnDomain(
        column = f.name,
        dataType = f.dataType,
        min = if (isBounded(f.dataType)) get(s"${f.name}__min") else None,
        max = if (isBounded(f.dataType)) get(s"${f.name}__max") else None,
        nominal = nominal,
        nullCount = get(s"${f.name}__nulls").map(_.asInstanceOf[Long]).getOrElse(0L),
        approxDistinct = get(s"${f.name}__approx_distinct").map(_.asInstanceOf[Long]).getOrElse(0L),
        distinctSketch =
          if (sketchable(f.dataType)) get(s"${f.name}__hll").map(_.asInstanceOf[Array[Byte]])
          else None,
        quantileSketch =
          if (f.dataType.isInstanceOf[NumericType]) get(s"${f.name}__kll").map(_.asInstanceOf[Array[Byte]])
          else None
      )
    } -> rowCount
  }

  /** Merge two domain snapshots — the incremental-update path (reference
    * calculators are initialized from the prior domain and updated batch
    * by batch, DefaultDomainWritableConfig.java:88-185; at 100 TB this is
    * how per-ingest statistics combine into table statistics without
    * rescanning). Exact for min/max/nullCount/nominal (nominal unions,
    * drops when the union exceeds `nominalCap` — drop is absorbing, like
    * the reference's drop-on-overflow). `approxDistinct` merges through
    * the HLL sketch union when both sides carry one (`distinctSketch`,
    * DataSketches — union of sketches ≡ sketch of union, so the merged
    * estimate equals a full recompute's); for non-sketchable types it
    * falls back to max(a, b), a lower bound.
    */
  def merge(a: Seq[ColumnDomain], b: Seq[ColumnDomain], nominalCap: Int = DefaultNominalCap): Seq[ColumnDomain] = {
    require(
      a.map(d => (d.column, d.dataType)) == b.map(d => (d.column, d.dataType)),
      "domain snapshots cover different schemas")
    def cmp(x: Any, y: Any): Int = x.asInstanceOf[Comparable[Any]].compareTo(y)
    def bound(x: Option[Any], y: Option[Any], keepLess: Boolean): Option[Any] = (x, y) match {
      case (Some(p), Some(q)) => Some(if ((cmp(p, q) <= 0) == keepLess) p else q)
      case _                  => x.orElse(y)
    }
    a.zip(b).map { case (da, db) =>
      val nominal = (da.nominal, db.nominal) match {
        // a dropped (overflowed) domain stays dropped — None is absorbing
        case (Some(na), Some(nb)) => Some((na ++ nb).distinct).filter(_.length <= nominalCap)
        case _                    => None
      }
      val mergedSketch = (da.distinctSketch, db.distinctSketch) match {
        case (Some(sa), Some(sb)) =>
          val u = new org.apache.datasketches.hll.Union(12)
          u.update(org.apache.datasketches.hll.HllSketch.heapify(sa))
          u.update(org.apache.datasketches.hll.HllSketch.heapify(sb))
          Some(u.getResult.toCompactByteArray)
        case _ => None
      }
      val mergedDistinct = mergedSketch
        .map(s => math.round(org.apache.datasketches.hll.HllSketch.heapify(s).getEstimate))
        .getOrElse(math.max(da.approxDistinct, db.approxDistinct))
      // KLL union preserves rank-error bounds — merged quantiles carry the
      // same guarantee a recompute would (see KllQuantileAgg)
      val mergedQuantiles = (da.quantileSketch, db.quantileSketch) match {
        case (Some(qa), Some(qb)) => Some(graft.functions.KllQuantileAgg.mergeBytes(qa, qb))
        case _                    => None
      }
      da.copy(
        min = bound(da.min, db.min, keepLess = true),
        max = bound(da.max, db.max, keepLess = false),
        nominal = nominal,
        nullCount = da.nullCount + db.nullCount,
        approxDistinct = mergedDistinct,
        distinctSketch = mergedSketch,
        quantileSketch = mergedQuantiles)
    }
  }

  /** The domain pass as a DataFrame (for the oracle/bench surface): one row
    * per numeric column with min/max/null-count. ONE scan — all statistics
    * in a single aggregation (map-side partial combine), then an unpivot of
    * the 1-row result. Deterministic output order.
    */
  def domainTable(df: DataFrame): DataFrame = {
    val numeric = df.schema.fields.collect {
      case f if f.dataType.isInstanceOf[NumericType] => f.name
    }.sorted.toSeq
    require(numeric.nonEmpty, "domainTable: no numeric columns")
    val exprs = numeric.flatMap(n =>
      Seq(
        min(col(n)).cast(DoubleType).as(s"${n}__min"),
        max(col(n)).cast(DoubleType).as(s"${n}__max"),
        count(when(col(n).isNull, 1)).as(s"${n}__nulls"),
        count(col(n)).as(s"${n}__nonnulls")
      ))
    val agged = df.agg(exprs.head, exprs.tail: _*)
    val stackExpr = s"stack(${numeric.length}, " + numeric
      .map(n => s"'$n', `${n}__min`, `${n}__max`, `${n}__nulls`, `${n}__nonnulls`")
      .mkString(", ") +
      ") as (column_name, min_value, max_value, null_count, non_null_count)"
    agged.select(expr(stackExpr)).orderBy(col("column_name"))
  }
}
