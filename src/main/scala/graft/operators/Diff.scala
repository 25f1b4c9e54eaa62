package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot diff: row-level comparison of two versions of a table keyed
  * by `keyCols` — the data-versioning primitive behind incremental
  * pipeline runs (what changed since the last ingest?), audit trails,
  * and regression checks between dataset releases.
  *
  * One sort-merge full-outer join on the key (both sides shuffle once);
  * non-key columns compare as a single null-safe struct equality, so the
  * comparison is codegen'd and adding columns never adds join passes.
  * Keys are assumed unique per snapshot (enforce with
  * [[graft.table.RowId.duplicateKeys]] upstream).
  */
object Diff {

  val StatusCol = "diff_status"

  /** Diff `newSnap` against `oldSnap`. Output: key columns +
    * `diff_status` ∈ {added, removed, changed, unchanged}. Schemas must
    * match exactly (same names and order).
    */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    require(
      oldSnap.columns.sameElements(newSnap.columns),
      s"schema mismatch: ${oldSnap.columns.mkString(",")} vs ${newSnap.columns.mkString(",")}")
    val nonKey = oldSnap.columns.filterNot(keyCols.contains).toSeq
    require(!oldSnap.columns.contains(StatusCol), s"column $StatusCol already exists")
    // <=> cannot compare MAP columns (unorderable); compare a canonical
    // sorted-entries encoding instead. Maps nested deeper than one level
    // inside other types are rejected with a clear error.
    import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}
    def containsMap(dt: DataType): Boolean = dt match {
      case _: MapType      => true
      case s: StructType   => s.fields.exists(f => containsMap(f.dataType))
      case ArrayType(e, _) => containsMap(e)
      case _               => false
    }
    def comparable(name: String): org.apache.spark.sql.Column =
      oldSnap.schema(name).dataType match {
        case _: MapType =>
          sort_array(map_entries(col(name)))
        case dt =>
          require(
            !containsMap(dt),
            s"snapshotDiff: column $name nests a map inside ${dt.simpleString}; " +
              "flatten or encode it before diffing")
          col(name)
      }
    // key-only tables have no payload to compare: presence alone decides
    // the status (never changed), so compare a constant
    def payload(): org.apache.spark.sql.Column =
      if (nonKey.isEmpty) lit(0) else struct(nonKey.map(comparable): _*)
    def side(df: DataFrame, tag: String) = df.select(
      keyCols.map(col) ++ Seq(
        payload().as(s"__payload_$tag"),
        lit(true).as(s"__present_$tag")): _*)
    side(oldSnap, "o")
      .join(side(newSnap, "n"), keyCols, "full_outer")
      .withColumn(
        StatusCol,
        when(col("__present_o").isNull, "added")
          .when(col("__present_n").isNull, "removed")
          .when(col("__payload_o") <=> col("__payload_n"), "unchanged")
          .otherwise("changed"))
      .select(keyCols.map(col) :+ col(StatusCol): _*)
  }
}
