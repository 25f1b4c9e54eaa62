package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Upsert / changelog-apply — the table-maintenance primitives of an
  * incremental pipeline (the MERGE INTO shape, composed from stock
  * relational operators so Catalyst plans and AQE tune them like any
  * other join).
  *
  * The reference has no mutation operators (its tables are immutable
  * snapshots; derivation happens through the virtual-table algebra,
  * reference org.knime.core.data.columnar/.../table/virtual/
  * ColumnarVirtualTable.java); these extend the same snapshot model with
  * the standard "next snapshot = f(snapshot, changes)" step.
  *
  * Scale notes (100 TB):
  *  - both operators shuffle each side ONCE on the key (sort-merge
  *    anti/window); a small changelog side is broadcast by AQE, making
  *    the snapshot side shuffle-free;
  *  - [[applyChangelog]] compacts the changelog FIRST (one window over
  *    the changelog only — typically orders of magnitude smaller than
  *    the snapshot) so the big table joins against one row per changed
  *    key;
  *  - keys are assumed unique per snapshot (enforce with
  *    [[graft.table.RowId.duplicateKeys]] upstream) — then the output is
  *    exactly one row per surviving key and the operators are
  *    idempotent.
  */
object Merge {

  /** Upsert: every `source` row wins over the `target` row with the same
    * key; target rows without a source match survive unchanged. Schemas
    * must match by name (the result has `target`'s column order).
    */
  def upsert(target: DataFrame, source: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    require(
      target.columns.sorted.sameElements(source.columns.sorted),
      s"schema mismatch: ${target.columns.mkString(",")} vs ${source.columns.mkString(",")}")
    val kept = target.join(source.select(keyCols.map(col): _*), keyCols, "left_anti")
    source.select(target.columns.map(col).toSeq: _*).unionByName(kept)
  }

  /** Apply a CDC changelog to a snapshot: per key, the change with the
    * highest `seqCol` wins; `opCol` = "D" deletes the key, anything else
    * ("I"/"U") upserts the change row's payload. `changes` carries the
    * snapshot's columns plus `opCol` and `seqCol`. (`seqCol`, `opCol`)
    * must be unique per key for a deterministic result — changelogs with
    * per-key sequence numbers (the standard CDC shape) satisfy this.
    */
  def applyChangelog(
      snapshot: DataFrame,
      changes: DataFrame,
      keyCols: Seq[String],
      seqCol: String,
      opCol: String
  ): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    val payloadCols = snapshot.columns.toSeq
    require(
      payloadCols.forall(changes.columns.contains),
      s"changes missing snapshot columns: ${payloadCols.filterNot(changes.columns.contains).mkString(",")}")
    val rn = "__graft_rn"
    // deterministic compaction: seq desc, op as tiebreak (unique per key
    // by contract; the tiebreak keeps accidental violations stable)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(seqCol).desc, col(opCol))
    val latest = changes
      .withColumn(rn, row_number().over(w))
      .where(col(rn) === 1)
      .drop(rn)
    val upserts = latest.where(col(opCol) =!= "D").select(payloadCols.map(col): _*)
    // every latest-changed key leaves the snapshot; non-deletes re-enter
    // with their new payload
    snapshot
      .join(latest.select(keyCols.map(col): _*), keyCols, "left_anti")
      .unionByName(upserts)
  }
}
