package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Missing-value imputation operators — the gap-filling passes of
  * time-series/feature pipelines, built on ignore-nulls window
  * aggregates (one sort-shuffle on the partition key, state bounded by
  * the frame).
  */
object Impute {

  /** Forward fill (last observation carried forward): nulls in
    * `valueCols` take the most recent non-null value within their
    * partition's order. Leading nulls (no prior observation) stay null.
    */
  def forwardFill(df: DataFrame, partitionCols: Seq[String], orderCol: String, valueCols: Seq[String]): DataFrame = {
    require(valueCols.nonEmpty)
    val w = Window.partitionBy(partitionCols.map(col): _*).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    valueCols.foldLeft(df)((d, c) => d.withColumn(c, last(col(c), ignoreNulls = true).over(w)))
  }

  /** Backward fill: symmetric (next non-null value). */
  def backwardFill(df: DataFrame, partitionCols: Seq[String], orderCol: String, valueCols: Seq[String]): DataFrame = {
    require(valueCols.nonEmpty)
    val w = Window.partitionBy(partitionCols.map(col): _*).orderBy(col(orderCol))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    valueCols.foldLeft(df)((d, c) => d.withColumn(c, first(col(c), ignoreNulls = true).over(w)))
  }

  /** Fill remaining nulls with per-partition means (the constant-fill
    * fallback after forward/backward fill leaves all-null groups).
    */
  def meanFill(df: DataFrame, partitionCols: Seq[String], valueCols: Seq[String]): DataFrame = {
    require(valueCols.nonEmpty)
    val w = Window.partitionBy(partitionCols.map(col): _*)
    valueCols.foldLeft(df)((d, c) => d.withColumn(c, coalesce(col(c), avg(col(c)).over(w))))
  }
}
