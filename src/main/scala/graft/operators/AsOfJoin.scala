package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join: for every left row, the most recent right row
  * with right.time <= left.time (or < when `strict`) per key — the
  * time-series enrichment operator the reference lacks (SURVEY.md §2.3
  * "—absent—"; Spark has no built-in either).
  *
  * Algorithm: union + running `last` window — the scalable sort-merge
  * shape. Both sides shuffle ONCE on the key, each partition sorts by
  * (time, side-tag), and a running last-non-null carries the right side's
  * packed values forward into each probe row. No per-row range scan, no
  * broadcast requirement, no quadratic per-key blowup: cost is ONE
  * sort-shuffle of |L|+|R|, the optimum for an unindexed as-of join at
  * 100 TB. Right-side values are packed into one struct so all enriched
  * columns come from the SAME right row (per-column `last` could mix
  * rows when right values contain nulls); the LEFT row rides the union as
  * a packed struct too, so the left plan is evaluated exactly once — no
  * id-based join-back, which would both re-evaluate the left lineage
  * (corrupting results for nondeterministic inputs) and cost a second
  * shuffle.
  */
object AsOfJoin {

  def backward(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftTime: String,
      rightTime: String,
      valueCols: Seq[String],
      prefix: String = "asof_",
      strict: Boolean = false
  ): DataFrame = {
    require(valueCols.nonEmpty, "asOf: need at least one right value column")
    val t = "__graft_asof_t"
    val probeTag = "__graft_asof_probe"
    val vals = "__graft_asof_vals"
    val leftRow = "__graft_asof_left"

    val valStruct = org.apache.spark.sql.types.StructType(valueCols.map(c => right.schema(c)))
    val leftStruct = left.schema
    val probeSide = left.select(
      on.map(col) ++ Seq(
        col(leftTime).as(t),
        // probes sort AFTER right rows at equal time for inclusive (<=),
        // BEFORE for strict (<)
        lit(if (strict) 0 else 1).as(probeTag),
        struct(left.columns.map(col).toSeq: _*).as(leftRow),
        lit(null).cast(valStruct).as(vals)
      ): _*)
    val buildSide = right.select(
      on.map(col) ++ Seq(
        col(rightTime).as(t),
        lit(if (strict) 1 else 0).as(probeTag),
        lit(null).cast(leftStruct).as(leftRow),
        struct(valueCols.map(col): _*).as(vals)
      ): _*)

    val w = Window
      .partitionBy(on.map(col): _*)
      .orderBy(col(t).asc, col(probeTag).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    probeSide
      .unionAll(buildSide)
      .withColumn(vals, last(col(vals), ignoreNulls = true).over(w))
      .where(col(leftRow).isNotNull)
      .select(col(s"$leftRow.*") +: valueCols.map(c => col(s"$vals.`$c`").as(prefix + c)): _*)
  }
}
