package graft.text

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

/** Token-budget data selection — "train on the best N tokens": rank
  * documents by a quality score (descending, id tie-break) and keep the
  * prefix whose cumulative token count stays within the budget. The
  * greedy prefix rule, not a knapsack: the first document that would
  * cross the budget is dropped and — cumulative sums being monotone —
  * so is everything ranked after it.
  *
  * Scale shape (100 TB): only (id, score, n_tokens) triples (~24 B/doc)
  * enter the sort's range exchange; text never moves. The global
  * running sum is the [[graft.table.RowId]] offsets pattern generalized
  * from counts to sums — per-partition token totals to the driver
  * (O(#partitions)), prefix offsets back as a plan literal (or a
  * broadcast join at degenerate partition counts), the within-partition
  * running sum a fully parallel per-partition window. No global
  * single-partition window anywhere. The sorted pairs are pinned with
  * an eager localCheckpoint so the offsets job and the selection job
  * cannot see different AQE partitionings (the RowId ADVICE-r2 trap).
  */
object Budget {

  /** Select documents by descending `scoreCol` until `budget` tokens.
    * Output: (idCol, n_tokens, cum_tokens) of the selected documents,
    * cum_tokens inclusive of the row itself.
    */
  def tokenBudgetSelect(docs: DataFrame, idCol: String, scoreCol: Column,
      tokens: Column, budget: Long): DataFrame = {
    require(budget >= 0, s"tokenBudgetSelect: negative budget $budget")
    // same reserved-name discipline as RowId.withRowIndexCounted (this is
    // that machinery with counts generalized to sums; kept separate
    // because the count path has a narrow-deterministic fast path and the
    // epoch variant restarts per epoch — see RowId.scala / Curriculum.scala).
    // The opening select projects every other input column away, so the
    // only possible clash is the id column itself.
    require(!Seq("__score", "__pid", "__offset", "n_tokens", "cum_tokens").contains(idCol),
      s"tokenBudgetSelect: id column name $idCol is reserved")
    val sorted = docs
      .select(col(idCol), scoreCol.as("__score"), tokens.cast("long").as("n_tokens"))
      .orderBy(col("__score").desc, col(idCol))
      .localCheckpoint(true)
    val tagged = sorted.withColumn("__pid", spark_partition_id())
    val sums = tagged.groupBy(col("__pid")).agg(sum(col("n_tokens")).as("s"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsetByPid = sums.map { case (p, s) => val o = acc; acc += s; (p, o) }.toMap
    val maxPid = sums.lastOption.map(_._1).getOrElse(-1)
    val w = Window.partitionBy(col("__pid")).orderBy(col("__score").desc, col(idCol))
    val withOffset = if (maxPid < 4096) {
      // dense plan-literal offsets (empty partitions carry the running
      // value; never evaluated) — the fast path at realistic counts
      var run = 0L
      val dense = (0 to maxPid).map { p => run = offsetByPid.getOrElse(p, run); run }
      tagged.withColumn("__offset", element_at(typedlit(dense), col("__pid") + 1))
    } else {
      val spark = docs.sparkSession
      val offsetsDf = spark.createDataFrame(
        spark.sparkContext.parallelize(sums.map(p => Row(p._1, offsetByPid(p._1))).toSeq, 1),
        StructType(Seq(
          StructField("__pid", IntegerType, nullable = false),
          StructField("__offset", LongType, nullable = false))))
      tagged.join(broadcast(offsetsDf), Seq("__pid"))
    }
    withOffset
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w) + col("__offset"))
      .where(col("cum_tokens") <= budget)
      .select(col(idCol), col("n_tokens"), col("cum_tokens"))
  }
}
