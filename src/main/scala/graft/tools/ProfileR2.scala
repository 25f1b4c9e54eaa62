package graft.tools

import graft.GraftSession
import graft.queries._
import org.apache.spark.sql.functions._

/** Round-2 hotspot profiler: breaks the slowest bench queries into their
  * component jobs to separate scan floor from operator overhead.
  */
object ProfileR2 {
  import Profile.time
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    // warmup
    orders.count(); orders.count()
    time("orders_scan_count")(orders.count())
    time("orders_union_scan")(orders.unionByName(orders).count())
    val u = graft.table.Combine.concatenate(Seq(orders, orders))
    time("concat_only")(u.count())
    time("rowid_regen")(graft.table.RowId.regenerateRowIds(u).count())
    time("q_concat_new_rowids_full")(graft.SparkEntry.queries("q_concat_new_rowids")(spark, dir).count())
    val customer = spark.read.parquet(s"$dir/customer.parquet")
    time("append_position_full")(graft.SparkEntry.queries("q_append_position")(spark, dir).count())
    time("append_position_unsorted")(
      graft.table.Combine.appendByPosition(
        customer, customer.select(col("c_custkey").as("k2")), sortedOutput = false).count())
    spark.stop()
  }
}
