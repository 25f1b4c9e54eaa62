package graft

import graft.sources.Layout
import org.apache.spark.sql.functions._

/** Physical-layout behavior: bucketed joins must not shuffle; partitioned
  * reads must prune.
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed join on the bucket key has no shuffle exchange") {
    val o = spark.read.parquet(s"$sf0001/orders.parquet")
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    Layout.writeBucketed(o, "orders_b", "o_orderkey", 8, sortCol = Some("o_orderkey"))
    Layout.writeBucketed(li.withColumnRenamed("l_orderkey", "o_orderkey"), "lineitem_b", "o_orderkey", 8, sortCol = Some("o_orderkey"))
    val joined = Layout.readTable(spark, "orders_b")
      .join(Layout.readTable(spark, "lineitem_b"), "o_orderkey")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
      s"expected shuffle-free bucketed join, got:\n${plan.linesIterator.take(25).mkString("\n")}")
    // and it is still correct
    assert(joined.count() == li.count())
  }

  test("partitioned write prunes on the partition column") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val path = java.nio.file.Files.createTempDirectory("layout").resolve("docs").toString
    Layout.writePartitioned(docs, path, Seq("lang"))
    val read = spark.read.parquet(path).where($"lang" === "en")
    val scan = read.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("lang"),
      scan.linesIterator.take(12).mkString("\n"))
    val expected = docs.where($"lang" === "en").count()
    assert(read.count() == expected)
  }

  test("writeSorted: files hold disjoint, ordered key ranges") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val path = java.nio.file.Files.createTempDirectory("layout").resolve("li_sorted").toString
    Layout.writeSorted(li, path, Seq("l_shipdate"), numFiles = 4)
    val ranges = Layout.fileKeyRanges(spark, path, "l_shipdate")
      .collect()
      .map(r => (r.getAs[java.time.LocalDateTime]("key_min"), r.getAs[java.time.LocalDateTime]("key_max")))
      .sortBy(_._1)(Ordering.fromLessThan(_ isBefore _))
    assert(ranges.length == 4)
    ranges.sliding(2).foreach {
      case Array((_, prevMax), (curMin, _)) =>
        assert(!curMin.isBefore(prevMax), s"overlapping file ranges: $prevMax vs $curMin")
      case _ =>
    }
    // contents unchanged
    assert(spark.read.parquet(path).count() == li.count())
  }

  test("compact: file count shrinks to ceil(bytes / target), contents unchanged") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val base = java.nio.file.Files.createTempDirectory("layout")
    val fragmented = base.resolve("frag").toString
    docs.repartition(32).write.parquet(fragmented) // 32 tiny files
    val compacted = base.resolve("compacted").toString
    val n = Layout.compact(spark, fragmented, compacted, targetFileBytes = 1L << 20)
    val outFiles = new java.io.File(compacted).listFiles().count(_.getName.endsWith(".parquet"))
    assert(outFiles == n && n < 32, s"expected $n parquet files < 32, found $outFiles")
    assert(spark.read.parquet(compacted).orderBy($"doc_id").collect().toSeq ==
      docs.orderBy($"doc_id").collect().toSeq)
  }
}
