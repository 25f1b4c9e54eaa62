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

  test("zorder expression interleaves bits (Morton order)") {
    import org.apache.spark.sql.graftbridge.Bridge
    val z = Bridge.column(graft.expressions.ZOrder(Seq(
      Bridge.expression(lit(3).cast("int")), // bits {0,1} → positions 0, 2
      Bridge.expression(lit(1).cast("int"))))) // bit {0} → position 1
    assert(spark.range(1).select(z.as("z")).head().getLong(0) == 7L)
    // clamp + null handling
    val z2 = Bridge.column(graft.expressions.ZOrder(Seq(
      Bridge.expression(lit(-5).cast("int")),
      Bridge.expression(lit(null).cast("int")))))
    assert(spark.range(1).select(z2.as("z")).head().getLong(0) == 0L)
  }

  test("z-order layout bounds per-file extents on BOTH columns; plain sort only on one") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select($"l_orderkey", $"l_suppkey", $"l_quantity")
    val base = java.nio.file.Files.createTempDirectory("zorder")
    val zPath = base.resolve("z").toString
    val sPath = base.resolve("s").toString
    Layout.writeZOrdered(li, zPath, Seq("l_orderkey", "l_suppkey"), numFiles = 16)
    Layout.writeSorted(li, sPath, Seq("l_orderkey"), numFiles = 16)

    def meanExtent(path: String, c: String): Double = {
      val ex = spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg((max(col(c)) - min(col(c))).cast("double").as("ext"))
        .agg(avg($"ext")).head().getDouble(0)
      ex
    }
    val globalSupp = li.agg((max($"l_suppkey") - min($"l_suppkey")).cast("double")).head().getDouble(0)
    // single-column sort leaves the second column unclustered: per-file
    // extent ≈ global extent
    assert(meanExtent(sPath, "l_suppkey") > globalSupp * 0.8)
    // z-order bounds BOTH dimensions: each file covers a fraction of the
    // second column's range too
    assert(meanExtent(zPath, "l_suppkey") < globalSupp * 0.6,
      s"zorder suppkey extent ${meanExtent(zPath, "l_suppkey")} vs global $globalSupp")
    assert(spark.read.parquet(zPath).count() == li.count())
  }

  test("scanParallelism: row-group counts from footers expose the single-row-group trap") {
    val dir = java.nio.file.Files.createTempDirectory("graft_scanpar").toString
    val df = spark.range(0, 50000).select($"id", ($"id" * 2).as("v"))
    // one task → one file; default block size → ONE row group
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/fat")
    // small parquet.block.size → many row groups in the same one file
    df.coalesce(1).write.mode("overwrite")
      .option("parquet.block.size", (64 * 1024).toString)
      .parquet(s"$dir/split")
    val fat = Layout.scanParallelism(spark, s"$dir/fat").collect()
    assert(fat.length == 1 && fat.head.getAs[Long]("row_groups") == 1L,
      s"fat: ${fat.mkString(",")}")
    assert(fat.head.getAs[Long]("rows") == 50000L)
    val split = Layout.scanParallelism(spark, s"$dir/split").collect()
    assert(split.length == 1 && split.head.getAs[Long]("row_groups") > 4L,
      s"split: ${split.mkString(",")}")
    assert(split.head.getAs[Long]("rows") == 50000L)
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

  test("rewriteForCompute: single-row-group table rises to ~target scan parallelism, contents unchanged") {
    val base = java.nio.file.Files.createTempDirectory("layout_rw")
    val df = spark.range(0, 40000).select($"id", ($"id" % 97).cast("string").as("s"))
    val starved = base.resolve("starved").toString
    df.coalesce(1).write.mode("overwrite").parquet(starved) // the pyarrow-default trap
    val before = Layout.scanParallelism(spark, starved).collect()
    assert(before.map(_.getAs[Long]("row_groups")).sum == 1L, "fixture must be one row group")

    val fixed = base.resolve("fixed").toString
    val n = Layout.rewriteForCompute(spark, starved, fixed, targetParallelism = 8)
    assert(n == 8, s"small table: file count == targetParallelism, got $n")
    val after = Layout.scanParallelism(spark, fixed).collect()
    assert(after.map(_.getAs[Long]("row_groups")).sum >= 8L,
      s"scan parallelism must rise to >= target: ${after.mkString(",")}")
    assert(after.map(_.getAs[Long]("rows")).sum == 40000L)
    assert(spark.read.parquet(fixed).orderBy($"id").collect().toSeq ==
      df.orderBy($"id").collect().toSeq, "round-robin rewrite preserves contents")
  }

  test("repartitionForCompute: downstream parallelism no longer bound by one input split") {
    val df = spark.range(0, 1000).toDF("id").coalesce(1)
    assert(df.rdd.getNumPartitions == 1)
    val fanned = Layout.repartitionForCompute(df)
    assert(fanned.rdd.getNumPartitions == 2 * spark.sparkContext.defaultParallelism)
    assert(Layout.repartitionForCompute(df, 7).rdd.getNumPartitions == 7)
    assert(fanned.agg(sum($"id")).head().getLong(0) == 499500L)
  }
}
