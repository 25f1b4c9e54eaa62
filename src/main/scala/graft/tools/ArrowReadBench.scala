package graft.tools

import graft.sources.ArrowIpc
import org.apache.spark.sql.SparkSession

/** Measures Arrow IPC read throughput (the migration path's hot loop):
  * writes `lineitem` from the given SF dir to a temp IPC store once, then
  * times `ArrowIpc.read(...).count()` best-of-N. Run on an idle machine:
  *
  *   sbt "runMain graft.tools.ArrowReadBench /root/testdata/sf0.1"
  *
  * Context for the number (BASELINE.md "Arrow IPC read path"): the reader
  * converts Arrow vectors straight to InternalRow (one conversion); the
  * r6 implementation went Arrow → InternalRow → Row → InternalRow (two).
  */
object ArrowReadBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .appName("graft-arrow-read-bench")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    try {
      val tmp = java.nio.file.Files.createTempDirectory("arrow_read_bench").resolve("lineitem").toString
      val li0 = spark.read.parquet(s"$sfDir/lineitem.parquet")
      // pre-r7 reader had no TimestampNTZ mapping; keep the bench runnable
      // against both implementations by normalizing to TimestampType
      val li = li0.select(li0.schema.map { f =>
        import org.apache.spark.sql.functions.col
        import org.apache.spark.sql.types.TimestampNTZType
        if (f.dataType == TimestampNTZType) col(f.name).cast("timestamp").as(f.name) else col(f.name)
      }: _*)
      val rows = li.count()
      ArrowIpc.write(li.repartition(8), tmp)
      // warm-up then best-of-3
      ArrowIpc.read(spark, tmp).count()
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val n = ArrowIpc.read(spark, tmp).count()
        require(n == rows, s"row count mismatch: $n vs $rows")
        (System.nanoTime() - t0) / 1e9
      }
      val best = times.min
      System.err.println(f"[arrow-read-bench] rows=$rows best=${best}%.3f s  (${rows / best / 1e6}%.2f M rows/s)  all=${times.map(t => f"$t%.3f").mkString(",")}")
      // column-pruned read: 2 of 16 columns via selective buffer IO —
      // report time AND bytes (the counter isolates what pruning skips)
      import org.apache.spark.sql.functions.{col, sum}
      def prunedAgg() = ArrowIpc.read(spark, tmp, Seq("l_orderkey", "l_quantity"))
        .agg(sum(col("l_quantity"))).collect()
      def fullAgg() = ArrowIpc.read(spark, tmp)
        .agg(sum(col("l_quantity"))).collect()
      prunedAgg(); fullAgg() // warm
      val (_, fullBytes) = ArrowIpc.bytesReadDuring(fullAgg())
      val fullT = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); fullAgg(); (System.nanoTime() - t0) / 1e9
      }.min
      val (_, prunedBytes) = ArrowIpc.bytesReadDuring(prunedAgg())
      val prunedT = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); prunedAgg(); (System.nanoTime() - t0) / 1e9
      }.min
      System.err.println(
        f"[arrow-read-bench] pruned 2/16 cols: ${prunedT}%.3f s / ${prunedBytes / 1e6}%.1f MB read  vs full-read agg ${fullT}%.3f s / ${fullBytes / 1e6}%.1f MB  (${fullBytes.toDouble / prunedBytes.max(1)}%.1fx bytes)")
    } finally spark.stop()
  }
}
