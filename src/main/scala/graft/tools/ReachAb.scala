package graft.tools

import graft.GraftSession
import graft.functions.{RegisterMaxAgg, RegisterMaxAggregator}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev A/B probe (optimization round 18): HyperBall register max-merge
  * via the r11 udaf `Aggregator` (ExpressionEncoder per input row) vs
  * the typed-imperative `RegisterMaxAgg` (primitive buffer, no boxing),
  * one JVM, identical inputs; asserts bit-identical register tables.
  */
object ReachAb {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val spark = GraftSession
      .builder(master = s"local[$cpus]", shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val edges = graft.text.LinkGraph.sharedSpanEdges(docs, "doc_id", "text", 5, 32)
    val e = edges.select(col("src"), col("dst"))
      .where(col("src") =!= col("dst")).distinct().localCheckpoint(true)
    val regs0 = docs.select(col("doc_id").as("id"),
        graft.text.HyperBall.initRegisters(col("doc_id")).as("reg"))
      .localCheckpoint(true)
    val M = graft.text.HyperBall.M
    val oldMax = udaf(RegisterMaxAggregator(M))

    def rounds(regsIn: DataFrame, agg: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
        hops: Int): DataFrame = {
      var regs = regsIn
      (1 to hops).foreach { _ =>
        val nb = e.join(regs, col("dst") === col("id"))
          .select(col("src").as("id"), col("reg"))
        regs = regs.unionAll(nb).groupBy(col("id")).agg(agg(col("reg")).as("reg"))
          .localCheckpoint(true)
      }
      regs
    }
    // equality: the two register tables must be bit-identical
    val a = rounds(regs0, c => oldMax(c), 3)
    val b = rounds(regs0, c => RegisterMaxAgg.registerMax(c, M), 3)
    val diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    System.err.println(s"[reachab] register-table diff=$diff (n=${a.count()})")
    require(diff == 0, "register tables differ")

    def time(tag: String, f: () => DataFrame): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f().count(); (System.nanoTime() - t0) / 1e9
      }
      System.err.println(f"[reachab] $tag%-10s min=${ts.min}%.3f s  all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    (1 to 2).foreach { round =>
      time(s"udaf#$round", () => rounds(regs0, c => oldMax(c), 3))
      time(s"typed#$round", () => rounds(regs0, c => RegisterMaxAgg.registerMax(c, M), 3))
    }
    spark.stop()
  }
}
