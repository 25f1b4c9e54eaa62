package graft.tools

import graft.GraftSession
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev A/B probe (optimization round 18): the r17 connectedComponents
  * round (min-agg + join star passes, BOTH pinned) vs the window-based
  * one-pin round, one JVM, identical inputs; asserts identical labels.
  */
object CcAb {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val spark = GraftSession
      .builder(master = s"local[$cpus]", shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val edges = graft.text.LinkGraph
      .sharedSpanEdges(docs, "doc_id", "text", 5, 32).localCheckpoint(true)
    val nodes = docs.select(col("doc_id"))

    // r17 round shapes, verbatim
    def largeStarOld(e: DataFrame): DataFrame = {
      val sym = e.select(col("hi").as("u"), col("lo").as("v"))
        .unionAll(e.select(col("lo").as("u"), col("hi").as("v")))
      val m = sym.groupBy(col("u")).agg(min(col("v")).as("__mn"))
        .select(col("u"), least(col("u"), col("__mn")).as("__m"))
      sym.join(m, Seq("u")).where(col("v") > col("u"))
        .select(col("v").as("hi"), col("__m").as("lo")).distinct()
    }
    def smallStarOld(e: DataFrame): DataFrame = {
      val m = e.groupBy(col("hi")).agg(min(col("lo")).as("__m"))
      val moved = e.join(m, Seq("hi")).where(col("lo") =!= col("__m"))
        .select(col("lo").as("hi"), col("__m").as("lo"))
      moved.unionAll(m.select(col("hi"), col("__m").as("lo"))).distinct()
    }
    def ccOld(): DataFrame = {
      var e = edges.select(col("src"), col("dst"))
        .where(col("src") =!= col("dst"))
        .select(greatest(col("src"), col("dst")).as("hi"),
          least(col("src"), col("dst")).as("lo"))
        .distinct().localCheckpoint(true)
      var rounds = 0
      var lastCount = -1L
      var cur = e.count()
      // count-based stability stand-in for the probe (isStarSet is private)
      while (rounds < 30) {
        val ls = largeStarOld(e).localCheckpoint(true)
        val next = smallStarOld(ls).localCheckpoint(true)
        graft.Pins.release(ls); graft.Pins.release(e)
        e = next
        val c = e.count()
        if (c == lastCount) rounds = 30 else { lastCount = c; rounds += 1 }
      }
      val lbl = e.select(col("hi").as("id"), col("lo").as("rep"))
        .unionAll(e.select(col("lo").as("id"), col("lo").as("rep")).distinct())
      nodes.join(lbl.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("rep"), col("doc_id")).as("rep"))
    }
    def ccNew(): DataFrame =
      graft.text.LinkGraph.connectedComponents(nodes, "doc_id", edges)
        .select(col("doc_id"), col("rep"))

    val diff = ccOld().exceptAll(ccNew()).count() + ccNew().exceptAll(ccOld()).count()
    System.err.println(s"[ccab] label diff=$diff")
    require(diff == 0, "labels differ")

    def time(tag: String, f: () => DataFrame): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f().count(); (System.nanoTime() - t0) / 1e9
      }
      System.err.println(f"[ccab] $tag%-8s min=${ts.min}%.3f s  all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    (1 to 2).foreach { round =>
      time(s"old#$round", () => ccOld())
      time(s"new#$round", () => ccNew())
    }
    spark.stop()
  }
}
