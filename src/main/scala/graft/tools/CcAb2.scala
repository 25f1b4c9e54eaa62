package graft.tools

import graft.GraftSession
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev A/B probe (optimization round 19): connected-components round
  * variants, one JVM, identical inputs, labels asserted identical.
  *
  *  - cur:   the shipped r18 loop (ls pin + ss pin + per-round isStarSet)
  *  - fused: ONE plan per round — smallStar(largeStar(e)) with the ls
  *           subtree shared via exchange reuse, one checkpoint — and the
  *           expensive star probe gated behind edge-count stability (the
  *           count rides the pinned checkpoint, ~free; the 2|E| probe
  *           aggregation runs only when the count says "maybe converged")
  *  - old:   the r17 count-based loop from CcAb, for reference
  */
object CcAb2 {
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

    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.select(col("hi").as("u"), col("lo").as("v"))
        .unionAll(e.select(col("lo").as("u"), col("hi").as("v")))
      val m = sym.groupBy(col("u")).agg(min(col("v")).as("__mn"))
        .select(col("u"), least(col("u"), col("__mn")).as("__m"))
      sym.join(m, Seq("u")).where(col("v") > col("u"))
        .select(col("v").as("hi"), col("__m").as("lo")).distinct()
    }
    def smallStar(e: DataFrame): DataFrame = {
      val m = e.groupBy(col("hi")).agg(min(col("lo")).as("__m"))
      val moved = e.join(m, Seq("hi")).where(col("lo") =!= col("__m"))
        .select(col("lo").as("hi"), col("__m").as("lo"))
      moved.unionAll(m.select(col("hi"), col("__m").as("lo"))).distinct()
    }
    def isStarSet(e: DataFrame): Boolean = {
      val sides = e
        .select(col("hi").as("n"), lit(1L).as("__h"))
        .unionAll(e.select(col("lo").as("n"), lit(0L).as("__h")))
      sides.groupBy(col("n"))
        .agg(sum(col("__h")).as("__nHi"), min(col("__h")).as("__minH"))
        .where(col("__nHi") > 1 || (col("__nHi") >= 1 && col("__minH") === 0))
        .limit(1).count() == 0L
    }
    def canon(): DataFrame = edges.select(col("src"), col("dst"))
      .where(col("src") =!= col("dst"))
      .select(greatest(col("src"), col("dst")).as("hi"),
        least(col("src"), col("dst")).as("lo"))
      .distinct()
    def label(e: DataFrame): DataFrame = {
      val lbl = e.select(col("hi").as("id"), col("lo").as("rep"))
        .unionAll(e.select(col("lo").as("id"), col("lo").as("rep")).distinct())
      nodes.join(lbl.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("rep"), col("doc_id")).as("rep"))
    }

    def ccFused(): DataFrame = {
      var e = canon().localCheckpoint(true)
      var cnt = e.count()
      var rounds = 0
      var converged = isStarSet(e) // parity with cur: star input does 0 rounds
      var probes = 1
      while (!converged && rounds < 30) {
        val next = smallStar(largeStar(e)).localCheckpoint(true)
        val c = next.count()
        if (c == cnt) { converged = isStarSet(next); probes += 1 }
        graft.Pins.release(e)
        e = next
        cnt = c
        rounds += 1
      }
      require(converged, "not converged")
      System.err.println(s"[ccab2] fused rounds=$rounds probes=$probes")
      label(e)
    }
    // old-style two pins per round, but convergence = count stability
    // confirmed by ONE star probe (exactness kept, probe cost amortized)
    def ccTwoPin(): DataFrame = {
      var e = canon().localCheckpoint(true)
      var cnt = e.count()
      var rounds = 0
      var converged = false
      var probes = 0
      while (!converged && rounds < 30) {
        val ls = largeStar(e).localCheckpoint(true)
        val next = smallStar(ls).localCheckpoint(true)
        graft.Pins.release(ls)
        val c = next.count()
        if (c == cnt) { converged = isStarSet(next); probes += 1 }
        graft.Pins.release(e)
        e = next
        cnt = c
        rounds += 1
      }
      require(converged, "not converged")
      System.err.println(s"[ccab2] twopin rounds=$rounds probes=$probes")
      label(e)
    }
    def ccCur(): DataFrame =
      graft.text.LinkGraph.connectedComponents(nodes, "doc_id", edges)
        .select(col("doc_id"), col("rep"))

    if (sys.env.contains("CCAB2_EXPLAIN")) {
      val e0 = canon().localCheckpoint(true)
      val planTxt = smallStar(largeStar(e0)).queryExecution.executedPlan.toString
      System.err.println("[ccab2] fused round plan:\n" + planTxt)
    }

    val a = ccCur(); val b = ccFused()
    val diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    System.err.println(s"[ccab2] label diff=$diff")
    require(diff == 0, "labels differ")

    def time(tag: String, f: () => DataFrame): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f().count(); (System.nanoTime() - t0) / 1e9
      }
      System.err.println(f"[ccab2] $tag%-8s min=${ts.min}%.3f s  all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    val c = ccTwoPin()
    val diff2 = a.exceptAll(c).count() + c.exceptAll(a).count()
    System.err.println(s"[ccab2] twopin label diff=$diff2")
    require(diff2 == 0, "twopin labels differ")
    (1 to 2).foreach { round =>
      time(s"cur#$round", () => ccCur())
      time(s"fused#$round", () => ccFused())
      time(s"twopin#$round", () => ccTwoPin())
    }
    spark.stop()
  }
}
