package graft.tools

import graft.GraftSession
import graft.text.LinkGraph
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Dev tool (optimization round 19): the ROUND-18 inner loop bodies,
  * inlined verbatim from the r18 tree (commit f044d35), so the
  * plans/r19 `_before` inner evidence shows what the shipped r18 code
  * actually planned — the r18 InnerPlans accidentally dumped r17 shapes
  * (ADVICE finding). [[InnerPlans]] dumps the shipped (r19) bodies.
  *
  * usage: InnerPlansR18 <outDir> <suffix>
  */
object InnerPlansR18 {
  def main(args: Array[String]): Unit = {
    val Array(outDir, suffix) = args.take(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession
      .builder(master = s"local[$cpus]", shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val txt = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      Files.writeString(Paths.get(outDir, s"${name}_$suffix.txt"), txt)
      val nEx = txt.linesIterator.count(_.trim.startsWith("Exchange"))
      System.err.println(s"[innerplansr18] $name -> ${name}_$suffix.txt ($nEx Exchange)")
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val edges = LinkGraph.sharedSpanEdges(docs, "doc_id", "text", w = 5, maxDf = 32)
    val ids = docs.select(col("doc_id").as("id"))

    // r18 pageRank round: union-into-aggregate, localCheckpoint EVERY
    // iteration (the body below is one such pinned iteration)
    val e = edges.select(col("src"), col("dst"))
      .where(col("src") =!= col("dst")).distinct()
    val ewd = e.join(e.groupBy(col("src")).agg(count(lit(1)).as("__deg")), Seq("src"))
      .cache()
    val ranks0 = ids.withColumn("r", lit(1000000L)).localCheckpoint(true)
    val contrib = ranks0.join(ewd, col("id") === col("src"))
      .select(col("dst").as("id"), expr("r div __deg").as("__c"))
    val iter = ids.withColumn("__c", lit(0L)).unionAll(contrib)
      .groupBy(col("id")).agg(sum(col("__c")).as("__s"))
      .select(col("id"), (lit(7L) + expr("(85L * __s) div 100L")).as("r"))
    dump("inner_pagerank_round", iter)
    ewd.unpersist()

    // r18 largeStar: symmetrized join + per-round distinct
    val canon = edges.select(col("src"), col("dst"))
      .where(col("src") =!= col("dst"))
      .select(greatest(col("src"), col("dst")).as("hi"),
        least(col("src"), col("dst")).as("lo"))
      .distinct().localCheckpoint(true)
    val sym = canon.select(col("hi").as("u"), col("lo").as("v"))
      .unionAll(canon.select(col("lo").as("u"), col("hi").as("v")))
    val m = sym.groupBy(col("u")).agg(min(col("v")).as("__mn"))
      .select(col("u"), least(col("u"), col("__mn")).as("__m"))
    val ls = sym.join(m, Seq("u")).where(col("v") > col("u"))
      .select(col("v").as("hi"), col("__m").as("lo")).distinct()
    dump("inner_components_largestar", ls)

    // r18 isStarSet probe — in r18 it ran EVERY round; in r19 it is
    // gated behind edge-count stability (runs once)
    val sides = canon
      .select(col("hi").as("n"), lit(1L).as("__h"))
      .unionAll(canon.select(col("lo").as("n"), lit(0L).as("__h")))
    val probe = sides.groupBy(col("n"))
      .agg(sum(col("__h")).as("__nHi"), min(col("__h")).as("__minH"))
      .where(col("__nHi") > 1 || (col("__nHi") >= 1 && col("__minH") === 0))
      .limit(1)
    dump("inner_components_starprobe", probe)

    spark.stop()
  }
}
