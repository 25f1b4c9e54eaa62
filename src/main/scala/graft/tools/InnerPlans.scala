package graft.tools

import graft.GraftSession
import graft.text.LinkGraph
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Dev tool (optimization rounds): the declared iterative queries pin
  * every round with localCheckpoint, so their `.explain` shows only the
  * final readout over an ExistingRDD. This probe explains the INNER
  * shapes the loops execute — the edge build and one loop round — which
  * is where the per-iteration Exchange counts live.
  *
  * usage: InnerPlans <outDir> <suffix>
  */
object InnerPlans {
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
      System.err.println(s"[innerplans] $name -> ${name}_$suffix.txt ($nEx Exchange)")
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    // 1. the shared-span edge build (feeds ~15 graph lanes)
    val edges = LinkGraph.sharedSpanEdges(docs, "doc_id", "text", w = 5, maxDf = 32)
    dump("inner_sharedSpanEdges", edges)

    // 2. one pageRank iteration body, the SHIPPED r18/r19 shape (union-
    //    into-aggregate; since r19 iterations chain with no per-iteration
    //    checkpoint, so the body below is what each chained step adds).
    //    Kept in sync with LinkGraph.pageRank by hand (ADVICE r18: the
    //    old dump showed the r17 left-join body, not the shipped one).
    val e = edges.select(col("src"), col("dst"))
      .where(col("src") =!= col("dst")).distinct()
    val ewd = e.join(e.groupBy(col("src")).agg(count(lit(1)).as("__deg")), Seq("src"))
      .cache()
    val ids = docs.select(col("doc_id").as("id"))
    val ranks0 = ids.withColumn("r", lit(1000000L)).localCheckpoint(true)
    val contrib = ranks0.join(ewd, col("id") === col("src"))
      .select(col("dst").as("id"), expr("r div __deg").as("__c"))
    val iter = ids.withColumn("__c", lit(0L)).unionAll(contrib)
      .groupBy(col("id")).agg(sum(col("__c")).as("__s"))
      .select(col("id"), (lit(7L) + expr("(85L * __s) div 100L")).as("r"))
    dump("inner_pagerank_round", iter)
    // 2b. three chained iterations — the r19 whole-loop plan the declared
    //     3-iter lanes execute as ONE job
    var ranksC = ids.withColumn("r", lit(1000000L))
    for (_ <- 1 to 3) {
      val c = ranksC.join(ewd, col("id") === col("src"))
        .select(col("dst").as("id"), expr("r div __deg").as("__c"))
      ranksC = ids.withColumn("__c", lit(0L)).unionAll(c)
        .groupBy(col("id")).agg(sum(col("__c")).as("__s"))
        .select(col("id"), (lit(7L) + expr("(85L * __s) div 100L")).as("r"))
    }
    dump("inner_pagerank_chained3", ranksC)
    ewd.unpersist()

    // 3. one connected-components round (largeStar then smallStar) over
    //    the canonicalized edge set — largeStar in its r19 lean shape
    //    (e joined directly, no per-round distinct; kept in sync with
    //    LinkGraph.largeStar by hand)
    val canon = edges.select(col("src"), col("dst"))
      .where(col("src") =!= col("dst"))
      .select(greatest(col("src"), col("dst")).as("hi"),
        least(col("src"), col("dst")).as("lo"))
      .distinct().localCheckpoint(true)
    val sym = canon.select(col("hi").as("u"), col("lo").as("v"))
      .unionAll(canon.select(col("lo").as("u"), col("hi").as("v")))
    val m = sym.groupBy(col("u")).agg(min(col("v")).as("__mn"))
      .select(col("u"), least(col("u"), col("__mn")).as("__m"))
    val ls = canon.join(m, col("lo") === col("u"))
      .select(col("hi"), col("__m").as("lo"))
    dump("inner_components_largestar", ls)

    // 4. one HyperBall round (register pull + max-merge) — the SHIPPED
    //    RegisterMaxAgg TypedImperativeAggregate (ADVICE r18: the old
    //    dump ran the superseded udaf RegisterMaxAggregator)
    val regs0 = ids.select(col("id"),
        graft.text.HyperBall.initRegisters(col("id")).as("reg"))
      .localCheckpoint(true)
    val nb = e.join(regs0, col("dst") === col("id"))
      .select(col("src").as("id"), col("reg"))
    val round = regs0.unionAll(nb)
      .groupBy(col("id"))
      .agg(graft.functions.RegisterMaxAgg
        .registerMax(col("reg"), graft.text.HyperBall.M).as("reg"))
    dump("inner_hyperball_round", round)

    spark.stop()
  }
}
