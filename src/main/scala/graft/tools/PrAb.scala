package graft.tools

import graft.GraftSession
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev A/B probe (optimization round 19): pageRank iteration variants,
  * one JVM, identical inputs, rank tables asserted bit-identical.
  *
  *  - cur:     shipped r18 loop (union-into-aggregate, localCheckpoint
  *             EVERY iteration — one driver barrier per iteration)
  *  - chained: same arithmetic, NO intermediate checkpoints — the whole
  *             iters-deep plan runs as one query (each exchange is its
  *             own materialization point, nothing is consumed twice), a
  *             single driver barrier at the end (guide §2.6: per-round
  *             job submission is the fixed cost on iterative lanes)
  *  - old:     r17 shape (aggregate then LEFT JOIN ids), per-iter pin
  */
object PrAb {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val iters = 3
    val spark = GraftSession
      .builder(master = s"local[$cpus]", shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val edges = graft.text.LinkGraph
      .sharedSpanEdges(docs, "doc_id", "text", 5, 32).localCheckpoint(true)
    val nodes = docs.select(col("doc_id"))
    val scale = 1000000000000L
    val (dampNum, dampDen) = (85, 100)

    def prep(): (DataFrame, DataFrame, Long) = {
      val ids = nodes.select(col("doc_id").as("id"))
      val e = edges.select(col("src"), col("dst"))
        .where(col("src") =!= col("dst")).distinct()
      val ewd = e.join(
          e.groupBy(col("src")).agg(count(lit(1)).as("__deg")), Seq("src"))
        .cache()
      (ids, ewd, ids.count())
    }

    def prCur(): DataFrame =
      graft.text.LinkGraph.pageRank(nodes, "doc_id", edges, iters)

    def prChained(): DataFrame = {
      val (ids, ewd, n) = prep()
      val teleport = ((dampDen - dampNum).toLong * scale / dampDen) / n
      var ranks = ids.withColumn("r", lit(scale / n))
      var i = 0
      while (i < iters) {
        val contrib = ranks.join(ewd, col("id") === col("src"))
          .select(col("dst").as("id"), expr("r div __deg").as("__c"))
        ranks = ids.withColumn("__c", lit(0L)).unionAll(contrib)
          .groupBy(col("id")).agg(sum(col("__c")).as("__s"))
          .select(col("id"),
            (lit(teleport) + expr(s"(${dampNum}L * __s) div ${dampDen}L")).as("r"))
        i += 1
      }
      val out = ranks.localCheckpoint(true)
      ewd.unpersist()
      out.select(col("id").as("doc_id"), col("r").as("rank_fp"),
        (col("r").cast("double") / lit(scale.toDouble)).as("score"))
    }

    def prOld(): DataFrame = {
      val (ids, ewd, n) = prep()
      val teleport = ((dampDen - dampNum).toLong * scale / dampDen) / n
      var ranks = ids.withColumn("r", lit(scale / n))
      var prevPinned: Option[DataFrame] = None
      var i = 0
      while (i < iters) {
        val contrib = ranks.join(ewd, col("id") === col("src"))
          .select(col("dst").as("id"), expr("r div __deg").as("__c"))
          .groupBy(col("id")).agg(sum(col("__c")).as("__s"))
        ranks = ids.join(contrib, Seq("id"), "left")
          .select(col("id"),
            (lit(teleport) +
              coalesce(expr(s"(${dampNum}L * __s) div ${dampDen}L"), lit(0L))).as("r"))
          .localCheckpoint(true)
        prevPinned.foreach(graft.Pins.release)
        prevPinned = Some(ranks)
        i += 1
      }
      ewd.unpersist()
      ranks.select(col("id").as("doc_id"), col("r").as("rank_fp"),
        (col("r").cast("double") / lit(scale.toDouble)).as("score"))
    }

    val a = prCur(); val b = prChained(); val c = prOld()
    val d1 = a.exceptAll(b).count() + b.exceptAll(a).count()
    val d2 = a.exceptAll(c).count() + c.exceptAll(a).count()
    System.err.println(s"[prab] rank diff chained=$d1 old=$d2")
    require(d1 == 0 && d2 == 0, "ranks differ")

    def time(tag: String, f: () => DataFrame): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f().count(); (System.nanoTime() - t0) / 1e9
      }
      System.err.println(f"[prab] $tag%-10s min=${ts.min}%.3f s  all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    (1 to 2).foreach { round =>
      time(s"cur#$round", () => prCur())
      time(s"chained#$round", () => prChained())
      time(s"old#$round", () => prOld())
    }
    spark.stop()
  }
}
