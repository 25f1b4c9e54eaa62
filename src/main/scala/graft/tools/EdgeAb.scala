package graft.tools

import graft.GraftSession
import graft.functions.{TextFunctions => T}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev A/B probe (optimization round 18): the r17 pair-join shared-span
  * edge builder vs the grouped single-scan rewrite, measured in ONE JVM
  * back to back so window drift cannot fake a verdict. Also asserts the
  * two produce the identical edge set.
  */
object EdgeAb {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val spark = GraftSession
      .builder(master = s"local[$cpus]", shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    // the r17 shape, verbatim
    def oldEdges(w: Int, maxDf: Int): DataFrame = {
      val spans = docs.select(col("doc_id").as("__id"),
        explode(T.shingleHashes(col("text"), w)).as("__h"))
      val rare = spans.groupBy(col("__h"))
        .agg(countDistinct(col("__id")).as("__df"))
        .where(col("__df") >= 2 && col("__df") <= maxDf)
        .select(col("__h"))
      val sp = spans.join(rare, Seq("__h"))
      val pairs = sp.select(col("__h"), col("__id").as("id_a"))
        .join(sp.select(col("__h"), col("__id").as("id_b")), Seq("__h"))
        .where(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b")).distinct()
      pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
        .unionAll(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
    }
    def newEdges(w: Int, maxDf: Int): DataFrame =
      graft.text.LinkGraph.sharedSpanEdges(docs, "doc_id", "text", w, maxDf)

    // equality first (both directions, exact set)
    val a = oldEdges(5, 32); val b = newEdges(5, 32)
    val onlyOld = a.exceptAll(b).count(); val onlyNew = b.exceptAll(a).count()
    System.err.println(s"[edgeab] edge-set diff old-only=$onlyOld new-only=$onlyNew " +
      s"(old=${a.count()}, new=${b.count()})")
    require(onlyOld == 0 && onlyNew == 0, "edge sets differ")

    def time(tag: String, f: () => DataFrame): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f().count(); (System.nanoTime() - t0) / 1e9
      }
      System.err.println(f"[edgeab] $tag%-10s min=${ts.min}%.3f s  all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    // interleave to share any window drift
    (1 to 2).foreach { round =>
      time(s"old#$round", () => oldEdges(5, 32))
      time(s"new#$round", () => newEdges(5, 32))
    }
    spark.stop()
  }
}
