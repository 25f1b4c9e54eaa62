package graft.tools

import graft.functions.{HashFunctions => H, TextFunctions => T}
import graft.GraftSession
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev tool: per-stage timing of the MinHash pipeline with non-prunable
  * actions (noop write evaluates every expression; count() would prune
  * projections).
  */
object ProfileMinhash {
  def force(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()
  def time[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    System.err.println(f"[pm] $name: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.count() // warm scan

    val shingled = docs
      .select(col("doc_id").as("id"), explode(T.shingles(col("text"), 3)).as("sh"))
      .select(col("id"), xxhash64(col("sh")).as("h"))
    time("explode+hash (noop)")(force(shingled))
    time("explode+hash again")(force(shingled))

    val sigOnly = shingled.groupBy(col("id"))
      .agg(graft.functions.MinHashAggregator.signature(col("h"), 64).as("sig"))
    time("sig udaf k=64")(force(sigOnly))
    time("sig udaf k=64 again")(force(sigOnly))

    val minAggs = (1 until 4).map(i => min(col("h") + i).as(s"m$i"))
    val sigNative = shingled.groupBy(col("id"))
      .agg(min(col("h")).as("m0"), minAggs: _*)
    time("4 plain min aggs (shuffle floor)")(force(sigNative))

    val withSet = shingled.groupBy(col("id"))
      .agg(
        graft.functions.MinHashAggregator.signature(col("h"), 64).as("sig"),
        collect_set(col("h")).as("shset"))
    time("sig + collect_set")(force(withSet))

    val keyed = withSet
      .select(col("id"), explode(H.lshBands(col("sig"), 16, 4)).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.bucket").as("bucket"))
    time("banding")(force(keyed))

    val cand = keyed.as("a").join(keyed.as("b"), Seq("band", "bucket"))
      .where(col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    time("candidate join (recomputes prep 2x unless reused)")(force(cand))

    time("full minHashPairs")(graft.dedup.Dedup.minHashPairs(docs, "text", "doc_id", threshold = 0.5).count())
    time("full minHashPairs again")(graft.dedup.Dedup.minHashPairs(docs, "text", "doc_id", threshold = 0.5).count())
    spark.stop()
  }
}
