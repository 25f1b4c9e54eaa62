package graft.tools

import graft.GraftSession
import graft.functions.{TextFunctions => T}
import org.apache.spark.sql.functions._

/** Throwaway dev probe (not part of the library surface). */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    // brute-force exact-Jaccard pairs over STRING shingle sets
    def brute(shCol: org.apache.spark.sql.Column, th: Double) = {
      val sh = docs.select(col("doc_id").as("id"), array_distinct(shCol).as("s"))
        .where(size(col("s")) > 0)
      sh.as("a").join(sh.as("b"), col("a.id") < col("b.id"))
        .withColumn("inter", size(array_intersect(col("a.s"), col("b.s"))))
        .withColumn("uni", size(col("a.s")) + size(col("b.s")) - col("inter"))
        .withColumn("j", col("inter").cast("double") / col("uni"))
        .where(col("j") >= th)
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"), round(col("j"), 6).as("jaccard_sim"))
    }

    val bfMin = brute(T.shingles(col("text"), 3), 0.5)
    val lshMin = graft.dedup.Dedup.minHashPairs(docs, "text", "doc_id", threshold = 0.5)
    println(s"minhash brute=${bfMin.count()} lsh=${lshMin.count()} " +
      s"diff=${bfMin.exceptAll(lshMin).count()}/${lshMin.exceptAll(bfMin).count()}")

    val bfNg = brute(T.charShingles(col("text"), 5), 0.4)
    val lshNg = graft.dedup.Dedup.ngramJaccardPairs(docs, "text", "doc_id", threshold = 0.4)
    println(s"ngram brute=${bfNg.count()} lsh=${lshNg.count()} " +
      s"diff=${bfNg.exceptAll(lshNg).count()}/${lshNg.exceptAll(bfNg).count()}")
    spark.stop()
  }
}
