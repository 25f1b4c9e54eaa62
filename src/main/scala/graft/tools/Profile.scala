package graft.tools

import graft.dedup.Dedup
import graft.functions.{HashFunctions => H, TextFunctions => T}
import graft.GraftSession
import org.apache.spark.sql.functions._

/** Ad-hoc profiling entry point (dev tool, not part of the driver
  * contract): times individual stages of the text-dedup pipeline to locate
  * interpreted-expression hotspots.
  */
object Profile {
  def time[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    System.err.println(f"[profile] $name: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.orElse(sys.env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse(sys.error("usage: Profile <sf-dir> (or set SPARK_GRAFT_SF_DIR)"))
    val spark = GraftSession.builder("local[16]", 16).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    time("count")(docs.count())
    time("normalize")(docs.select(T.normalizeText(col("text"))).count())
    time("tokenize")(docs.select(T.tokenize(col("text"))).count())
    time("fingerprint")(docs.select(T.fingerprint(col("text"))).count())
    time("fingerprint2")(docs.select(T.fingerprint(col("text"))).count())
    time("exact_dedup")(Dedup.exact(docs, "text", "doc_id").count())
    time("shingles")(docs.select(T.shingles(col("text"), 3).as("sh")).count())
    val sh = docs.select(col("doc_id"), T.shingles(col("text"), 3).as("sh"))
    time("minhash_hof_k16")(sh.select(H.minHashSignature(col("sh"), 16)).count())
    time("minhash_hof_k64")(sh.select(H.minHashSignature(col("sh"), 64)).count())
    time("minhash_pairs")(Dedup.minHashPairs(docs, "text", "doc_id", threshold = 0.5).count())
    time("minhash_pairs2")(Dedup.minHashPairs(docs, "text", "doc_id", threshold = 0.5).count())
    // diagnose candidate blowup: raw band-bucket candidate pair count
    time("minhash_candidates") {
      import graft.functions.{TextFunctions => TF, HashFunctions => HF}
      val shingled = docs
        .select(col("doc_id").as("id"), explode(TF.shingles(col("text"), 3)).as("sh"))
        .select(col("id"), xxhash64(col("sh")).as("h"))
      val prepared = shingled.groupBy(col("id"))
        .agg(graft.functions.MinHashAggregator.signature(col("h"), 64).as("sig"))
      val keyed = prepared
        .select(col("id"), explode(HF.lshBands(col("sig"), 16, 4)).as("bk"))
        .select(col("id"), col("bk.band").as("band"), col("bk.bucket").as("bucket"))
      val n = keyed.as("a").join(keyed.as("b"), Seq("band", "bucket"))
        .where(col("a.id") < col("b.id")).count()
      System.err.println(s"[profile]   raw candidate pairs (with band dups): $n")
    }
    time("simhash")(docs.select(H.simHash64(T.tokenize(col("text")))).count())
    time("simhash_agg")(Dedup.simHashFingerprints(docs, "text", "doc_id").count())
    time("simhash_pairs")(Dedup.simHashPairs(docs, "text", "doc_id", maxHamming = 3).count())
    time("ngram_pairs")(Dedup.ngramJaccardPairs(docs, "text", "doc_id", threshold = 0.4).count())
    time("minhash_dedup_e2e")(Dedup.minHashDedup(docs, "text", "doc_id", threshold = 0.5).count())
    time("langid")(docs.select(T.langId(col("text"))).count())
    time("quality")(docs.select(T.qualityScore(col("text"))).count())
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    time("emb_pairs")(Dedup.embeddingPairs(emb, "embedding", "vec_id", threshold = 0.9).count())
    time("ann_brute")(graft.similarity.Similarity
      .bruteForceTopK(emb, emb.where(col("vec_id") < 5), "embedding", "vec_id", 5).count())
    time("ann_ivf")({
      val idx = graft.similarity.Similarity.ivfBuild(emb, "embedding", "vec_id", 16)
      graft.similarity.Similarity.ivfTopK(idx, emb.where(col("vec_id") < 5), "embedding", "vec_id", 5, 16, 4).count()
    })
    time("exact_dedup2")(Dedup.exact(docs, "text", "doc_id").count())
    spark.stop()
  }
}
