package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** Dev probe (optimization round 19): q_minhash_store breakdown — batch
  * signature pass vs store probe (posting read + candidate pruning +
  * exact verification).
  */
object MinhashProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val spark = GraftSession
      .builder(master = s"local[$cpus]", shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.dedup.{Dedup, MinHashStore}
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val d = java.nio.file.Files.createTempDirectory("graft_mhs_prof").toString
    MinHashStore.build(docs.where(pmod(col("doc_id"), lit(3)) === 0),
      "text", "doc_id", d, nBuckets = 16)
    def batch = docs.where(pmod(col("doc_id"), lit(3)) =!= 0)

    def time(tag: String)(f: => Unit): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      System.err.println(f"[mhprof] $tag%-12s min=${ts.min}%.3f s  all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    batch.count() // warm
    time("batchsigs") {
      Dedup.minHashSignatureTable(batch, "text", "doc_id", 3, 64)
        .write.format("noop").mode("overwrite").save()
    }
    time("incremental") { // the in-memory sibling (q_dedup_minhash core)
      Dedup.minHashIncremental(docs.where(pmod(col("doc_id"), lit(3)) === 0),
        batch, "text", "doc_id", threshold = 0.5).count()
    }
    time("store-probe") {
      MinHashStore.dedupBatch(spark, d, batch, "text", "doc_id", threshold = 0.5).count()
    }
    // stepwise replica of dedupBatch internals
    import graft.functions.{HashFunctions => H}
    time("steps") {
      val t0 = System.nanoTime()
      def lap(tag: String): Unit =
        System.err.println(f"[mhprof]   +$tag%-14s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      val m = MinHashStore.loadManifest(spark, d)
      lap("manifest")
      val rows = m.numHashes / m.bands
      val batchSigs = Dedup.minHashSignatureTable(batch, "text", "doc_id",
        m.shingleSize, m.numHashes).localCheckpoint(true)
      lap("batchsigs-pin")
      val bandKeys = batchSigs.where(size(col("shset")) > 0)
        .select(posexplode(H.bandHashes(col("sig"), m.bands, rows)).as(Seq("band", "bucket")))
        .distinct()
        .localCheckpoint(true)
      lap("bandkeys-pin")
      val tb = bandKeys
        .select(pmod(xxhash64(col("band"), col("bucket")), lit(m.nBuckets.toLong)).cast("int").as("b"))
        .distinct().collect().map(_.getInt(0)).sorted
      lap("tb-collect")
      val post = spark.read.parquet(s"$d/segs/seg=0/postings")
        .where(col("pb").isInCollection(tb))
      val candIds = post.join(bandKeys, Seq("band", "bucket"))
        .select(col("id")).distinct().localCheckpoint(true)
      lap("candids-pin")
      val sb = candIds
        .select(pmod(xxhash64(col("id")), lit(m.nBuckets.toLong)).cast("int").as("b"))
        .distinct().collect().map(_.getInt(0)).sorted
      lap("sb-collect")
      val candSigs = spark.read.parquet(s"$d/segs/seg=0/sigs")
        .where(col("pb").isInCollection(sb))
        .join(candIds, Seq("id"))
        .select(col("id"), col("sig"), col("shset"))
      val out = Dedup.minHashIncrementalSigs(candSigs, batchSigs, batch, "doc_id",
        m.numHashes, m.bands, 0.5)
      out.count()
      lap("verify-count")
    }
    spark.stop()
  }
}
