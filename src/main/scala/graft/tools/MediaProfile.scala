package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** Dev probe (optimization round 19): q_media_dedup_store breakdown —
  * how much of the lane is batch fingerprinting (synthetic AVI payload
  * generation + frame decode + aHash, all per-row compute) vs the store
  * probe (posting read + banded-Hamming rule). Evidence for the
  * "name the bottleneck" verdict task.
  */
object MediaProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val spark = GraftSession
      .builder(master = s"local[$cpus]", shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.multimodal.{Multimodal, MediaFingerprintStore}
    val avi = udf((id: Long) => Multimodal.syntheticAvi(id))
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val d = java.nio.file.Files.createTempDirectory("graft_mfps_prof").toString
    MediaFingerprintStore.build(
      docs.where(pmod(col("doc_id"), lit(2)) === 0)
        .select(col("doc_id"), avi(col("doc_id")).as("payload")),
      "payload", "doc_id", d, n = 3, bands = 8, nBuckets = 16)
    def batch = docs.where(pmod(col("doc_id"), lit(2)) === 1)
      .select(col("doc_id"), avi(col("doc_id")).as("payload"))

    def time(tag: String)(f: => Unit): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      System.err.println(f"[mediaprof] $tag%-12s min=${ts.min}%.3f s  all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    // warm
    batch.count()
    time("payload") { batch.write.format("noop").mode("overwrite").save() }
    time("fingerprint") {
      Multimodal.videoFrameHashes(batch, "doc_id", "payload", 3)
        .write.format("noop").mode("overwrite").save()
    }
    time("full") {
      MediaFingerprintStore.dedupBatch(spark, d, batch, "payload", "doc_id",
        maxHamming = 6, minMatches = 2).count()
    }
    // sub-pieces: candidate row volumes + where the shuffle goes
    import graft.functions.{HashFunctions => H}
    val m = 3
    val bands = 8
    val batchFps = Multimodal.videoFrameHashes(batch, "doc_id", "payload", m)
      .select(col("doc_id").cast("long").as("id"), col("sample_idx").as("slot"),
        col("frame_hash").as("fp"))
      .localCheckpoint(true)
    val keyedB = batchFps
      .select(col("id"), col("slot"), col("fp"), explode(H.simHashBands(col("fp"), bands)).as("bk"))
      .select(col("id"), col("slot"), col("fp"), col("bk.band").as("band"), col("bk.bucket").as("bucket"))
      .localCheckpoint(true)
    System.err.println(s"[mediaprof] batchFps rows=${batchFps.count()} keyedB rows=${keyedB.count()}")
    val candBB = keyedB.as("a").join(keyedB.as("b"), Seq("slot", "band", "bucket"))
      .where(col("a.id") < col("b.id"))
      .select(col("b.id").as("id_b"), col("a.id").as("id_other"), col("slot"),
        col("b.fp").as("fp_b"), col("a.fp").as("fp_o"))
    time("candBB") { candBB.write.format("noop").mode("overwrite").save() }
    System.err.println(s"[mediaprof] candBB rows=${candBB.count()}")
    time("losersBB-distinct-first") {
      candBB.distinct()
        .where(H.hamming64(col("fp_b"), col("fp_o")) <= 6)
        .groupBy(col("id_b"), col("id_other")).agg(count(lit(1)).as("m"))
        .where(col("m") >= 2).select(col("id_b"))
        .write.format("noop").mode("overwrite").save()
    }
    // identical-fingerprint-vector group structure: how degenerate is the
    // LSH on this data? (vecs = slot-ordered fp vector per id)
    val vecs = batchFps.groupBy(col("id"))
      .agg(sort_array(collect_list(struct(col("slot"), col("fp")))).as("v"))
      .select(col("id"), xxhash64(to_json(col("v"))).as("vk"))
    val g = vecs.groupBy(col("vk")).agg(count(lit(1)).as("n"))
    val top = g.orderBy(col("n").desc).limit(5).collect().map(_.getLong(1)).mkString(",")
    System.err.println(s"[mediaprof] ids=${vecs.count()} distinct fp-vectors=${g.count()} top-group sizes=$top")
    time("losersBB-filter-first") {
      candBB.where(H.hamming64(col("fp_b"), col("fp_o")) <= 6)
        .distinct()
        .groupBy(col("id_b"), col("id_other")).agg(count(lit(1)).as("m"))
        .where(col("m") >= 2).select(col("id_b"))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
