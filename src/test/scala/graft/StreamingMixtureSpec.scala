package graft

import graft.streaming.StreamingMixture
import graft.text.Mixture
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Epoch-frozen streaming mixture: arrival-order independence,
  * stream ≡ batch equivalence, idempotent replay, refreeze ≡ rebuild.
  */
class StreamingMixtureSpec extends SparkSpec {
  import spark.implicits._

  // 3 sources with very different token masses so √p flattening bites
  private def doc(id: Long, src: String, words: Int) =
    (id, src, Seq.tabulate(words)(i => s"w$i").mkString(" "))

  private val all =
    (1L to 40L).map(i => doc(i, "big", 40)) ++
      (41L to 50L).map(i => doc(i, "mid", 20)) ++
      (51L to 53L).map(i => doc(i, "small", 10))

  test("frozen rates: stream output equals batch applyRates over the union; replay idempotent") {
    val dir = java.nio.file.Files.createTempDirectory("smix").toString
    val (ratesDir, keptDir, statsDir) = (s"$dir/rates", s"$dir/kept", s"$dir/stats")
    val allDf = all.toDF("doc_id", "source", "text")

    // epoch artifact: rates frozen from the full snapshot
    val rates = Mixture.sourceRates(allDf, "text", "source", budgetFraction = 0.5)
    StreamingMixture.freezeRates(spark, rates, ratesDir)
    assert(StreamingMixture.readRates(spark, ratesDir) == rates, "freeze/read must round-trip")
    // flattening sanity: the small source keeps a higher fraction than the big one
    val byName = rates.map(r => r.source -> r.rate).toMap
    assert(byName("small") > byName("big"))

    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, String, String)]
    val q = StreamingMixture
      .writer(source.toDF.toDF("doc_id", "source", "text"),
        "text", "doc_id", "source", ratesDir, keptDir, statsDir)
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    // arrival order scrambled across 3 micro-batches — must not matter
    source.addData(all.drop(45): _*) // the tail first
    q.processAllAvailable()
    source.addData(all.slice(20, 45): _*)
    q.processAllAvailable()
    source.addData(all.take(20): _*)
    q.processAllAvailable()
    q.stop()

    val streamed = StreamingMixture.readKept(spark, keptDir)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    val batch = Mixture.applyRates(allDf, "doc_id", "source", rates)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(streamed == batch, s"stream $streamed != batch $batch")
    assert(streamed.nonEmpty && streamed.size < all.size, "filter must actually drop and keep")

    // replay of a committed batch overwrites its own output bit-for-bit
    StreamingMixture.applyBatch(all.slice(20, 45).toDF("doc_id", "source", "text"), 1L,
      "text", "doc_id", "source", ratesDir, keptDir, statsDir)
    val replayed = StreamingMixture.readKept(spark, keptDir)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(replayed == streamed, s"replay changed kept set: $replayed")

    // refreeze from accumulated stats ≡ one-shot recompute over all docs
    val refrozen = StreamingMixture.refreeze(spark, statsDir, budgetFraction = 0.5, ratesDir)
    assert(refrozen == rates, s"merged-stats rates $refrozen != rebuild $rates")
    assert(StreamingMixture.readRates(spark, ratesDir) == refrozen)
  }

  test("stats describe the full arriving batch, not just survivors") {
    val dir = java.nio.file.Files.createTempDirectory("smix2").toString
    val (ratesDir, keptDir, statsDir) = (s"$dir/rates", s"$dir/kept", s"$dir/stats")
    // rate 0 for the only source: everything is dropped, stats still count it
    StreamingMixture.freezeRates(spark,
      Seq(Mixture.SourceRate("big", 100L, 0.0)), ratesDir)
    StreamingMixture.applyBatch(
      Seq(doc(1L, "big", 7), doc(2L, "big", 5)).toDF("doc_id", "source", "text"),
      0L, "text", "doc_id", "source", ratesDir, keptDir, statsDir)
    assert(StreamingMixture.readKept(spark, keptDir).count() == 0)
    val stats = spark.read.parquet(s"$statsDir/batch=0")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(stats == Seq(("big", 12L)), s"got $stats")
  }
}
