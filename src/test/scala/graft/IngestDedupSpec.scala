package graft

import graft.streaming.IngestDedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** End-to-end continuous-ingest dedup: micro-batches with intra-batch,
  * cross-batch, and corpus-vs-batch duplicates; the corpus must end up
  * exactly-deduped with earliest ids winning, replays must be
  * idempotent, and uncommitted (crashed) batch directories invisible.
  */
class IngestDedupSpec extends SparkSpec {
  import spark.implicits._

  private val a = "first unique document with plenty of words in it"
  private val b = "second distinct document about completely different matters"
  private val c = "third novel text that matches nothing else at all"

  test("multi-batch streaming ingest dedups within and across batches") {
    val corpusDir = java.nio.file.Files.createTempDirectory("ingest_corpus").toString + "/t"
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, String)]
    val q = IngestDedup
      .writer(source.toDF.toDF("doc_id", "text"), "text", "doc_id", corpusDir)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ingest_ckpt").toString)
      .start()
    source.addData((0L, a), (1L, b), (2L, a)) // 2 dups of 0 within batch
    q.processAllAvailable()
    source.addData((3L, a), (4L, c)) // 3 dups corpus doc 0; 4 novel
    q.processAllAvailable()
    source.addData((5L, c)) // dup of batch-2 doc 4
    q.processAllAvailable()
    q.stop()

    val corpus = IngestDedup.readCorpus(spark, corpusDir).get
    val rows = corpus.select($"doc_id", $"text").as[(Long, String)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(0L, 1L, 4L), s"got ${rows.toSeq}")
    assert(rows.map(_._2).toSet == Set(a, b, c))
    // the fingerprint column IS the store — one per surviving doc
    assert(corpus.select($"__fp").distinct().count() == 3)
  }

  test("batch backfill through the same table sees streamed fingerprints") {
    val corpusDir = java.nio.file.Files.createTempDirectory("bf_corpus").toString + "/t"
    IngestDedup.ingestBatch(Seq((0L, a)).toDF("doc_id", "text"), "text", "doc_id", corpusDir, batchId = 0L)
    IngestDedup.ingestBatch(
      Seq((1L, a), (2L, b)).toDF("doc_id", "text"), "text", "doc_id", corpusDir, batchId = 1L)
    val ids = IngestDedup.readCorpus(spark, corpusDir).get
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(0L, 2L))
  }

  test("replaying a batch is idempotent; uncommitted batch dirs are invisible") {
    val corpusDir = java.nio.file.Files.createTempDirectory("replay_corpus").toString + "/t"
    val batch = Seq((0L, a), (1L, b)).toDF("doc_id", "text")
    IngestDedup.ingestBatch(batch, "text", "doc_id", corpusDir, batchId = 7L)
    IngestDedup.ingestBatch(batch, "text", "doc_id", corpusDir, batchId = 7L) // crash-replay
    val corpus = IngestDedup.readCorpus(spark, corpusDir).get
    assert(corpus.count() == 2, "replay duplicated the batch")
    // simulate a crashed batch: directory without _SUCCESS
    val dead = java.nio.file.Paths.get(corpusDir, "batch=99")
    java.nio.file.Files.createDirectories(dead)
    java.nio.file.Files.writeString(dead.resolve("junk.parquet"), "not parquet")
    assert(IngestDedup.readCorpus(spark, corpusDir).get.count() == 2, "uncommitted batch visible")
  }
}
