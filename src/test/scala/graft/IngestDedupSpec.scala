package graft

import graft.streaming.IngestDedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** End-to-end continuous-ingest dedup: micro-batches with intra-batch,
  * cross-batch, and corpus-vs-batch duplicates; the corpus must end up
  * exactly-deduped with earliest ids winning, and the fingerprint store
  * must track it.
  */
class IngestDedupSpec extends SparkSpec {
  import spark.implicits._

  private val a = "first unique document with plenty of words in it"
  private val b = "second distinct document about completely different matters"
  private val c = "third novel text that matches nothing else at all"

  test("multi-batch streaming ingest dedups within and across batches") {
    val corpusDir = java.nio.file.Files.createTempDirectory("ingest_corpus").toString + "/t"
    val fpDir = java.nio.file.Files.createTempDirectory("ingest_fp").toString + "/t"
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, String)]
    val q = IngestDedup
      .writer(source.toDF.toDF("doc_id", "text"), "text", "doc_id", corpusDir, fpDir)
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

    val corpus = spark.read.parquet(corpusDir)
    val rows = corpus.select($"doc_id", $"text").as[(Long, String)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(0L, 1L, 4L), s"got ${rows.toSeq}")
    assert(rows.map(_._2).toSet == Set(a, b, c))
    assert(spark.read.parquet(fpDir).distinct().count() == 3)
  }

  test("batch backfill through the same artifact sees streamed fingerprints") {
    val corpusDir = java.nio.file.Files.createTempDirectory("bf_corpus").toString + "/t"
    val fpDir = java.nio.file.Files.createTempDirectory("bf_fp").toString + "/t"
    IngestDedup.ingestBatch(Seq((0L, a)).toDF("doc_id", "text"), "text", "doc_id", corpusDir, fpDir)
    IngestDedup.ingestBatch(
      Seq((1L, a), (2L, b)).toDF("doc_id", "text"), "text", "doc_id", corpusDir, fpDir)
    val ids = spark.read.parquet(corpusDir).select($"doc_id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(0L, 2L))
  }
}
