package graft

import graft.streaming.StreamingBm25
import graft.text.Bm25
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Continuous BM25 indexing: segment-per-batch state, merge-at-read
  * equivalence with a batch rebuild, idempotent replay.
  */
class StreamingBm25Spec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "zebra stripes pattern in the wild savanna"),
    (2L, "zebra crossing painted on the city street"),
    (3L, "market prices for grain and cattle today"),
    (4L, "stripes on fabric patterns for tailors"),
    (5L, "city traffic report with street closures")
  )

  test("streamed segments answer queries exactly like a batch rebuild; replay is idempotent") {
    val dir = java.nio.file.Files.createTempDirectory("sbm25").toString
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, String)]
    val q = StreamingBm25
      .writer(source.toDF.toDF("doc_id", "text"), "text", "doc_id", s"$dir/index")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    source.addData(docs.take(3): _*)
    q.processAllAvailable()
    source.addData(docs.drop(3): _*)
    q.processAllAvailable()
    q.stop()

    val queries = Seq((100L, "zebra stripes"), (101L, "city street")).toDF("doc_id", "text")
    val streamed = StreamingBm25.topK(spark, s"$dir/index", queries, "text", "doc_id", k = 3)
      .orderBy($"query_id", $"rank").collect().map(_.toSeq).toSeq
    val rebuilt = Bm25.topK(docs.toDF("doc_id", "text"), queries, "text", "doc_id", k = 3)
      .orderBy($"query_id", $"rank").collect().map(_.toSeq).toSeq
    assert(streamed == rebuilt, s"streamed $streamed\nrebuilt $rebuilt")
    assert(streamed.nonEmpty)

    // replay batch 1 (restart-from-checkpoint): overwrites its own
    // segment, the merged answer must not change
    StreamingBm25.applyBatch(docs.drop(3).toDF("doc_id", "text"), 1L, "text", "doc_id", s"$dir/index")
    val replayed = StreamingBm25.topK(spark, s"$dir/index", queries, "text", "doc_id", k = 3)
      .orderBy($"query_id", $"rank").collect().map(_.toSeq).toSeq
    assert(replayed == rebuilt, "replay changed the merged index")

    // state is the index artifact only — no document text stored
    val postCols = spark.read.parquet(s"$dir/index/postings/batch=0").columns.toSet
    assert(postCols == Set("doc_id", "term", "tf", "len"), s"state carries $postCols")

    // compaction: segments fold into the bucketed serving artifact —
    // persisted-path scores identical, and future ingest appends through
    // Bm25Store without the stream
    val storeDir = java.nio.file.Files.createTempDirectory("sbm25c").toString
    StreamingBm25.compactTo(spark, s"$dir/index", storeDir, nBuckets = 4)
    val served = graft.text.Bm25Store.scoreTopKPersisted(spark, storeDir, queries,
        "text", "doc_id", k = 3)
      .orderBy($"query_id", $"rank").collect().map(_.toSeq).toSeq
    assert(served == rebuilt, s"compacted artifact diverges: $served")
    val m = graft.text.Bm25Store.loadManifest(spark, storeDir)
    assert(m.nDocs == docs.length.toLong)
  }

  test("readIndex fails clearly before any batch commits") {
    val dir = java.nio.file.Files.createTempDirectory("sbm25e").toString
    val e = intercept[IllegalStateException] {
      StreamingBm25.readIndex(spark, s"$dir/index")
    }
    assert(e.getMessage.contains("no committed batches"))
  }
}
