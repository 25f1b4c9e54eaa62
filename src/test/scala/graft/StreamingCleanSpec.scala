package graft

import graft.streaming.StreamingClean
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming blocklist-filter + PII-redaction: stateless per-batch
  * hygiene, idempotent replay, audit manifest after the data commit.
  */
class StreamingCleanSpec extends SparkSpec {
  import spark.implicits._

  private val terms = Seq("bad phrase", "spamword")

  private val b0 = Seq(
    (1L, "reach me at jo@corp.example.org or +1-555-0042"), // kept, 1 email + 1 phone
    (2L, "bad phrase here and bad phrase there"),           // 2 hits > 1 → dropped
    (3L, "server at 10.0.42.7 fine")                        // kept, 1 ip
  )
  private val b1 = Seq(
    (4L, "one bad phrase is tolerated"),                    // 1 hit <= 1 → kept
    (5L, "spamword spamword bad phrase")                    // 3 hits → dropped
  )

  test("stream clean: filter + redact per batch, audit counts, idempotent replay") {
    val dir = java.nio.file.Files.createTempDirectory("sclean").toString
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, String)]
    val q = StreamingClean
      .writer(source.toDF.toDF("doc_id", "text"), "text", "doc_id", terms,
        maxHits = 1, outDir = s"$dir/out")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    source.addData(b0: _*)
    q.processAllAvailable()
    source.addData(b1: _*)
    q.processAllAvailable()
    q.stop()

    val cleaned = StreamingClean.readClean(spark, s"$dir/out")
      .select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(cleaned.keySet == Set(1L, 3L, 4L))
    assert(cleaned(1L) == "reach me at [EMAIL] or [PHONE]")
    assert(cleaned(3L) == "server at [IP] fine")
    assert(cleaned(4L) == "one bad phrase is tolerated") // under threshold: kept un-dropped, nothing to redact

    val audit = StreamingClean.readAudit(spark, s"$dir/out")
      .orderBy($"batch_id").collect()
    assert(audit.length == 2)
    val a0 = audit(0)
    assert(a0.getAs[Long]("n_in") == 3 && a0.getAs[Long]("n_kept") == 2 &&
      a0.getAs[Long]("n_dropped") == 1)
    assert(a0.getAs[Long]("n_emails_redacted") == 1 &&
      a0.getAs[Long]("n_phones_redacted") == 1 && a0.getAs[Long]("n_ips_redacted") == 1)
    val a1 = audit(1)
    assert(a1.getAs[Long]("n_in") == 2 && a1.getAs[Long]("n_kept") == 1 &&
      a1.getAs[Long]("n_dropped") == 1)

    // replay of a committed batch reproduces it exactly (stateless ⇒ trivially idempotent)
    StreamingClean.applyBatch(b0.toDF("doc_id", "text"), 0L, "text", "doc_id",
      terms, maxHits = 1, outDir = s"$dir/out")
    val replayed = StreamingClean.readClean(spark, s"$dir/out")
      .select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(replayed == cleaned)
  }
}
