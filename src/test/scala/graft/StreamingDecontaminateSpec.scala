package graft

import graft.dedup.Decontaminate
import graft.streaming.StreamingDecontaminate
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Continuous eval-set decontamination: static eval index, per-batch
  * Bloom gate + exact verification, idempotent replay, batch-mode parity
  * with Decontaminate.clean.
  */
class StreamingDecontaminateSpec extends SparkSpec {
  import spark.implicits._

  private val leaked =
    "what is the capital of france the capital of france is paris a city on the seine"
  private val clean1 =
    "spark engines shuffle data across partitions with hash exchanges and sort merge joins at scale"
  private val clean2 =
    "completely unrelated content about astronomy telescopes galaxies nebulae and the expansion of space"

  private def evalSet = Seq((100L, leaked)).toDF("doc_id", "text")

  test("stream drops contaminated docs across batches; replay is idempotent") {
    val dir = java.nio.file.Files.createTempDirectory("sdecon").toString
    val survDir = s"$dir/surv"
    val index = StreamingDecontaminate.buildIndex(evalSet, "text", w = 8)

    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, String)]
    val q = StreamingDecontaminate
      .writer(source.toDF.toDF("doc_id", "text"), "text", "doc_id", index, survDir)
      .option("checkpointLocation", s"$dir/ckpt")
      .start()

    // batch 0: one contaminated doc, one clean, one short (< w tokens)
    source.addData((0L, s"intro paragraph then $leaked and trailing words"), (1L, clean1), (3L, "tiny doc"))
    q.processAllAvailable()
    // batch 1: another leak (verbatim eval text) + a clean doc
    source.addData((4L, leaked), (5L, clean2))
    q.processAllAvailable()
    q.stop()

    val survivors = StreamingDecontaminate.readSurvivors(spark, survDir)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(survivors == Seq(1L, 3L, 5L),
      s"expected {1,3,5} (0 and 4 share eval spans), got $survivors")

    // replay of a committed batch overwrites its own output: same verdict
    val batch1 = Seq((4L, leaked), (5L, clean2)).toDF("doc_id", "text")
    StreamingDecontaminate.applyBatch(batch1, 1L, "text", "doc_id", index, survDir)
    val replayed = StreamingDecontaminate.readSurvivors(spark, survDir)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(replayed == Seq(1L, 3L, 5L), s"replay changed survivors: $replayed")
  }

  test("batch-mode parity: streamed survivors == Decontaminate.clean on the union") {
    val dir = java.nio.file.Files.createTempDirectory("sdecon2").toString
    val train = Seq(
      (0L, s"intro paragraph then $leaked and some trailing commentary"),
      (1L, clean1), (2L, clean2), (3L, "tiny doc")
    ).toDF("doc_id", "text")
    val index = StreamingDecontaminate.buildIndex(evalSet, "text", w = 8)
    // two batches that union to `train`
    StreamingDecontaminate.applyBatch(train.where($"doc_id" < 2), 0L, "text", "doc_id", index, s"$dir/surv")
    StreamingDecontaminate.applyBatch(train.where($"doc_id" >= 2), 1L, "text", "doc_id", index, s"$dir/surv")
    val streamed = StreamingDecontaminate.readSurvivors(spark, s"$dir/surv")
      .select($"doc_id").as[Long].collect().sorted.toSeq
    val batchMode = Decontaminate.clean(train, evalSet, "text", "doc_id", w = 8)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(streamed == batchMode, s"streamed=$streamed batch=$batchMode")
  }

  test("empty eval set → everything survives; survivor read before first commit fails clearly") {
    val dir = java.nio.file.Files.createTempDirectory("sdecon3").toString
    val emptyIndex = StreamingDecontaminate.buildIndex(evalSet.where($"doc_id" < 0), "text", w = 8)
    assert(emptyIndex.bloom == null)
    intercept[IllegalStateException] {
      StreamingDecontaminate.readSurvivors(spark, s"$dir/surv")
    }
    StreamingDecontaminate.applyBatch(
      Seq((0L, leaked)).toDF("doc_id", "text"), 0L, "text", "doc_id", emptyIndex, s"$dir/surv")
    val surv = StreamingDecontaminate.readSurvivors(spark, s"$dir/surv")
      .select($"doc_id").as[Long].collect().toSeq
    assert(surv == Seq(0L), "with no eval spans even a leaked text survives")
  }
}
