package graft

import graft.streaming.StreamingDedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Continuous near-dedup: admitted-set semantics across micro-batches,
  * signature-only state, idempotent replay.
  */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog again and again in the bright morning sun today"
  private val variant1 = base.replace("lazy", "sleepy") // near-dup of base
  private val variant2 = base.replace("bright morning", "dark evening") // near-dup of base
  private val other =
    "completely different content about distributed query engines and columnar storage formats"
  private val third =
    "yet another unrelated document discussing streaming watermarks and stateful aggregation"

  test("stream admits first-seen docs, drops near-dups of admitted docs, replay is idempotent") {
    val dir = java.nio.file.Files.createTempDirectory("sdedup").toString
    val (survDir, sigDir) = (s"$dir/surv", s"$dir/sigs")
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, String)]
    val q = StreamingDedup
      .writer(source.toDF.toDF("doc_id", "text"), "text", "doc_id", survDir, sigDir, threshold = 0.5)
      .option("checkpointLocation", s"$dir/ckpt")
      .start()

    // batch 0: base + a distinct doc + a near-dup of base (higher id dies)
    source.addData((1L, base), (2L, other), (3L, variant1))
    q.processAllAvailable()
    // batch 1: near-dup of an ADMITTED doc (cross-batch drop) + a new doc
    source.addData((4L, variant2), (5L, third))
    q.processAllAvailable()
    q.stop()

    val survivors = StreamingDedup.readSurvivors(spark, survDir)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(survivors == Seq(1L, 2L, 5L),
      s"expected {1,2,5} (3 near-dups 1 in-batch, 4 near-dups 1 cross-batch), got $survivors")

    // state is signatures only — no document text in the stored artifact
    val sigCols = spark.read.parquet(s"$sigDir/batch=0").columns.toSet
    assert(sigCols == Set("id", "sig", "shset"), s"state carries $sigCols")

    // replay of a committed batch (restart-from-checkpoint shape):
    // overwrites its own output, does not duplicate or re-drop
    val batch1 = Seq((4L, variant2), (5L, third)).toDF("doc_id", "text")
    StreamingDedup.applyBatch(batch1, 1L, "text", "doc_id", survDir, sigDir, 0.5)
    val replayed = StreamingDedup.readSurvivors(spark, survDir)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(replayed == Seq(1L, 2L, 5L), s"replay changed survivors: $replayed")

    // compactTo: fold the per-batch signature dirs into the MinHashStore
    // serving artifact — store-served verdicts ≡ the streaming
    // incremental path, on a batch with one near-dup of an admitted doc
    // (6 dies against 1) and one novel doc (7 survives)
    val storeDir = s"$dir/mhstore"
    StreamingDedup.compactTo(spark, sigDir, storeDir)
    val m = graft.dedup.MinHashStore.loadManifest(spark, storeDir)
    assert(m.nDocs == 3L, s"store holds ${m.nDocs} docs, admitted 3")
    val nextBatch = Seq(
      (6L, base.replace("quick", "swift")),
      (7L, "entirely novel words about nothing previously admitted whatsoever")
    ).toDF("doc_id", "text")
    val stored = graft.dedup.MinHashStore
      .dedupBatch(spark, storeDir, nextBatch, "text", "doc_id", threshold = 0.5)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    StreamingDedup.applyBatch(nextBatch, 2L, "text", "doc_id", survDir, sigDir, 0.5)
    val streamed = spark.read.parquet(s"$survDir/batch=2")
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(stored == streamed && stored == Seq(7L),
      s"store-served $stored != streaming $streamed (expected {7})")
  }
}
