package graft

import graft.dedup.Dedup
import graft.streaming.StreamingRewrite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Continuous chunk-dedup rewrite: keep-first across micro-batches in
  * arrival order, hash-only state, idempotent replay, stream ≡ batch.
  */
class StreamingRewriteSpec extends SparkSpec {
  import spark.implicits._

  // w=2 chunks; doc text chosen so chunk boundaries are easy to read
  private val b0 = Seq(
    (1L, "a b c d"), // admits [a b][c d]
    (2L, "a b x y")  // [a b] drops in-batch, admits [x y]
  )
  private val b1 = Seq(
    (3L, "c d e f"), // [c d] drops cross-batch, admits [e f]
    (4L, "x y x y")  // [x y][x y]: both drop (state hit; the in-batch dup of a state hit must not resurrect)
  )

  test("stream rewrite equals batch rewrite on ordered arrival; replay is idempotent; state is hashes only") {
    val dir = java.nio.file.Files.createTempDirectory("srewrite").toString
    val (outDir, stateDir) = (s"$dir/out", s"$dir/state")
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, String)]
    val q = StreamingRewrite
      .writer(source.toDF.toDF("doc_id", "text"), "text", "doc_id", outDir, stateDir, w = 2)
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    source.addData(b0: _*)
    q.processAllAvailable()
    source.addData(b1: _*)
    q.processAllAvailable()
    q.stop()

    val streamed = StreamingRewrite.readRewritten(spark, outDir)
      .select($"id", $"clean_text", $"n_chunks", $"n_dropped")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    // batch-mode ground truth over the union (ids in arrival order, so
    // keep-first verdicts coincide)
    val all = (b0 ++ b1).toDF("doc_id", "text")
    val batch = Dedup.chunkDedupRewrite(all, "text", "doc_id", w = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(streamed == batch, s"stream $streamed != batch $batch")
    // spot-check the cross-batch drop and the state-hit in-batch dup
    val byId = streamed.map(t => t._1 -> t).toMap
    assert(byId(3L)._2 == "e f" && byId(3L)._4 == 1)
    assert(byId(4L)._2 == "" && byId(4L)._4 == 2)

    // state artifact carries chunk hashes only — never text
    assert(spark.read.parquet(s"$stateDir/batch=0").columns.toSeq == Seq("h"))
    // exactly one batch admits any given hash: state deltas are disjoint
    val h0 = spark.read.parquet(s"$stateDir/batch=0").as[Long].collect().toSet
    val h1 = spark.read.parquet(s"$stateDir/batch=1").as[Long].collect().toSet
    assert(h0.intersect(h1).isEmpty, "a hash was admitted twice")

    // replay of EITHER committed batch reproduces its first run exactly
    StreamingRewrite.applyBatch(b1.toDF("doc_id", "text"), 1L, "text", "doc_id", outDir, stateDir, w = 2)
    StreamingRewrite.applyBatch(b0.toDF("doc_id", "text"), 0L, "text", "doc_id", outDir, stateDir, w = 2)
    val replayed = StreamingRewrite.readRewritten(spark, outDir)
      .select($"id", $"clean_text", $"n_chunks", $"n_dropped")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(replayed == batch, s"replay changed the corpus: $replayed")
  }

  test("CDC stream: a later near-duplicate with a local edit drops all but the edited neighborhood") {
    val words = Array("alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
      "golf", "hotel", "india", "juliet", "kilo", "lima")
    val rnd = new scala.util.Random(11)
    val original = Seq.fill(300)(words(rnd.nextInt(words.length))).mkString(" ")
    val toks = original.split(" ")
    val edited = (toks.take(150) ++ Array("edited") ++ toks.drop(150)).mkString(" ")

    val dir = java.nio.file.Files.createTempDirectory("srewritecdc").toString
    val (outDir, stateDir) = (s"$dir/out", s"$dir/state")
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, String)]
    val q = StreamingRewrite
      .cdcWriter(source.toDF.toDF("doc_id", "text"), "text", "doc_id", outDir, stateDir)
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    source.addData((1L, original))
    q.processAllAvailable()
    source.addData((2L, edited))
    q.processAllAvailable()
    q.stop()

    val byId = StreamingRewrite.readRewritten(spark, outDir)
      .select($"id", $"clean_text", $"n_chunks", $"n_dropped")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(byId(1L)._1 == original && byId(1L)._3 == 0L, "first copy untouched")
    val (_, n2, d2) = byId(2L)
    assert(d2.toDouble / n2 > 0.6 && d2 < n2,
      s"cross-batch CDC must drop all but the edited neighborhood: dropped $d2 of $n2")

    // stream ≡ batch: cdcDedupRewrite over the ordered union gives the
    // same verdicts, and replay of batch 1 is idempotent
    val all = Seq((1L, original), (2L, edited)).toDF("doc_id", "text")
    val batchTruth = Dedup.cdcDedupRewrite(all, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(byId == batchTruth, s"stream $byId != batch $batchTruth")
    StreamingRewrite.applyCdcBatch(Seq((2L, edited)).toDF("doc_id", "text"),
      1L, "text", "doc_id", outDir, stateDir)
    val replayed = StreamingRewrite.readRewritten(spark, outDir)
      .select($"id", $"clean_text", $"n_chunks", $"n_dropped")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(replayed == batchTruth, s"replay changed the corpus: $replayed")
  }
}
