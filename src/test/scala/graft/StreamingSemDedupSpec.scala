package graft

import graft.dedup.SemDedup
import graft.streaming.StreamingSemDedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Continuous semantic near-dedup: admitted-set semantics across
  * micro-batches, vector-only state, idempotent replay.
  */
class StreamingSemDedupSpec extends SparkSpec {
  import spark.implicits._

  private val ex = Array(1.0f, 0.0f, 0.0f, 0.0f)
  private val ey = Array(0.0f, 1.0f, 0.0f, 0.0f)
  private val exNear = Array(0.99f, 0.01f, 0.0f, 0.0f)  // near-dup of ex
  private val exNear2 = Array(1.0f, 0.001f, 0.0f, 0.0f) // near-dup of ex
  private val eyNear = Array(0.0f, 0.98f, 0.02f, 0.0f)  // near-dup of ey
  private val ez = Array(0.0f, 0.0f, 1.0f, 0.0f)        // distinct

  test("stream admits first-seen vectors, drops semantic dups, replay is idempotent") {
    val dir = java.nio.file.Files.createTempDirectory("ssemdedup").toString
    val (survDir, stateDir) = (s"$dir/surv", s"$dir/state")
    // centroids frozen from a bounded sample — the index, not state
    val sample = Seq((0L, ex), (1L, ey)).toDF("vec_id", "embedding")
    val centroids = SemDedup.kmeansDeterministic(sample, "embedding", "vec_id", k = 2, iters = 0)

    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, Array[Float])]
    val q = StreamingSemDedup
      .writer(source.toDF.toDF("vec_id", "embedding"), "vec_id", "embedding",
        survDir, stateDir, centroids, tau = 0.95)
      .option("checkpointLocation", s"$dir/ckpt")
      .start()

    // batch 0: two anchors + an in-batch near-dup of ex (higher id dies)
    source.addData((1L, ex), (2L, ey), (3L, exNear))
    q.processAllAvailable()
    // batch 1: cross-batch near-dups of ADMITTED anchors + a new vector
    source.addData((4L, exNear2), (5L, eyNear), (6L, ez))
    q.processAllAvailable()
    q.stop()

    val survivors = StreamingSemDedup.readSurvivors(spark, survDir)
      .select($"vec_id").as[Long].collect().sorted.toSeq
    assert(survivors == Seq(1L, 2L, 6L),
      s"expected {1,2,6} (3 in-batch dup, 4+5 cross-batch dups), got $survivors")

    // state carries vectors + cluster only, no payload columns
    val stateCols = spark.read.parquet(s"$stateDir/batch=0").columns.toSet
    assert(stateCols == Set("id", "cluster", "vec"), s"state carries $stateCols")

    // replay of a committed batch overwrites its own output: same verdict
    val batch1 = Seq((4L, exNear2), (5L, eyNear), (6L, ez)).toDF("vec_id", "embedding")
    StreamingSemDedup.applyBatch(batch1, 1L, "vec_id", "embedding",
      survDir, stateDir, centroids, tau = 0.95)
    val replayed = StreamingSemDedup.readSurvivors(spark, survDir)
      .select($"vec_id").as[Long].collect().sorted.toSeq
    assert(replayed == Seq(1L, 2L, 6L), s"replay changed survivors: $replayed")
  }

  test("cluster bound: near-identical vectors in DIFFERENT clusters are not compared") {
    val dir = java.nio.file.Files.createTempDirectory("ssemdedup2").toString
    // the two seeds anchor their own clusters — a vector near BOTH seeds
    // assigns to one and never pairs with the other's twin
    val sample = Seq((0L, Array(1.0f, 0.0f)), (1L, Array(0.999f, 0.001f)))
      .toDF("vec_id", "embedding")
    val centroids = SemDedup.kmeansDeterministic(sample, "embedding", "vec_id", k = 2, iters = 0)
    val batch = Seq((10L, Array(1.0f, 0.0f)), (11L, Array(0.999f, 0.001f)))
      .toDF("vec_id", "embedding")
    StreamingSemDedup.applyBatch(batch, 0L, "vec_id", "embedding",
      s"$dir/surv", s"$dir/state", centroids, tau = 0.95)
    val surv = StreamingSemDedup.readSurvivors(spark, s"$dir/surv")
      .select($"vec_id").as[Long].collect().sorted.toSeq
    assert(surv == Seq(10L, 11L),
      s"cross-cluster near-dups must both survive (the SemDeDup trade-off): $surv")
  }
}
