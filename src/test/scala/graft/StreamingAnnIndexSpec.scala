package graft

import graft.similarity.Similarity
import graft.streaming.StreamingAnnIndex
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Continuous IVF maintenance: streamed vector batches assigned against
  * the persisted centroid sidecar, per-batch exactly-once layout,
  * probe-pruning intact, batch-proportional certification counts — the
  * streaming twin of appendToIvfIndex.
  */
class StreamingAnnIndexSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(from: Long, until: Long) = {
    val rnd = new scala.util.Random(9)
    // skip deterministically so every id gets the same vector regardless
    // of the (from, until) slice
    (0L until until).map { i =>
      (i, Array.fill(8)(rnd.nextFloat() * 2 - 1))
    }.filter(_._1 >= from).toDF("vec_id", "embedding")
  }

  test("streamed appends == full rebuild; replay idempotent; pruning and counts intact") {
    val all = vecs(0, 200)
    val dir = java.nio.file.Files.createTempDirectory("annstream").toString
    val (ixDir, stDir) = (s"$dir/index", s"$dir/stats")
    StreamingAnnIndex.initialize(vecs(0, 150), "embedding", "vec_id", nlist = 8, ixDir)

    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, Array[Float])]
    val q = StreamingAnnIndex
      .writer(source.toDF.toDF("vec_id", "embedding"), "embedding", "vec_id", ixDir, stDir)
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    val batch0 = vecs(150, 175).as[(Long, Array[Float])].collect().toSeq
    val batch1 = vecs(175, 200).as[(Long, Array[Float])].collect().toSeq
    source.addData(batch0: _*)
    q.processAllAvailable()
    source.addData(batch1: _*)
    q.processAllAvailable()
    q.stop()

    // merged index row-for-row equals one build over everything
    val streamed = StreamingAnnIndex.readIndex(spark, ixDir)
      .select($"vec_id", $"embedding".cast("array<double>"), $"cell")
      .orderBy($"vec_id").collect().toSeq
    val rebuilt = Similarity.ivfBuild(all, "embedding", "vec_id", nlist = 8)
      .select($"vec_id", $"embedding".cast("array<double>"), $"cell")
      .orderBy($"vec_id").collect().toSeq
    assert(streamed == rebuilt, "streamed appends must equal a full rebuild")

    // probes over the streamed artifact: identical verdicts + pruning
    val loaded = StreamingAnnIndex.readIndex(spark, ixDir)
    val queries = all.where($"vec_id" < 3)
    def run(ix: org.apache.spark.sql.DataFrame) =
      Similarity.ivfTopK(ix, queries, "embedding", "vec_id", k = 5, nlist = 8, nprobe = 2)
        .orderBy($"query_id", $"rank")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(run(loaded) == run(Similarity.ivfBuild(all, "embedding", "vec_id", nlist = 8)))
    val plan = Similarity.ivfTopK(loaded, queries, "embedding", "vec_id", k = 5, nlist = 8, nprobe = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"), s"pruning lost in the batch layout:\n${plan.take(1500)}")

    // replay of a committed batch overwrites its own directory bit-for-bit
    StreamingAnnIndex.applyBatch(batch1.toDF("vec_id", "embedding"), 1L,
      "embedding", "vec_id", ixDir, stDir)
    val replayed = StreamingAnnIndex.readIndex(spark, ixDir)
      .select($"vec_id", $"embedding".cast("array<double>"), $"cell")
      .orderBy($"vec_id").collect().toSeq
    assert(replayed == rebuilt, "replay must not duplicate rows")

    // certification counts: base sidecar + batch manifests == the data
    val counted = StreamingAnnIndex.cellCounts(spark, ixDir, stDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val actual = StreamingAnnIndex.readIndex(spark, ixDir).groupBy($"cell").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counted == actual, s"counts $counted != data $actual")

    // contract: ids at-or-below the centroid range are rejected
    val ex = intercept[IllegalArgumentException] {
      StreamingAnnIndex.applyBatch(vecs(0, 3).toDF("vec_id", "embedding"), 9L,
        "embedding", "vec_id", ixDir, stDir)
    }
    assert(ex.getMessage.contains("sort above every centroid id"), ex.getMessage)
  }

  test("compact folds batches into a one-file-per-cell base; counts truthful; crash-safe both ways") {
    val dir = java.nio.file.Files.createTempDirectory("anncompact").toString
    val (ixDir, stDir) = (s"$dir/index", s"$dir/stats")
    StreamingAnnIndex.initialize(vecs(0, 150), "embedding", "vec_id", nlist = 8, ixDir)
    StreamingAnnIndex.applyBatch(vecs(150, 175).toDF("vec_id", "embedding"), 0L,
      "embedding", "vec_id", ixDir, stDir)
    StreamingAnnIndex.applyBatch(vecs(175, 200).toDF("vec_id", "embedding"), 1L,
      "embedding", "vec_id", ixDir, stDir)

    def rows() = StreamingAnnIndex.readIndex(spark, ixDir)
      .select($"vec_id", $"embedding".cast("array<double>"), $"cell")
      .orderBy($"vec_id").collect().toSeq
    def batchDirs() = new java.io.File(ixDir).listFiles()
      .map(_.getName).filter(_.startsWith("batch=")).toSet
    def dataCounts() = StreamingAnnIndex.readIndex(spark, ixDir).groupBy($"cell").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val before = rows()
    assert(batchDirs() == Set("batch=0", "batch=1", "batch=2"))

    // an UNMARKED staging leftover (crash mid-write) is discarded, then
    // the fold proceeds normally
    val staging = new java.io.File(s"$ixDir/_compact")
    staging.mkdirs()
    new java.io.File(staging, "junk").createNewFile()
    StreamingAnnIndex.compact(spark, ixDir, stDir, upToBatch = 2L)

    assert(rows() == before, "compaction must not change the data")
    assert(batchDirs() == Set("batch=0"), s"folded dirs remain: ${batchDirs()}")
    new java.io.File(s"$ixDir/batch=0").listFiles()
      .filter(_.getName.startsWith("cell=")).foreach { cd =>
        val n = cd.listFiles().count(_.getName.endsWith(".parquet"))
        assert(n == 1, s"${cd.getName}: $n files, want 1")
      }
    val counted = StreamingAnnIndex.cellCounts(spark, ixDir, stDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counted == dataCounts(), s"counts $counted != data ${dataCounts()}")

    // probes unchanged, pruning intact
    val all = vecs(0, 200)
    val queries = all.where($"vec_id" < 3)
    def run(ix: org.apache.spark.sql.DataFrame) =
      Similarity.ivfTopK(ix, queries, "embedding", "vec_id", k = 5, nlist = 8, nprobe = 2)
        .orderBy($"query_id", $"rank")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(run(StreamingAnnIndex.readIndex(spark, ixDir)) ==
      run(Similarity.ivfBuild(all, "embedding", "vec_id", nlist = 8)))

    // a compact with nothing to fold is a no-op
    StreamingAnnIndex.compact(spark, ixDir, stDir, upToBatch = 2L)
    assert(rows() == before && batchDirs() == Set("batch=0"))

    // roll-forward: stage a fold exactly as compact would (data, then the
    // certifying marker), "crash" before the finish — the next compact
    // call must complete it, not restart it
    StreamingAnnIndex.applyBatch(vecs(200, 225).toDF("vec_id", "embedding"), 2L,
      "embedding", "vec_id", ixDir, stDir)
    val after = rows()
    StreamingAnnIndex.readIndex(spark, ixDir).where($"batch" <= 3).drop("batch")
      .repartition(8, $"cell")
      .write.mode("overwrite").partitionBy("cell").parquet(s"$ixDir/_compact")
    new java.io.File(staging, "_UPTO=3").createNewFile()
    StreamingAnnIndex.compact(spark, ixDir, stDir, upToBatch = 3L)
    assert(rows() == after, "roll-forward lost or duplicated rows")
    assert(batchDirs() == Set("batch=0"))
    val counted2 = StreamingAnnIndex.cellCounts(spark, ixDir, stDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counted2 == dataCounts(), s"counts $counted2 != data ${dataCounts()}")
    assert(counted2.values.sum == 225L)
  }
}
