package graft

import graft.similarity.Similarity
import org.apache.spark.sql.functions._

/** The IVF index as an on-disk artifact: save partitioned by cell, load,
  * probe — verdicts identical to the in-memory index, and the probe's
  * scan is dynamically pruned to the probed cells' partitions.
  */
class IvfPersistSpec extends SparkSpec {
  import spark.implicits._

  private def vecs: org.apache.spark.sql.DataFrame = {
    val rnd = new scala.util.Random(5)
    (0L until 200L).map { i =>
      (i, Array.fill(8)(rnd.nextFloat() * 2 - 1))
    }.toDF("vec_id", "embedding")
  }

  test("persisted probe == in-memory probe; partition layout on disk; pruning in the plan") {
    val emb = vecs
    val indexed = Similarity.ivfBuild(emb, "embedding", "vec_id", nlist = 8).localCheckpoint(true)
    val dir = java.nio.file.Files.createTempDirectory("ivfidx").toString
    Similarity.saveIvfIndex(indexed, dir)

    // one directory per cell on disk
    val cellDirs = new java.io.File(dir).listFiles().filter(_.getName.startsWith("cell=")).map(_.getName)
    assert(cellDirs.length == 8, s"expected 8 cell partitions, got ${cellDirs.toSeq}")

    val loaded = Similarity.loadIvfIndex(spark, dir)
    val queries = emb.where($"vec_id" < 3)
    def run(ix: org.apache.spark.sql.DataFrame) =
      Similarity.ivfTopK(ix, queries, "embedding", "vec_id", k = 5, nlist = 8, nprobe = 2)
        .orderBy($"query_id", $"rank")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSeq
    val fromDisk = run(loaded)
    val fromMem = run(indexed)
    assert(fromDisk == fromMem, s"disk=$fromDisk mem=$fromMem")

    // the probed-cells broadcast join must turn into a dynamic partition
    // pruning subquery on the parquet scan (read ~nprobe/nlist, not all)
    val plan = Similarity.ivfTopK(loaded, queries, "embedding", "vec_id", k = 5, nlist = 8, nprobe = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"expected a dynamicpruning subquery on the partitioned scan; plan:\n${plan.take(2000)}")
  }
}
