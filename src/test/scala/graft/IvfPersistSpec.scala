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

  test("append == full rebuild on the concatenated corpus; sidecar counts truthful; pruning intact") {
    val emb = vecs
    val base = emb.where($"vec_id" < 150)
    val extra = emb.where($"vec_id" >= 150)
    val dir = java.nio.file.Files.createTempDirectory("ivfapp").toString
    Similarity.saveIvfIndexAppendable(
      Similarity.ivfBuild(base, "embedding", "vec_id", nlist = 8),
      dir, "embedding", "vec_id", nlist = 8)
    Similarity.appendToIvfIndex(extra, "embedding", "vec_id", dir)

    // merged artifact row-for-row equals one build over everything
    val appended = Similarity.loadIvfIndex(spark, dir)
      .select($"vec_id", $"embedding".cast("array<double>"), $"cell")
      .orderBy($"vec_id").collect().toSeq
    val rebuilt = Similarity.ivfBuild(emb, "embedding", "vec_id", nlist = 8)
      .select($"vec_id", $"embedding".cast("array<double>"), $"cell")
      .orderBy($"vec_id").collect().toSeq
    assert(appended == rebuilt, "append must be bit-identical to a full rebuild")

    // sidecar: same centroid set as the build, counts = merged per-cell rows
    val side = Similarity.loadIvfCentroids(spark, dir)
    assert(side.count() == 8)
    assert(side.agg(sum($"n_rows")).head().getLong(0) == 200L, "manifest counts cover the merge")
    val perCell = Similarity.loadIvfIndex(spark, dir).groupBy($"cell").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    side.collect().foreach { r =>
      assert(r.getLong(2) == perCell.getOrElse(r.getLong(0), 0L),
        s"cell ${r.getLong(0)} sidecar=${r.getLong(2)} actual=${perCell.get(r.getLong(0))}")
    }

    // probes on the merged artifact still get dynamic partition pruning
    val plan = Similarity.ivfTopK(Similarity.loadIvfIndex(spark, dir),
        emb.where($"vec_id" < 3), "embedding", "vec_id", k = 5, nlist = 8, nprobe = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"), s"pruning lost after append:\n${plan.take(2000)}")

    // contract: ids at-or-below the centroid range are rejected up front
    val ex = intercept[IllegalArgumentException] {
      Similarity.appendToIvfIndex(emb.where($"vec_id" === 3), "embedding", "vec_id", dir)
    }
    assert(ex.getMessage.contains("sort above every centroid id"), ex.getMessage)
    // a plain (sidecar-less) index refuses append instead of corrupting
    val plainDir = java.nio.file.Files.createTempDirectory("ivfplain").toString
    Similarity.saveIvfIndex(Similarity.ivfBuild(base, "embedding", "vec_id", nlist = 8), plainDir)
    val ex2 = intercept[Exception] {
      Similarity.appendToIvfIndex(extra, "embedding", "vec_id", plainDir)
    }
    assert(ex2.getMessage.contains("_centroids") || ex2.getMessage.contains("PATH_NOT_FOUND")
      || ex2.getMessage.toLowerCase.contains("path does not exist"), ex2.getMessage)
  }

  test("rebalance splits hot cells, keeps the artifact truthful, stays probe-correct") {
    val emb = vecs
    val dir = java.nio.file.Files.createTempDirectory("ivfrebal").toString
    Similarity.saveIvfIndexAppendable(
      Similarity.ivfBuild(emb, "embedding", "vec_id", nlist = 4),
      dir, "embedding", "vec_id", nlist = 4)
    val before = Similarity.loadIvfCentroids(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val budget = 55L // mean is 50; at seed 5 at least one of 4 cells exceeds 55
    assert(before.values.exists(_ > budget), s"fixture not skewed: $before")
    val hotBefore = before.filter(_._2 > budget).keySet

    Similarity.rebalanceIvfIndex(spark, dir, "embedding", "vec_id", maxCellRows = budget)

    // sidecar grew by one centroid per hot cell; counts match the data;
    // every former hot cell is now split under (or at worst near) budget
    val side = Similarity.loadIvfCentroids(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(side.size == before.size + hotBefore.size, s"before=$before after=$side")
    val perCell = Similarity.loadIvfIndex(spark, dir).groupBy($"cell").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(side == perCell, s"sidecar=$side actual=$perCell")
    assert(side.values.sum == 200L, "rebalance must not add or drop rows")
    hotBefore.foreach { c =>
      assert(side(c) < before(c), s"hot cell $c did not shrink: ${before(c)} -> ${side(c)}")
    }
    // untouched cells keep their exact counts
    (before.keySet -- hotBefore).foreach { c => assert(side(c) == before(c), s"cold cell $c changed") }

    // probe correctness: with every cell probed, the sidecar-centroid
    // probe must equal brute force — the rebalance moved rows between
    // cells but may not lose or duplicate any
    val queries = emb.where($"vec_id" < 3)
    val full = Similarity.ivfTopKPersisted(spark, dir, queries, "embedding", "vec_id",
        k = 5, nprobe = side.size)
      .orderBy($"query_id", $"rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val brute = Similarity.bruteForceTopK(emb, queries, "embedding", "vec_id", k = 5)
      .orderBy($"query_id", $"rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(full == brute, s"probe=$full brute=$brute")

    // pruning survives the rewrite, and appends after a rebalance are
    // held to the REFRESHED contract (ids above the split centroids too)
    val plan = Similarity.ivfTopKPersisted(spark, dir, queries, "embedding", "vec_id",
        k = 5, nprobe = 2).queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"), s"pruning lost after rebalance:\n${plan.take(2000)}")
    val newMax = side.keys.max
    val ex = intercept[IllegalArgumentException] {
      Similarity.appendToIvfIndex(
        emb.where($"vec_id" === (newMax - 1)), "embedding", "vec_id", dir)
    }
    assert(ex.getMessage.contains("sort above every centroid id"), ex.getMessage)

    // a rebalance with nothing over budget is a byte-level no-op
    val filesBefore = new java.io.File(dir).listFiles().map(_.getName).toSet
    Similarity.rebalanceIvfIndex(spark, dir, "embedding", "vec_id", maxCellRows = 1000L)
    assert(Similarity.loadIvfCentroids(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap == side)
    assert(new java.io.File(dir).listFiles().map(_.getName).toSet == filesBefore)
  }

  test("rebalance fails fast when a split id would collide with an existing cell") {
    // a REFINED artifact's cells are ORDINALS 0..nlist-1 — the same number
    // space as member ids, so "the farthest member's own id becomes the
    // new cell id" can collide. Crafted so cell 0's farthest member IS
    // vec 0: the dynamic partition overwrite would smash cell 0 in place;
    // the require must fire BEFORE any write and leave the artifact whole
    val emb = (Seq(
      (0L, Array(1f, 0f)), // seed 0; ends up the farthest member of its own cell
      (1L, Array(0f, 1f)) // seed 1; a singleton cell
    ) ++ (2L until 10L).map(i => (i, Array(1f, 0.1f * (i - 1))))).toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("ivfcollide").toString
    Similarity.saveIvfIndexRefined(emb, dir, "embedding", "vec_id", nlist = 2, iters = 1)
    val before = Similarity.loadIvfCentroids(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(before.keySet == Set(0L, 1L) && before(0L) > 2L, s"fixture drifted: $before")

    val ex = intercept[IllegalArgumentException] {
      Similarity.rebalanceIvfIndex(spark, dir, "embedding", "vec_id", maxCellRows = 2L)
    }
    assert(ex.getMessage.contains("collide with existing cells"), ex.getMessage)
    // artifact untouched: sidecar and data exactly as built
    assert(Similarity.loadIvfCentroids(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap == before)
    assert(Similarity.loadIvfIndex(spark, dir).count() == 10L)
  }
}
