package graft

import graft.text.{HyperBall, HyperBallStore, LinkGraph, LinkGraphStore}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The persisted HyperBall register artifact: stored readouts are
  * bit-identical to the in-memory propagation, extendTo ≡ a deeper
  * rebuild, a torn extend is invisible until its manifest commits, and
  * the guards hold.
  */
class HyperBallStoreSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("stored readouts == in-memory HyperBall, bit-identical") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val nodes = docs.select($"doc_id")
    val edges = LinkGraph.sharedSpanEdges(docs, "doc_id", "text", w = 5, maxDf = 32)
      .localCheckpoint(true) // same edge set for both paths
    try {
      val dir = tmp("hbs")
      HyperBallStore.build(nodes, "doc_id", edges, maxHops = 3, dir, nBuckets = 8)
      val m = HyperBallStore.loadManifest(spark, dir)
      assert(m.maxHops == 3 && m.nNodes == nodes.count() && m.m == HyperBall.M)
      assert(rows(HyperBallStore.neighborhoodEstimate(spark, dir, "doc_id")) ==
        rows(HyperBall.neighborhoodEstimate(nodes, "doc_id", edges, maxHops = 3)))
      assert(rows(HyperBallStore.neighborhoodFunction(spark, dir, "doc_id")) ==
        rows(HyperBall.neighborhoodFunction(nodes, "doc_id", edges, maxHops = 3)))
      assert(rows(HyperBallStore.distanceDistribution(spark, dir)) ==
        rows(HyperBall.distanceDistribution(nodes, "doc_id", edges, maxHops = 3)))
      // a shallower readout serves from the stored horizon without touching edges
      assert(rows(HyperBallStore.neighborhoodEstimate(spark, dir, "doc_id", hops = 1)) ==
        rows(HyperBall.neighborhoodEstimate(nodes, "doc_id", edges, maxHops = 1)))
      // point lookup: bucket-pruned single-doc probes equal the full
      // readout restricted to those ids (driver-side pmod replay exact)
      val probeIds = Seq(0L, 7L, 123L, 499L)
      val point = rows(HyperBallStore.neighborhoodEstimateFor(
        spark, dir, "doc_id", probeIds))
      val full = rows(HyperBallStore.neighborhoodEstimate(spark, dir, "doc_id")
        .where($"doc_id".isInCollection(probeIds)))
      assert(point == full && point.size == probeIds.size)
    } finally graft.Pins.release(edges)
  }

  test("extendTo == deeper rebuild; torn extend invisible; guards") {
    // small deterministic graph: a chain plus a triangle
    val edgePairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (1L, 3L))
    val edges = (edgePairs ++ edgePairs.map(p => (p._2, p._1)))
      .toDF("src", "dst")
    val nodes = (1L to 6L).toDF("id")
    val dir = tmp("hbs_ext")
    HyperBallStore.build(nodes, "id", edges, maxHops = 2, dir, nBuckets = 2)
    // torn extend: an uncommitted hop dir above the horizon is invisible
    new java.io.File(s"$dir/regs/hop=3/bucket=0").mkdirs()
    assert(HyperBallStore.loadManifest(spark, dir).maxHops == 2)
    assert(rows(HyperBallStore.neighborhoodEstimate(spark, dir, "id")).nonEmpty)
    // extend overwrites the torn attempt and commits
    HyperBallStore.extendTo(edges, dir, newMaxHops = 4)
    assert(HyperBallStore.loadManifest(spark, dir).maxHops == 4)
    val rb = tmp("hbs_rb")
    HyperBallStore.build(nodes, "id", edges, maxHops = 4, rb, nBuckets = 2)
    // registers bit-identical at every hop, not just the estimates
    (0 to 4).foreach { d =>
      val got = HyperBallStore.readHop(spark, dir, d)
        .select($"id", xxhash64($"reg")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = HyperBallStore.readHop(spark, rb, d)
        .select($"id", xxhash64($"reg")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == want, s"hop $d registers diverge")
    }
    assert(rows(HyperBallStore.neighborhoodFunction(spark, dir, "id")) ==
      rows(HyperBallStore.neighborhoodFunction(spark, rb, "id")))
    // guards: shallower extend rejected; missing artifact rejected
    val shallow = intercept[IllegalArgumentException] {
      HyperBallStore.extendTo(edges, dir, newMaxHops = 3)
    }
    assert(shallow.getMessage.contains("stored"))
    intercept[IllegalArgumentException] {
      HyperBallStore.loadManifest(spark, tmp("hbs_none"))
    }
  }

  test("randomized extendTo == deeper rebuild (property, fixed seeds)") {
    // random sparse digraphs with hubs and isolated nodes: the extend
    // composition must hold on any shape, not just the crafted chain
    for (seed <- Seq(3L, 77L)) {
      val rnd = new scala.util.Random(seed)
      val n = 60
      val pairs = (1 to 150).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(p => p._1 != p._2).distinct
      val edges = pairs.toDF("src", "dst")
      val nodes = (0L until n.toLong).toDF("id")
      val dir = tmp(s"hbs_prop$seed")
      HyperBallStore.build(nodes, "id", edges, maxHops = 1, dir, nBuckets = 4)
      HyperBallStore.extendTo(edges, dir, newMaxHops = 3)
      HyperBallStore.extendTo(edges, dir, newMaxHops = 4)
      val rb = tmp(s"hbs_prop_rb$seed")
      HyperBallStore.build(nodes, "id", edges, maxHops = 4, rb, nBuckets = 4)
      (0 to 4).foreach { d =>
        val got = HyperBallStore.readHop(spark, dir, d)
          .select($"id", xxhash64($"reg")).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val want = HyperBallStore.readHop(spark, rb, d)
          .select($"id", xxhash64($"reg")).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(got == want, s"seed $seed hop $d registers diverge")
      }
    }
  }

  test("staleness: registers built from a graph fail loud after it mutates") {
    val base = Seq((1L, "x y p q"), (2L, "x y"), (3L, "m n"), (4L, "p q"))
      .toDF("doc_id", "text")
    val gDir = tmp("hbs_src")
    LinkGraphStore.build(base, "doc_id", "text", w = 2, maxDf = 4, gDir, nBuckets = 2)
    val dir = tmp("hbs_stale")
    HyperBallStore.buildFromGraph(spark, base.select($"doc_id".as("id")), "id",
      gDir, maxHops = 2, dir, nBuckets = 2)
    // fresh: fingerprint recorded, checked readouts serve
    assert(!HyperBallStore.isStale(spark, dir, gDir))
    assert(HyperBallStore.loadManifest(spark, dir).source.exists(_.startsWith("linkgraph;")))
    assert(rows(HyperBallStore.neighborhoodEstimateChecked(spark, dir, gDir, "id")).nonEmpty)
    // a DELTA-route append (manifest untouched - the hard case: epoch,
    // nEdges, maxId all unchanged) must still flip the fingerprint
    val route = LinkGraphStore.appendAuto(
      Seq((5L, "x y m n")).toDF("doc_id", "text"), "doc_id", "text", gDir,
      smallBatchFraction = 0.9, maxLiveDeltas = 32)
    assert(route == "delta", s"expected the delta route, got $route")
    assert(HyperBallStore.isStale(spark, dir, gDir))
    val e1 = intercept[IllegalArgumentException] {
      HyperBallStore.neighborhoodEstimateChecked(spark, dir, gDir, "id")
    }
    assert(e1.getMessage.contains("STALE"))
    // extendTo over the mutated graph refused too (it would stamp a
    // fresh-looking horizon onto old-graph registers)
    intercept[IllegalArgumentException] {
      HyperBallStore.extendToFromGraph(spark, gDir, dir, newMaxHops = 3)
    }
    // a FOLD retires the deltas but advances the watermark: still stale
    LinkGraphStore.compactInPlace(spark, gDir)
    assert(HyperBallStore.isStale(spark, dir, gDir))
    // rebuild from the grown graph: fresh again, extend + checked serve work
    HyperBallStore.buildFromGraph(spark,
      (1L to 5L).toDF("id"), "id", gDir, maxHops = 2, dir, nBuckets = 2)
    assert(!HyperBallStore.isStale(spark, dir, gDir))
    HyperBallStore.extendToFromGraph(spark, gDir, dir, newMaxHops = 3)
    assert(HyperBallStore.loadManifest(spark, dir).maxHops == 3)
    assert(!HyperBallStore.isStale(spark, dir, gDir)) // extend kept the fingerprint
    assert(rows(HyperBallStore.distanceDistributionChecked(spark, dir, gDir)).nonEmpty)
    // a RAW extendTo cannot tie its edges to the graph: it must DROP the
    // certificate (a fresh-looking fingerprint over possibly mixed
    // registers would be the exact silent-staleness hole the feature
    // closes) - conservatively stale afterwards, unchecked readouts serve
    HyperBallStore.extendTo(LinkGraphStore.loadEdges(spark, gDir), dir, newMaxHops = 4)
    assert(HyperBallStore.loadManifest(spark, dir).source.isEmpty)
    assert(HyperBallStore.isStale(spark, dir, gDir))
    intercept[IllegalArgumentException] {
      HyperBallStore.neighborhoodEstimateChecked(spark, dir, gDir, "id")
    }
    // a raw-edge-frame store has no recorded source: conservatively stale
    // (freshness unverifiable), unchecked readouts still serve
    val rawDir = tmp("hbs_raw")
    HyperBallStore.build((1L to 3L).toDF("id"), "id",
      Seq((1L, 2L), (2L, 3L)).toDF("src", "dst"), maxHops = 1, rawDir, nBuckets = 2)
    assert(HyperBallStore.isStale(spark, rawDir, gDir))
    assert(rows(HyperBallStore.neighborhoodEstimate(spark, rawDir, "id")).nonEmpty)
  }

  test("stored distribution: DerivedStore chain serves live-identical and " +
      "flips stale on a graph delta append") {
    val base = Seq((1L, "x y p q"), (2L, "x y"), (3L, "m n"), (4L, "p q"))
      .toDF("doc_id", "text")
    val gDir = tmp("hbs_dd_g")
    LinkGraphStore.build(base, "doc_id", "text", w = 2, maxDf = 4, gDir, nBuckets = 2)
    val hbDir = tmp("hbs_dd_hb")
    HyperBallStore.buildFromGraph(spark, base.select($"doc_id".as("id")), "id",
      gDir, maxHops = 2, hbDir, nBuckets = 2)
    val dDir = tmp("hbs_dd_d")
    HyperBallStore.saveDistanceDistribution(spark, hbDir, gDir, dDir)
    // served table == the live readout from the registers, value-identical
    assert(rows(HyperBallStore.distanceDistributionStored(spark, dDir, hbDir, gDir)) ==
      rows(HyperBallStore.distanceDistribution(spark, hbDir)))
    assert(!HyperBallStore.distributionIsStale(spark, dDir, hbDir, gDir))
    // leg 1 flip: a DELTA append mutates the graph but touches NEITHER
    // the register store's manifest NOR the derived certificate — only
    // the chained check can see it
    val route = LinkGraphStore.appendAuto(
      Seq((5L, "x y m n")).toDF("doc_id", "text"), "doc_id", "text", gDir,
      smallBatchFraction = 0.9, maxLiveDeltas = 32)
    assert(route == "delta", s"expected the delta route, got $route")
    assert(HyperBallStore.distributionIsStale(spark, dDir, hbDir, gDir))
    val e = intercept[IllegalArgumentException] {
      HyperBallStore.distanceDistributionStored(spark, dDir, hbDir, gDir)
    }
    assert(e.getMessage.contains("STALE"))
    // saving a new derived table over stale registers must refuse too:
    // a fresh-looking certificate over old-graph numbers is the hole
    intercept[IllegalArgumentException] {
      HyperBallStore.saveDistanceDistribution(spark, hbDir, gDir, dDir)
    }
    // rebuild the registers from the grown graph: leg 1 fresh again but
    // leg 2 now stale (the derived table describes the OLD registers)
    HyperBallStore.buildFromGraph(spark, (1L to 5L).toDF("id"), "id",
      gDir, maxHops = 2, hbDir, nBuckets = 2)
    assert(HyperBallStore.distributionIsStale(spark, dDir, hbDir, gDir))
    intercept[IllegalArgumentException] {
      HyperBallStore.distanceDistributionStored(spark, dDir, hbDir, gDir)
    }
    // re-save: the whole chain is fresh and the served values match the
    // grown graph's live readout
    HyperBallStore.saveDistanceDistribution(spark, hbDir, gDir, dDir)
    assert(!HyperBallStore.distributionIsStale(spark, dDir, hbDir, gDir))
    assert(rows(HyperBallStore.distanceDistributionStored(spark, dDir, hbDir, gDir)) ==
      rows(HyperBallStore.distanceDistribution(spark, hbDir)))
  }
}
