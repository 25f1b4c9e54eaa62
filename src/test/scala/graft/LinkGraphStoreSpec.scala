package graft

import graft.text.{LinkGraph, LinkGraphStore}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The persisted appendable link-graph artifact: build ≡ sharedSpanEdges,
  * append ≡ rebuild (deletions included — the df-band crossing case), the
  * id-discipline guards, and the surface hygiene (postings/dfs/manifest).
  */
class LinkGraphStoreSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def canonSet(df: DataFrame): Set[(Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("build: edges + support match sharedSpanEdges/Weighted on real docs") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val dir = tmp("lgs_build")
    LinkGraphStore.build(docs, "doc_id", "text", w = 5, maxDf = 32, dir, nBuckets = 8)
    val stored = canonSet(LinkGraphStore.loadEdgesCanonical(spark, dir))
    val expected = canonSet(
      LinkGraph.sharedSpanEdgesWeighted(docs, "doc_id", "text", w = 5, maxDf = 32)
        .where(col("src") < col("dst"))
        .select(col("src"), col("dst"), col("weight")))
    assert(stored == expected, s"stored ${stored.size} vs expected ${expected.size}")
    // symmetric load matches sharedSpanEdges exactly
    val sym = LinkGraphStore.loadEdges(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val symExp = LinkGraph.sharedSpanEdges(docs, "doc_id", "text", w = 5, maxDf = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sym == symExp)
    val m = LinkGraphStore.loadManifest(spark, dir)
    assert(m.w == 5 && m.maxDf == 32 && m.nBuckets == 8)
    assert(m.nDocs == docs.count() && m.nEdges == expected.size.toLong)
  }

  test("append == rebuild, including df-band edge retraction") {
    // w=2 spans are adjacent word pairs. maxDf=2 so the batch forces:
    //  - "x y": df 2 -> 3, crosses the band  -> edge (1,2) RETRACTED
    //  - "m n": df 1 -> 2, enters the band   -> edge (3,4) created
    //  - "p q": df 1 -> 2, enters the band   -> edge (1,5) created
    val base = Seq((1L, "x y p q"), (2L, "x y"), (3L, "m n")).toDF("doc_id", "text")
    val batch = Seq((4L, "x y m n"), (5L, "p q")).toDF("doc_id", "text")
    val dir = tmp("lgs_append")
    LinkGraphStore.build(base, "doc_id", "text", w = 2, maxDf = 2, dir, nBuckets = 2)
    assert(canonSet(LinkGraphStore.loadEdgesCanonical(spark, dir)) == Set((1L, 2L, 1L)))
    LinkGraphStore.append(batch, "doc_id", "text", dir, batchId = 7L)
    val after = canonSet(LinkGraphStore.loadEdgesCanonical(spark, dir))
    val rebuiltDir = tmp("lgs_rebuild")
    LinkGraphStore.build(base.unionAll(batch), "doc_id", "text", w = 2, maxDf = 2,
      rebuiltDir, nBuckets = 2)
    assert(after == canonSet(LinkGraphStore.loadEdgesCanonical(spark, rebuiltDir)))
    assert(after == Set((3L, 4L, 1L), (1L, 5L, 1L)), s"got $after")
    // surfaces: the blown span is purged from postings, dfs carries df=3
    val posts = spark.read.parquet(s"$dir/postings").select($"h", $"id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val postsRebuilt = spark.read.parquet(s"$rebuiltDir/postings").select($"h", $"id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(posts == postsRebuilt)
    val dfs = spark.read.parquet(s"$dir/dfs").select($"h", $"df")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val dfsRebuilt = spark.read.parquet(s"$rebuiltDir/dfs").select($"h", $"df")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(dfs == dfsRebuilt)
    val m = LinkGraphStore.loadManifest(spark, dir)
    assert(m.nDocs == 5 && m.nEdges == 2 && m.maxId == 5L && m.lastBatchId == 7L)
  }

  test("append retracting the last edge empties the bucket (stale files purged)") {
    // nBuckets=1: the single edge bucket must be DELETED when its rows
    // vanish — dynamic overwrite alone would leave the stale partition
    val base = Seq((1L, "x y"), (2L, "x y")).toDF("doc_id", "text")
    val dir = tmp("lgs_retract")
    LinkGraphStore.build(base, "doc_id", "text", w = 2, maxDf = 2, dir, nBuckets = 1)
    assert(LinkGraphStore.loadEdgesCanonical(spark, dir).count() == 1)
    LinkGraphStore.append(Seq((3L, "x y")).toDF("doc_id", "text"), "doc_id", "text", dir)
    assert(LinkGraphStore.loadEdgesCanonical(spark, dir).count() == 0)
    // and downstream operators run on the empty graph
    val comps = LinkGraph.connectedComponents(
      Seq(1L, 2L, 3L).toDF("doc_id"), "doc_id",
      LinkGraphStore.loadEdges(spark, dir))
    assert(comps.where($"component_size" === 1).count() == 3)
  }

  test("append == rebuild on a real-docs half/half split") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val half = docs.agg(max($"doc_id")).head().getLong(0) / 2
    val dir = tmp("lgs_half")
    LinkGraphStore.build(docs.where($"doc_id" <= half), "doc_id", "text",
      w = 5, maxDf = 32, dir, nBuckets = 8)
    LinkGraphStore.append(docs.where($"doc_id" > half), "doc_id", "text", dir)
    val after = canonSet(LinkGraphStore.loadEdgesCanonical(spark, dir))
    val expected = canonSet(
      LinkGraph.sharedSpanEdgesWeighted(docs, "doc_id", "text", w = 5, maxDf = 32)
        .where(col("src") < col("dst"))
        .select(col("src"), col("dst"), col("weight")))
    assert(after == expected, s"append ${after.size} vs rebuild ${expected.size}")
    assert(LinkGraphStore.loadManifest(spark, dir).nEdges == expected.size.toLong)
  }

  test("randomized multi-batch append == rebuild (property, fixed seeds)") {
    // the delta math's adversarial surface is df-band traffic: tiny word
    // pool + low maxDf so every batch moves many spans across both band
    // edges. 3 seeds x 3 sequential appends, edges compared exactly.
    for (seed <- Seq(7L, 42L, 1234L)) {
      val rnd = new scala.util.Random(seed)
      val pool = Vector("aa", "bb", "cc", "dd", "ee", "ff")
      def doc(): String =
        (0 until (2 + rnd.nextInt(6))).map(_ => pool(rnd.nextInt(pool.size))).mkString(" ")
      val all = (1L to 40L).map(i => (i, doc()))
      val dir = tmp(s"lgs_prop$seed")
      LinkGraphStore.build(all.take(10).toDF("doc_id", "text"), "doc_id", "text",
        w = 2, maxDf = 3, dir, nBuckets = 4)
      Seq(all.slice(10, 20), all.slice(20, 30), all.slice(30, 40)).foreach { b =>
        LinkGraphStore.append(b.toDF("doc_id", "text"), "doc_id", "text", dir)
      }
      val got = canonSet(LinkGraphStore.loadEdgesCanonical(spark, dir))
      val rb = tmp(s"lgs_prop_rb$seed")
      LinkGraphStore.build(all.toDF("doc_id", "text"), "doc_id", "text",
        w = 2, maxDf = 3, rb, nBuckets = 4)
      val want = canonSet(LinkGraphStore.loadEdgesCanonical(spark, rb))
      assert(got == want, s"seed $seed: ${got.size} vs ${want.size}")
      // and the band actually moved both ways somewhere in the run
      val dfs = spark.read.parquet(s"$dir/dfs").select($"df")
        .collect().map(_.getLong(0))
      assert(dfs.exists(_ > 3), s"seed $seed never blew a span past maxDf")
    }
  }

  test("id discipline: overlapping, duplicate, and empty batches") {
    val base = Seq((1L, "x y"), (2L, "x y")).toDF("doc_id", "text")
    val dir = tmp("lgs_guard")
    LinkGraphStore.build(base, "doc_id", "text", w = 2, maxDf = 4, dir, nBuckets = 2)
    val overlap = intercept[IllegalArgumentException] {
      LinkGraphStore.append(Seq((2L, "z z")).toDF("doc_id", "text"), "doc_id", "text", dir)
    }
    assert(overlap.getMessage.contains("must sort above"))
    val dup = intercept[IllegalArgumentException] {
      LinkGraphStore.append(Seq((3L, "a b"), (3L, "c d")).toDF("doc_id", "text"),
        "doc_id", "text", dir)
    }
    assert(dup.getMessage.contains("not unique"))
    // empty batch: artifact untouched, manifest unchanged
    val before = LinkGraphStore.loadManifest(spark, dir)
    LinkGraphStore.append(base.where($"doc_id" > 99), "doc_id", "text", dir)
    assert(LinkGraphStore.loadManifest(spark, dir) == before)
  }
}
