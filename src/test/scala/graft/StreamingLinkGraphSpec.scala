package graft

import graft.streaming.{StreamingComponents, StreamingLinkGraph}
import graft.text.{LinkGraph, LinkGraphStore}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming link-graph maintenance: the delta-log fold equals a full
  * batch rebuild (retractions included), replay of a committed batch is
  * a no-op, torn attempts recompute byte-identically, the positive-delta
  * feed keeps StreamingComponents labels ≡ batch rebuild, and compactTo
  * folds the log into a standalone artifact.
  */
class StreamingLinkGraphSpec extends SparkSpec {
  import spark.implicits._

  private def canonSet(df: DataFrame): Set[(Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("document stream: edges after N batches == batch rebuild, with retraction") {
    // w=2, maxDf=2 (the LinkGraphStoreSpec scenario, streamed): batch 1
    // retracts the (1,2) edge ("x y" crosses the band) and creates (3,4)
    // and (1,5)
    val base = Seq((1L, "x y p q"), (2L, "x y"), (3L, "m n"))
    val b1 = Seq((4L, "x y m n"), (5L, "p q"))
    val b2 = Seq((6L, "p q zz"), (7L, "aa bb"))  // "p q" df 2->3: retracts (1,5)
    val dir = java.nio.file.Files.createTempDirectory("slg").toString
    implicit val sqlCtx = spark.sqlContext
    StreamingLinkGraph.initialize(base.toDF("doc_id", "text"), "doc_id", "text",
      w = 2, maxDf = 2, dir, nBuckets = 2)
    val source = MemoryStream[(Long, String)]
    val q = StreamingLinkGraph
      .writer(source.toDF.toDF("doc_id", "text"), "doc_id", "text", dir)
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    source.addData(b1: _*)
    q.processAllAvailable()
    source.addData(b2: _*)
    q.processAllAvailable()
    q.stop()

    val got = canonSet(StreamingLinkGraph.readEdgesCanonical(spark, dir))
    // full rebuild over every document ever ingested
    val rebuiltDir = java.nio.file.Files.createTempDirectory("slg_rb").toString
    LinkGraphStore.build((base ++ b1 ++ b2).toDF("doc_id", "text"),
      "doc_id", "text", w = 2, maxDf = 2, rebuiltDir, nBuckets = 2)
    val want = canonSet(LinkGraphStore.loadEdgesCanonical(spark, rebuiltDir))
    assert(got == want, s"streamed edges diverge from rebuild:\n$got\nvs\n$want")
    // the retraction actually happened: (1,5) was created by b1, gone after b2
    assert(!got.exists(e => e._1 == 1L && e._2 == 5L))
    assert(StreamingLinkGraph.readMeta(spark, dir, 1L).nRetractions > 0)

    // replay of a COMMITTED batch is a no-op (marker short-circuit)
    StreamingLinkGraph.applyBatch(b2.toDF("doc_id", "text"), 1L, "doc_id", "text", dir)
    assert(canonSet(StreamingLinkGraph.readEdgesCanonical(spark, dir)) == got)

    // torn attempt: delete batch 1's marker (crash before commit) and
    // replay — the delta recomputes from the same inputs, byte-identical
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/deltas/batch=1/_done"), false)
    StreamingLinkGraph.applyBatch(b2.toDF("doc_id", "text"), 1L, "doc_id", "text", dir)
    assert(canonSet(StreamingLinkGraph.readEdgesCanonical(spark, dir)) == got)

    // compactTo: a standalone artifact with the same edges and manifest sums
    val outDir = java.nio.file.Files.createTempDirectory("slg_cmp").toString
    StreamingLinkGraph.compactTo(spark, dir, outDir)
    assert(canonSet(LinkGraphStore.loadEdgesCanonical(spark, outDir)) == got)
    val m = LinkGraphStore.loadManifest(spark, outDir)
    assert(m.nDocs == 7 && m.maxId == 7L && m.nEdges == got.size.toLong)
    // the compacted artifact's surfaces equal the rebuild's — future
    // LinkGraphStore.append calls see exactly rebuild state
    val cmpDfs = spark.read.parquet(s"$outDir/dfs").select($"h", $"df")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rbDfs = spark.read.parquet(s"$rebuiltDir/dfs").select($"h", $"df")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cmpDfs == rbDfs)
    val cmpPosts = spark.read.parquet(s"$outDir/postings").select($"h", $"id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rbPosts = spark.read.parquet(s"$rebuiltDir/postings").select($"h", $"id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cmpPosts == rbPosts)
  }

  test("positive-delta feed keeps StreamingComponents labels == batch rebuild") {
    // retraction-free parameters (maxDf high): labels fold incrementally
    val base = Seq((1L, "x y p q"), (2L, "x y"), (3L, "m n"))
    val b1 = Seq((4L, "x y m n"), (5L, "p q"))
    val b2 = Seq((6L, "p q zz"), (7L, "aa bb"))
    val dir = java.nio.file.Files.createTempDirectory("slg_lbl").toString
    StreamingLinkGraph.initialize(base.toDF("doc_id", "text"), "doc_id", "text",
      w = 2, maxDf = 100, dir, nBuckets = 2)
    val lblDir = s"$dir/labels"
    StreamingComponents.initializeFrom(
      LinkGraph.connectedComponents(Seq(1L, 2L, 3L).toDF("doc_id"), "doc_id",
        StreamingLinkGraph.readEdges(spark, dir)),
      "doc_id", lblDir)
    Seq((0L, b1), (1L, b2)).foreach { case (bid, docs) =>
      StreamingLinkGraph.applyBatch(docs.toDF("doc_id", "text"), bid, "doc_id", "text", dir)
      assert(StreamingLinkGraph.readMeta(spark, dir, bid).nRetractions == 0)
      StreamingComponents.applyBatch(
        StreamingLinkGraph.newEdges(spark, dir, bid), bid, "doc_id", lblDir)
    }
    val got = StreamingComponents.readLabels(spark, lblDir)
      .orderBy($"doc_id").collect().map(_.toSeq).toSeq
    val want = LinkGraph.connectedComponents(
        (1L to 7L).toDF("doc_id"), "doc_id",
        LinkGraph.sharedSpanEdges((base ++ b1 ++ b2).toDF("doc_id", "text"),
          "doc_id", "text", w = 2, maxDf = 100))
      .orderBy($"doc_id").collect().map(_.toSeq).toSeq
    assert(got == want, s"labels diverge:\n$got\nvs\n$want")
  }

  test("guards: empty batch, non-monotone ids, missing base") {
    val dir = java.nio.file.Files.createTempDirectory("slg_g").toString
    intercept[IllegalArgumentException] {
      StreamingLinkGraph.applyBatch(Seq((1L, "a b")).toDF("doc_id", "text"),
        0L, "doc_id", "text", dir) // no base built
    }
    StreamingLinkGraph.initialize(Seq((5L, "a b")).toDF("doc_id", "text"),
      "doc_id", "text", w = 2, maxDf = 2, dir, nBuckets = 1)
    val low = intercept[IllegalArgumentException] {
      StreamingLinkGraph.applyBatch(Seq((3L, "c d")).toDF("doc_id", "text"),
        0L, "doc_id", "text", dir)
    }
    assert(low.getMessage.contains("must sort above"))
    // empty micro-batch: a NO-OP (foreachBatch delivers them routinely),
    // never an error that would kill the stream — and no delta commits
    StreamingLinkGraph.applyBatch(Seq.empty[(Long, String)].toDF("doc_id", "text"),
      0L, "doc_id", "text", dir)
    assert(StreamingLinkGraph.committedBatches(spark, dir).isEmpty)
    // out-of-order backfill: committing batch 5 then applying unseen
    // batch 3 must fail LOUDLY — batch 5's delta was computed without 3's
    // df contributions, so folding 3 in afterwards breaks append≡rebuild
    StreamingLinkGraph.applyBatch(Seq((10L, "c d")).toDF("doc_id", "text"),
      5L, "doc_id", "text", dir)
    val ooo = intercept[IllegalArgumentException] {
      StreamingLinkGraph.applyBatch(Seq((20L, "e f")).toDF("doc_id", "text"),
        3L, "doc_id", "text", dir)
    }
    assert(ooo.getMessage.contains("ascending batchId order"))
    // a committed id's replay still short-circuits BEFORE the order guard
    StreamingLinkGraph.applyBatch(Seq((10L, "c d")).toDF("doc_id", "text"),
      5L, "doc_id", "text", dir)
    assert(StreamingLinkGraph.committedBatches(spark, dir) == Seq(5L))
  }

  test("compactTo refuses in-place targets (stream dir and its base)") {
    val dir = java.nio.file.Files.createTempDirectory("slg_guard").toString
    StreamingLinkGraph.initialize(Seq((1L, "x y p q"), (2L, "x y")).toDF("doc_id", "text"),
      "doc_id", "text", w = 2, maxDf = 2, dir, nBuckets = 2)
    // onto the base: would stamp epochs + overwrite base/edges before the
    // postings/dfs readers materialize - torn, rebuild-only
    intercept[IllegalArgumentException] {
      StreamingLinkGraph.compactTo(spark, dir, s"$dir/base")
    }
    // onto the stream dir itself: artifact surfaces interleave the delta log
    intercept[IllegalArgumentException] {
      StreamingLinkGraph.compactTo(spark, dir, dir)
    }
    // the base is untouched by the refused calls
    assert(canonSet(StreamingLinkGraph.readEdgesCanonical(spark, dir)).nonEmpty)
  }

}
