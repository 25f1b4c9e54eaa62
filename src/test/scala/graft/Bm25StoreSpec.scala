package graft

import graft.text.{Bm25, Bm25Store}
import org.apache.spark.sql.functions._

/** The persisted BM25 artifact: save/load round-trip, append ≡ rebuild,
  * the disjoint-id guard, and the term-bucket-pruned serving path.
  */
class Bm25StoreSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def scores(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double, Int)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet

  test("save/load round-trip scores identically to the in-memory index") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val queries = docs.where($"doc_id" < 5)
    val dir = tmp("bm25_rt")
    Bm25Store.build(docs, "text", "doc_id", dir, nBuckets = 8)
    val expected = scores(Bm25.topK(docs, queries, "text", "doc_id", k = 5))
    val loaded = scores(Bm25.scoreTopK(Bm25Store.load(spark, dir), queries,
      "text", "doc_id", k = 5))
    assert(loaded == expected)
    val m = Bm25Store.loadManifest(spark, dir)
    assert(m.nDocs == docs.count())
    val idx = Bm25.buildIndex(docs, "text", "doc_id")
    assert(m.sumLen == idx.sumLen && m.nBuckets == 8)
  }

  test("append == rebuild: segment fold matches a one-shot full build") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val half = docs.agg(max($"doc_id")).head().getLong(0) / 2
    val dir = tmp("bm25_app")
    Bm25Store.build(docs.where($"doc_id" <= half), "text", "doc_id", dir, nBuckets = 8)
    Bm25Store.append(Bm25.buildIndex(docs.where($"doc_id" > half), "text", "doc_id"),
      dir, segmentId = 1L)
    val queries = docs.where($"doc_id" >= 5 && $"doc_id" < 10)
    val expected = scores(Bm25.topK(docs, queries, "text", "doc_id", k = 5))
    assert(scores(Bm25.scoreTopK(Bm25Store.load(spark, dir), queries,
      "text", "doc_id", k = 5)) == expected)
    // surfaces merged exactly: df table equals the full build's
    val m = Bm25Store.loadManifest(spark, dir)
    val full = Bm25.buildIndex(docs, "text", "doc_id")
    assert(m.nDocs == full.nDocs && m.sumLen == full.sumLen)
    val storedDf = Bm25Store.load(spark, dir).dfTab
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val fullDf = full.dfTab.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(storedDf == fullDf)
    // compactTo: two segments fold into a single-segment store that
    // scores bit-identically through the persisted serving path
    val out = tmp("bm25_cmp")
    Bm25Store.compactTo(spark, dir, out)
    assert(Bm25Store.committedSegments(spark, out) == Seq(0L))
    val mc = Bm25Store.loadManifest(spark, out)
    assert(mc.nDocs == m.nDocs && mc.sumLen == m.sumLen && mc.maxDocId == m.maxDocId)
    assert(scores(Bm25Store.scoreTopKPersisted(spark, out, queries,
        "text", "doc_id", k = 5)) ==
      scores(Bm25Store.scoreTopKPersisted(spark, dir, queries,
        "text", "doc_id", k = 5)))
    // in-place compaction is rejected, source untouched
    val same = intercept[IllegalArgumentException] {
      Bm25Store.compactTo(spark, dir, dir)
    }
    assert(same.getMessage.contains("must differ"))
    assert(Bm25Store.loadManifest(spark, dir) == m)
  }

  test("persisted serving path prunes to the query terms' buckets and matches") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val queries = docs.where($"doc_id" < 5)
    val dir = tmp("bm25_serve")
    Bm25Store.build(docs, "text", "doc_id", dir, nBuckets = 8)
    val served = Bm25Store.scoreTopKPersisted(spark, dir, queries, "text", "doc_id", k = 5)
    val expected = scores(Bm25.topK(docs, queries, "text", "doc_id", k = 5))
    assert(scores(served) == expected)
    // the scan carries a bucket partition filter (the pruning IS the
    // serving-path point; with the synthetic corpus's tiny vocabulary the
    // query set may touch every bucket, so assert the FILTER, not the count)
    val plan = served.queryExecution.executedPlan.toString
    assert(plan.contains("bucket"), plan.linesIterator.take(30).mkString("\n"))
  }

  test("append guard: overlapping doc ids fail fast") {
    val docs = Seq((1L, "alpha beta"), (2L, "beta gamma")).toDF("doc_id", "text")
    val dir = tmp("bm25_guard")
    Bm25Store.build(docs, "text", "doc_id", dir, nBuckets = 4)
    val err = intercept[IllegalArgumentException] {
      Bm25Store.append(Bm25.buildIndex(
        Seq((2L, "delta")).toDF("doc_id", "text"), "text", "doc_id"), dir, segmentId = 1L)
    }
    assert(err.getMessage.contains("disjoint"))
    // replay safety: a committed segment's re-append is a no-op, and a
    // TORN append (marker deleted = crash before commit) retries cleanly
    Bm25Store.append(Bm25.buildIndex(
      Seq((9L, "epsilon zeta")).toDF("doc_id", "text"), "text", "doc_id"), dir, segmentId = 2L)
    val m1 = Bm25Store.loadManifest(spark, dir)
    Bm25Store.append(Bm25.buildIndex(
      Seq((9L, "epsilon zeta")).toDF("doc_id", "text"), "text", "doc_id"), dir, segmentId = 2L)
    assert(Bm25Store.loadManifest(spark, dir) == m1, "committed replay changed the index")
    val fsP = new org.apache.hadoop.fs.Path(dir)
    val fs = fsP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/segs/seg=2/_done"), false)
    assert(Bm25Store.loadManifest(spark, dir).nDocs == m1.nDocs - 1) // torn = invisible
    Bm25Store.append(Bm25.buildIndex(
      Seq((9L, "epsilon zeta")).toDF("doc_id", "text"), "text", "doc_id"), dir, segmentId = 2L)
    assert(Bm25Store.loadManifest(spark, dir) == m1, "torn retry must restore exactly")
    // zero-posting segments with claimed docs fail fast (id guard blind spot)
    val empty = intercept[IllegalArgumentException] {
      Bm25Store.append(Bm25.buildIndex(
        Seq((20L, "")).toDF("doc_id", "text"), "text", "doc_id"), dir, segmentId = 3L)
    }
    assert(empty.getMessage.contains("ZERO postings"))
    // torn REBUILD: save() deletes segs/ first - a crash before seg 0's
    // marker must read as a loud failure, never a silently-empty index
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/segs"), true)
    val tornBuild = intercept[IllegalArgumentException] {
      Bm25Store.loadManifest(spark, dir)
    }
    assert(tornBuild.getMessage.contains("no committed segments"), tornBuild.getMessage)
  }

  test("appendAuto: fold at the segment bound == rebuild; crash mid-swap rolls forward") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    def slice(lo: Long, hi: Long) = docs.where($"doc_id" >= lo && $"doc_id" < hi)
    val dir = tmp("bm25_auto")
    Bm25Store.build(slice(0, 200), "text", "doc_id", dir, nBuckets = 8)
    // two appends under the bound: plain segments
    assert(Bm25Store.appendAuto(Bm25.buildIndex(slice(200, 300), "text", "doc_id"),
      dir, segmentId = 1L, maxSegments = 4) == "append")
    assert(Bm25Store.appendAuto(Bm25.buildIndex(slice(300, 400), "text", "doc_id"),
      dir, segmentId = 2L, maxSegments = 4) == "append")
    assert(Bm25Store.committedSegments(spark, dir).size == 3)
    // the bound-crossing append folds in place
    assert(Bm25Store.appendAuto(Bm25.buildIndex(slice(400, 500), "text", "doc_id"),
      dir, segmentId = 3L, maxSegments = 4) == "append+compact")
    assert(Bm25Store.committedSegments(spark, dir) == Seq(0L))
    // folded store == a one-shot full build, bit-identical scoring
    val queries = docs.where($"doc_id" >= 5 && $"doc_id" < 10)
    val expected = scores(Bm25.topK(docs, queries, "text", "doc_id", k = 5))
    assert(scores(Bm25Store.scoreTopKPersisted(spark, dir, queries,
      "text", "doc_id", k = 5)) == expected)
    val m = Bm25Store.loadManifest(spark, dir)
    val full = Bm25.buildIndex(docs, "text", "doc_id")
    assert(m.nDocs == full.nDocs && m.sumLen == full.sumLen)

    // crash mid-swap: fold committed (staging + _SWAP marker) but the
    // segs tree never swapped - the next append rolls it forward and the
    // appended segment lands on the FOLDED tree, nothing lost
    val dir2 = tmp("bm25_auto2")
    Bm25Store.build(slice(0, 200), "text", "doc_id", dir2, nBuckets = 8)
    Bm25Store.append(Bm25.buildIndex(slice(200, 300), "text", "doc_id"), dir2, 1L)
    Bm25Store.compactTo(spark, dir2, s"$dir2/_compact")
    val fs = new org.apache.hadoop.fs.Path(dir2)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.create(new org.apache.hadoop.fs.Path(s"$dir2/_compact/_SWAP"), true).close()
    // simulated crash here; the next append recovers then appends
    Bm25Store.append(Bm25.buildIndex(slice(300, 400), "text", "doc_id"), dir2, 2L)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir2/_compact")))
    assert(Bm25Store.committedSegments(spark, dir2) == Seq(0L, 2L))
    assert(Bm25Store.loadManifest(spark, dir2).nDocs == slice(0, 400).count())
    // an UNMARKED staging (fold crashed before commit) is discarded
    val dir3 = tmp("bm25_auto3")
    Bm25Store.build(slice(0, 100), "text", "doc_id", dir3, nBuckets = 8)
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$dir3/_compact/segs/seg=0"))
    Bm25Store.append(Bm25.buildIndex(slice(100, 150), "text", "doc_id"), dir3, 1L)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir3/_compact")))
    assert(Bm25Store.committedSegments(spark, dir3) == Seq(0L, 1L))
  }


  test("randomized appendAuto sequences (mixed folds) == one-shot rebuild (property)") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .localCheckpoint(true)
    try {
      for (seed <- Seq(7L, 99L)) {
        val rnd = new scala.util.Random(seed)
        val dir = tmp(s"bm25_auto_prop$seed")
        var next = 0L
        def slice(n: Long) = { val lo = next; next += n; docs.where($"doc_id" >= lo && $"doc_id" < next) }
        Bm25Store.build(slice(60 + rnd.nextInt(60)), "text", "doc_id", dir, nBuckets = 8)
        var segId = 0L
        (1 to 5).foreach { _ =>
          segId += 1
          Bm25Store.appendAuto(Bm25.buildIndex(slice(20 + rnd.nextInt(50)), "text", "doc_id"),
            dir, segmentId = segId, maxSegments = 2 + rnd.nextInt(3))
        }
        val rb = tmp(s"bm25_auto_prop_rb$seed")
        Bm25Store.build(docs.where($"doc_id" < next), "text", "doc_id", rb, nBuckets = 8)
        val m1 = Bm25Store.loadManifest(spark, dir)
        val m2 = Bm25Store.loadManifest(spark, rb)
        assert(m1.nDocs == m2.nDocs && m1.sumLen == m2.sumLen && m1.maxDocId == m2.maxDocId,
          s"seed $seed manifests diverge: $m1 vs $m2")
        val queries = docs.where($"doc_id" >= 5 && $"doc_id" < 10)
        assert(scores(Bm25Store.scoreTopKPersisted(spark, dir, queries, "text", "doc_id", k = 5)) ==
          scores(Bm25Store.scoreTopKPersisted(spark, rb, queries, "text", "doc_id", k = 5)),
          s"seed $seed scoring diverges")
      }
    } finally graft.Pins.release(docs)
  }

}
