package graft

import graft.dedup.{Dedup, MinHashStore}
import org.apache.spark.sql.functions._

/** The persisted near-dup index: store-served dedup ≡ in-memory
  * incremental, append ≡ rebuild on both surfaces, id-discipline guards,
  * and a planted near-duplicate actually dying against the store.
  */
class MinHashStoreSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String): String = java.nio.file.Files.createTempDirectory(p).toString

  test("dedupBatch == minHashIncremental on real docs") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val corpus = docs.where(pmod($"doc_id", lit(3)) === 0)
    val batch = docs.where(pmod($"doc_id", lit(3)) =!= 0)
    val dir = tmp("mhs")
    MinHashStore.build(corpus, "text", "doc_id", dir, nBuckets = 8)
    val served = MinHashStore.dedupBatch(spark, dir, batch, "text", "doc_id", threshold = 0.5)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    val expected = Dedup.minHashIncremental(corpus, batch, "text", "doc_id", threshold = 0.5)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(served == expected, s"served ${served.size} vs expected ${expected.size}")
    val m = MinHashStore.loadManifest(spark, dir)
    assert(m.nDocs == corpus.count() && m.numHashes == 64 && m.bands == 16)
  }

  test("append == rebuild: surfaces and verdicts identical") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val half = docs.agg(max($"doc_id")).head().getLong(0) / 2
    val dir = tmp("mhs_app")
    MinHashStore.build(docs.where($"doc_id" <= half && pmod($"doc_id", lit(3)) === 0),
      "text", "doc_id", dir, nBuckets = 8)
    MinHashStore.append(docs.where($"doc_id" > half && pmod($"doc_id", lit(3)) === 0),
      "text", "doc_id", dir)
    val rb = tmp("mhs_rb")
    MinHashStore.build(docs.where(pmod($"doc_id", lit(3)) === 0), "text", "doc_id",
      rb, nBuckets = 8)
    def sigSet(d: String) = MinHashStore.readSigs(spark, d)
      .select($"id", xxhash64($"sig"), xxhash64($"shset"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    def postSet(d: String) = MinHashStore.readPostings(spark, d)
      .select($"band", $"bucket", $"id")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(sigSet(dir) == sigSet(rb))
    assert(postSet(dir) == postSet(rb))
    val batch = docs.where(pmod($"doc_id", lit(3)) =!= 0)
    val a = MinHashStore.dedupBatch(spark, dir, batch, "text", "doc_id", 0.5)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    val b = MinHashStore.dedupBatch(spark, rb, batch, "text", "doc_id", 0.5)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b)
    assert(MinHashStore.loadManifest(spark, dir).nDocs ==
      MinHashStore.loadManifest(spark, rb).nDocs)
  }

  test("planted duplicate dies against the store; guards fire") {
    val text = "the quick brown fox jumps over the lazy dog again and again today"
    val corpus = Seq((1L, text), (2L, "completely different words entirely unrelated content here"))
      .toDF("doc_id", "text")
    val dir = tmp("mhs_g")
    MinHashStore.build(corpus, "text", "doc_id", dir, nBuckets = 4)
    val batch = Seq((10L, text), (11L, "another novel document nothing shared with anything"))
      .toDF("doc_id", "text")
    val survivors = MinHashStore.dedupBatch(spark, dir, batch, "text", "doc_id", 0.7)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(survivors == Set(11L), s"got $survivors")
    // append survivors, then the SAME text in a later batch dies too
    MinHashStore.append(batch.where($"doc_id" === 11L), "text", "doc_id", dir)
    val again = MinHashStore.dedupBatch(spark, dir,
        Seq((20L, "another novel document nothing shared with anything")).toDF("doc_id", "text"),
        "text", "doc_id", 0.7)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(again.isEmpty)
    val low = intercept[IllegalArgumentException] {
      MinHashStore.append(Seq((5L, "x")).toDF("doc_id", "text"), "text", "doc_id", dir)
    }
    assert(low.getMessage.contains("must sort above"))
  }

  test("segment discipline: torn append invisible, committed replay no-op") {
    val corpus = Seq((1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight nine ten"))
      .toDF("doc_id", "text")
    val dir = tmp("mhs_seg")
    MinHashStore.build(corpus, "text", "doc_id", dir, nBuckets = 4)
    val batch = Seq((10L, "totally fresh words nothing shared here at all"))
      .toDF("doc_id", "text")
    // explicit segment id: committed replay must be a byte-level no-op
    MinHashStore.append(batch, "text", "doc_id", dir, segmentId = 7L)
    val before = MinHashStore.readSigs(spark, dir).count()
    MinHashStore.append(batch, "text", "doc_id", dir, segmentId = 7L) // replay
    assert(MinHashStore.readSigs(spark, dir).count() == before)
    assert(MinHashStore.loadManifest(spark, dir).nDocs == 3L)
    // auto-id retry of a committed append fails LOUDLY (id guard), never duplicates
    val dup = intercept[IllegalArgumentException] {
      MinHashStore.append(batch, "text", "doc_id", dir)
    }
    assert(dup.getMessage.contains("must sort above"))
    // torn append: a segment dir without _done is invisible to every reader
    val torn = new java.io.File(s"$dir/segs/seg=9/sigs")
    torn.mkdirs()
    assert(MinHashStore.committedSegments(spark, dir) == Seq(0L, 7L))
    assert(MinHashStore.readSigs(spark, dir).count() == before)
    // rebuild over a dir with committed segments: full overwrite, no stale folds
    MinHashStore.build(corpus, "text", "doc_id", dir, nBuckets = 4)
    assert(MinHashStore.committedSegments(spark, dir) == Seq(0L))
    assert(MinHashStore.loadManifest(spark, dir).nDocs == 2L)
  }

  test("compactTo folds segments into one; verdicts bit-identical") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six seven")).toDF("doc_id", "text")
    val b1 = Seq((10L, "red orange yellow green blue indigo")).toDF("doc_id", "text")
    val b2 = Seq((20L, "north south east west up down sideways")).toDF("doc_id", "text")
    val dir = tmp("mhs_cmp")
    MinHashStore.build(corpus, "text", "doc_id", dir, nBuckets = 4)
    MinHashStore.append(b1, "text", "doc_id", dir)
    MinHashStore.append(b2, "text", "doc_id", dir)
    assert(MinHashStore.committedSegments(spark, dir).size == 3)
    val out = tmp("mhs_cmp_out")
    MinHashStore.compactTo(spark, dir, out)
    assert(MinHashStore.committedSegments(spark, out) == Seq(0L))
    val mc = MinHashStore.loadManifest(spark, out)
    assert(mc.nDocs == 4L && mc.maxId == 20L)
    // same surfaces (signatures reused, postings recomputed deterministically)
    def sigSet(d: String) = MinHashStore.readSigs(spark, d)
      .select($"id", xxhash64($"sig"), xxhash64($"shset"))
      .collect().map(_.toSeq).toSet
    assert(sigSet(out) == sigSet(dir))
    // verdicts bit-identical on a mixed batch (one near-dup of an
    // admitted doc, one novel)
    val probe = Seq(
      (30L, "alpha beta gamma delta epsilon eta"),
      (31L, "completely novel nothing shared at all ever")).toDF("doc_id", "text")
    def verdict(d: String) = MinHashStore.dedupBatch(spark, d, probe,
      "text", "doc_id", threshold = 0.5).select($"doc_id").as[Long].collect().sorted.toSeq
    assert(verdict(out) == verdict(dir))
    // in-place compaction is rejected (the fold deletes the output's
    // segments before the source readers materialize)
    val same = intercept[IllegalArgumentException] {
      MinHashStore.compactTo(spark, dir, dir)
    }
    assert(same.getMessage.contains("must differ"))
    assert(MinHashStore.loadManifest(spark, dir).nDocs == 4L) // untouched
  }

  test("guards: segment 0 is the build's; a torn build fails loud, not empty") {
    val corpus = Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val dir = tmp("mhs_guard")
    MinHashStore.build(corpus, "text", "doc_id", dir, nBuckets = 2)
    // explicit segment id 0 would match the build's committed marker and
    // silently drop the batch - rejected loudly (streams pass batchId+1)
    val zero = intercept[IllegalArgumentException] {
      MinHashStore.append(Seq((5L, "x y z")).toDF("doc_id", "text"),
        "text", "doc_id", dir, segmentId = 0L)
    }
    assert(zero.getMessage.contains("belongs to the build"))
    // torn build: manifest written, then the crash landed before seg 0's
    // marker - reading on would serve an EMPTY store that admits every
    // duplicate; must fail naming the rebuild
    val segs = new java.io.File(s"$dir/segs")
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
    }
    rm(segs)
    val torn = intercept[IllegalArgumentException] {
      MinHashStore.loadManifest(spark, dir)
    }
    assert(torn.getMessage.contains("no committed segments"), torn.getMessage)
  }

  test("appendAuto: fold at the segment bound preserves verdicts; roll-forward") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    def slice(lo: Long, hi: Long) = docs.where($"doc_id" >= lo && $"doc_id" < hi)
    val dir = tmp("mh_auto")
    MinHashStore.build(slice(0, 200), "text", "doc_id", dir, nBuckets = 8)
    assert(MinHashStore.appendAuto(slice(200, 300), "text", "doc_id", dir,
      segmentId = 1L, maxSegments = 3) == "append")
    // bound crossed: fold in place, single segment remains
    assert(MinHashStore.appendAuto(slice(300, 400), "text", "doc_id", dir,
      segmentId = 2L, maxSegments = 3) == "append+compact")
    assert(MinHashStore.committedSegments(spark, dir) == Seq(0L))
    // verdicts across the fold == a never-folded store's
    val rb = tmp("mh_auto_rb")
    MinHashStore.build(slice(0, 400), "text", "doc_id", rb, nBuckets = 8)
    val probe = docs.where($"doc_id" >= 400 && $"doc_id" < 440)
    def ids(d: String) = MinHashStore.dedupBatch(spark, d, probe, "text", "doc_id")
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(ids(dir) == ids(rb))
    // sig surface identical to the rebuild's
    def sigSet(d: String) = MinHashStore.readSigs(spark, d)
      .select($"id", xxhash64($"sig"), xxhash64($"shset")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(sigSet(dir) == sigSet(rb))
    // crash mid-swap rolls forward on the next appendAuto
    MinHashStore.compactTo(spark, dir, s"$dir/_compact")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.create(new org.apache.hadoop.fs.Path(s"$dir/_compact/_SWAP"), true).close()
    assert(MinHashStore.appendAuto(slice(400, 450), "text", "doc_id", dir,
      segmentId = 5L, maxSegments = 10) == "append")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/_compact")))
    assert(MinHashStore.committedSegments(spark, dir) == Seq(0L, 5L))
    assert(MinHashStore.loadManifest(spark, dir).nDocs == 450)
  }


  test("randomized appendAuto sequences (mixed folds) == one-shot rebuild (property)") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .localCheckpoint(true)
    try {
      for (seed <- Seq(11L, 42L)) {
        val rnd = new scala.util.Random(seed)
        val dir = tmp(s"mh_auto_prop$seed")
        var next = 0L
        def slice(n: Long) = { val lo = next; next += n; docs.where($"doc_id" >= lo && $"doc_id" < next) }
        MinHashStore.build(slice(60 + rnd.nextInt(60)), "text", "doc_id", dir, nBuckets = 8)
        var segId = 0L
        (1 to 5).foreach { _ =>
          segId += 1
          // random batch sizes and a small random fold bound: some calls
          // fold mid-sequence, some do not - the routes interleave
          MinHashStore.appendAuto(slice(20 + rnd.nextInt(50)), "text", "doc_id",
            dir, segmentId = segId, maxSegments = 2 + rnd.nextInt(3))
        }
        val rb = tmp(s"mh_auto_prop_rb$seed")
        MinHashStore.build(docs.where($"doc_id" < next), "text", "doc_id", rb, nBuckets = 8)
        // committed signature surface == the rebuild's, and verdicts match
        def sigSet(d: String) = MinHashStore.readSigs(spark, d)
          .select($"id", xxhash64($"sig"), xxhash64($"shset")).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        assert(sigSet(dir) == sigSet(rb), s"seed $seed signature surfaces diverge")
        val probe = docs.where($"doc_id" >= next && $"doc_id" < next + 40)
        def verdicts(d: String) = MinHashStore.dedupBatch(spark, d, probe, "text", "doc_id")
          .select($"doc_id").as[Long].collect().sorted.toSeq
        assert(verdicts(dir) == verdicts(rb), s"seed $seed verdicts diverge")
      }
    } finally graft.Pins.release(docs)
  }

}
