package graft

import graft.dedup.Dedup
import graft.functions.{TextFunctions => T}
import org.apache.spark.sql.functions._

/** Invariants for content-defined chunking: partition property, length
  * clamps, determinism, and the edit-robustness that motivates CDC over
  * fixed chunking.
  */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  private val words = Array("alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
    "golf", "hotel", "india", "juliet", "kilo", "lima", "mike", "november")

  private def syntheticText(seed: Int, n: Int): String = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n)(words(rnd.nextInt(words.length))).mkString(" ")
  }

  private def chunksOf(text: String, maskBits: Int = 3, minT: Int = 4, maxT: Int = 16): Seq[String] =
    Seq(text).toDF("text")
      .select(T.cdcChunks($"text", 8, maskBits, minT, maxT).as("c"))
      .head().getSeq[String](0)

  test("chunks partition the normalized text; token counts respect the clamps") {
    val text = syntheticText(1, 300)
    val ch = chunksOf(text)
    assert(ch.mkString(" ") == text, "chunks joined by ' ' must reconstruct the normalized text")
    val sizes = ch.map(_.split(" ").length)
    assert(sizes.init.forall(s => s >= 4 && s <= 16), s"interior chunks in [4,16]: $sizes")
    assert(sizes.last <= 16, s"tail chunk at most maxTokens: ${sizes.last}")
    assert(sizes.count(_ == 16) < sizes.length, "mask cuts fire (not all force-cuts)")
  }

  test("empty and short texts") {
    assert(chunksOf("").isEmpty)
    assert(chunksOf("one two").mkString(" ") == "one two") // single short chunk
  }

  test("edit robustness: one inserted token re-chunks locally, fixed chunking loses everything after it") {
    val a = syntheticText(2, 400)
    val b = "inserted " + a // one-token insertion at the front — worst case for fixed chunks
    val cdcShared = chunksOf(a).toSet.intersect(chunksOf(b).toSet).size
    assert(cdcShared.toDouble / chunksOf(a).size > 0.6,
      s"CDC must re-sync after the edit: shared $cdcShared of ${chunksOf(a).size}")
    def fixedChunks(t: String): Seq[String] =
      Seq(t).toDF("text").select(T.chunkTokens(T.tokenize($"text"), 8, 8).as("c"))
        .head().getSeq[String](0)
    val fixedShared = fixedChunks(a).toSet.intersect(fixedChunks(b).toSet).size
    assert(fixedShared <= 1, s"fixed chunking shifts every boundary: shared $fixedShared")
  }

  test("cdcDedupRewrite: exact duplicate doc is fully rewritten away, clean docs untouched") {
    val a = syntheticText(3, 120)
    val other = syntheticText(4, 120)
    val docs = Seq((0L, a), (1L, other), (2L, a)).toDF("doc_id", "text")
    val out = Dedup.cdcDedupRewrite(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    val (clean0, n0, d0) = out(0L)
    assert(clean0 == a && d0 == 0L, "first copy keeps everything")
    val (clean2, n2, d2) = out(2L)
    assert(clean2 == "" && d2 == n2 && n2 == n0, "exact dup loses every chunk")
    val (clean1, _, d1) = out(1L)
    assert(clean1 == other && d1 == 0L, "unrelated doc untouched")
  }

  test("near-duplicate with a mid-document edit keeps only the edited neighborhood") {
    val a = syntheticText(5, 300)
    val toks = a.split(" ")
    val b = (toks.take(150) ++ Array("edited") ++ toks.drop(150)).mkString(" ")
    val docs = Seq((0L, a), (1L, b)).toDF("doc_id", "text")
    val out = Dedup.cdcDedupRewrite(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    val (n1, d1) = out(1L)
    assert(d1.toDouble / n1 > 0.6, s"most of the near-dup must dedup away: dropped $d1 of $n1")
    assert(d1 < n1, "the edited neighborhood survives")
  }
}
