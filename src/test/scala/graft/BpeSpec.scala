package graft

import graft.text.Bpe
import org.apache.spark.sql.functions._

/** BPE trainer: merge sequence matches an independent single-node
  * reference, is partitioning-independent, and segmentation counts are
  * consistent with applying the merges by hand.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Independent reference BPE over a word-frequency map: symbol lists,
    * explicit left-to-right non-overlapping merge — no string replace, so
    * agreement with the engine's replace-based merge is evidence, not
    * tautology.
    */
  private def refBpe(words: Map[String, Long], k: Int): Seq[(Int, String, String, Long)] = {
    var dict: Map[Vector[String], Long] =
      words.map { case (w, c) => (w.map(_.toString).toVector, c) }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    for (step <- 1 to k) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
      dict.foreach { case (syms, c) =>
        syms.indices.dropRight(1).foreach(i => counts((syms(i), syms(i + 1))) += c)
      }
      if (counts.nonEmpty) {
        val ((l, r), c) = counts.toSeq.minBy { case ((a, b), n) => (-n, s"$a $b") }
        out += ((step, s"$l $r", l + r, c))
        dict = dict.map { case (syms, cn) =>
          val merged = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
              merged += (l + r); i += 2
            } else { merged += syms(i); i += 1 }
          }
          (merged.toVector, cn)
        }.groupMapReduce(_._1)(_._2)(_ + _)
      }
    }
    out.toSeq
  }

  private val corpus = Seq(
    (1L, "low lower lowest low low"),
    (2L, "new newer newest new"),
    (3L, "wide wider widest lowest newest"),
    (4L, "low new wide wide wider")
  )

  private def wordCounts: Map[String, Long] =
    corpus.flatMap(_._2.split(" ")).groupBy(identity).view.mapValues(_.size.toLong).toMap

  test("merge sequence matches an independent reference implementation") {
    val docs = corpus.toDF("doc_id", "text")
    val got = Bpe.train(docs, col("text"), merges = 10)
      .map(m => (m.step, m.pair, m.merged, m.count))
    val want = refBpe(wordCounts, 10)
    assert(got == want, s"\nengine: $got\nref:    $want")
  }

  test("training is partitioning-independent") {
    val docs = corpus.toDF("doc_id", "text")
    val a = Bpe.train(docs.repartition(1), col("text"), merges = 6)
    val b = Bpe.train(docs.repartition(7), col("text"), merges = 6)
    assert(a == b)
  }

  test("segment: subword counts equal hand-applied merges; broadcast dict join") {
    val docs = corpus.toDF("doc_id", "text")
    val merges = Bpe.train(docs, col("text"), merges = 6)
    val out = Bpe.segment(docs, "doc_id", col("text"), merges)
      .orderBy($"doc_id").collect()
    assert(out.length == 4)
    // reference: apply the merge sequence to each word's symbol list
    def applySeq(w: String): Int = {
      var syms = w.map(_.toString).toVector
      merges.foreach { m =>
        val Array(l, r) = m.pair.split(" ")
        val next = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) { next += m.merged; i += 2 }
          else { next += syms(i); i += 1 }
        }
        syms = next.toVector
      }
      syms.length
    }
    out.foreach { r =>
      val id = r.getLong(0)
      val toks = corpus.find(_._1 == id).get._2.split(" ").toSeq
      assert(r.getLong(1) == toks.length, s"doc $id token count")
      assert(r.getLong(2) == toks.map(applySeq(_).toLong).sum, s"doc $id subword count")
    }
    // fewer merges can only increase (or keep) subword counts
    val fewer = Bpe.segment(docs, "doc_id", col("text"), merges.take(2))
      .orderBy($"doc_id").collect()
    out.zip(fewer).foreach { case (a, b) =>
      assert(a.getLong(2) <= b.getLong(2))
    }
  }

  test("adjacent occurrences of the winning pair all merge (doubled-separator)") {
    // "papapa" has three consecutive (p,a) adjacencies — a single-space
    // representation under-merges because consecutive matches share the
    // delimiter space (" p a p a " → " pa p a "); the doubled-separator
    // representation merges greedily left-to-right in one replace pass
    val docs = Seq((1L, "papapa papa ba")).toDF("doc_id", "text")
    val got = Bpe.train(docs, col("text"), merges = 3)
      .map(m => (m.step, m.pair, m.merged, m.count))
    val want = refBpe(Map("papapa" -> 1L, "papa" -> 1L, "ba" -> 1L), 3)
    assert(got == want, s"\nengine: $got\nref:    $want")
    // after merging (p,a) then (pa,pa): papapa → [papa, pa] (2 subwords)
    val seg = Bpe.segment(docs, "doc_id", col("text"),
        Bpe.train(docs, col("text"), merges = 2))
      .collect()
    assert(seg.head.getLong(2) == 2 + 1 + 2) // papa+pa, papa, b+a
  }

  test("single-char and exhausted-corpus edges") {
    val tiny = Seq((1L, "a b a b")).toDF("doc_id", "text")
    // only pair ever available is none (all words single-symbol) after 0 merges:
    // 'a' and 'b' are 1-char words → no adjacent pairs → early stop
    val m = Bpe.train(tiny, col("text"), merges = 5)
    assert(m.isEmpty, s"expected no merges from single-char words, got $m")
    val seg = Bpe.segment(tiny, "doc_id", col("text"), m).collect()
    assert(seg.head.getLong(1) == 4 && seg.head.getLong(2) == 4)
  }
}
