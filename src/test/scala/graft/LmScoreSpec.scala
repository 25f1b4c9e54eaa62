package graft

import graft.text.LmScore
import org.apache.spark.sql.functions._

class LmScoreSpec extends SparkSpec {
  import spark.implicits._

  test("bigramModel counts transitions and contexts exactly") {
    val docs = Seq((0L, "a b a b c"), (1L, "a b")).toDF("doc_id", "text")
    val m = LmScore.bigramModel(docs, "text")
    val c12 = m.bigrams.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // doc0: (a,b) (b,a) (a,b) (b,c); doc1: (a,b)
    assert(c12 == Map(("a", "b") -> 3L, ("b", "a") -> 1L, ("b", "c") -> 1L))
    val c1 = m.contexts.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(c1 == Map("a" -> 3L, "b" -> 2L))
    assert(m.vocabSize == 3L) // a, b, c
  }

  test("bigram perplexity: in-model text scores better than out-of-model text") {
    val train = Seq((0L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")
    val score = Seq(
      (10L, "the quick brown fox"),       // transitions all in model
      (11L, "dog lazy over jumps fox")    // all transitions unseen
    ).toDF("doc_id", "text")
    val m = LmScore.bigramModel(train, "text")
    val ppl = LmScore.bigramPerplexity(score, "text", "doc_id", m)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(ppl(10L) < ppl(11L), s"in-model must beat held-out: $ppl")
  }

  test("documents with fewer than 2 tokens produce no row; n_transitions = len-1") {
    val docs = Seq((0L, "solo"), (1L, ""), (2L, "three token doc")).toDF("doc_id", "text")
    val m = LmScore.bigramModel(docs, "text")
    val out = LmScore.bigramPerplexity(docs, "text", "doc_id", m).collect()
    assert(out.map(_.getLong(0)).toSet == Set(2L))
    assert(out.head.getLong(1) == 2L)
  }

  test("smoothed probabilities sum to 1 over the vocab for a seen context") {
    // context 'a' with V=3: p(b|a)=(3+1)/(3+3), p(a|a)=(0+1)/6, p(c|a)=(0+1)/6 -> sum 1
    val docs = Seq((0L, "a b a b c"), (1L, "a b")).toDF("doc_id", "text")
    val m = LmScore.bigramModel(docs, "text")
    val c1a = 3.0; val v = m.vocabSize.toDouble
    val pSum = (3.0 + 1.0) / (c1a + v) + (0.0 + 1.0) / (c1a + v) + (0.0 + 1.0) / (c1a + v)
    assert(math.abs(pSum - 1.0) < 1e-12)
  }

  test("rounded bigram perplexity is identical across partitionings") {
    val docs = (0L until 40L).map(i => (i, s"w${i % 7} w${(i + 1) % 7} w${(i + 2) % 7} shared tail"))
      .toDF("doc_id", "text")
    def run(p: Int) = {
      val d = docs.repartition(p)
      val m = LmScore.bigramModel(d.where($"doc_id" % 2 === 0), "text")
      LmScore.bigramPerplexity(d, "text", "doc_id", m)
        .select($"id", round($"perplexity", 4)).orderBy($"id").collect().map(_.toSeq).toSeq
    }
    assert(run(2) == run(9))
  }
}
