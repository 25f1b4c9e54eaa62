package graft

import graft.text.Dsir
import org.apache.spark.sql.functions._

class DsirSpec extends SparkSpec {
  import spark.implicits._

  // target domain talks about cats; raw pool is a mix
  private def corpus() = Seq(
    (0L, "the cat sat on the mat", "tgt"),
    (1L, "a cat and another cat purred", "tgt"),
    (2L, "cats cat feline cat", "raw"),
    (3L, "stock market index fund returns", "raw"),
    (4L, "the dog barked at the mailman", "raw"),
    (5L, "", "raw")
  ).toDF("id", "text", "domain")

  test("featureLogRatios: dim-bounded table; target-heavy features score positive") {
    val lam = Dsir.featureLogRatios(corpus(), "text", $"domain" === "tgt", dim = 256, alpha = 1.0)
    assert(lam.count() <= 256)
    assert(lam.columns.toSeq == Seq("bucket", "raw_cnt", "tgt_cnt", "lam"))
    // a bucket whose occurrences are mostly target must outscore one that
    // never appears in the target
    val rows = lam.collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    val tgtHeavy = rows.filter { case (raw, tgt, _) => tgt == raw && tgt > 0 }.map(_._3)
    val rawOnly = rows.filter { case (_, tgt, _) => tgt == 0 }.map(_._3)
    assert(tgtHeavy.nonEmpty && rawOnly.nonEmpty)
    assert(tgtHeavy.min > rawOnly.max)
  }

  test("importanceWeights: cat-docs outrank off-domain; empty doc drops") {
    val w = Dsir.importanceWeights(corpus(), "text", "id", $"domain" === "tgt", dim = 256)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(!w.contains(5L), "empty doc must produce no row")
    assert(w(2L) > w(3L), s"cat doc must outrank finance doc: $w")
    assert(w(2L) > w(4L), s"cat doc must outrank dog doc: $w")
  }

  test("n_terms counts unigrams + bigrams with multiplicity") {
    val w = Dsir.importanceWeights(corpus(), "text", "id", $"domain" === "tgt", dim = 256)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // "the cat sat on the mat": 6 unigrams + 5 bigrams
    assert(w(0L) == 11L, s"got ${w(0L)}")
    // "cats cat feline cat": 4 + 3
    assert(w(2L) == 7L, s"got ${w(2L)}")
  }

  test("selectTopK: target rows never selected; ordered by rounded weight then id") {
    val sel = Dsir.selectTopK(corpus(), "text", "id", $"domain" === "tgt", k = 2, dim = 256)
      .collect()
    val ids = sel.map(_.getLong(0)).toSeq
    assert(ids.size == 2 && !ids.contains(0L) && !ids.contains(1L), s"ids=$ids")
    assert(ids.head == 2L, s"the cat-heavy raw doc must rank first: $ids")
    val weights = sel.map(_.getDouble(2)).toSeq
    assert(weights == weights.sorted.reverse, "output must be weight-descending")
  }

  test("rounded weights are identical across partitionings") {
    val docs = (0L until 80L).map { i =>
      (i, (0 until 20).map(j => s"w${(i * 7 + j * 3) % 13}").mkString(" "),
        if (i % 9 == 0) "tgt" else "raw")
    }
    def run(parts: Int) =
      Dsir.importanceWeights(docs.toDF("id", "text", "domain").repartition(parts),
          "text", "id", $"domain" === "tgt", dim = 512)
        .select($"id", $"n_terms", round($"weight", 6).as("w"))
        .orderBy($"id").collect().map(_.toSeq)
    assert(run(3).toSeq == run(17).toSeq)
  }
}
