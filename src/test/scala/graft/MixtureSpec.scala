package graft

import graft.text.Mixture
import org.apache.spark.sql.functions._

class MixtureSpec extends SparkSpec {
  import spark.implicits._

  // skewed corpus: 'big' has ~16x the tokens of 'small'
  private def corpus() = {
    val big = (0 until 64).map(i => (i.toLong, "alpha beta gamma delta", "big"))
    val small = (64 until 68).map(i => (i.toLong, "epsilon zeta eta theta", "small"))
    (big ++ small).toDF("doc_id", "text", "source")
  }

  test("temperature flattening boosts small sources: rate(small) > rate(big)") {
    val rates = Mixture.sourceRates(corpus(), "text", "source", budgetFraction = 0.25)
      .map(r => r.source -> r).toMap
    assert(rates("small").rate > rates("big").rate,
      s"small ${rates("small").rate} vs big ${rates("big").rate}")
    assert(rates.values.forall(r => r.rate > 0.0 && r.rate <= 1.0))
    // √p flattening: with a 16:1 token skew the weight ratio is 4:1, so
    // small's rate (budget·w/tokens) is 16/4 = 4x big's
    val ratio = rates("small").rate / rates("big").rate
    assert(math.abs(ratio - 4.0) < 1e-9, s"rate ratio $ratio")
  }

  test("rates cap at 1.0 when a source's allocation exceeds its tokens") {
    val rates = Mixture.sourceRates(corpus(), "text", "source", budgetFraction = 1.5)
    assert(rates.forall(_.rate <= 1.0))
    assert(rates.exists(_.rate == 1.0))
  }

  test("sample is deterministic across partitionings and respects the per-source rate") {
    def run(p: Int) = Mixture.temperatureSample(corpus().repartition(p),
        "text", "doc_id", "source", budgetFraction = 0.25)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    val s1 = run(2)
    assert(s1 == run(7), "hash sampling must not depend on partitioning")
    // kept fraction per source should be within binomial noise of rate
    val rates = Mixture.sourceRates(corpus(), "text", "source", budgetFraction = 0.25)
      .map(r => r.source -> r.rate).toMap
    val keptBig = s1.count(_ < 64).toDouble / 64.0
    assert(math.abs(keptBig - rates("big")) < 0.2, s"big kept $keptBig vs rate ${rates("big")}")
  }

  test("summary lists every source, zero-survivor sources included") {
    val out = Mixture.sampleSummary(corpus(), "text", "doc_id", "source", budgetFraction = 0.01)
      .orderBy($"source").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("big", "small"))
    // tokens_kept is consistent with n_kept (4 tokens per doc fixture)
    out.foreach(r => assert(r.getLong(4) == 4L * r.getLong(3), r.toString))
  }

  test("summary token totals are exact") {
    val out = Mixture.sampleSummary(corpus(), "text", "doc_id", "source", budgetFraction = 0.25)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("big" -> 256L, "small" -> 16L))
  }

  test("temperatureExpand upsamples small sources: rate > 1 repeats docs, expectation = rate") {
    val rates = Mixture.sourceRates(corpus(), "text", "source", budgetFraction = 0.8, capAtOne = false)
      .map(r => r.source -> r.rate).toMap
    // 16x skew + sqrt flattening: the small source's uncapped rate exceeds 1
    assert(rates("small") > 1.0 && rates("big") < 1.0, s"rates $rates")
    val out = Mixture.temperatureExpand(corpus(), "text", "doc_id", "source", budgetFraction = 0.8)
      .groupBy($"source").agg(count(lit(1)).as("n"), countDistinct($"doc_id").as("d"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // every small doc appears floor(rate) or floor(rate)+1 times
    val (nSmall, dSmall) = out("small")
    assert(dSmall == 4L, "rate > 1 must keep every doc at least once")
    val lo = 4L * math.floor(rates("small")).toLong
    assert(nSmall >= lo && nSmall <= lo + 4, s"small copies $nSmall outside [$lo, ${lo + 4}]")
    // big is downsampled, never repeated
    val (nBig, dBig) = out("big")
    assert(nBig == dBig && nBig < 64L, s"big must downsample without repeats, got $out")
    // copy indices are contiguous 0..n-1 per doc
    val copies = Mixture.temperatureExpand(corpus(), "text", "doc_id", "source", budgetFraction = 0.8)
      .groupBy($"doc_id").agg(count(lit(1)).as("n"), min($"copy").as("mn"), max($"copy").as("mx"))
      .collect()
    copies.foreach(r => assert(r.getInt(2) == 0 && r.getInt(3) == r.getLong(1).toInt - 1, r.toString))
    // deterministic under repartitioning
    val a = Mixture.temperatureExpand(corpus(), "text", "doc_id", "source", 0.8)
      .select($"doc_id", $"copy").collect().map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    val b = Mixture.temperatureExpand(corpus().repartition(9), "text", "doc_id", "source", 0.8)
      .select($"doc_id", $"copy").collect().map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    assert(a == b)
  }
}
