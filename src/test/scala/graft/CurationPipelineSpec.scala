package graft

import graft.dedup.CurationPipeline
import org.apache.spark.sql.functions._

class CurationPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("stages shrink monotonically and drop the planted garbage + dups") {
    val good =
      "the quick brown fox jumps over the lazy dog while the cat sleeps on the warm mat near the open door of the old house and the wind blows through the tall trees in the quiet garden outside the village"
    val docs = Seq(
      (0L, good),
      (1L, good), // exact dup of 0
      (2L, good.replace("warm", "cold")), // near dup of 0
      (3L, "@@@@ #### !!!! %%%%"), // garbage → quality gate
      (4L, "spark engines shuffle data across partitions with hash exchanges and the sort merge joins at scale work well for the large tables in the cluster")
    ).toDF("doc_id", "text")

    val r = CurationPipeline.run(docs, "text", "doc_id", minQuality = 0.5, nearThreshold = 0.5, collectStats = true)
    val c = r.counts
    assert(c.input == 5)
    assert(c.afterQuality == 4) // garbage dropped
    assert(c.afterExact == 3)   // exact dup dropped
    assert(c.afterNear == 2)    // near dup dropped
    assert(c.input >= c.afterQuality && c.afterQuality >= c.afterRepetition &&
      c.afterRepetition >= c.afterPerplexity && c.afterPerplexity >= c.afterLang &&
      c.afterLang >= c.afterExact && c.afterExact >= c.afterNear)
    val ids = r.survivors.select($"doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(0L, 4L))
  }

  test("repetition gate drops spammy docs, keeps varied text") {
    val spam = ("buy now " * 40).trim // top bigram dominates
    val varied =
      "the quick brown fox jumps over the lazy dog while a cat sleeps on the warm mat near an open door of the old house"
    val docs = Seq((0L, spam), (1L, varied)).toDF("doc_id", "text")
    val r = CurationPipeline.run(docs, "text", "doc_id", minQuality = 0.0,
      maxRepetition = Some(CurationPipeline.RepetitionGate()), collectStats = true)
    val ids = r.survivors.select($"doc_id").collect().map(_.getLong(0)).toSeq
    assert(ids == Seq(1L), s"got $ids")
    assert(r.counts.afterRepetition == 1)
  }

  test("pipeline runs on the documents table") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val r = CurationPipeline.run(docs, "text", "doc_id", minQuality = 0.3, nearThreshold = 0.6)
    val n = r.survivors.count()
    assert(n > 0 && n <= docs.count())
  }

  test("perplexity gate drops the high-perplexity tail, keeps common-token docs") {
    // doc 1 repeats corpus-common tokens; doc 0 is all-singletons → max ppl
    val docs = Seq(
      (0L, "xylophone quixotic zephyr jabberwocky vortex glyph"),
      (1L, "common words common words common words common words"),
      (2L, "common words and a few more common words here")
    ).toDF("doc_id", "text")
    val model = graft.text.LmScore.unigramModel(docs, "text")
    val ppl = graft.text.LmScore.perplexity(docs, "text", "doc_id", model)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(ppl(0L) > ppl(1L)) // singleton-token doc scores worse
    val cutoff = (ppl(0L) + math.max(ppl(1L), ppl(2L))) / 2
    val r = CurationPipeline.run(docs, "text", "doc_id", minQuality = 0.0,
      maxPerplexity = Some(cutoff), nearThreshold = 0.99, collectStats = true)
    val ids = r.survivors.select($"doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(1L, 2L), s"got $ids (ppl=$ppl cutoff=$cutoff)")
    assert(r.counts.afterPerplexity == 2)
  }

  test("decontamination stage drops docs overlapping the eval set") {
    val leaked = "what is the capital of france the capital of france is paris on the seine river"
    val docs = Seq(
      (0L, s"document leaking eval content $leaked plus commentary"),
      (1L, "genuinely original training text with distinct phrasing and nothing shared at all here")
    ).toDF("doc_id", "text")
    val ev = Seq((100L, leaked)).toDF("doc_id", "text")
    val r = CurationPipeline.run(docs, "text", "doc_id",
      minQuality = 0.0, nearThreshold = 0.95, evalSet = Some(ev), collectStats = true)
    val ids = r.survivors.select($"doc_id").collect().map(_.getLong(0)).toSeq
    assert(ids == Seq(1L), s"got $ids")
    assert(r.counts.afterDecontaminate <= r.counts.afterPassage)
  }

  test("passage gate drops boilerplate-heavy docs, keeps short docs") {
    val boiler = "subscribe to our newsletter for updates and follow us on social media channels today"
    val docs = Seq(
      (0L, s"$boiler plus little else"), // mostly boilerplate (7 of 10 spans shared)
      (1L, s"genuinely original article text with many distinct thoughts and phrasings that nobody else uses anywhere $boiler"),
      (2L, s"another entirely different document about completely unrelated topics with its own unique vocabulary and structure throughout $boiler"),
      (3L, "short doc") // < w tokens: no spans → kept
    ).toDF("doc_id", "text")
    val r = CurationPipeline.run(docs, "text", "doc_id",
      minQuality = 0.0, nearThreshold = 0.95, maxDupSpanRatio = Some(0.5), collectStats = true)
    val ids = r.survivors.select($"doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids.contains(3L), s"short doc must survive: $ids")
    assert(!ids.contains(0L), s"boilerplate-heavy doc must be dropped: $ids")
    assert(r.counts.afterPassage <= r.counts.afterNear)
  }
}
