package graft

import graft.text.Bm25
import org.apache.spark.sql.functions._

class Bm25Spec extends SparkSpec {
  import spark.implicits._

  // 'zebra' is rare (docs 1,2); 'common' is everywhere (pruned at 0.5)
  private def corpus() = Seq(
    (0L, "common zebra query words here"),
    (1L, "common zebra zebra document about animals"),
    (2L, "common zebra appears once more"),
    (3L, "common unrelated text about engines"),
    (4L, "common another filler document entirely"),
    (5L, "common filler filler filler filler")
  ).toDF("doc_id", "text")

  test("rare query terms dominate; ubiquitous terms are df-pruned") {
    val out = Bm25.topK(corpus(), corpus().where($"doc_id" === 0), "text", "doc_id", k = 5)
      .orderBy($"rank").collect()
    val ranked = out.map(r => (r.getLong(1), r.getDouble(2)))
    // docs with 'zebra' must outrank docs sharing only pruned 'common'
    assert(ranked.take(2).map(_._1).toSet == Set(1L, 2L), s"got ${ranked.toSeq}")
    // 'common' (df = 6/6 > 0.5 cap) contributes nothing: docs 3,4,5 share
    // no unpruned query term -> absent from results entirely
    assert(out.forall(r => Set(1L, 2L).contains(r.getLong(1))), s"got ${ranked.toSeq}")
  }

  test("without pruning, ubiquitous terms still score (sanity) and self is excluded") {
    val out = Bm25.topK(corpus(), corpus().where($"doc_id" === 0), "text", "doc_id",
      k = 10, maxDfFraction = None).collect()
    assert(out.length == 5, s"all 5 non-self docs score via 'common': ${out.length}")
    assert(!out.exists(_.getLong(1) == 0L), "query must not match itself")
  }

  test("higher tf saturates: doc with tf=2 beats tf=1, bounded by k1+1 factor") {
    val out = Bm25.topK(corpus(), corpus().where($"doc_id" === 0), "text", "doc_id", k = 2)
      .orderBy($"rank").collect()
    assert(out(0).getLong(1) == 1L, "tf=2 zebra doc must rank first")
    assert(out(0).getDouble(2) > out(1).getDouble(2))
    // saturation: doubling tf must not double the score
    assert(out(0).getDouble(2) < 2.0 * out(1).getDouble(2))
  }

  test("rounded scores are identical across partitionings") {
    def run(p: Int) = Bm25.topK(corpus().repartition(p),
        corpus().where($"doc_id" < 2), "text", "doc_id", k = 5)
      .orderBy($"query_id", $"rank").collect().map(_.toSeq)
    assert(run(2).toSeq == run(7).toSeq)
  }
}
