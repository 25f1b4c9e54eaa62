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

  test("df-pruned IDF joins the query terms BEFORE the posting fan-out (plan shape)") {
    import org.apache.spark.sql.catalyst.plans.logical.{Join => LJoin}
    val df = Bm25.topK(corpus(), corpus().where($"doc_id" === 0), "text", "doc_id", k = 5)
    val joins = df.queryExecution.optimizedPlan.collect { case j: LJoin => j }
    // the join that touches the postings (the only side carrying `tf`)
    // must see `idf` (and the query ids) already on its other side — the
    // stopword-pruned term set gates the fan-out, instead of the old
    // shape where (query x posting) exploded first and idf pruned after
    def names(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) =
      p.output.map(_.name).toSet
    val gated = joins.exists { j =>
      val (l, r) = (names(j.left), names(j.right))
      (l.contains("tf") && !l.contains("query_id") && r.contains("query_id") && r.contains("idf")) ||
        (r.contains("tf") && !r.contains("query_id") && l.contains("query_id") && l.contains("idf"))
    }
    assert(gated, s"posting fan-out is not idf-gated:\n${df.queryExecution.optimizedPlan}")
  }

  test("rounded scores are identical across partitionings") {
    def run(p: Int) = Bm25.topK(corpus().repartition(p),
        corpus().where($"doc_id" < 2), "text", "doc_id", k = 5)
      .orderBy($"query_id", $"rank").collect().map(_.toSeq)
    assert(run(2).toSeq == run(7).toSeq)
  }

  test("incremental merge == full rebuild (postings, df, stats, and scores)") {
    val old = corpus().where($"doc_id" % 2 === 0)
    val batch = corpus().where($"doc_id" % 2 === 1)
    val merged = Bm25.mergeIndex(
      Bm25.buildIndex(old, "text", "doc_id"),
      Bm25.buildIndex(batch, "text", "doc_id"))
    val full = Bm25.buildIndex(corpus(), "text", "doc_id")
    assert(merged.nDocs == full.nDocs && merged.sumLen == full.sumLen)
    assert(merged.dfTab.orderBy($"term").collect().toSeq ==
      full.dfTab.orderBy($"term").collect().toSeq)
    assert(merged.postings.orderBy($"doc_id", $"term").collect().toSeq ==
      full.postings.orderBy($"doc_id", $"term").collect().toSeq)
    val q = corpus().where($"doc_id" < 2)
    assert(
      Bm25.scoreTopK(merged, q, "text", "doc_id", k = 5)
        .orderBy($"query_id", $"rank").collect().toSeq ==
      Bm25.topK(corpus(), q, "text", "doc_id", k = 5)
        .orderBy($"query_id", $"rank").collect().toSeq)
  }

  test("merge of a vocabulary-disjoint segment keeps both vocabularies scoreable") {
    val extra = Seq((6L, "quokka quokka sighting report")).toDF("doc_id", "text")
    val merged = Bm25.mergeIndex(
      Bm25.buildIndex(corpus(), "text", "doc_id"),
      Bm25.buildIndex(extra, "text", "doc_id"))
    val q = Seq((100L, "zebra quokka")).toDF("doc_id", "text")
    val hit = Bm25.scoreTopK(merged, q, "text", "doc_id", k = 10)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(Set(1L, 2L, 6L).subsetOf(hit), s"got $hit")
  }
}
