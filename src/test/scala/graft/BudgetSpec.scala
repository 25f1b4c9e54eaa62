package graft

import graft.text.Budget
import org.apache.spark.sql.functions._

class BudgetSpec extends SparkSpec {
  import spark.implicits._

  // score-ordered: 10 (s=5), 11 (s=4), 12 (s=3), 13 (s=2), 14 (s=1)
  private def docs = Seq(
    (10L, 5.0, 4L), (11L, 4.0, 3L), (12L, 3.0, 6L), (13L, 2.0, 1L), (14L, 1.0, 2L)
  ).toDF("doc_id", "score", "toks")

  test("greedy prefix: budget cut is exact, crossing doc and everything after it drop") {
    // cum: 4, 7, 13, 14, 16 — budget 13 admits the first three exactly
    val out = Budget.tokenBudgetSelect(docs, "doc_id", $"score", $"toks", budget = 13L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(out.toSeq == Seq((10L, 4L, 4L), (11L, 3L, 7L), (12L, 6L, 13L)))
    // budget 12: doc 12 crosses (cum 13) and is dropped; doc 13 (cum 14)
    // stays dropped too — greedy prefix, not knapsack, even though its
    // 1 token would fit the remaining 5
    val tight = Budget.tokenBudgetSelect(docs, "doc_id", $"score", $"toks", budget = 12L)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(tight == Seq(10L, 11L))
  }

  test("tie-break on id, zero budget, and partition independence") {
    val tied = Seq((3L, 1.0, 2L), (1L, 1.0, 2L), (2L, 1.0, 2L)).toDF("doc_id", "score", "toks")
    // equal scores rank by ascending id: 1 (cum 2), 2 (cum 4), 3 (cum 6)
    val out = Budget.tokenBudgetSelect(tied, "doc_id", $"score", $"toks", budget = 4L)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(out == Seq(1L, 2L))
    assert(Budget.tokenBudgetSelect(docs, "doc_id", $"score", $"toks", budget = 0L).count() == 0)
    val spread = Budget.tokenBudgetSelect(docs.repartition(7), "doc_id", $"score", $"toks", budget = 13L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(spread.toSeq == Seq((10L, 4L, 4L), (11L, 3L, 7L), (12L, 6L, 13L)))
  }
}
