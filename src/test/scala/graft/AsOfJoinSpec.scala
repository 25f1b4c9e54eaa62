package graft

import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def trades = Seq(
    ("A", 1L, 100), ("A", 5L, 101), ("A", 10L, 102),
    ("B", 3L, 200)
  ).toDF("sym", "t", "qty")

  private def quotes = Seq(
    ("A", 0L, 9.9, 1), ("A", 5L, 10.5, 2), ("A", 9L, 10.9, 3),
    ("B", 4L, 20.0, 4)
  ).toDF("sym", "t", "px", "qid")

  test("backward inclusive: latest quote at or before each trade") {
    val out = AsOfJoin.backward(trades, quotes, Seq("sym"), "t", "t", Seq("px", "qid"))
      .orderBy($"sym", $"t").collect()
    // A@1 → quote@0; A@5 → quote@5 (inclusive); A@10 → quote@9; B@3 → none
    assert(out(0).getAs[Double]("asof_px") == 9.9)
    assert(out(1).getAs[Double]("asof_px") == 10.5)
    assert(out(2).getAs[Double]("asof_px") == 10.9)
    assert(out(3).isNullAt(out(3).fieldIndex("asof_px")))
    // both value columns come from the SAME right row
    assert(out(1).getAs[Int]("asof_qid") == 2)
  }

  test("backward strict: equal timestamps excluded") {
    val out = AsOfJoin.backward(trades, quotes, Seq("sym"), "t", "t", Seq("px"), strict = true)
      .orderBy($"sym", $"t").collect()
    assert(out(1).getAs[Double]("asof_px") == 9.9) // A@5 strict → quote@0, not @5
  }

  test("left columns fully preserved") {
    val out = AsOfJoin.backward(trades, quotes, Seq("sym"), "t", "t", Seq("px"))
    assert(out.columns.toSeq == Seq("sym", "t", "qty", "asof_px"))
    assert(out.count() == 4)
  }
}
