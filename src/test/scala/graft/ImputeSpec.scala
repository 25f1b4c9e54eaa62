package graft

import graft.operators.Impute
import org.apache.spark.sql.functions._

class ImputeSpec extends SparkSpec {
  import spark.implicits._

  private def ts = Seq(
    ("a", 1, None), // leading null: no prior value
    ("a", 2, Some(10.0)),
    ("a", 3, None), // → 10.0
    ("a", 4, None), // → 10.0
    ("a", 5, Some(20.0)),
    ("b", 1, None), // all-null partition
    ("b", 2, None)
  ).toDF("k", "t", "v")

  test("forwardFill carries last observation; leading nulls stay null") {
    val out = Impute.forwardFill(ts, Seq("k"), "t", Seq("v"))
      .orderBy($"k", $"t").collect()
      .map(r => (r.getString(0), if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    assert(out.toSeq == Seq(
      ("a", None), ("a", Some(10.0)), ("a", Some(10.0)), ("a", Some(10.0)), ("a", Some(20.0)),
      ("b", None), ("b", None)))
  }

  test("backwardFill takes next observation; trailing nulls stay null") {
    val out = Impute.backwardFill(ts, Seq("k"), "t", Seq("v"))
      .orderBy($"k", $"t").collect()
      .map(r => if (r.isNullAt(2)) None else Some(r.getDouble(2)))
    assert(out.toSeq == Seq(
      Some(10.0), Some(10.0), Some(20.0), Some(20.0), Some(20.0), None, None))
  }

  test("meanFill fills with partition mean; all-null partitions stay null") {
    val out = Impute.meanFill(ts, Seq("k"), Seq("v"))
      .orderBy($"k", $"t").collect()
      .map(r => if (r.isNullAt(2)) None else Some(r.getDouble(2)))
    assert(out.take(5).toSeq == Seq(Some(15.0), Some(10.0), Some(15.0), Some(15.0), Some(20.0)))
    assert(out.drop(5).forall(_.isEmpty))
  }
}
