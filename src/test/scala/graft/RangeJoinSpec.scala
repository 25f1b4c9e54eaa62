package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._

/** Bucketed range join must be result-identical to the plain non-equi
  * join — bucketing is an execution detail, never visible in results.
  */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def points = (0 until 500).map(i => (i.toLong, (i % 97) * 0.53)).toDF("pid", "v")
  // overlapping, touching, and wide intervals; boundaries land exactly on
  // bucket edges (multiples of the 5.0 width) to exercise the edge cases
  private def intervals = Seq(
    (0L, 0.0, 5.0), (1L, 5.0, 10.0), (2L, 2.5, 12.5), (3L, 10.0, 10.0), // empty interval
    (4L, 0.0, 50.99), (5L, 49.0, 51.0), (6L, 20.0, 25.0)
  ).toDF("iid", "lo", "hi")

  test("bucketed equals plain non-equi join, incl. boundary and wide intervals") {
    val plain = points.join(intervals, $"v" >= $"lo" && $"v" < $"hi")
      .select($"pid", $"iid").as[(Long, Long)].collect().toSet
    val bucketed = RangeJoin.bucketed(points, intervals, "v", "lo", "hi", bucketWidth = 5.0)
      .select($"pid", $"iid").as[(Long, Long)].collect().toSet
    assert(bucketed == plain)
    assert(plain.nonEmpty)
  }

  test("randomized equivalence incl. negative values, several widths") {
    val rnd = new scala.util.Random(42)
    val pts = (0 until 300).map(i => (i.toLong, rnd.nextDouble() * 80 - 40)).toDF("pid", "v")
    val ivs = (0 until 40).map { i =>
      val lo = rnd.nextDouble() * 80 - 45
      (i.toLong, lo, lo + rnd.nextDouble() * 25)
    }.toDF("iid", "lo", "hi")
    val plain = pts.join(ivs, $"v" >= $"lo" && $"v" < $"hi")
      .select($"pid", $"iid").as[(Long, Long)].collect().toSet
    Seq(0.5, 3.0, 7.7, 100.0).foreach { w =>
      val bucketed = RangeJoin.bucketed(pts, ivs, "v", "lo", "hi", bucketWidth = w)
        .select($"pid", $"iid").as[(Long, Long)].collect().toSet
      assert(bucketed == plain, s"width=$w")
    }
  }

  test("broadcastIndexed equals plain non-equi join on disjoint intervals; plan has no nested loop") {
    val disjoint = Seq(
      (0L, 0.0, 5.0), (1L, 5.0, 10.0), (2L, 12.5, 20.0), (3L, 20.0, 25.0), (4L, 40.0, 51.0)
    ).toDF("iid", "lo", "hi")
    val plain = points.join(disjoint, $"v" >= $"lo" && $"v" < $"hi")
      .select($"pid", $"iid").as[(Long, Long)].collect().toSet
    val indexed = RangeJoin.broadcastIndexed(points, disjoint, "v", "lo", "hi")
    val got = indexed.select($"pid", $"iid").as[(Long, Long)].collect().toSet
    assert(got == plain && plain.nonEmpty)
    val plan = indexed.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.linesIterator.take(15).mkString("\n"))
    assert(plan.contains("BroadcastHashJoin"), plan.linesIterator.take(15).mkString("\n"))
  }

  test("broadcastIndexed rejects overlapping intervals") {
    val overlapping = Seq((0L, 0.0, 5.0), (1L, 2.5, 10.0)).toDF("iid", "lo", "hi")
    intercept[IllegalArgumentException](
      RangeJoin.broadcastIndexed(points, overlapping, "v", "lo", "hi").collect())
  }

  test("column collision is rejected") {
    intercept[IllegalArgumentException] {
      RangeJoin.bucketed(points.withColumnRenamed("v", "lo"), intervals, "lo", "lo", "hi", 5.0)
    }
  }
}
