package graft

import graft.similarity.Pca
import org.apache.spark.sql.functions._

class PcaSpec extends SparkSpec {
  import spark.implicits._

  // data stretched along a known direction (3, 1)/√10 in 2-d, plus noise
  // in the orthogonal direction at 1/10 the scale
  private def corpus() = {
    val dir = Array(3.0 / math.sqrt(10.0), 1.0 / math.sqrt(10.0))
    val ort = Array(-dir(1), dir(0))
    (0L until 50L).map { i =>
      val a = math.sin(i * 0.7) * 10.0
      val b = math.cos(i * 1.3)
      (i, Array((a * dir(0) + b * ort(0)).toFloat, (a * dir(1) + b * ort(1)).toFloat))
    }.toDF("id", "vec")
  }

  test("power iteration recovers the dominant direction") {
    val (mu, pc) = Pca.fit(corpus(), "vec", "id", iters = 8)
    assert(mu.length == 2 && pc.length == 2)
    val want = Array(3.0 / math.sqrt(10.0), 1.0 / math.sqrt(10.0))
    val cos = math.abs(pc(0) * want(0) + pc(1) * want(1))
    assert(cos > 0.999, s"pc=${pc.toSeq} not aligned with ${want.toSeq} (|cos|=$cos)")
    // unit norm
    assert(math.abs(pc(0) * pc(0) + pc(1) * pc(1) - 1.0) < 1e-12)
  }

  test("projections are centered: scores sum to ~0") {
    val (mu, pc) = Pca.fit(corpus(), "vec", "id", iters = 4)
    val s = Pca.project(corpus(), "vec", "id", mu, pc)
      .agg(sum($"pc_score")).head().getDouble(0)
    assert(math.abs(s) < 1e-9, s"centered projections must sum to 0, got $s")
  }

  test("fit is bit-identical across partitionings") {
    val a = Pca.fit(corpus().repartition(3), "vec", "id", iters = 3)
    val b = Pca.fit(corpus().repartition(17), "vec", "id", iters = 3)
    assert(a._1.toSeq == b._1.toSeq, "means differ across partitionings")
    assert(a._2.toSeq == b._2.toSeq, "components differ across partitionings")
  }

  test("degenerate corpus fails with a clear message") {
    val flat = Seq((0L, Array(1.0f, 2.0f)), (1L, Array(1.0f, 2.0f))).toDF("id", "vec")
    val e = intercept[IllegalArgumentException] {
      Pca.fit(flat, "vec", "id", iters = 1)
    }
    assert(e.getMessage.contains("zero-variance"))
  }
}
