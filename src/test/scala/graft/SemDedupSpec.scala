package graft

import graft.dedup.SemDedup
import org.apache.spark.sql.functions._

class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  // well-separated synthetic clusters in 4-d with planted near-dups
  private def corpus() = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
    (1L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
    (2L, Array(0.99f, 0.01f, 0.0f, 0.0f)),  // near-dup of 0
    (3L, Array(0.0f, 0.98f, 0.02f, 0.0f)),  // near-dup of 1
    (4L, Array(-1.0f, 0.0f, 0.0f, 0.0f)),   // opposite — never a dup
    (5L, Array(1.0f, 0.001f, 0.0f, 0.0f))   // near-dup of 0 and 2
  ).toDF("id", "vec")

  test("kmeans: k lowest ids seed; Lloyd step moves centroids to member means") {
    val cents0 = SemDedup.kmeansDeterministic(corpus(), "vec", "id", k = 2, iters = 0)
    assert(cents0.length == 2)
    assert(cents0(0).toSeq == Seq(1.0, 0.0, 0.0, 0.0))
    assert(cents0(1).toSeq == Seq(0.0, 1.0, 0.0, 0.0))
    val cents1 = SemDedup.kmeansDeterministic(corpus(), "vec", "id", k = 2, iters = 1)
    // cluster 0 members under seed assignment: ids 0, 2, 5 (4 is closer to seed 0
    // than seed 1? d2(4,s0)=4, d2(4,s1)=2 -> cluster 1); cluster 1: 1, 3, 4
    val exp0 = Seq(
      (1.0 + 0.99f.toDouble + 1.0) / 3,
      (0.0 + 0.01f.toDouble + 0.001f.toDouble) / 3, 0.0, 0.0)
    assert(cents1(0).zip(exp0).forall { case (a, b) => math.abs(a - b) < 1e-12 },
      s"${cents1(0).toSeq} vs $exp0")
  }

  test("semDedup: lowest id survives, near-dups drop, opposites survive") {
    val out = SemDedup.semDedup(corpus(), "id", "vec", k = 2, iters = 1, tau = 0.95)
      .orderBy($"id").collect()
    val kept = out.filter(_.getBoolean(2)).map(_.getLong(0)).toSet
    val dropped = out.filter(!_.getBoolean(2)).map(_.getLong(0)).toSet
    assert(kept.contains(0L) && kept.contains(1L) && kept.contains(4L), s"kept=$kept")
    assert(dropped == Set(2L, 3L, 5L), s"dropped=$dropped")
  }

  test("semDedupSurvivors returns the kept corpus rows") {
    val surv = SemDedup.semDedupSurvivors(corpus(), "id", "vec", k = 2, iters = 1, tau = 0.95)
      .select($"id").as[Long].collect().sorted
    assert(surv.toSeq == Seq(0L, 1L, 4L))
  }

  test("pruning is intra-cluster only: cross-cluster near-dups are NOT compared") {
    // two near-identical vectors seeded as the 2 centroids: each anchors its
    // own cluster, so the pair is never compared (the SemDeDup trade-off)
    val df = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.999f, 0.001f)),
      (2L, Array(0.7f, 0.7f))  // cosine ~0.71 to both — below tau
    ).toDF("id", "vec")
    val out = SemDedup.semDedup(df, "id", "vec", k = 2, iters = 0, tau = 0.95)
      .orderBy($"id").collect()
    val clusters = out.map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(clusters(0L) != clusters(1L), "seeds must anchor distinct clusters")
    assert(out.forall(_.getBoolean(2)), "cross-cluster pair must not be pruned")
  }

  test("verdict is bit-identical across partitionings") {
    val big = (0L until 60L).map { i =>
      (i, Array.tabulate(8)(t => (math.sin(i * 0.37 + t) + (if (i % 7 == 0) 0.0 else t * 0.1)).toFloat))
    }
    val a = SemDedup.semDedup(big.toDF("id", "vec").repartition(3), "id", "vec", k = 4, iters = 2, tau = 0.9)
      .orderBy($"id").collect().map(_.toSeq)
    val b = SemDedup.semDedup(big.toDF("id", "vec").repartition(17), "id", "vec", k = 4, iters = 2, tau = 0.9)
      .orderBy($"id").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }
}
