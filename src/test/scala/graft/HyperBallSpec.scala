package graft

import graft.expressions.Hll
import graft.text.HyperBall
import org.apache.spark.sql.functions._

/** HyperBall vs a brute-force replay: exact BFS ball in Scala →
  * elementwise-max of member registers → the identical raw estimate.
  * Proves the iterated max-merge equals the true-ball register state
  * (idempotence) and that results are partition-invariant.
  */
class HyperBallSpec extends SparkSpec {
  import spark.implicits._

  private def ball(adj: Map[Long, Seq[Long]], root: Long, hops: Int): Set[Long] = {
    var reached = Set(root)
    var frontier = Set(root)
    for (_ <- 1 to hops) {
      frontier = frontier.flatMap(v => adj.getOrElse(v, Nil)).diff(reached)
      reached ++= frontier
    }
    reached
  }

  private def bruteEstimate(members: Set[Long]): (Double, Int) = {
    val regs = new Array[Int](Hll.M)
    for (m <- members; (r, j) <- Hll.initRegisters(m).zipWithIndex)
      if (r > regs(j)) regs(j) = r
    var s = 0.0
    var z = 0
    for (j <- 0 until Hll.M) {
      s += 1.0 / (1L << regs(j)).toDouble
      if (regs(j) == 0) z += 1
    }
    (0.709 * 4096.0 / s, z)
  }

  test("estimates equal the brute-force exact-ball replay on a random graph") {
    val rnd = new scala.util.Random(5)
    val nodes = (0L until 40L)
    val pairs = Seq.fill(120)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter(p => p._1 != p._2).distinct
    val adj = pairs.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val out = HyperBall.neighborhoodEstimate(
        nodes.toDF("id"), "id", pairs.toDF("src", "dst"), maxHops = 3)
      .orderBy($"id").collect()
    for (r <- out) {
      val id = r.getLong(0)
      val (e, z) = bruteEstimate(ball(adj, id, 3))
      assert(r.getDouble(1) == e, s"node $id: est ${r.getDouble(1)} != $e")
      assert(r.getInt(2) == z, s"node $id: n_zero")
    }
    // isolated node: singleton ball, estimate of a one-element set
    val (e1, z1) = bruteEstimate(Set(99L))
    val solo = HyperBall.neighborhoodEstimate(
      Seq(99L).toDF("id"), "id", pairs.toDF("src", "dst"), maxHops = 2).collect()
    assert(solo(0).getDouble(1) == e1 && solo(0).getInt(2) == z1)
  }

  test("bit-identical across partitionings; estimate grows with the ball") {
    val rnd = new scala.util.Random(9)
    val pairs = Seq.fill(150)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter(p => p._1 != p._2).distinct
    val n = (0L until 30L).toDF("id")
    val e = pairs.toDF("src", "dst")
    val a = HyperBall.neighborhoodEstimate(n, "id", e, 3)
      .orderBy($"id").collect().map(_.toSeq).toSeq
    val b = HyperBall.neighborhoodEstimate(n.repartition(7), "id", e.repartition(5), 3)
      .orderBy($"id").collect().map(_.toSeq).toSeq
    assert(a == b, "HyperBall must be partition-invariant")
    // more hops never shrinks a ball: n_zero never grows, est never drops
    val h1 = HyperBall.neighborhoodEstimate(n, "id", e, 1)
      .orderBy($"id").collect()
    val h3 = HyperBall.neighborhoodEstimate(n, "id", e, 3)
      .orderBy($"id").collect()
    for ((r1, r3) <- h1.zip(h3)) {
      assert(r3.getDouble(1) >= r1.getDouble(1))
      assert(r3.getInt(2) <= r1.getInt(2))
    }
  }

  test("neighborhoodFunction: per-hop estimates match per-hop balls; harmonic is the pinned fold") {
    val rnd = new scala.util.Random(3)
    val pairs = Seq.fill(80)((rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
      .filter(p => p._1 != p._2).distinct
    val adj = pairs.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val out = HyperBall.neighborhoodFunction(
        (0L until 25L).toDF("id"), "id", pairs.toDF("src", "dst"), maxHops = 3)
      .orderBy($"id").collect()
    for (r <- out) {
      val id = r.getLong(0)
      val ests = (1 to 3).map(d => bruteEstimate(ball(adj, id, d))._1)
      assert((1 to 3).forall(d => r.getDouble(d) == ests(d - 1)),
        s"node $id per-hop: ${(1 to 3).map(r.getDouble)} vs $ests")
      val e0 = bruteEstimate(Set(id))._1
      val expect = ((ests(0) - e0) / 1.0 + (ests(1) - ests(0)) / 2.0) + (ests(2) - ests(1)) / 3.0
      assert(r.getDouble(4) == expect, s"node $id harmonic")
    }
  }

  test("distanceDistribution: fixed-point sums match the brute per-node fold, invariant") {
    val rnd = new scala.util.Random(5)
    val pairs = Seq.fill(70)((rnd.nextInt(20).toLong, rnd.nextInt(20).toLong))
      .filter(p => p._1 != p._2).distinct
    val adj = pairs.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val n = (0L until 20L).toDF("id")
    val out = HyperBall.distanceDistribution(n, "id", pairs.toDF("src", "dst"),
        maxHops = 3, q = 0.9)
      .orderBy($"hop").collect()
    assert(out.length == 4)
    // expected fixed-point sums from the brute per-node estimates
    val expected = (0 to 3).map { d =>
      (0L until 20L).map { id =>
        math.floor(bruteEstimate(ball(adj, id, d))._1 * 1048576.0).toLong
      }.sum
    }
    assert(out.map(_.getAs[Long]("nf_fp")).toSeq == expected,
      s"${out.map(_.getAs[Long]("nf_fp")).toSeq} vs $expected")
    // monotone, last frac exactly 1.0 and flagged
    assert(out.map(_.getAs[Long]("nf_fp")).sliding(2).forall(p => p(0) <= p(1)))
    assert(out.last.getAs[Double]("frac") == 1.0 && out.last.getAs[Boolean]("reaches_q"))
    // partition invariance of the exact longs
    val out2 = HyperBall.distanceDistribution(n.repartition(7), "id",
        pairs.toDF("src", "dst").repartition(3), maxHops = 3, q = 0.9)
      .orderBy($"hop").collect().map(_.toSeq).toSeq
    assert(out2 == out.map(_.toSeq).toSeq)
  }

  test("estimator accuracy stays within the m=64 error regime on a 200-ball") {
    // one hub connected to 199 leaves: ball(hub, 1) has 200 members
    val pairs = (1L to 199L).map(i => (0L, i))
    val n = (0L to 199L).toDF("id")
    val out = HyperBall.neighborhoodEstimate(n, "id", pairs.toDF("src", "dst"), 1)
      .where($"id" === 0).collect()
    val est = out(0).getDouble(1)
    // raw HLL at m=64: ~13% standard error; allow 3 sigma
    assert(est > 200 * 0.6 && est < 200 * 1.5, s"est $est vs true 200")
  }
}
