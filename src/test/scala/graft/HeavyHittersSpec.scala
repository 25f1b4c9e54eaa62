package graft

import graft.text.HeavyHitters
import org.apache.spark.sql.functions._

import scala.util.Random

/** Exact heavy hitters: the Misra–Gries candidate pass must never lose a
  * true heavy hitter (superset guarantee), and the exact recount must
  * make the final answer identical to brute force — on skewed data,
  * adversarial partitionings, and thresholds at the guarantee boundary.
  */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def brute(items: Seq[String], theta: Double): Map[String, Long] = {
    val n = items.length.toLong
    items.groupBy(identity).view.mapValues(_.length.toLong)
      .filter { case (_, c) => c > theta * n }.toMap
  }

  private def run(items: Seq[String], theta: Double, parts: Int): Map[String, Long] =
    HeavyHitters.frequent(
      spark.createDataset(items).repartition(parts).toDF("x"), "x", theta)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("matches brute force on zipf-skewed random streams across thetas and partitionings") {
    val rnd = new Random(42)
    // zipf-ish: item k with weight 1/(k+1)
    val vocab = (0 until 200).map(i => s"w$i")
    val weights = vocab.indices.map(i => 1.0 / (i + 1))
    val cum = weights.scanLeft(0.0)(_ + _).tail
    val total = cum.last
    val items = Seq.fill(20000) {
      val u = rnd.nextDouble() * total
      vocab(cum.indexWhere(u <= _))
    }
    for (theta <- Seq(0.2, 0.05, 0.01); parts <- Seq(1, 7, 32))
      assert(run(items, theta, parts) == brute(items, theta), s"theta=$theta parts=$parts")
  }

  test("exact boundary: count == theta*n is excluded, one more is included") {
    // 100 items: 'a' x 10 (== 0.1*n, excluded), 'b' x 11 (included),
    // filler unique
    val items = Seq.fill(10)("a") ++ Seq.fill(11)("b") ++ (0 until 79).map(i => s"f$i")
    val got = run(items, 0.1, 5)
    assert(got == Map("b" -> 11L))
  }

  test("adversarial partitioning: a heavy hitter spread thin across partitions still surfaces") {
    // 'hot' is 12% globally but each partition also carries unique noise
    // that churns the MG counters
    val items = (0 until 4000).flatMap { i =>
      if (i % 8 == 0) Seq("hot") else Seq(s"noise_$i")
    }
    for (parts <- Seq(3, 16, 64))
      assert(run(items, 0.1, parts) == brute(items, 0.1), s"parts=$parts")
  }

  test("all-identical stream returns the single item with its exact count") {
    assert(run(Seq.fill(500)("only"), 0.5, 8) == Map("only" -> 500L))
  }

  test("empty input and null items") {
    assert(run(Nil, 0.1, 4) == Map.empty)
    val withNulls = spark.createDataset(Seq[String](null, null, "a", "a", "a", "b"))
      .toDF("x")
    // n counts non-null occurrences only: 4; a=3 > 0.5*4, b=1 not
    val got = HeavyHitters.frequent(withNulls, "x", 0.5)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 3L))
  }

  test("frequentPerKey matches per-key brute force with disjoint per-key distributions") {
    val rnd = new Random(7)
    // key A: heavy 'a0'; key B: heavy 'b0'+'b1'; key C: uniform (no hitters at 0.3)
    val items: Seq[(String, String)] =
      Seq.fill(3000)(("A", if (rnd.nextDouble() < 0.4) "a0" else s"a${rnd.nextInt(100) + 1}")) ++
        Seq.fill(2000)(("B", rnd.nextDouble() match {
          case d if d < 0.35 => "b0"
          case d if d < 0.68 => "b1"
          case _ => s"b${rnd.nextInt(200) + 2}"
        })) ++
        Seq.fill(1000)(("C", s"c${rnd.nextInt(50)}"))
    def bruteKey(theta: Double): Map[(String, String), Long] =
      items.groupBy(_._1).flatMap { case (k, g) =>
        val nk = g.length.toLong
        g.groupBy(_._2).view.mapValues(_.length.toLong)
          .filter { case (_, c) => c > theta * nk }
          .map { case (x, c) => (k, x) -> c }
      }
    for (theta <- Seq(0.3, 0.1); parts <- Seq(1, 16)) {
      val df = spark.createDataset(items).repartition(parts).toDF("k", "x")
      val got = HeavyHitters.frequentPerKey(df, "k", "x", theta)
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(got == bruteKey(theta), s"theta=$theta parts=$parts")
    }
  }

  test("frequentPerKey ignores null keys and items; thresholds are per-key, not global") {
    val items = Seq(
      (null, "x"), ("A", null),
      ("A", "hot"), ("A", "hot"), ("A", "hot"), ("A", "cold"),
      ("B", "b1"), ("B", "b2")) // B: each item 50%, theta 0.6 → none
    val df = spark.createDataset(items).toDF("k", "x")
    val got = HeavyHitters.frequentPerKey(df, "k", "x", 0.6)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // A has 4 non-null items; hot=3 > 0.6*4=2.4 — 'hot' only
    assert(got == Map(("A", "hot") -> 3L))
  }

  test("broadcast guard: past the candidate limit the recount routes to a shuffle semi-join, oracle-identical") {
    val rnd = new Random(11)
    // low theta + many partitions: the candidate surface (≤ parts·⌈1/θ⌉)
    // dwarfs the forced limit of 0, so the guard MUST take the routed arm
    val items = Seq.fill(8000)(s"t${rnd.nextInt(300)}")
    val df = spark.createDataset(items).repartition(32).toDF("x")
    val routed = HeavyHitters.frequent(df, "x", 0.01, broadcastLimit = 0L)
    val plan = routed.queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"),
      "routed shape missing:\n" + plan.linesIterator.take(30).mkString("\n"))
    assert(!plan.contains("BroadcastHashJoin"),
      "guarded plan still broadcasts:\n" + plan.linesIterator.take(30).mkString("\n"))
    val got = routed.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == brute(items, 0.01))
    // and the default limit keeps the broadcast plan for small candidates
    val bc = HeavyHitters.frequent(df, "x", 0.01)
    assert(bc.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
  }

  test("frequentPerKey broadcast guard routes both joins past the limit, oracle-identical") {
    val rnd = new Random(13)
    val items = Seq.fill(4000)((s"k${rnd.nextInt(40)}", s"v${rnd.nextInt(20)}"))
    def bruteKey(theta: Double): Map[(String, String), Long] =
      items.groupBy(_._1).flatMap { case (k, g) =>
        val nk = g.length.toLong
        g.groupBy(_._2).view.mapValues(_.length.toLong)
          .filter { case (_, c) => c > theta * nk }
          .map { case (x, c) => (k, x) -> c }
      }
    val df = spark.createDataset(items).repartition(16).toDF("k", "x")
    val routed = HeavyHitters.frequentPerKey(df, "k", "x", 0.1, broadcastLimit = 0L)
    val plan = routed.queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"),
      "routed shape missing:\n" + plan.linesIterator.take(40).mkString("\n"))
    assert(!plan.contains("BroadcastHashJoin"),
      "guarded plan still broadcasts:\n" + plan.linesIterator.take(40).mkString("\n"))
    val got = routed.collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == bruteKey(0.1))
  }

  test("frequentPerKey memory contract: repartitionByKey agrees with the direct route on high-cardinality keys × small partitions") {
    // 500 distinct keys over 64 small partitions — the regime the doc
    // warns about; the key-partitioned summary pass sees ~8 keys per
    // partition instead of all 500, and both routes must match brute force
    for (seed <- Seq(1, 2, 3)) {
      val rnd = new Random(seed)
      val items = Seq.fill(6000) {
        val k = s"k${rnd.nextInt(500)}"
        val x = if (rnd.nextDouble() < 0.5) "hot" else s"v${rnd.nextInt(30)}"
        (k, x)
      }
      val bruteKey: Map[(String, String), Long] =
        items.groupBy(_._1).flatMap { case (k, g) =>
          val nk = g.length.toLong
          g.groupBy(_._2).view.mapValues(_.length.toLong)
            .filter { case (_, c) => c > 0.3 * nk }
            .map { case (x, c) => (k, x) -> c }
        }
      val df = spark.createDataset(items).repartition(64).toDF("k", "x")
      def run(byKey: Boolean): Map[(String, String), Long] =
        HeavyHitters.frequentPerKey(df, "k", "x", 0.3, repartitionByKey = byKey)
          .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      val direct = run(byKey = false)
      val partitioned = run(byKey = true)
      assert(direct == bruteKey, s"seed=$seed direct route diverged")
      assert(partitioned == bruteKey, s"seed=$seed repartitionByKey route diverged")
    }
  }

  test("theta bounds fail fast") {
    val df = spark.createDataset(Seq("a")).toDF("x")
    intercept[IllegalArgumentException](HeavyHitters.frequent(df, "x", 0.0))
    intercept[IllegalArgumentException](HeavyHitters.frequent(df, "x", 1.0))
  }

  test("non-string column casts to string and keeps exact counts") {
    val df = spark.range(0, 1000).select((col("id") % 7).as("k"))
    val got = HeavyHitters.frequent(df, "k", 0.05)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // every residue occurs 142 or 143 times > 50
    assert(got.keySet == (0 until 7).map(_.toString).toSet)
    assert(got.values.sum == 1000L)
  }
}
