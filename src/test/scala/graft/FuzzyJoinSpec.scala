package graft

import graft.operators.FuzzyJoin
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private def naive(rows: Seq[(Long, String)], d: Int): Set[(Long, Long, Int)] = {
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        dp(i)(j) = math.min(
          math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
          dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      dp(a.length)(b.length)
    }
    (for {
      (ia, ka) <- rows; (ib, kb) <- rows if ia < ib
      dist = lev(ka, kb) if dist <= d
    } yield (ia, ib, dist)).toSet
  }

  test("blocked fuzzy join equals the naive cross join on random strings") {
    val gen = for {
      n <- Gen.choose(10, 40)
      keys <- Gen.listOfN(n, Gen.listOfN(6, Gen.oneOf("abc".toSeq)).map(_.mkString)
        .flatMap(s => Gen.choose(0, 3).map(cut => s.drop(cut)))) // varied lengths
    } yield keys
    (0 until 4).foreach { i =>
      val keys = gen.apply(Gen.Parameters.default, Seed(1234L + i)).get
      val rows = keys.zipWithIndex.map { case (k, idx) => (idx.toLong, k) }
      val df = rows.toDF("id", "key")
      (0 to 2).foreach { d =>
        val got = FuzzyJoin.selfJoin(df, "key", "id", d)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
        assert(got == naive(rows, d), s"seed=$i d=$d")
      }
    }
  }

  test("fuzzy pairs + label propagation = entity clusters") {
    // three true entities with typo variants
    val df = Seq(
      (1L, "acme corp"), (2L, "acme corp."), (3L, "acme korp"),
      (10L, "globex"), (11L, "globeks"),
      (20L, "initech")
    ).toDF("id", "name")
    val pairs = FuzzyJoin.selfJoin(df, "name", "id", maxDistance = 2)
      .withColumnRenamed("distance", "w")
      .select($"id_a", $"id_b", $"w")
    val reps = graft.dedup.Dedup.clusterRepresentatives(
      pairs.select($"id_a", $"id_b", $"w".cast("double").as("jaccard_sim")))
    val byRep = reps.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byRep(2L) == 1L && byRep(3L) == 1L)
    assert(byRep(11L) == 10L)
    assert(!byRep.contains(20L)) // singleton: no pairs, no cluster row
  }
}
