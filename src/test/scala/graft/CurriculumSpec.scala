package graft

import graft.text.Curriculum
import org.apache.spark.sql.functions._

class CurriculumSpec extends SparkSpec {
  import spark.implicits._

  private def docs(n: Int) =
    (1 to n).map(i => (i.toLong, (i * 37 % n) + 1)).toDF("id", "difficulty")

  test("qualityBuckets matches the SQL ntile size contract") {
    // n = 10, b = 4: first 10 % 4 = 2 buckets take 3 rows, the rest 2
    val sizes = Curriculum.qualityBuckets(docs(10), "id", col("difficulty"), nBuckets = 4)
      .groupBy($"bucket").count().orderBy($"bucket").collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(sizes == Seq((1, 3L), (2, 3L), (3, 2L), (4, 2L)))
    // bucket order follows the score order: the 3 smallest difficulties land in bucket 1
    val byBucket = Curriculum.qualityBuckets(docs(10), "id", col("difficulty"), nBuckets = 4)
      .join(docs(10), "id").groupBy($"bucket").agg(max($"difficulty").as("mx"), min($"difficulty").as("mn"))
      .orderBy($"bucket").collect().map(r => (r.getInt(1), r.getInt(2)))
    assert(byBucket.sliding(2).forall { case Array((mxA, _), (_, mnB)) => mxA <= mnB; case _ => true },
      s"buckets must be score-contiguous: ${byBucket.toSeq}")
  }

  test("qualityBuckets degenerate n < b: rank is bucket") {
    val out = Curriculum.qualityBuckets(docs(3), "id", col("difficulty"), nBuckets = 8)
      .collect().map(_.getInt(1)).sorted.toSeq
    assert(out == Seq(1, 2, 3))
  }

  test("epochOrder: widening schedule, contiguous positions, determinism under repartition") {
    val d = docs(40)
    val out = Curriculum.epochOrder(d, "id", col("difficulty"), nBuckets = 8, epochs = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    val byEpoch = out.groupBy(_._3).view.mapValues(_.map(_._1).toSet).toMap
    // easy-to-hard: each epoch's admitted set contains the previous epoch's
    (1 to 3).foreach { e =>
      assert(byEpoch(e).subsetOf(byEpoch(e + 1)), s"epoch $e not a subset of ${e + 1}")
    }
    // last epoch admits everything
    assert(byEpoch(4) == (1 to 40).map(_.toLong).toSet)
    // admitted sets honor the bucket schedule: epoch e -> ceil(e*8/4) = 2e buckets
    val buckets = Curriculum.qualityBuckets(d, "id", col("difficulty"), nBuckets = 8)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    out.foreach { case (id, b, e, _) =>
      assert(b == buckets(id) && b <= 2 * e, s"doc $id bucket $b admitted in epoch $e")
    }
    // positions are contiguous 1..n_e within each epoch
    out.groupBy(_._3).foreach { case (e, rows) =>
      assert(rows.map(_._4).sorted.toSeq == (1L to rows.length).toSeq, s"epoch $e positions not contiguous")
    }
    // pure function of (ids, scores, b, epochs): partitioning must not matter
    val again = Curriculum.epochOrder(d.repartition(7), "id", col("difficulty"), nBuckets = 8, epochs = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    assert(out.sortBy(t => (t._3, t._4)).toSeq == again.sortBy(t => (t._3, t._4)).toSeq)
  }

  test("epochOrder: different epochs get different permutations of the shared admitted set") {
    val out = Curriculum.epochOrder(docs(40), "id", col("difficulty"), nBuckets = 2, epochs = 2)
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getLong(3)))
    // epochs = buckets/1 step: epoch 1 admits bucket 1 (20 docs), epoch 2 all 40
    val e1 = out.filter(_._2 == 1).sortBy(_._3).map(_._1).toSeq
    val e2 = out.filter(_._2 == 2).sortBy(_._3).map(_._1).filter(e1.contains).toSeq
    assert(e1.toSet == e2.toSet && e1 != e2,
      "epoch salt must reshuffle the shared docs, not repeat the order")
  }
}
