package graft

import graft.text.TfVectors
import org.apache.spark.sql.functions._

class TfVectorsSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "alpha beta gamma alpha"),
    (1L, "alpha beta gamma alpha"), // identical to 0
    (2L, "delta epsilon zeta eta"), // disjoint from 0
    (3L, "alpha beta delta zeta") // partial overlap
  ).toDF("doc_id", "text")

  test("identical docs have cosine 1, disjoint docs produce no pair") {
    // pruning off: this asserts the exact unpruned cosine on a 4-doc corpus
    val out = TfVectors.cosineTopK(docs, docs.where($"doc_id" === 0), "text", "doc_id",
        dim = 64, k = 3, maxDfFraction = None)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(out(1L) == 1.0)
    assert(!out.contains(2L)) // no shared bucket → no candidate at all
    assert(out(3L) > 0 && out(3L) < 1.0)
  }

  test("default df-pruning is on and equals the explicit absolute cap") {
    // 20 docs: "common" appears in all 20 (df=20, pruned at the default
    // cap max(1, floor(20*0.1)) = 2), pair-tokens shared by exactly 2
    // docs survive; unique tokens keep the norms honest.
    val many = spark.range(20).selectExpr(
      "id AS doc_id",
      "concat('common tok', CAST(id AS STRING), ' pair', CAST(id % 10 AS STRING)) AS text")
    val q = many.where($"doc_id" < 3)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val byDefault = key(TfVectors.cosineTopK(many, q, "text", "doc_id", dim = 4096, k = 5))
    val byCap = key(TfVectors.cosineTopK(many, q, "text", "doc_id", dim = 4096, k = 5,
      maxDf = Some(2L), maxDfFraction = None))
    val unpruned = key(TfVectors.cosineTopK(many, q, "text", "doc_id", dim = 4096, k = 5,
      maxDfFraction = None))
    assert(byDefault == byCap)
    assert(byDefault != unpruned) // "common" really was dropped
    // pair partner (i, i+10) is still each query's top neighbor post-pruning
    assert(byDefault.filter(_._4 == 1L).forall(t => t._2 == t._1 + 10))
  }

  test("fused TermBucketTfs kernel ≡ relational bucketCounts, incl. n2 and hot exclusion") {
    val rel = TfVectors.bucketCounts(docs, "text", "doc_id", dim = 64, n = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val fused = docs
      .select($"doc_id", TfVectors.termVector($"text", 2, 64).as("v"))
      .select($"doc_id", $"v.n2".as("n2"), explode($"v.pairs").as("p"))
      .select($"doc_id", $"n2", $"p.bucket", $"p.tf")
      .collect()
    assert(fused.map(r => (r.getLong(0), r.getInt(2), r.getLong(3))).toSet == rel)
    // n2 = Σ tf² per doc
    val n2ByDoc = fused.map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = fused.groupBy(_.getLong(0)).view.mapValues(_.map(r => r.getLong(3) * r.getLong(3)).sum)
    expected.foreach { case (id, n2) => assert(n2ByDoc(id) == n2) }
    // hot exclusion drops the bucket AND its n2 contribution
    val someBucket = fused.head.getInt(2)
    val pruned = docs
      .select($"doc_id", TfVectors.termVector($"text", 2, 64, Seq(someBucket)).as("v"))
      .select($"doc_id", $"v.n2".as("n2"), explode($"v.pairs").as("p"))
      .select($"doc_id", $"n2", $"p.bucket", $"p.tf")
      .collect()
    assert(!pruned.exists(_.getInt(2) == someBucket))
    pruned.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      assert(rows.head.getLong(1) == rows.map(r => r.getLong(3) * r.getLong(3)).sum)
    }
  }

  test("hot bucket ids outside [0, dim) fail at construction, not in executor eval (ADVICE r3)") {
    val e = org.apache.spark.sql.graftbridge.Bridge.expression(lit("x"))
    intercept[IllegalArgumentException] {
      graft.expressions.TermBucketTfs(e, 1, 64, Seq(64))
    }
    intercept[IllegalArgumentException] {
      graft.expressions.TermBucketTfs(e, 1, 64, Seq(-1))
    }
  }

  test("maxDf prunes ubiquitous buckets") {
    val spam = docs.withColumn("text", concat(lit("common "), $"text")) // "common" in every doc
    val counts = TfVectors.bucketCounts(spam, "text", "doc_id", dim = 64, maxDf = Some(3L))
    val commonBucket = TfVectors.bucketCounts(spam.limit(1), "text", "doc_id", dim = 64)
      .join(TfVectors.bucketCounts(spam, "text", "doc_id", dim = 64)
        .groupBy($"bucket").agg(count(lit(1)).as("df")).where($"df" === 4), "bucket")
      .select($"bucket").collect().map(_.getInt(0)).toSet
    assert(commonBucket.nonEmpty)
    val kept = counts.select($"bucket").distinct().collect().map(_.getInt(0)).toSet
    assert(commonBucket.forall(b => !kept.contains(b)))
  }
}
