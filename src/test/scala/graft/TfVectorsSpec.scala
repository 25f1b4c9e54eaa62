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
    val out = TfVectors.cosineTopK(docs, docs.where($"doc_id" === 0), "text", "doc_id", dim = 64, k = 3)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(out(1L) == 1.0)
    assert(!out.contains(2L)) // no shared bucket → no candidate at all
    assert(out(3L) > 0 && out(3L) < 1.0)
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
