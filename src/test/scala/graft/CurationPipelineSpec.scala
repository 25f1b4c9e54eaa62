package graft

import graft.dedup.CurationPipeline
import org.apache.spark.sql.functions._

class CurationPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("stages shrink monotonically and drop the planted garbage + dups") {
    val good =
      "the quick brown fox jumps over the lazy dog while the cat sleeps on the warm mat near the open door of the old house and the wind blows through the tall trees in the quiet garden outside the village"
    val docs = Seq(
      (0L, good),
      (1L, good), // exact dup of 0
      (2L, good.replace("warm", "cold")), // near dup of 0
      (3L, "@@@@ #### !!!! %%%%"), // garbage → quality gate
      (4L, "spark engines shuffle data across partitions with hash exchanges and the sort merge joins at scale work well for the large tables in the cluster")
    ).toDF("doc_id", "text")

    val r = CurationPipeline.run(docs, "text", "doc_id", minQuality = 0.5, nearThreshold = 0.5, collectStats = true)
    val c = r.counts
    assert(c.input == 5)
    assert(c.afterQuality == 4) // garbage dropped
    assert(c.afterExact == 3)   // exact dup dropped
    assert(c.afterNear == 2)    // near dup dropped
    assert(c.input >= c.afterQuality && c.afterQuality >= c.afterLang &&
      c.afterLang >= c.afterExact && c.afterExact >= c.afterNear)
    val ids = r.survivors.select($"doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(0L, 4L))
  }

  test("pipeline runs on the documents table") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val r = CurationPipeline.run(docs, "text", "doc_id", minQuality = 0.3, nearThreshold = 0.6)
    val n = r.survivors.count()
    assert(n > 0 && n <= docs.count())
  }
}
