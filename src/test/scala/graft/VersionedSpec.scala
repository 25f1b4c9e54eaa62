package graft

import graft.sources.Versioned
import org.apache.spark.sql.functions._

class VersionedSpec extends SparkSpec {
  import spark.implicits._

  test("write assigns sequential versions; reads are by-version; diff classifies") {
    val base = java.nio.file.Files.createTempDirectory("versioned").toString + "/t"
    val v1 = Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v")
    val v2 = Seq((1, "a"), (2, "B"), (4, "d")).toDF("k", "v") // changed 2, removed 3, added 4
    assert(Versioned.versions(spark, base).isEmpty)
    assert(Versioned.write(v1, base) == 1)
    assert(Versioned.write(v2, base) == 2)
    assert(Versioned.versions(spark, base) == Seq(1, 2))
    assert(Versioned.read(spark, base, 1).orderBy($"k").collect().map(_.getString(1)).toSeq == Seq("a", "b", "c"))
    assert(Versioned.readLatest(spark, base).count() == 3)
    val d = Versioned.diff(spark, base, 1, 2, Seq("k"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(d == Map(1 -> "unchanged", 2 -> "changed", 3 -> "removed", 4 -> "added"))
  }

  test("concurrent-write guard: a version directory is never overwritten") {
    val base = java.nio.file.Files.createTempDirectory("versioned2").toString + "/t"
    val df = Seq((1, "a")).toDF("k", "v")
    Versioned.write(df, base)
    // simulate a racing writer that targets an existing version
    intercept[Exception](df.write.mode("errorifexists").parquet(s"$base/v=1"))
  }
}
