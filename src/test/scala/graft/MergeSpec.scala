package graft

import graft.operators.Merge
import org.apache.spark.sql.functions._

class MergeSpec extends SparkSpec {
  import spark.implicits._

  private def snap = Seq((1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)).toDF("k", "name", "v")

  test("upsert: source wins, unmatched target survives, column order kept") {
    val source = Seq((2, "B", 99.0), (4, "d", 40.0)).toDF("k", "name", "v")
    val out = Merge.upsert(snap, source, Seq("k")).orderBy($"k").collect()
    assert(out.map(r => (r.getInt(0), r.getString(1), r.getDouble(2))).toSeq ==
      Seq((1, "a", 10.0), (2, "B", 99.0), (3, "c", 30.0), (4, "d", 40.0)))
  }

  test("upsert with mismatched schema rejected") {
    val bad = Seq((1, "x")).toDF("k", "name")
    intercept[IllegalArgumentException](Merge.upsert(snap, bad, Seq("k")))
  }

  test("applyChangelog: latest seq wins per key, D deletes, U upserts") {
    val changes = Seq(
      (1, "a2", 11.0, "U", 1L),
      (1, "a3", 12.0, "U", 2L), // later update wins
      (2, "b", 20.0, "D", 1L), // delete
      (3, "c2", 31.0, "D", 1L),
      (3, "c3", 32.0, "U", 2L), // delete then re-insert: latest is U
      (4, "d", 40.0, "U", 1L) // brand-new key
    ).toDF("k", "name", "v", "op", "seq")
    val out = Merge.applyChangelog(snap, changes, Seq("k"), "seq", "op")
      .orderBy($"k").collect()
    assert(out.map(r => (r.getInt(0), r.getString(1), r.getDouble(2))).toSeq ==
      Seq((1, "a3", 12.0), (3, "c3", 32.0), (4, "d", 40.0)))
  }

  test("applyChangelog: empty changelog is identity") {
    val empty = Seq.empty[(Int, String, Double, String, Long)].toDF("k", "name", "v", "op", "seq")
    val out = Merge.applyChangelog(snap, empty, Seq("k"), "seq", "op")
    assert(out.orderBy($"k").collect().toSeq == snap.orderBy($"k").collect().toSeq)
  }

  test("applyChangelog is idempotent (re-applying the same compacted log)") {
    val changes = Seq((1, "a2", 11.0, "U", 5L), (2, "b", 20.0, "D", 5L)).toDF("k", "name", "v", "op", "seq")
    val once = Merge.applyChangelog(snap, changes, Seq("k"), "seq", "op")
    val twice = Merge.applyChangelog(once, changes, Seq("k"), "seq", "op")
    assert(once.orderBy($"k").collect().toSeq == twice.orderBy($"k").collect().toSeq)
  }
}
