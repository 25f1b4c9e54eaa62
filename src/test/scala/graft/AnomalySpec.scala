package graft

import graft.operators.Anomaly
import org.apache.spark.sql.functions._

/** Rate-anomaly laws: hand-computed exact z-scores, degenerate lanes,
  * partition invariance.
  */
class AnomalySpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: Seq[(String, String)]) =
    rows.toDF("event_type", "ts_s").select($"event_type", $"ts_s".cast("timestamp").as("ts"))

  test("hand-computed z: spike flagged, baseline not, degenerate lanes pinned") {
    // type a: hourly counts [10, 10, 10, 40] → m=4, S1=70, S2=1900,
    // mu=17.5, var=(1900-1225)/3=225, sigma=15, z = -0.5/-0.5/-0.5/1.5
    val a = (0 until 10).flatMap(i => Seq(
      ("a", "2024-01-01 00:10:00"), ("a", "2024-01-01 01:10:00"),
      ("a", "2024-01-01 02:10:00"))) ++
      (0 until 40).map(_ => ("a", "2024-01-01 03:10:00"))
    // type b: one bucket → z = 0; type c: constant counts → var 0 → z = 0
    val b = Seq(("b", "2024-01-01 00:30:00"))
    val c = Seq(("c", "2024-01-01 00:00:01"), ("c", "2024-01-01 01:00:01"))
    val out = Anomaly.rateZ(ev(a ++ b ++ c), "event_type", "ts", "hour", zThreshold = 1.4)
      .orderBy($"event_type", $"bucket").collect()
    val aRows = out.filter(_.getString(0) == "a")
    assert(aRows.map(_.getAs[Long]("n")).toSeq == Seq(10L, 10L, 10L, 40L))
    assert(aRows.map(_.getAs[Double]("z")).toSeq == Seq(-0.5, -0.5, -0.5, 1.5))
    assert(aRows.map(_.getAs[Boolean]("is_anomaly")).toSeq ==
      Seq(false, false, false, true))
    out.filter(r => r.getString(0) == "b" || r.getString(0) == "c").foreach { r =>
      assert(r.getAs[Double]("z") == 0.0 && !r.getAs[Boolean]("is_anomaly"), r.toString)
    }
  }

  test("partition-invariant: identical bits under repartitioning") {
    val rnd = new scala.util.Random(9)
    val rows = Seq.fill(500)((s"t${rnd.nextInt(4)}",
      f"2024-01-01 ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:00"))
    val x = Anomaly.rateZ(ev(rows), "event_type", "ts", "hour")
      .orderBy($"event_type", $"bucket").collect().map(_.toSeq).toSeq
    val y = Anomaly.rateZ(ev(rows).repartition(13), "event_type", "ts", "hour")
      .orderBy($"event_type", $"bucket").collect().map(_.toSeq).toSeq
    assert(x == y)
  }
}
