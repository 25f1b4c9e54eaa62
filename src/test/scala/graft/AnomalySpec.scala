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

  test("robustRateZ: median/MAD resists the spike that inflates the mean") {
    // counts [10, 10, 10, 12, 400]: med = 10, devs = [0,0,0,2,390],
    // MAD = 0 (median of sorted [0,0,0,2,390])... use [8,10,10,12,400]:
    // med 10, devs [2,0,0,2,390] sorted [0,0,2,2,390] → MAD 2,
    // z(400) = 390/(1.4826·2) = 131.5..., z(8) = -2/2.9652
    val rows =
      (0 until 8).map(_ => ("a", "2024-01-01 00:00:00")) ++
      (0 until 10).map(_ => ("a", "2024-01-02 00:00:00")) ++
      (0 until 10).map(_ => ("a", "2024-01-03 00:00:00")) ++
      (0 until 12).map(_ => ("a", "2024-01-04 00:00:00")) ++
      (0 until 400).map(_ => ("a", "2024-01-05 00:00:00"))
    val out = graft.operators.Anomaly.robustRateZ(ev(rows), "event_type", "ts", "day",
        zThreshold = 3.5)
      .orderBy($"bucket").collect()
    assert(out.map(_.getAs[Long]("n")).toSeq == Seq(8L, 10L, 10L, 12L, 400L))
    assert(out.forall(_.getAs[Double]("med") == 10.0))
    val z400 = out.last.getAs[Double]("z_robust")
    assert(z400 == 390.0 / (1.4826 * 2.0), s"got $z400")
    assert(out.last.getAs[Boolean]("is_anomaly"))
    assert(out.take(4).forall(!_.getAs[Boolean]("is_anomaly")))
    // the classic z on the same data: the spike inflates mean AND sigma —
    // z(400) ≈ 1.79, BELOW even a 1.8 threshold: the masking robust fixes
    val classic = graft.operators.Anomaly.rateZ(ev(rows), "event_type", "ts", "day",
        zThreshold = 1.8)
      .orderBy($"bucket").collect()
    assert(!classic.last.getAs[Boolean]("is_anomaly"),
      s"classic z ${classic.last.getAs[Double]("z")} unexpectedly over 1.8")
    // zero-MAD lane pinned: constant counts → z_robust 0
    val flat = (0 until 4).flatMap(d => (0 until 5).map(_ => ("b", s"2024-01-0${d + 1} 00:00:00")))
    val outF = graft.operators.Anomaly.robustRateZ(ev(flat), "event_type", "ts", "day")
      .collect()
    assert(outF.forall(r => r.getAs[Double]("z_robust") == 0.0 && !r.getAs[Boolean]("is_anomaly")))
  }

  test("rateZSeasonal: same-hour baseline catches what the flat baseline hides") {
    // hour 00: nine days of 2 events, then a 30-event burst on day 10;
    // hour 12: ten days of 100 events (the diurnal peak). The flat
    // baseline mixes 2s with 100s, so 30 reads as unremarkable; the
    // same-hour history [2×9, 30] puts it near z ≈ 2.85.
    val rows =
      (1 to 9).flatMap(d => (0 until 2).map(_ => ("a", f"2024-01-$d%02d 00:30:00"))) ++
      (0 until 30).map(_ => ("a", "2024-01-10 00:30:00")) ++
      (1 to 10).flatMap(d => (0 until 100).map(_ => ("a", f"2024-01-$d%02d 12:30:00")))
    val seasonal = graft.operators.Anomaly.rateZSeasonal(ev(rows), "event_type", "ts",
        zThreshold = 2.5)
      .orderBy($"bucket").collect()
    val burst = seasonal.find(r => r.getAs[Long]("n") == 30L).get
    // replicate the engine's exact op order
    val mu = 48.0 / 10.0
    val v = (936.0 - 48.0 * 48.0 / 10.0) / 9.0
    val zExpect = (30.0 - mu) / math.sqrt(v)
    assert(burst.getAs[Double]("z") == zExpect, s"got ${burst.getAs[Double]("z")}")
    assert(burst.getAs[Boolean]("is_anomaly") && burst.getAs[Long]("season") == 0L)
    // the peak hours are their own season: z small, never flagged
    assert(seasonal.filter(_.getAs[Long]("season") == 12L)
      .forall(!_.getAs[Boolean]("is_anomaly")))
    // the FLAT baseline misses the same burst at the same threshold
    val flat = graft.operators.Anomaly.rateZ(ev(rows), "event_type", "ts", "hour",
        zThreshold = 2.5)
      .collect().find(_.getAs[Long]("n") == 30L).get
    assert(!flat.getAs[Boolean]("is_anomaly"),
      s"flat z ${flat.getAs[Double]("z")} unexpectedly flagged")
  }

  test("rateTrend: exact slope on a linear ramp, degenerate single bucket") {
    // hourly counts [3, 5, 7, 9] → slope exactly 2.0 events/bucket
    val ramp = (0 until 4).flatMap(h =>
      (0 until 3 + 2 * h).map(_ => ("a", f"2024-01-01 $h%02d:00:00")))
    val single = Seq(("b", "2024-01-01 00:00:00"))
    val out = graft.operators.Anomaly.rateTrend(ev(ramp ++ single), "event_type", "ts", "hour")
      .orderBy($"event_type").collect()
    val a = out(0)
    assert(a.getAs[Long]("m") == 4L && a.getAs[Long]("total") == 24L)
    assert(a.getAs[Double]("slope") == 2.0, s"got ${a.getAs[Double]("slope")}")
    assert(out(1).getAs[Double]("slope") == 0.0 && out(1).getAs[Long]("m") == 1L)
    // closed-form agreement on an uneven series [10, 4, 7]:
    // m=3, sx=3, sy=21, sxy=0*10+1*4+2*7=18, sxx=5 → (54-63)/(15-9) = -1.5
    val uneven = (0 until 10).map(_ => ("c", "2024-01-01 00:00:00")) ++
      (0 until 4).map(_ => ("c", "2024-01-01 01:00:00")) ++
      (0 until 7).map(_ => ("c", "2024-01-01 02:00:00"))
    val u = graft.operators.Anomaly.rateTrend(ev(uneven), "event_type", "ts", "hour").head()
    assert(u.getAs[Double]("slope") == -1.5, s"got ${u.getAs[Double]("slope")}")
  }

  test("healthReport: composite matches its component lanes") {
    val rows =
      (0 until 8).map(_ => ("a", "2024-01-01 00:00:00")) ++
      (0 until 10).map(_ => ("a", "2024-01-01 01:00:00")) ++
      (0 until 40).map(_ => ("a", "2024-01-01 02:00:00")) ++
      Seq(("b", "2024-01-01 00:00:00"))
    val out = graft.operators.Anomaly.healthReport(ev(rows), "event_type", "ts", "hour",
        zThreshold = 1.0)
      .orderBy($"event_type").collect()
    val z = graft.operators.Anomaly.rateZ(ev(rows), "event_type", "ts", "hour", 1.0)
      .where($"event_type" === "a").collect()
    val t = graft.operators.Anomaly.rateTrend(ev(rows), "event_type", "ts", "hour")
      .where($"event_type" === "a").head()
    val a = out(0)
    assert(a.getAs[Long]("n_buckets") == 3L && a.getAs[Long]("total") == 58L)
    assert(a.getAs[Double]("max_abs_z") == z.map(r => math.abs(r.getAs[Double]("z"))).max)
    assert(a.getAs[Long]("n_anomalies") == z.count(_.getAs[Boolean]("is_anomaly")).toLong)
    assert(a.getAs[Double]("slope") == t.getAs[Double]("slope"))
    val b = out(1)
    assert(b.getAs[Long]("n_buckets") == 1L && b.getAs[Double]("slope") == 0.0 &&
      b.getAs[Double]("max_abs_z") == 0.0)
  }

  test("rateTrendRobust: Theil-Sen shrugs off the outlier that wrecks least squares") {
    // ramp [3,5,7,9] with a final corrupted bucket of 100: LSQ slope
    // reads 19.8; the pairwise-slope median stays exactly 2.0
    val counts = Seq(3, 5, 7, 9, 100)
    val rows = counts.zipWithIndex.flatMap { case (c, h) =>
      (0 until c).map(_ => ("a", f"2024-01-01 $h%02d:00:00")) }
    val ts = graft.operators.Anomaly.rateTrendRobust(ev(rows), "event_type", "ts", "hour")
      .head()
    assert(ts.getAs[Double]("slope_ts") == 2.0, s"got ${ts.getAs[Double]("slope_ts")}")
    assert(ts.getAs[Long]("m") == 5L && ts.getAs[Long]("total") == 124L)
    val lsq = graft.operators.Anomaly.rateTrend(ev(rows), "event_type", "ts", "hour").head()
    assert(math.abs(lsq.getAs[Double]("slope") - 2.0) > 3.0,
      s"LSQ ${lsq.getAs[Double]("slope")} unexpectedly robust")
    // single bucket pins 0; the quadratic guard fails fast with the count
    val one = graft.operators.Anomaly.rateTrendRobust(
      ev(Seq(("b", "2024-01-01 00:00:00"))), "event_type", "ts", "hour").head()
    assert(one.getAs[Double]("slope_ts") == 0.0)
    val ex = intercept[IllegalArgumentException] {
      graft.operators.Anomaly.rateTrendRobust(ev(rows), "event_type", "ts", "hour",
        maxBuckets = 3L)
    }
    assert(ex.getMessage.contains("maxBuckets"), ex.getMessage)
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
