package graft

import graft.operators.Anomaly
import graft.streaming.StreamingAnomaly
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming rate monitoring: per-batch integer deltas sum to the exact
  * batch result even when a bucket spans micro-batches; replay is
  * idempotent.
  */
class StreamingAnomalySpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: Seq[(String, String)]) =
    rows.toDF("event_type", "ts_s").select($"event_type", $"ts_s".cast("timestamp").as("ts"))

  // hour 03 is split across the two micro-batches — the case per-batch
  // z-scores would get wrong and delta-summing gets exactly right
  private val b0 = (0 until 10).flatMap(_ => Seq(
    ("a", "2024-01-01 00:10:00"), ("a", "2024-01-01 01:10:00"),
    ("a", "2024-01-01 02:10:00"))) ++
    (0 until 15).map(_ => ("a", "2024-01-01 03:05:00"))
  private val b1 = (0 until 25).map(_ => ("a", "2024-01-01 03:45:00")) ++
    Seq(("b", "2024-01-01 05:00:00"))

  test("stream deltas sum to the batch operator's exact bits; replay idempotent") {
    val dir = java.nio.file.Files.createTempDirectory("sanom").toString
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(String, String)]
    val q = StreamingAnomaly
      .writer(source.toDF.toDF("event_type", "ts_s")
          .select($"event_type", $"ts_s".cast("timestamp").as("ts")),
        "event_type", "ts", "hour", s"$dir/out")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    source.addData(b0: _*)
    q.processAllAvailable()
    source.addData(b1: _*)
    q.processAllAvailable()
    q.stop()

    val got = StreamingAnomaly.readAnomalies(spark, s"$dir/out", "event_type", 1.4)
      .orderBy($"event_type", $"bucket").collect().map(_.toSeq).toSeq
    val want = Anomaly.rateZ(ev(b0 ++ b1), "event_type", "ts", "hour", 1.4)
      .orderBy($"event_type", $"bucket").collect().map(_.toSeq).toSeq
    assert(got == want, s"streamed anomalies diverge:\n$got\nvs\n$want")
    // the spanning hour really did sum: [10,10,10,40] → z = 1.5, flagged
    val hour3 = got.find(r => r.head == "a" && r(1).toString.contains("03:00")).get
    assert(hour3(2) == 40L && hour3(3) == 1.5 && hour3(4) == true, hour3.toString)

    // the trend readout over the same state equals the batch operator
    val gotT = StreamingAnomaly.readTrend(spark, s"$dir/out", "event_type")
      .orderBy($"event_type").collect().map(_.toSeq).toSeq
    val wantT = Anomaly.rateTrend(ev(b0 ++ b1), "event_type", "ts", "hour")
      .orderBy($"event_type").collect().map(_.toSeq).toSeq
    assert(gotT == wantT, s"streamed trend diverges:\n$gotT\nvs\n$wantT")

    // replay the last micro-batch: byte-identical state
    StreamingAnomaly.applyBatch(ev(b1), 1L, "event_type", "ts", "hour", s"$dir/out")
    val replayed = StreamingAnomaly.readAnomalies(spark, s"$dir/out", "event_type", 1.4)
      .orderBy($"event_type", $"bucket").collect().map(_.toSeq).toSeq
    assert(replayed == got, "replay must be idempotent")
  }

  test("reading before any commit fails with a clear message") {
    val dir = java.nio.file.Files.createTempDirectory("sanom2").toString
    val ex = intercept[IllegalStateException] {
      StreamingAnomaly.readAnomalies(spark, s"$dir/out", "event_type")
    }
    assert(ex.getMessage.contains("no committed batches"), ex.getMessage)
  }
}
