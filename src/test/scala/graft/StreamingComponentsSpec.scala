package graft

import graft.streaming.StreamingComponents
import graft.text.LinkGraph
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming component-label maintenance: snapshot-chain fold equals the
  * full batch recompute, replay is byte-identical, pruning keeps the
  * replay window.
  */
class StreamingComponentsSpec extends SparkSpec {
  import spark.implicits._

  private val b0 = Seq((1L, 2L), (3L, 4L))            // {1,2} {3,4} {5..}
  private val b1 = Seq((2L, 3L), (6L, 7L))            // {1,2,3,4} {6,7}
  private val b2 = Seq((4L, 5L), (7L, 8L), (9L, 9L))  // self-loop ignored

  test("stream components: fold equals full recompute, replay idempotent, prune") {
    val dir = java.nio.file.Files.createTempDirectory("scomp").toString
    implicit val sqlCtx = spark.sqlContext
    StreamingComponents.initialize(Seq(1L, 2L, 3L, 4L, 5L).toDF("id"), "id", s"$dir/out")
    val source = MemoryStream[(Long, Long)]
    val q = StreamingComponents
      .writer(source.toDF.toDF("src", "dst"), "id", s"$dir/out")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    source.addData(b0: _*)
    q.processAllAvailable()
    source.addData(b1: _*)
    q.processAllAvailable()
    source.addData(b2: _*)
    q.processAllAvailable()
    q.stop()

    val got = StreamingComponents.readLabels(spark, s"$dir/out")
      .orderBy($"id").collect().map(_.toSeq).toSeq
    // full batch recompute over every edge ever seen, same node universe
    val allEdges = (b0 ++ b1 ++ b2).toDF("src", "dst")
    val nodes = (1L to 9L).toDF("id")
    val want = LinkGraph.connectedComponents(nodes, "id", allEdges)
      .orderBy($"id").collect().map(_.toSeq).toSeq
    assert(got == want, s"streamed labels diverge from batch recompute:\n$got\nvs\n$want")
    // {1..5} one component rooted at 1, {6,7,8} rooted at 6, 9 singleton
    val byId = got.map(r => r.head.asInstanceOf[Long] ->
      (r(1).asInstanceOf[Long], r(2).asInstanceOf[Long])).toMap
    assert((1L to 5L).forall(i => byId(i) == ((1L, 5L))))
    assert(Seq(6L, 7L, 8L).forall(i => byId(i) == ((6L, 3L))))
    assert(byId(9L) == ((9L, 1L)))

    // replay the LAST micro-batch (the restart window): byte-identical labels
    StreamingComponents.applyBatch(b2.toDF("src", "dst"), 2L, "id", s"$dir/out")
    val replayed = StreamingComponents.readLabels(spark, s"$dir/out")
      .orderBy($"id").collect().map(_.toSeq).toSeq
    assert(replayed == got, "replay must be idempotent")

    // prune to the replay window: latest two snapshots remain, labels intact
    StreamingComponents.prune(spark, s"$dir/out", keepLast = 2)
    val left = new java.io.File(s"$dir/out").listFiles()
      .filter(_.getName.startsWith("batch=")).map(_.getName).sorted.toSeq
    assert(left == Seq("batch=2", "batch=3"), s"got $left")
    assert(StreamingComponents.readLabels(spark, s"$dir/out")
      .orderBy($"id").collect().map(_.toSeq).toSeq == got)
  }

  test("stream components: missing predecessor snapshot fails with a clear message") {
    val dir = java.nio.file.Files.createTempDirectory("scomp2").toString
    val ex = intercept[IllegalStateException] {
      StreamingComponents.applyBatch(Seq((1L, 2L)).toDF("src", "dst"), 0L, "id", s"$dir/out")
    }
    assert(ex.getMessage.contains("initialize"), ex.getMessage)
  }
}
