package graft.tools

import graft.{GraftSession, SparkEntry}
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerJobStart}
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Dev tool (optimization rounds): per-lane execution statistics —
  * warm wall time plus job/stage/task counts and shuffle/input bytes from
  * a SparkListener. The structural numbers (jobs, stages, shuffle bytes)
  * are the evidence that a change removed work, not just moved it; wall
  * seconds alone can't distinguish a shuffle removed from a cache warmed.
  *
  * usage: LaneStats <query[,query...]|ALL> [reps=3]
  * env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
  *        SPARK_GRAFT_CPUS   (default 32)
  * output: one tab-separated line per lane (last-rep structural counts,
  * min wall time across reps) — lane, secs, jobs, stages, tasks,
  * shuffle_write_MB, input_MB.
  */
object LaneStats {
  def main(args: Array[String]): Unit = {
    val namesArg = args.headOption.getOrElse("ALL")
    val reps = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession
      .builder(master = s"local[$cpus]", shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val shuffleWrite = new AtomicLong
    val input = new AtomicLong
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(sc.stageInfo.numTasks)
        shuffleWrite.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
        input.addAndGet(sc.stageInfo.taskMetrics.inputMetrics.bytesRead)
      }
    }
    spark.sparkContext.addSparkListener(listener)

    val names =
      if (namesArg == "ALL") SparkEntry.queries.keys.toSeq.sorted
      else namesArg.split(",").toSeq
    // warm the session so first-lane JIT doesn't pollute the first lane
    SparkEntry.queries("q_slice")(spark, sfDir).count()
    println("lane\tsecs\tjobs\tstages\ttasks\tshufMB\tinMB")
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => System.err.println(s"[lanestats] unknown query: $name")
        case Some(fn) =>
          try {
            var best = Double.MaxValue
            var (j, st, ta) = (0, 0, 0)
            var (sw, in) = (0L, 0L)
            (1 to reps).foreach { _ =>
              // let listener events from the previous rep drain before zeroing
              Thread.sleep(200)
              jobs.set(0); stages.set(0); tasks.set(0)
              shuffleWrite.set(0); input.set(0)
              val t0 = System.nanoTime()
              fn(spark, sfDir).count()
              val dt = (System.nanoTime() - t0) / 1e9
              Thread.sleep(200)
              if (dt < best) best = dt
              j = jobs.get(); st = stages.get(); ta = tasks.get()
              sw = shuffleWrite.get(); in = input.get()
            }
            println(f"$name\t$best%.3f\t$j\t$st\t$ta\t${sw / 1e6}%.1f\t${in / 1e6}%.1f")
          } catch {
            case e: Throwable =>
              System.err.println(s"[lanestats] $name FAILED: ${e.getMessage}")
          }
      }
    }
    spark.stop()
  }
}
