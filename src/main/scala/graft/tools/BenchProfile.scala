package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dev tool: run each Bench headline query N times in one session to
  * split fixed per-shape cost (codegen/JIT — first run) from
  * data-proportional cost (steady-state runs). Guides which bench
  * hotspots are real at scale and which are single-JVM warmup artifacts.
  */
object BenchProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.orElse(sys.env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse(sys.error("usage: BenchProfile <sf-dir> (or set SPARK_GRAFT_SF_DIR)"))
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = Seq(
      "q_scan_filter_project_slice", "q_concat_new_rowids", "q_append_position",
      "q_domain_stats", "q_map", "q1_agg", "q_join_multi", "q_window_rank",
      "q_dedup_exact", "q_dedup_minhash", "q_ann_bruteforce", "q_ann_ivf",
      "q_asof_join", "q_salted_agg", "q_stream_window_batch", "q_text_quality")
    SparkEntry.queries("q_slice")(spark, sfDir).count()
    names.foreach { name =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      System.err.println(
        f"[profile] $name%-28s cold=${times.head}%6.2fs warm_min=${times.tail.minOption.getOrElse(times.head)}%6.2fs")
    }
    spark.stop()
  }
}
