package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — one JSON line per run (driver contract).
  *
  * Headline queries mirror BASELINE.md §2's metric set: the §7.1 minimum
  * slice (scan+filter+project+slice), concatenate + RowID regen,
  * append-by-position, the domain/statistics pass, the map/UDF pipeline
  * (SimpleLinearWorkflowBenchmark analog — reference
  * org.knime.core.columnar.benchmarks.tests/.../workflow/SimpleLinearWorkflowBenchmark.java:85-240),
  * plus the relational/LLM headliners (Q1 agg, multi-join, exact dedup,
  * MinHash pairs, brute-force ANN).
  *
  * == Self-adjudicating windows ==
  * Two consecutive rounds burned effort hand-adjudicating environment-
  * elevated windows (r15's bench_ab control protocol, r16's uniform
  * 1.38×-floor driver window), so the control protocol now rides IN the
  * output: every run emits a `floors` block — per-run median/mean ratio
  * to the recorded per-lane floors (BASELINE.md#floors), the lanes over
  * 2× floor, and `control_drift` = median floor-ratio of the CONTROL
  * panel below — so any window, driver or local, carries its own
  * environment verdict and needs zero manual archaeology. (The reference
  * pins its measurement protocol in-code the same way — JMH warmup/
  * measure annotations, benchmarks.tests/.../HeapBadgerBenchmark.java:90-171.)
  */
object Bench {

  /** Control panel for window adjudication: CPU-heavy lanes (floors
    * ≥0.5 s, so launch jitter can't dominate the ratio) whose measured
    * code has been byte-stable for multiple rounds. Elevated ratios HERE
    * mean the window (JVM/page-cache/CPU contention), not a regression —
    * r16's driver window sat at 1.38× mean floor with q_pack_sequences
    * et al. elevated in lockstep with the touched lanes. Revise the
    * panel if a member's measured path changes (its floor is then
    * re-established per BASELINE.md#floors and it stops being a control).
    */
  private[graft] val controlLanes = Seq(
    "q_pack_sequences", "q_bpe_train", "q_image_resize", "q_audio_mfcc",
    "q_dsir_weights")

  /** Window adjudication computed against the recorded floors.
    * `controlsExcluded` = control-panel lanes DROPPED from the drift
    * verdict because the floor baseline marks their floors as
    * re-established (not min-folded) — a re-established control floor
    * is by definition a window-of-record measurement, so drift against
    * it is circular; emitting the exclusion in-band keeps the verdict
    * from silently rotting (r17 verdict task).
    */
  private[graft] final case class Adjudication(
      nFloored: Int, medianRatio: Double, meanRatio: Double,
      over2x: Seq[String], controlRatios: Seq[(String, Double)],
      controlDrift: Double, window: String,
      controlsExcluded: Seq[String] = Seq.empty)

  private[graft] def median(sortedXs: Seq[Double]): Double =
    if (sortedXs.isEmpty) Double.NaN
    else if (sortedXs.size % 2 == 1) sortedXs(sortedXs.size / 2)
    else (sortedXs(sortedXs.size / 2 - 1) + sortedXs(sortedXs.size / 2)) / 2.0

  /** Per-lane floor ratios + the control verdict. None when no floor
    * baseline applies (missing file or tier mismatch) — the caller then
    * reports `"window":"no-floor-baseline"` rather than a fake verdict.
    * Window bands: ≤1.25 control drift = "clean" (the idle-machine
    * band across r13–r16 folds), ≤1.6 = "elevated" (interpret lane
    * deltas against the drift, as in r16), above = "degraded" (re-run
    * on an idle machine; per-lane numbers are not floor-comparable).
    */
  private[graft] def adjudicate(results: Seq[(String, Double)],
      floors: Map[String, Double],
      reestablished: Set[String] = Set.empty): Option[Adjudication] = {
    val ratios = results.collect {
      case (n, b) if b > 0 && floors.get(n).exists(_ > 0) => n -> b / floors(n)
    }
    if (ratios.isEmpty) None
    else {
      val sorted = ratios.map(_._2).sorted
      // a control whose floor was RE-ESTABLISHED in the baseline's round
      // is not a control (its floor is a window measurement, drift
      // against it is circular) — excluded, and the exclusion is
      // reported in-band so the panel can't silently rot
      val excluded = controlLanes.filter(reestablished.contains)
      val ctrl = ratios.filter(t =>
        controlLanes.contains(t._1) && !reestablished.contains(t._1))
      val drift = median(ctrl.map(_._2).sorted)
      val window =
        if (ctrl.isEmpty) "no-controls"
        else if (drift <= 1.25) "clean"
        else if (drift <= 1.6) "elevated"
        else "degraded"
      Some(Adjudication(ratios.size, median(sorted), sorted.sum / sorted.size,
        ratios.collect { case (n, r) if r > 2.0 => n }, ctrl, drift, window,
        excluded))
    }
  }

  /** The `floors` JSON block (compact, self-contained). */
  private[graft] def floorsJson(adj: Option[Adjudication], baseline: String): String =
    adj match {
      case None =>
        s"""{"baseline":"$baseline","window":"no-floor-baseline"}"""
      case Some(a) =>
        val ctrl = a.controlRatios
          .map { case (n, r) => "\"" + n + "\":" + f"$r%.2f" }.mkString("{", ",", "}")
        val over = a.over2x.map("\"" + _ + "\"").mkString("[", ",", "]")
        val excl =
          if (a.controlsExcluded.isEmpty) ""
          else a.controlsExcluded.map("\"" + _ + "\"")
            .mkString(""""controls_reestablished":[""", ",", "],")
        s"""{"baseline":"$baseline","n_floored":${a.nFloored},""" +
          f""""median_floor_ratio":${a.medianRatio}%.2f,""" +
          f""""mean_floor_ratio":${a.meanRatio}%.2f,""" +
          s""""lanes_over_2x_floor":$over,"controls":$ctrl,$excl""" +
          (if (a.controlDrift.isNaN) s""""window":"${a.window}"}"""
           else f""""control_drift":${a.controlDrift}%.2f,"window":"${a.window}"}""")
    }

  private val headline = Seq(
    "q_scan_filter_project_slice",
    "q_concat_new_rowids",
    "q_append_position",
    "q_domain_stats",
    "q_map",
    "q1_agg",
    "q_join_multi",
    "q_window_rank",
    "q_dedup_exact",
    "q_dedup_minhash",
    "q_ann_bruteforce",
    "q_ann_ivf",
    "q_asof_join",
    "q_salted_agg",
    "q_stream_window_batch",
    "q_text_quality",
    "q_sessionize",
    "q_range_join_bucketed",
    "q_dedup_incremental",
    "q_decontaminate",
    "q_repetition",
    "q_merge_upsert",
    "q_vocab",
    "q_text_knn",
    "q_fuzzy_join",
    "q_changelog_apply",
    "q_forward_fill",
    "q_embed_centroid",
    "q_ann_pq",
    "q_ann_ivfpq",
    "q_substring_dedup",
    // round 7: Lloyd-refined PQ and the real-codec media paths
    "q_ann_pq_refined",
    "q_image_decode",
    "q_image_resize",
    "q_audio_decode",
    "q_audio_features",
    "q_video_decode",
    "q_pack_sequences",
    "q_bpe_train",
    "q_audio_mfcc",
    "q_semdedup",
    "q_dsir_weights",
    "q_pca_project",
    "q_bm25",
    // round 7 late session: retrieval evaluation + data mixing
    "q_hybrid_retrieval",
    "q_domain_mixture",
    "q_bm25_incremental",
    // round 7 final session: epoch construction + layout + audit
    "q_curriculum",
    "q_shard_assign",
    "q_mixture_upsample",
    "q_contamination_report",
    // round 7 closing session: corpus hygiene + selection + reporting
    "q_dedup_rewrite",
    "q_token_budget",
    "q_dataset_card",
    // round 8: export last mile, link-graph scoring, MP4 indexing
    "q_export_pack",
    "q_link_score",
    "q_video_index",
    "q_pack_efficiency",
    // round 9: fragmented (moof/trun) MP4 indexing (q_export_epoch and
    // q_export_audit stay correctness-only gates: their cost is the
    // parquet write itself, which q_export_pack's materialization
    // already represents), plus ranked-retrieval metrics (exact + IVF
    // rankings -> MRR/NDCG)
    "q_video_index_frag",
    "q_retrieval_metrics",
    // round 9 late: the Bloom decontamination path benched against its
    // exact-broadcast sibling, and the corpus-scale sampled-roots
    // centrality shape
    "q_decontaminate_bloom",
    "q_link_score_sampled",
    "q_cdc_rewrite",
    // round 10: WebM/Matroska container indexing (the second web video
    // container; same scan-local shape as the MP4 lanes) and the
    // incrementally-maintained IVF index probe
    "q_video_index_webm",
    "q_ann_ivf_append",
    // round 10 late: the rest of the index-maintenance lifecycle (hot-cell
    // rebalance probe, streamed-ingest fold) and the calibration report
    "q_ann_ivf_rebalance",
    "q_ann_stream_compact",
    "q_calibration",
    // round 10 latest: the Lloyd-refined quantizer (k-means build + probe),
    // laced-WebM indexing, and the mixed-container dispatch
    "q_ann_ivf_refined",
    "q_video_index_webm_laced",
    "q_video_index_auto",
    // round 11: char-scan PII redaction, Aho–Corasick blocklist report,
    // fixed-point PageRank, MMR-diversified retrieval
    "q_pii_redact",
    "q_blocklist",
    "q_pagerank",
    "q_mmr_rerank",
    // round 11 late: HyperBall all-roots reach estimation (the 100×
    // centrality scale path) and the span-novelty profile
    "q_reach_estimate",
    "q_span_novelty",
    // round 11 session 3: alternating-star connected components,
    // degree-ordered triangle counting, fused HTML→text extraction,
    // k-core peel, TrustRank, label-prop communities, URL keys,
    // exact-stats rate anomaly
    "q_components",
    "q_triangles",
    "q_html_extract",
    "q_kcore",
    "q_trustrank",
    "q_communities",
    "q_url_canonicalize",
    "q_rate_anomaly",
    // round 11 session 3 late: monitoring + graph summary lanes
    "q_rate_anomaly_robust",
    "q_rate_anomaly_seasonal",
    "q_rate_trend",
    "q_ingest_health",
    "q_degree_distribution",
    "q_reach_distribution",
    // round 12: the persisted-artifact serving shapes (graph lanes from
    // the stored edge table instead of a per-query rebuild; BM25 and
    // compressed-ANN probes from their on-disk indexes) and the
    // append ≡ rebuild maintenance lane
    "q_pagerank_artifact",
    "q_components_artifact",
    "q_linkgraph_append",
    "q_bm25_persisted",
    "q_bm25_index_append",
    "q_ann_ivfpq_persisted",
    "q_pagerank_weighted_artifact",
    "q_linkgraph_stream",
    "q_span_novelty_artifact",
    "q_minhash_store",
    // round 13: appendAuto's delta-routed maintenance lane + the reach
    // family served from the persisted register artifact (one
    // propagation, three readouts - vs three propagations per round)
    "q_linkgraph_append_auto",
    "q_reach_estimate_artifact",
    "q_reach_harmonic_artifact",
    "q_reach_distribution_artifact",
    "q_reach_point_artifact",
    "q_media_dedup_store",
    "q_semdedup_store",
    "q_pagerank_store",
    // round 14 continuation: column-pruned Arrow IPC migration scan
    // (selective buffer IO — the lane includes the one-time store write,
    // the ivfIndexDirs amortization shape) and exact heavy hitters
    // (Misra-Gries candidates + exact recount, two scans, no occurrence
    // shuffle)
    "q_arrow_pruned_scan",
    "q_heavy_hitters",
    "q_arrow_filtered_scan",
    "q_heavy_hitters_by_lang",
    // round 15: nested-leaf IPC filter pushdown (dotted-path batch stats)
    // and the partial/in-flight (torn-store) reader
    "q_arrow_nested_scan",
    "q_arrow_partial_scan",
    "q_plan_persist",
    "q_plan_persist_multi",
    "q_components_store",
    // round 16: the distribution readout served from its DerivedStore
    // (the last reach-family member without a served lane) + the pruned
    // torn-store walk (footer-free selective IO)
    "q_reach_distribution_store",
    "q_arrow_partial_pruned",
    // round 17: the drift gate's opt-in evolution path (renamed+widened
    // source bound exactly under a persisted SourceEvolution)
    "q_plan_persist_evolve",
    // round 18: the Catalyst-integrated IPC read (DataSourceV2 pushdown
    // over spark.read composition - same engine as q_arrow_filtered_scan,
    // so the lane pair prices the DSv2 integration itself), and late-r18
    // the DSv2 WRITE round trip (df.write.format("arrowipc") store build
    // amortized session-wide + the filtered DSv2 read over it)
    "q_arrow_dsv2",
    "q_arrow_dsv2_write",
    // the streaming sink's serving lane (store build session-amortized,
    // like the other artifact lanes; the first run pays the stream)
    "q_arrow_stream_sink"
  )

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession
      .builder(master = s"local[$cpus]", shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warm the JVM/parquet footer caches once with the cheapest query so
    // first-query JIT/classloading doesn't dominate the measurements.
    SparkEntry.queries("q_slice")(spark, sfDir).count()

    // Best-of-N per query (default 3): single-run numbers swing ±0.3 s on
    // launch jitter (JIT, page cache, GC alignment), which masked a real
    // regression behind noise in r3→r4. The warm minimum is the
    // reproducible floor and is what BASELINE.md quotes; measured
    // stability at N=3: two consecutive totals within 0.4%, every
    // per-query spread ≤ 0.11 s absolute.
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt.max(1)
    // optional comma-separated subset for focused scale-ladder runs (the
    // full set at a 100x tier would run for hours); the driver's default
    // invocation sets neither env var and benches everything
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    val results = headline.filter(n => only.forall(_.contains(n))).flatMap { name =>
      SparkEntry.queries.get(name).map { fn =>
        // a failed run must never win the min (a fast failure would read
        // as a speedup): successes compete, total failure reports -1
        val times = (1 to runs).map { _ =>
          val t0 = System.nanoTime()
          try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
          catch {
            case e: Throwable =>
              System.err.println(s"[bench] $name failed: $e"); Double.PositiveInfinity
          }
        }
        val best = if (times.min.isInfinity) -1.0 else times.min
        // progress to stderr (the JSON line lands only at the end; a
        // silent 15-minute sf1 run is indistinguishable from a hang)
        System.err.println(f"[bench] $name%-28s best-of-$runs $best%.3f s")
        name -> best
      }
    }
    // Poisoning guard (round 12): one disk-full/OOM event poisons every
    // SUBSEQUENT same-JVM measurement 2-4× (measured: q_pack_efficiency
    // 314 s poisoned vs 113 s fresh; r11's driver window carried an 11×
    // q_video_index outlier its best-of-3 could not catch because all
    // three runs shared the poisoned JVM). Any floor >3× its recorded
    // previous floor — and >0.5 s absolute off it, so sub-second launch
    // jitter can't trigger forks — is re-measured once in a FRESH JVM;
    // the fresh floor wins if faster. Baseline: SPARK_GRAFT_BENCH_BASELINE
    // or ./BENCH_floor.json (refreshed each round); absent → no guard.
    val guarded = remeasureOutliers(results, sfDir, cpus, runs)
    val qs = guarded.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
    val total = guarded.map(_._2).sum
    // in-band window adjudication (see object doc): ratios to the
    // recorded floors + the untouched-control drift verdict
    val baselinePath = sys.env.getOrElse("SPARK_GRAFT_BENCH_BASELINE", "BENCH_floor.json")
    val adj = adjudicate(guarded, loadFloors(baselinePath, sfDir),
      loadReestablished(baselinePath))
    val floors = floorsJson(adj, baselinePath)
    adj.foreach { a =>
      System.err.println(f"[bench] window: ${a.window} (control drift " +
        f"${a.controlDrift}%.2fx, median floor-ratio ${a.medianRatio}%.2fx, " +
        s"${a.over2x.size} lane(s) over 2x floor" +
        (if (a.over2x.isEmpty) ")" else s": ${a.over2x.mkString(",")})"))
    }
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""floors":$floors,"sf":"$sfDir"}"""
    println(line)
    // the capture keeps the END of stdout, and the full per-lane line is
    // now 100+ lanes long — r11 AND r12 driver captures front-truncated
    // it into `parsed: null`. So the LAST line is a compact self-contained
    // summary (same shape, no per-lane map) that survives any tail clip;
    // the full map rides the line above and the mirror file
    val summary = s"""{"metric":"total","value":$total,"unit":"sec",""" +
      s""""n_queries":${guarded.size},"floors":$floors,"sf":"$sfDir"}"""
    println(summary)
    // flush explicitly (an unflushed buffer at JVM teardown is a
    // truncated BENCH_r*.json), and mirror the full line to a file so a
    // clipped stdout capture is recoverable
    System.out.flush()
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
        "/tmp/graft_bench_last.json")), line + "\n" + summary + "\n")
    catch { case _: Exception => () }
    spark.stop()
  }

  /** Re-measure suspicious floors in a fresh JVM (see main). The child
    * is this very main, restricted via SPARK_GRAFT_BENCH_ONLY, launched
    * with the parent's own JVM arguments (heap, --add-opens) and
    * classpath; SPARK_GRAFT_BENCH_NOFORK breaks recursion. Any child
    * failure leaves the parent's numbers untouched.
    */
  /** Per-lane floors from `baselinePath`, empty when missing/unparseable
    * or when the baseline's tier does not match this run's (floors are
    * tier-specific: comparing an sf10 run against sf0.1 floors would
    * flag every lane). Shared by the poisoning guard and the window
    * adjudication.
    */
  private def loadFloors(baselinePath: String, sfDir: String): Map[String, Double] =
    try {
      val txt = java.nio.file.Files.readString(java.nio.file.Paths.get(baselinePath))
      val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(txt)
      val sfOk = node != null && node.isObject && {
        val s = node.get("sf")
        s != null && s.isTextual &&
          new java.io.File(s.asText()).getName == new java.io.File(sfDir).getName
      }
      val q = if (sfOk) node.get("queries") else null
      if (q == null || !q.isObject) Map.empty
      else {
        import scala.jdk.CollectionConverters._
        q.fields().asScala.map(e => e.getKey -> e.getValue).collect {
          case (k, v) if v.isNumber => k -> v.doubleValue()
        }.toMap
      }
    } catch { case _: Exception => Map.empty }

  /** Lanes the floor baseline marks as RE-ESTABLISHED in its own round
    * (`"reestablished": [...]` — written by the round-close fold for
    * lanes whose floors were reset rather than min-folded, per
    * BASELINE.md#floors). Consumed by [[adjudicate]] to drop such lanes
    * from the control panel. Missing field / file → empty.
    */
  private def loadReestablished(baselinePath: String): Set[String] =
    try {
      val txt = java.nio.file.Files.readString(java.nio.file.Paths.get(baselinePath))
      val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(txt)
      val arr = if (node != null && node.isObject) node.get("reestablished") else null
      if (arr == null || !arr.isArray) Set.empty
      else {
        import scala.jdk.CollectionConverters._
        arr.elements().asScala.filter(_.isTextual).map(_.asText()).toSet
      }
    } catch { case _: Exception => Set.empty }

  private def remeasureOutliers(results: Seq[(String, Double)], sfDir: String,
      cpus: String, runs: Int): Seq[(String, Double)] = {
    if (sys.env.contains("SPARK_GRAFT_BENCH_NOFORK")) return results
    val baselinePath = sys.env.getOrElse("SPARK_GRAFT_BENCH_BASELINE", "BENCH_floor.json")
    val floors = loadFloors(baselinePath, sfDir)
    val outliers = results.collect {
      case (name, best) if best > 0 && floors.get(name).exists(f =>
        best > 3.0 * f && best - f > 0.5) => name
    }
    if (outliers.isEmpty) return results
    System.err.println(s"[bench] re-measuring ${outliers.size} outlier(s) in a " +
      s"fresh JVM: ${outliers.mkString(",")}")
    val fresh: Map[String, Double] = try {
      import scala.jdk.CollectionConverters._
      val jvmArgs = java.lang.management.ManagementFactory.getRuntimeMXBean
        .getInputArguments.asScala.toSeq
      val javaBin = new java.io.File(new java.io.File(sys.props("java.home"), "bin"), "java").toString
      val cmd = (Seq(javaBin) ++ jvmArgs ++
        Seq("-cp", sys.props("java.class.path"), "graft.Bench")).asJava
      val pb = new ProcessBuilder(cmd)
      pb.environment().put("SPARK_GRAFT_BENCH_NOFORK", "1")
      pb.environment().put("SPARK_GRAFT_BENCH_ONLY", outliers.mkString(","))
      pb.environment().put("SPARK_GRAFT_BENCH_RUNS", runs.toString)
      pb.environment().put("SPARK_GRAFT_SF_DIR", sfDir)
      pb.environment().put("SPARK_GRAFT_CPUS", cpus)
      pb.redirectErrorStream(false)
      pb.redirectError(ProcessBuilder.Redirect.INHERIT)
      val p = pb.start()
      val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
      p.waitFor()
      val line = out.linesIterator.toSeq.reverse.find(_.startsWith("{"))
      line.map { l =>
        val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(l)
        val q = node.get("queries")
        import scala.jdk.CollectionConverters._
        q.fields().asScala.map(e => e.getKey -> e.getValue).collect {
          case (k, v) if v.isNumber => k -> v.doubleValue()
        }.toMap
      }.getOrElse(Map.empty)
    } catch { case e: Exception =>
      System.err.println(s"[bench] fresh-JVM re-measure failed: $e"); Map.empty
    }
    results.map { case (name, best) =>
      fresh.get(name).filter(f => f > 0 && f < best) match {
        case Some(f) =>
          System.err.println(f"[bench] $name%-28s fresh-JVM floor $f%.3f s " +
            f"(was $best%.3f s - poisoned measurement replaced)")
          name -> f
        case None => name -> best
      }
    }
  }
}
