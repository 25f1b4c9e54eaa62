package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph quality scoring — neighborhood centrality over a
  * (src, dst) edge table, the graph signal a pretraining pipeline feeds
  * into document quality weights (well-connected pages/domains rank
  * above orphans; PageRank-family scores are the classic form).
  *
  * Design choice: BOUNDED-HOP centrality, all-integer BFS — not float
  * PageRank. Power-iteration PageRank accumulates floating-point sums
  * whose value depends on partition order, so two runs (or two engines)
  * disagree in final ulps and no bit-exact oracle exists. Min-distance
  * hop counts are integers: `harmonic` below is a FIXED-ORDER expression
  * over those integers (n₁/1 + n₂/2 + … evaluated left-to-right), so
  * results are bit-identical across engines, runs, and partitionings —
  * the same determinism contract as the rest of the engine. Bounded-hop
  * harmonic centrality also matches how web-quality signals are used in
  * practice: influence beyond a few hops is noise, and the bound is what
  * makes the computation tractable at all on a 100 TB corpus graph.
  *
  * Scale shape: iteration d is one (frontier ⨝ edges) equi-join plus an
  * anti-join against the reached set — the [[graft.dedup.Decontaminate.transitiveContamination]]
  * frontier machinery run from ALL roots at once. Everything that
  * shuffles is (root, id) integer pairs; the reached set's size is
  * Σ_root |B_d(root)| — the output's own size, inherent to all-pairs
  * centrality, kept linear-ish by the hop bound and by capping hub
  * degree upstream (see the df cap in the q_link_score edge builder:
  * a span shared by thousands of documents is boilerplate, not signal,
  * and would otherwise make the pair join quadratic).
  */
object LinkGraph {

  /** Default [[centrality]] density-guard bound: ~10⁹ (root, id) rows ≈
    * tens of GB of closure state — past this, an uncapped all-roots BFS
    * is a cluster-killer, not a query (measured: 80 GB of spill and an
    * aborted job at the 100× tier, SCALE.md round 9 finding 2).
    */
  val DefaultMaxEstimatedReach: Long = 1L << 30

  /** Per-node bounded-hop centrality: `(idCol, n_hop_1 … n_hop_maxHops,
    * reach, harmonic)` where `n_hop_d` counts nodes at MIN distance
    * exactly `d`, `reach` their sum, and `harmonic` = Σ_d n_hop_d / d
    * (fixed evaluation order, see class doc). Nodes absent from `edges`
    * report all-zero lanes (harmonic 0.0). Directed: follow `src → dst`;
    * pass both directions for an undirected graph.
    *
    * DENSITY GUARD (fail-fast, same pattern as simHashPairs'
    * `maxHamming < bands` and knnClassify's `maxQueries`): before the
    * closure starts, one aggregation over the already-materialized edge
    * table probes |E| and the mean out-degree, and the geometric reach
    * estimate `Σ_d |roots| · avgDeg^d` must stay under
    * `maxEstimatedReach` ([[DefaultMaxEstimatedReach]]). The estimate
    * ignores ball saturation, so it over-counts on dense graphs —
    * exactly the cases that must fail fast; sparse real link graphs pass
    * with orders of magnitude to spare. Overrides, in preference order:
    * sample the roots (the corpus-scale shape — see q_link_score_sampled),
    * bound the balls with [[centralityCapped]], or raise/disable the
    * bound explicitly (`maxEstimatedReach = Long.MaxValue`) when the
    * closure size is a measured, accepted cost.
    */
  def centrality(nodes: DataFrame, idCol: String, edges: DataFrame, maxHops: Int): DataFrame =
    centrality(nodes, idCol, edges, maxHops, DefaultMaxEstimatedReach)

  /** [[centrality]] with an explicit density-guard bound (see above). */
  def centrality(nodes: DataFrame, idCol: String, edges: DataFrame, maxHops: Int,
      maxEstimatedReach: Long): DataFrame = {
    require(maxEstimatedReach >= 1,
      s"LinkGraph.centrality: maxEstimatedReach $maxEstimatedReach < 1")
    centralityImpl(nodes, idCol, edges, maxHops, maxReachPerRoot = None,
      maxEstimatedReach = maxEstimatedReach)
  }

  /** [[centrality]] with a per-root BALL-SIZE cap — the BFS analog of the
    * edge builder's df cap, for graphs with supernode components: a root
    * whose reached ball exceeds `maxReachPerRoot` after a hop stops
    * expanding (its frontier is dropped), so one pathological component
    * cannot blow the (root, id) table up to |component|² while every
    * healthy root still computes exactly. Capped roots report their
    * PARTIAL hop lanes with `capped = true` — a flagged lower bound, not
    * a silent wrong answer; uncapped roots carry `capped = false` and
    * values identical to [[centrality]]. Costs one extra per-root count
    * aggregation per hop (map-side combined, (root, cnt) rows only).
    */
  def centralityCapped(nodes: DataFrame, idCol: String, edges: DataFrame, maxHops: Int,
      maxReachPerRoot: Long): DataFrame = {
    require(maxReachPerRoot >= 1,
      s"LinkGraph.centralityCapped: maxReachPerRoot $maxReachPerRoot < 1")
    centralityImpl(nodes, idCol, edges, maxHops, Some(maxReachPerRoot),
      maxEstimatedReach = Long.MaxValue)
  }

  private def centralityImpl(nodes: DataFrame, idCol: String, edges: DataFrame,
      maxHops: Int, maxReachPerRoot: Option[Long], maxEstimatedReach: Long): DataFrame = {
    require(maxHops >= 1, s"LinkGraph.centrality: maxHops $maxHops < 1")
    val e = edges.select(col("src"), col("dst"))
      .where(col("src") =!= col("dst")).distinct().cache()
    // reached: (root, id, d) with d = min hops root → id; seed d = 0 rows
    // keep every node present in the output even when isolated
    var reached = nodes.select(col(idCol).as("root"), col(idCol).as("id"),
      lit(0).as("d")).cache()
    var cachedHandle = reached
    var staleHandle: Option[org.apache.spark.sql.DataFrame] = None
    var reachedCount = reached.count()
    // density guard for the UNCAPPED closure (capped runs are bounded by
    // construction): one cheap aggregation over the cached edges, then
    // fail fast BEFORE any closure state accumulates. The probe rides on
    // data the loop needs cached anyway; see the [[centrality]] scaladoc.
    if (maxReachPerRoot.isEmpty && maxEstimatedReach < Long.MaxValue) {
      // approx_count_distinct, not exact: the probe must stay one
      // map-side-combined pass even on a 10⁹-edge table (an exact
      // distinct is itself a full shuffle), and a ±2% HLL error cannot
      // flip a guard whose failure mode is orders of magnitude
      val probe = e.agg(count(lit(1)).as("m"),
        approx_count_distinct(col("src")).as("s")).head()
      val m = probe.getLong(0)
      val avgDeg = m.toDouble / math.max(1L, probe.getLong(1))
      var est = 0.0
      var term = reachedCount.toDouble
      var i = 0
      while (i < maxHops && est <= maxEstimatedReach.toDouble) {
        term *= avgDeg; est += term; i += 1
      }
      if (est > maxEstimatedReach.toDouble) {
        cachedHandle.unpersist() // fail-fast must not leak the seed/edge caches
        e.unpersist()
        throw new IllegalArgumentException(
          f"LinkGraph.centrality: estimated closure size $est%.3g (root, id) rows " +
            f"(${reachedCount} roots x avg out-degree $avgDeg%.1f over $maxHops hops, " +
            s"$m edges) exceeds maxEstimatedReach $maxEstimatedReach - an uncapped " +
            "all-roots BFS at this density is a measured disk-exhaustion footgun. " +
            "Sample the roots, use centralityCapped(maxReachPerRoot), or pass " +
            "centrality(..., maxEstimatedReach) explicitly to accept the cost.")
      }
    }
    var frontier = reached.select(col("root"), col("id"))
    // roots stopped by the ball cap (None = unlimited); cumulative, and
    // always re-derived from the CACHED reached table so checking it
    // never re-executes the join chain
    var cappedRoots: Option[DataFrame] = None
    var d = 1
    var done = false
    while (!done) {
      val next = frontier.join(e, col("id") === col("src"))
        .select(col("root"), col("dst").as("id")).distinct()
        .join(reached.select(col("root"), col("id")), Seq("root", "id"), "left_anti")
        .withColumn("d", lit(d))
      val grown = reached.unionAll(next).cache()
      if (d == maxHops) {
        // the final iteration terminates unconditionally: skip its
        // convergence count and let the closing localCheckpoint do the
        // one materialization. The previous cache must stay live until
        // then — `grown`'s lineage still reads it
        staleHandle = Some(cachedHandle)
        cachedHandle = grown
        done = true
      } else {
        // loop control materializes the iteration; the count doubles as
        // empty-frontier detection (no growth → converged early)
        val grownCount = grown.count()
        cachedHandle.unpersist()
        cachedHandle = grown
        done = grownCount == reachedCount
        reachedCount = grownCount
        // ball-size check AFTER the hop materialized: roots over the cap
        // expand no further (their reached rows stay — flagged partial).
        // Reach only grows, so the latest check subsumes earlier ones.
        maxReachPerRoot.foreach { cap =>
          cappedRoots = Some(grown.groupBy(col("root"))
            .agg(count(lit(1)).as("__n"))
            .where(col("__n") > cap)
            .select(col("root")))
        }
      }
      // read the next frontier back out of the cached union — deriving it
      // from `next` would re-execute the whole join chain next iteration
      frontier = grown.where(col("d") === d).select(col("root"), col("id"))
      cappedRoots.foreach(cr => frontier = frontier.join(cr, Seq("root"), "left_anti"))
      reached = grown
      d += 1
    }
    val pinned = reached.localCheckpoint(true)
    // pin the capped set too before releasing the caches its plan reads
    val cappedPinned = cappedRoots.map(_.localCheckpoint(true))
    staleHandle.foreach(_.unpersist())
    cachedHandle.unpersist()
    e.unpersist()
    val hopAggs = (1 to maxHops).map(i =>
      sum(when(col("d") === i, 1L).otherwise(0L)).as(s"n_hop_$i"))
    val agg = pinned.groupBy(col("root").as(idCol))
      .agg(hopAggs.head, hopAggs.tail: _*)
    val reach = (1 to maxHops).map(i => col(s"n_hop_$i")).reduce(_ + _)
    val harmonic = (1 to maxHops)
      .map(i => col(s"n_hop_$i").cast("double") / lit(i.toDouble))
      .reduce(_ + _)
    val base = agg.withColumn("reach", reach).withColumn("harmonic", harmonic)
    cappedPinned match {
      case Some(cr) =>
        base.join(cr.select(col("root").as(idCol), lit(true).as("__capped")),
            Seq(idCol), "left")
          .withColumn("capped", coalesce(col("__capped"), lit(false)))
          .drop("__capped")
      case None if maxReachPerRoot.isDefined =>
        // maxHops == 1 never truncates (the single hop always completes)
        base.withColumn("capped", lit(false))
      case None => base
    }
  }

  /** Damped PageRank power iteration in FIXED-POINT integer arithmetic —
    * the float-PageRank determinism objection (class doc) resolved rather
    * than avoided: ranks are Long fixed-point units (`scale` units of
    * total mass), per-edge contributions are integer divisions, and Long
    * addition is exactly commutative/associative, so the result is
    * BIT-IDENTICAL across partitionings, runs, and engines — DuckDB
    * replays it in BIGINT arithmetic for a full oracle.
    *
    * Formula per iteration (all integer, truncating division; every
    * intermediate provably fits a signed 64-bit at ANY corpus size
    * because total mass never exceeds `scale`):
    * {{{
    *   teleport   = ((dampDen - dampNum) * scale / dampDen) / N
    *   contrib(e) = rank(src) / outdeg(src)
    *   rank'(v)   = teleport + dampNum * Σ contrib(e into v) / dampDen
    * }}}
    * Truncation loses ≤ 1 unit per division (≤ |E| + N units of mass per
    * iteration ≈ 10⁻¹² relative at the default scale) and loses it
    * DETERMINISTICALLY. Dangling-node mass is dropped, not redistributed
    * (the cheap, shuffle-free variant; symmetric edge tables have no
    * dangling nodes). Unlike all-pairs centrality there is no closure
    * state: each iteration shuffles |E| contribution rows + N rank rows,
    * so no density guard is needed — cost is linear in edges per
    * iteration at any scale.
    *
    * Returns `(idCol, rank_fp: long, score: double = rank_fp / scale)`.
    */
  def pageRank(nodes: DataFrame, idCol: String, edges: DataFrame, iters: Int,
      scale: Long = 1000000000000L, dampNum: Int = 85, dampDen: Int = 100): DataFrame = {
    require(iters >= 1, s"LinkGraph.pageRank: iters $iters < 1")
    require(dampNum > 0 && dampNum < dampDen, s"LinkGraph.pageRank: damping $dampNum/$dampDen")
    require(scale >= 1 && scale <= Long.MaxValue / dampDen,
      s"LinkGraph.pageRank: scale $scale would overflow the damping multiply")
    val ids = nodes.select(col(idCol).as("id"))
    val e = edges.select(col("src"), col("dst"))
      .where(col("src") =!= col("dst")).distinct()
    // (src, dst, deg) cached once: both the degree and the join side of
    // every iteration (the one data-sized table in the loop)
    val ewd = e.join(
        e.groupBy(col("src")).agg(count(lit(1)).as("__deg")), Seq("src"))
      .cache()
    val n = ids.count()
    require(n > 0, "LinkGraph.pageRank: empty node set")
    val teleport = ((dampDen - dampNum).toLong * scale / dampDen) / n
    var ranks = ids.withColumn("r", lit(scale / n))
    var i = 0
    while (i < iters) {
      // `div`, not `/`: Spark's `/` on longs is DOUBLE division — the
      // fixed-point contract needs truncating integer division
      val contrib = ranks.join(ewd, col("id") === col("src"))
        .select(col("dst").as("id"), expr("r div __deg").as("__c"))
        .groupBy(col("id")).agg(sum(col("__c")).as("__s"))
      // pin each iteration: cuts the k-fold self-join lineage and makes
      // iteration k read materialized ranks, not re-run iterations 1..k-1
      ranks = ids.join(contrib, Seq("id"), "left")
        .select(col("id"),
          (lit(teleport) +
            coalesce(expr(s"(${dampNum}L * __s) div ${dampDen}L"), lit(0L))).as("r"))
        .localCheckpoint(true)
      i += 1
    }
    ewd.unpersist()
    ranks.select(col("id").as(idCol), col("r").as("rank_fp"),
      (col("r").cast("double") / lit(scale.toDouble)).as("score"))
  }

  /** [[pageRank]] with per-edge Long weights (`edges: (src, dst,
    * weight)`) — contribution `(rank·w) / W(src)` instead of
    * `rank / outdeg`, all integer, same bit-determinism contract.
    * Duplicate (src, dst) rows are weight-SUMMED (one |E| aggregation
    * per call, not per iteration). Two fail-fast overflow guards ride
    * the same aggregation: per-source total weight `W(src)` and the
    * `scale · maxWeight` product must fit the damping multiply — probed
    * before any iteration starts, with the formula in the message.
    */
  def pageRankWeighted(nodes: DataFrame, idCol: String, edges: DataFrame, iters: Int,
      scale: Long = 1000000000000L, dampNum: Int = 85, dampDen: Int = 100,
      maxSourceWeight: Long = 1000000L): DataFrame = {
    require(iters >= 1, s"LinkGraph.pageRankWeighted: iters $iters < 1")
    require(dampNum > 0 && dampNum < dampDen,
      s"LinkGraph.pageRankWeighted: damping $dampNum/$dampDen")
    require(scale >= 1 && scale <= Long.MaxValue / dampDen,
      s"LinkGraph.pageRankWeighted: scale $scale would overflow the damping multiply")
    val ids = nodes.select(col(idCol).as("id"))
    val e = edges.select(col("src"), col("dst"), col("weight").cast("long").as("weight"))
      .where(col("src") =!= col("dst") && col("weight") > 0)
      .groupBy(col("src"), col("dst")).agg(sum(col("weight")).as("weight"))
    val ewd = e.join(
        e.groupBy(col("src")).agg(sum(col("weight")).as("__wsum")), Seq("src"))
      .cache()
    // overflow guard (fail fast, riding the cached edge table): the
    // per-edge product rank·weight is bounded by scale·maxW, which must
    // stay under Long.MaxValue with headroom for the damping multiply
    val maxW = ewd.agg(max(col("__wsum"))).head() match {
      case r if r.isNullAt(0) => 0L
      case r => r.getLong(0)
    }
    if (maxW > maxSourceWeight) {
      ewd.unpersist()
      throw new IllegalArgumentException(
        s"LinkGraph.pageRankWeighted: max per-source weight $maxW exceeds " +
          s"maxSourceWeight $maxSourceWeight - rank*weight products at scale $scale " +
          s"could overflow 64-bit (bound: scale*maxW <= ${Long.MaxValue}). Rescale " +
          "the weights (only ratios within a source matter) or raise maxSourceWeight " +
          "explicitly after checking the product bound.")
    }
    require(maxW == 0 || scale <= Long.MaxValue / maxW,
      s"LinkGraph.pageRankWeighted: scale $scale * max weight $maxW overflows 64-bit")
    val n = ids.count()
    require(n > 0, "LinkGraph.pageRankWeighted: empty node set")
    val teleport = ((dampDen - dampNum).toLong * scale / dampDen) / n
    var ranks = ids.withColumn("r", lit(scale / n))
    var i = 0
    while (i < iters) {
      val contrib = ranks.join(ewd, col("id") === col("src"))
        .select(col("dst").as("id"), expr("(r * weight) div __wsum").as("__c"))
        .groupBy(col("id")).agg(sum(col("__c")).as("__s"))
      ranks = ids.join(contrib, Seq("id"), "left")
        .select(col("id"),
          (lit(teleport) +
            coalesce(expr(s"(${dampNum}L * __s) div ${dampDen}L"), lit(0L))).as("r"))
        .localCheckpoint(true)
      i += 1
    }
    ewd.unpersist()
    ranks.select(col("id").as(idCol), col("r").as("rank_fp"),
      (col("r").cast("double") / lit(scale.toDouble)).as("score"))
  }

  /** Shared-span document graph: symmetric (src, dst) edges between
    * documents sharing at least one w-token shingle whose document
    * frequency lies in [2, maxDf]. The df cap drops boilerplate spans —
    * they carry no linkage signal and are exactly the spans that would
    * make the pair join quadratic (same hygiene as LSH bucket caps).
    */
  def sharedSpanEdges(docs: DataFrame, idCol: String, textCol: String,
      w: Int, maxDf: Int): DataFrame = {
    import graft.functions.{TextFunctions => T}
    val spans = docs.select(col(idCol).as("__id"),
      explode(T.shingleHashes(col(textCol), w)).as("__h"))
    val rare = spans.groupBy(col("__h"))
      .agg(countDistinct(col("__id")).as("__df"))
      .where(col("__df") >= 2 && col("__df") <= maxDf)
      .select(col("__h"))
    val sp = spans.join(rare, Seq("__h"))
    val pairs = sp.select(col("__h"), col("__id").as("id_a"))
      .join(sp.select(col("__h"), col("__id").as("id_b")), Seq("__h"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
    pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionAll(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
  }

  /** Per-document span-novelty profile — the inverse signal of the link
    * graph: how much of a document is UNIQUE vs shared vs boilerplate.
    * For each document's distinct w-token spans, counts them by corpus
    * document frequency: `n_unique` (df = 1), `n_shared` (2 ≤ df ≤
    * maxDf — the linkage band), `n_boilerplate` (df > maxDf), plus the
    * ratios. High boilerplate fraction = template/spam page; high
    * novelty = original content — the standard span-level curation
    * signal. One span explode + one df aggregation + one per-doc rollup
    * (all map-side combined); no pair join anywhere, so unlike the edge
    * builder this stays cheap on ANY df distribution.
    */
  def spanNovelty(docs: DataFrame, idCol: String, textCol: String,
      w: Int, maxDf: Int): DataFrame = {
    import graft.functions.{TextFunctions => T}
    val spans = docs.select(col(idCol).as("__id"),
      explode(T.shingleHashes(col(textCol), w)).as("__h"))
    val df = spans.groupBy(col("__h"))
      .agg(countDistinct(col("__id")).as("__df"))
    val counts = spans.join(df, Seq("__h"))
      .groupBy(col("__id").as(idCol))
      .agg(
        count(lit(1)).as("n_spans"),
        sum(when(col("__df") === 1, 1L).otherwise(0L)).as("n_unique"),
        sum(when(col("__df") >= 2 && col("__df") <= maxDf, 1L).otherwise(0L)).as("n_shared"),
        sum(when(col("__df") > maxDf, 1L).otherwise(0L)).as("n_boilerplate"))
    docs.select(col(idCol)).join(counts, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("n_unique"), lit(0L)).as("n_unique"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        coalesce(col("n_boilerplate"), lit(0L)).as("n_boilerplate"),
        when(coalesce(col("n_spans"), lit(0L)) === 0, lit(0.0))
          .otherwise(col("n_unique").cast("double") / col("n_spans").cast("double"))
          .as("novelty"))
  }

  /** [[sharedSpanEdges]] with the edge weight = number of DISTINCT rare
    * spans the two documents share (the natural link strength for
    * [[pageRankWeighted]]): same pair join, `count` instead of
    * `distinct` (shingle hashes are already per-document distinct).
    * Weights are bounded by spans-per-document, far under the
    * [[pageRankWeighted]] overflow guard.
    */
  def sharedSpanEdgesWeighted(docs: DataFrame, idCol: String, textCol: String,
      w: Int, maxDf: Int): DataFrame = {
    import graft.functions.{TextFunctions => T}
    val spans = docs.select(col(idCol).as("__id"),
      explode(T.shingleHashes(col(textCol), w)).as("__h"))
    val rare = spans.groupBy(col("__h"))
      .agg(countDistinct(col("__id")).as("__df"))
      .where(col("__df") >= 2 && col("__df") <= maxDf)
      .select(col("__h"))
    val sp = spans.join(rare, Seq("__h"))
    val pairs = sp.select(col("__h"), col("__id").as("id_a"))
      .join(sp.select(col("__h"), col("__id").as("id_b")), Seq("__h"))
      .where(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("weight"))
    pairs.select(col("id_a").as("src"), col("id_b").as("dst"), col("weight"))
      .unionAll(pairs.select(col("id_b").as("src"), col("id_a").as("dst"), col("weight")))
  }
}
