package graft.text

import graft.functions.RegisterMaxAggregator
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HyperBall-style approximate neighborhood function (Boldi, Rosa &
  * Vigna 2011, public algorithm): per-node HLL registers, iterated
  * `registers(v) ← elementwise-max(registers(v), registers(u) for
  * v → u)` — after d rounds each node holds the registers of its exact
  * d-hop ball, because max-merge is idempotent (path overcounting
  * cannot inflate it).
  *
  * THIS is the all-roots answer at 100×: exact all-pairs centrality
  * materializes Σ|ball| (root, id) rows — measured 80 GB of spill and
  * an aborted job at the sf10 tier (SCALE.md round 9 finding 2) and
  * fail-fast-guarded since — while HyperBall shuffles |E| fixed-size
  * 64-int register arrays per round: O(hops · |E|) total, ball-size
  * independent, the published trick that took neighborhood functions to
  * web-graph scale. Trade-off: ~±13% standard error at m = 64 (raw
  * estimator, no small-range correction — see
  * [[graft.expressions.Hll.rawEstimate]]); exact lanes remain for
  * sampled roots ([[LinkGraph.centrality]]).
  *
  * Registers are integers and every merge is a max, so results are
  * BIT-DETERMINISTIC across partitionings — and the register/estimate
  * pipeline replays in DuckDB HUGEINT/BIGINT for a full oracle.
  */
object HyperBall {

  /** m = 64 registers (6-bit index / 58-bit rho domain) — fixed so the
    * oracle, the estimator constant (alpha_64 = 0.709), and the shuffle
    * width are all pinned.
    */
  val M: Int = graft.expressions.Hll.M

  private def b = org.apache.spark.sql.graftbridge.Bridge

  /** Singleton-ball registers of an id column. */
  def initRegisters(id: Column): Column =
    b.column(graft.expressions.HllInitRegisters(b.expression(id)))

  /** `struct<est_ball, n_zero>` readout of a register column. */
  def estimate(regs: Column): Column =
    b.column(graft.expressions.HllRawEstimate(b.expression(regs)))

  /** Per-node d-hop ball-size estimate over `edges (src, dst)`:
    * `(idCol, est_ball: double, n_zero: int)`. The ball INCLUDES the
    * node itself (est ≈ |B_d(v)|, v ∈ B_d(v)) — unlike
    * [[LinkGraph.centrality]]'s `reach`, which counts others only.
    * Each round: one equi-join of the register table against the edge
    * list + one map-side-combined max aggregation; register state is
    * localCheckpoint-pinned per round (same loop hygiene as the BFS).
    */
  def neighborhoodEstimate(nodes: DataFrame, idCol: String, edges: DataFrame,
      maxHops: Int): DataFrame = {
    require(maxHops >= 1, s"HyperBall.neighborhoodEstimate: maxHops $maxHops < 1")
    val ids = nodes.select(col(idCol).as("id"))
    val e = edges.select(col("src"), col("dst"))
      .where(col("src") =!= col("dst")).distinct().cache()
    val regMax = udaf(RegisterMaxAggregator(M))
    var regs = ids.select(col("id"), initRegisters(col("id")).as("reg"))
      .localCheckpoint(true)
    var d = 0
    while (d < maxHops) {
      // ball(v) ⊇ ball(u) for every edge v → u: v pulls u's registers
      val nb = e.join(regs, col("dst") === col("id"))
        .select(col("src").as("id"), col("reg"))
      regs = regs.unionAll(nb)
        .groupBy(col("id")).agg(regMax(col("reg")).as("reg"))
        .localCheckpoint(true)
      d += 1
    }
    e.unpersist()
    regs.select(col("id").as(idCol), estimate(col("reg")).as("__e"))
      .select(col(idCol), col("__e.est_ball").as("est_ball"), col("__e.n_zero").as("n_zero"))
  }
}
