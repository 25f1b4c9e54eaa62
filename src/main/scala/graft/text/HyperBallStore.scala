package graft.text

import graft.functions.RegisterMaxAggregator
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted HyperBall register artifact — build the per-hop register
  * snapshots ONCE over a link graph, serve every reach readout from disk.
  * Round 12 measured q_reach_estimate / q_reach_harmonic /
  * q_reach_distribution as three of the most expensive bench lanes, and
  * each one RE-PROPAGATES the same registers over the same edges
  * (O(hops·|E|) register shuffles per query, three times per round).
  * With the artifact the propagation happens once; each readout is a
  * node-sized scan + the estimate expression. Reference analog: the
  * write-once/read-many batch store (reference
  * org.knime.core.columnar.arrow/…/ArrowBatchStore.java:57-62).
  *
  * == Layout ==
  * {{{
  *   dir/regs/hop=D/bucket=B/  (id: long, reg: array<int>)   D = 0…maxHops
  *   dir/_manifest.json        {version, m, maxHops, nNodes, nBuckets}  LAST
  * }}}
  * Registers are integers and every merge is a max, so stored snapshots
  * are BIT-IDENTICAL to the in-memory propagation's — the artifact gates
  * share the from-scratch XxhSql oracles. Buckets (pmod(xxhash64(id)))
  * give one file per bucket and keep a future single-document reach
  * lookup bucket-prunable.
  *
  * == Incremental maintenance: what is (and is not) sound ==
  *
  * [[extendTo]] DEEPENS the horizon on the UNCHANGED graph: hop-(d+1)
  * balls are exactly one max-merge round over hop-d balls
  * (B_(d+1)(v) = {v} ∪ ⋃_(v→u) B_d(u)), so continuing from the stored
  * last hop is bit-identical to a deeper rebuild (HyperBallStoreSpec +
  * the gate prove it). EDGE GROWTH is NOT incrementally serveable: a new
  * edge shortens distances retroactively at every hop — hop-d balls
  * under the grown graph are not derivable from the old hop-d balls
  * (the old registers are only a LOWER bound, and max-merging new paths
  * in would need the new graph's full propagation anyway). On growth,
  * rebuild — the artifact's win is amortizing the per-READOUT
  * re-propagation, which is where the measured cost was.
  *
  * Write ordering: hop surfaces first, manifest LAST. A torn EXTEND is
  * invisible (the manifest still certifies the old horizon; hops above
  * it are uncommitted, and a same-graph retry rewrites them
  * byte-identically) — the [[graft.streaming.StreamingLinkGraph]] replay
  * discipline without a marker per hop. A torn REBUILD cannot hide
  * behind the old manifest (the graph may have changed), so [[build]]
  * deletes the manifest before touching data: a crash mid-rebuild
  * leaves a dir that fails loud with "no _manifest — build", never a
  * stale certificate over mixed-graph registers.
  */
object HyperBallStore {

  final case class Manifest(version: Int, m: Int, maxHops: Int, nNodes: Long,
      nBuckets: Int)

  /** Propagate `maxHops` rounds and persist every hop's registers
    * (hop 0 = singleton balls). Ids are ingested as LONG (the
    * artifact-family id discipline).
    */
  def build(nodes: DataFrame, idCol: String, edges: DataFrame, maxHops: Int,
      dir: String, nBuckets: Int = 64): Unit = {
    require(maxHops >= 1, s"HyperBallStore.build: maxHops $maxHops < 1")
    require(nBuckets >= 1, s"HyperBallStore.build: nBuckets $nBuckets < 1")
    val spark = nodes.sparkSession
    val regsRoot = new org.apache.hadoop.fs.Path(s"$dir/regs")
    val fs = regsRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // REBUILD discipline: invalidate the old manifest FIRST, then clear
    // the hop dirs. A rebuild crash anywhere after this point leaves a
    // manifest-less dir and readers fail with the clean "no _manifest"
    // message — never a stale manifest over deleted/mixed-graph hops
    // (extendTo's marker-free replay safety only holds on an UNCHANGED
    // graph; a rebuild is the changed-graph path)
    val manifestPath = new org.apache.hadoop.fs.Path(dir, "_manifest.json")
    if (fs.exists(manifestPath)) fs.delete(manifestPath, false)
    // full overwrite: stale hop dirs from an earlier, deeper build must
    // not survive under the new manifest
    if (fs.exists(regsRoot)) fs.delete(regsRoot, true)
    val ids = nodes.select(col(idCol).cast("long").as("id"))
    val e = edges.select(col("src"), col("dst"))
      .where(col("src") =!= col("dst")).distinct().cache()
    try {
      var regs = ids.select(col("id"), HyperBall.initRegisters(col("id")).as("reg"))
        .localCheckpoint(true)
      val nNodes = regs.count()
      writeHop(regs, dir, 0, nBuckets)
      var d = 0
      while (d < maxHops) {
        val prev = regs
        regs = round(e, regs).localCheckpoint(true)
        graft.Pins.release(prev) // superseded round (unpersist is a checkpoint no-op)
        d += 1
        writeHop(regs, dir, d, nBuckets)
      }
      graft.Pins.release(regs)
      writeManifest(spark, dir, Manifest(1, HyperBall.M, maxHops, nNodes, nBuckets))
    } finally e.unpersist()
  }

  /** Continue the propagation from the stored last hop to `newMaxHops`
    * on the SAME graph — bit-identical to a deeper rebuild (see class
    * doc for why this is the one sound incremental axis). Hops already
    * stored are never recomputed or rewritten.
    */
  def extendTo(edges: DataFrame, dir: String, newMaxHops: Int): Unit = {
    val spark = edges.sparkSession
    val m = loadManifest(spark, dir)
    require(newMaxHops > m.maxHops,
      s"HyperBallStore.extendTo: newMaxHops $newMaxHops must exceed the stored " +
        s"horizon ${m.maxHops} (shallower readouts just read the stored hops)")
    val e = edges.select(col("src"), col("dst"))
      .where(col("src") =!= col("dst")).distinct().cache()
    try {
      var regs = readHop(spark, dir, m.maxHops).localCheckpoint(true)
      var d = m.maxHops
      while (d < newMaxHops) {
        val prev = regs
        regs = round(e, regs).localCheckpoint(true)
        graft.Pins.release(prev)
        d += 1
        writeHop(regs, dir, d, m.nBuckets)
      }
      graft.Pins.release(regs)
      writeManifest(spark, dir, m.copy(maxHops = newMaxHops)) // manifest LAST
    } finally e.unpersist()
  }

  /** [[HyperBall.neighborhoodEstimate]] served from the stored registers
    * at the manifest horizon (or a shallower `hops`).
    */
  def neighborhoodEstimate(spark: SparkSession, dir: String, idCol: String,
      hops: Int = -1): DataFrame = {
    val m = loadManifest(spark, dir)
    val d = if (hops < 0) m.maxHops else hops
    require(d >= 0 && d <= m.maxHops,
      s"HyperBallStore: hop $d outside the stored horizon [0, ${m.maxHops}]")
    readHop(spark, dir, d)
      .select(col("id").as(idCol), HyperBall.estimate(col("reg")).as("__e"))
      .select(col(idCol), col("__e.est_ball").as("est_ball"),
        col("__e.n_zero").as("n_zero"))
  }

  /** Point lookup: reach estimates for a SMALL driver-side id set,
    * reading ONLY the ids' hash buckets of one hop surface (the
    * bucket-partitioned layout's payoff — a "how connected is this
    * document" probe costs a few files, not a corpus scan).
    */
  def neighborhoodEstimateFor(spark: SparkSession, dir: String, idCol: String,
      ids: Seq[Long], hops: Int = -1): DataFrame = {
    val m = loadManifest(spark, dir)
    val d = if (hops < 0) m.maxHops else hops
    require(d >= 0 && d <= m.maxHops,
      s"HyperBallStore: hop $d outside the stored horizon [0, ${m.maxHops}]")
    require(ids.nonEmpty, "HyperBallStore.neighborhoodEstimateFor: empty id set")
    val buckets = ids.map { i =>
      // the write path's pmod(xxhash64(id), n) replayed driver-side:
      // same kernel (seed 42), same sign fold
      val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
        i, org.apache.spark.sql.types.LongType, 42L)
      val n = m.nBuckets.toLong
      (((h % n) + n) % n).toInt
    }.distinct.sorted
    spark.read.schema(regsSchema).parquet(s"$dir/regs/hop=$d")
      .where(col("bucket").isInCollection(buckets) && col("id").isInCollection(ids))
      .select(col("id").as(idCol), HyperBall.estimate(col("reg")).as("__e"))
      .select(col(idCol), col("__e.est_ball").as("est_ball"),
        col("__e.n_zero").as("n_zero"))
  }

  /** [[HyperBall.neighborhoodFunction]] served from the stored snapshots
    * — identical expressions and fold order (bit-portable doubles).
    */
  def neighborhoodFunction(spark: SparkSession, dir: String, idCol: String): DataFrame = {
    val m = loadManifest(spark, dir)
    HyperBall.nfReadout(wideSnapshots(spark, dir, m.maxHops), idCol, m.maxHops)
  }

  /** [[HyperBall.distanceDistribution]] served from the stored snapshots. */
  def distanceDistribution(spark: SparkSession, dir: String, q: Double = 0.9,
      scaleBits: Int = 20): DataFrame = {
    val m = loadManifest(spark, dir)
    HyperBall.ddReadout(wideSnapshots(spark, dir, m.maxHops), spark, m.maxHops,
      q, scaleBits)
  }

  def loadManifest(spark: SparkSession, dir: String): Manifest = {
    import graft.sources.{ArtifactJson => J}
    val path = new org.apache.hadoop.fs.Path(dir, "_manifest.json")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(path), s"HyperBallStore: no _manifest.json under $dir - " +
      "build the artifact with HyperBallStore.build")
    val node = J.readFile(spark, s"$dir/_manifest.json")
    def num(f: String): Long = J.long(node, f, dir)
    Manifest(num("version").toInt, num("m").toInt, num("maxHops").toInt,
      num("nNodes"), num("nBuckets").toInt)
  }

  /** Stored registers of one hop (id, reg). */
  def readHop(spark: SparkSession, dir: String, d: Int): DataFrame =
    spark.read.schema(regsSchema).parquet(s"$dir/regs/hop=$d")
      .select(col("id"), col("reg"))

  // ---- internals ----

  /** One max-merge round: ball(v) ⊇ ball(u) for every edge v → u
    * (identical to [[HyperBall]]'s in-memory loop body).
    */
  private def round(e: DataFrame, regs: DataFrame): DataFrame = {
    val regMax = udaf(RegisterMaxAggregator(HyperBall.M))
    val nb = e.join(regs, col("dst") === col("id"))
      .select(col("src").as("id"), col("reg"))
    regs.unionAll(nb)
      .groupBy(col("id")).agg(regMax(col("reg")).as("reg"))
  }

  /** The wide `(id, __reg1 … __regD)` frame the shared readouts consume,
    * reassembled from the stored hop tables by id-joins (node-sized; the
    * expensive part — propagation — is what the store amortizes).
    */
  private def wideSnapshots(spark: SparkSession, dir: String, maxHops: Int): DataFrame =
    (1 to maxHops).foldLeft(readHop(spark, dir, 0).select(col("id"))) { (acc, d) =>
      acc.join(readHop(spark, dir, d).select(col("id"), col("reg").as(s"__reg$d")),
        Seq("id"))
    }

  private def writeHop(regs: DataFrame, dir: String, d: Int, nBuckets: Int): Unit =
    regs.withColumn("bucket",
        pmod(xxhash64(col("id")), lit(nBuckets.toLong)).cast("int"))
      .repartition(col("bucket")) // one file per bucket
      .write.mode("overwrite").partitionBy("bucket").parquet(s"$dir/regs/hop=$d")

  private def writeManifest(spark: SparkSession, dir: String, m: Manifest): Unit =
    graft.sources.ArtifactJson.writeFile(spark, s"$dir/_manifest.json",
      s"""{"version":${m.version},"m":${m.m},"maxHops":${m.maxHops},""" +
        s""""nNodes":${m.nNodes},"nBuckets":${m.nBuckets}}""")

  import org.apache.spark.sql.types._
  private val regsSchema = StructType(Seq(
    StructField("id", LongType),
    StructField("reg", ArrayType(IntegerType, containsNull = false)),
    StructField("bucket", IntegerType)))
}
