package graft.table

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Generic persisted DERIVED table — any DataFrame computed FROM another
  * artifact, stored with that artifact's state fingerprint so staleness
  * is detectable instead of silent. This is the
  * [[graft.text.HyperBallStore]] source-certificate pattern factored out
  * for flat results (rank tables, centrality readouts, precomputed
  * reports): a persisted PageRank over a
  * [[graft.text.LinkGraphStore]] that mutated afterwards is still a
  * correct ranking OF THE OLD GRAPH — correct for what it certifies,
  * wrong for what the caller thinks it describes — and nothing in the
  * data itself can reveal that. The fingerprint can.
  *
  * == Layout ==
  * {{{
  *   dir/data/            parquet
  *   dir/_manifest.json   {version, rows, source}   written LAST
  * }}}
  * Data first, manifest last: a torn save leaves a dir that fails loud
  * on the missing/old manifest, never a manifest certifying data that
  * is not fully there. A re-save overwrites data then re-certifies.
  *
  * `source` is an opaque fingerprint string from the upstream artifact —
  * [[graft.text.LinkGraphStore.stateFingerprint]] today; anything
  * stable-by-value works. [[loadChecked]] compares it against the
  * upstream's CURRENT fingerprint and refuses to serve a mismatch;
  * [[load]] serves unconditionally (callers who hold no upstream handle).
  */
object DerivedStore {

  /** Persist `df` certified against `source`. The fingerprint should be
    * captured BEFORE computing `df` and re-captured/compared after if
    * the upstream admits concurrent writers (the buildFromGraph
    * discipline); single-writer pipelines can pass it directly.
    */
  def save(df: DataFrame, dir: String, source: String): Unit = {
    val spark = df.sparkSession
    // invalidate the old certificate FIRST: a crash mid-overwrite must
    // not leave the previous manifest over half-rewritten data
    val manifestPath = new org.apache.hadoop.fs.Path(dir, "_manifest.json")
    val fs = manifestPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(manifestPath)) fs.delete(manifestPath, false)
    // row count from the WRITING job itself (observe rides the write's
    // scan) — a post-write re-read is footer-cheap at test scale but an
    // extra job over the whole data dir at a 100 TB derived table
    val obs = org.apache.spark.sql.Observation()
    df.observe(obs, org.apache.spark.sql.functions
        .count(org.apache.spark.sql.functions.lit(1)).as("rows"))
      .write.mode("overwrite").parquet(s"$dir/data")
    val rows = obs.get("rows").asInstanceOf[Long]
    val esc = new com.fasterxml.jackson.databind.ObjectMapper()
      .writeValueAsString(source)
    graft.sources.ArtifactJson.writeFile(spark, s"$dir/_manifest.json",
      s"""{"version":1,"rows":$rows,"source":$esc}""")
  }

  /** The stored table, no freshness check. */
  def load(spark: SparkSession, dir: String): DataFrame = {
    requireManifest(spark, dir)
    spark.read.parquet(s"$dir/data")
  }

  /** The stored table, refusing to serve when the upstream moved on. */
  def loadChecked(spark: SparkSession, dir: String,
      currentSource: String): DataFrame = {
    requireFresh(spark, dir, currentSource)
    spark.read.parquet(s"$dir/data")
  }

  /** The fingerprint the store was certified against. */
  def sourceOf(spark: SparkSession, dir: String): String = {
    val node = requireManifest(spark, dir)
    val v = node.get("source")
    require(v != null && v.isTextual,
      s"DerivedStore: malformed manifest under $dir (no source)")
    v.asText()
  }

  def isStale(spark: SparkSession, dir: String, currentSource: String): Boolean =
    sourceOf(spark, dir) != currentSource

  def requireFresh(spark: SparkSession, dir: String, currentSource: String): Unit = {
    val src = sourceOf(spark, dir)
    require(src == currentSource,
      s"DerivedStore: $dir is STALE - computed at $src, upstream now at " +
        s"$currentSource. The stored table describes the OLD upstream state; " +
        "recompute and save again")
  }

  private def requireManifest(spark: SparkSession, dir: String) = {
    val p = new org.apache.hadoop.fs.Path(dir, "_manifest.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p), s"DerivedStore: no _manifest.json under $dir - " +
      "either never saved or a save crashed mid-overwrite (the certificate " +
      "is deleted before the data rewrite); recompute with DerivedStore.save")
    graft.sources.ArtifactJson.readFile(spark, s"$dir/_manifest.json")
  }
}
