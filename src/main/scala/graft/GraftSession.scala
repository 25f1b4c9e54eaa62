package graft

import org.apache.spark.sql.SparkSession

/** Canonical session factory for the engine.
  *
  * The reference backend sizes its pipeline for a single machine
  * (worker pools min(max(cores/2,1),8), 64 MiB batches — reference
  * org.knime.core.data.columnar/.../preferences/ColumnarPreferenceUtils.java:163,
  * org.knime.core.columnar/.../badger/HeapBadger.java:94-97). Our engine
  * delegates all of that to Spark; what we fix here is the SQL-level
  * configuration that matters at cluster scale: AQE on (runtime
  * re-planning, skew-join splitting, partition coalescing), shuffle
  * partition count matched to the deployment (32 for local[32]; a real
  * cluster overrides via --conf), UTC session time zone for oracle
  * parity, and parquet as the canonical store format with zstd.
  */
object GraftSession {

  def builder(master: String = "local[32]", shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession
      .builder()
      .master(master)
      .appName("graft")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.sql.parquet.compression.codec", "zstd")
      .config("spark.sql.parquet.filterPushdown", "true")
      .config("spark.sql.parquet.aggregatePushdown", "true")
      // typed-Aggregator (udaf) pipelines: keep object hash aggregation in
      // the hash map instead of sort-based fallback at 128 distinct keys
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", (128L * 1024 * 1024).toString)

  def getOrCreate(master: String = "local[32]"): SparkSession = {
    val s = builder(master).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
