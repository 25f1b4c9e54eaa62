package graft.table

import org.apache.spark.sql.DataFrame

/** Partition-overwrite semantics pins for artifact writers.
  *
  * A full-surface rewrite (`mode("overwrite").partitionBy(...)`) has two
  * session-dependent meanings: STATIC deletes the whole path first (a
  * partition absent from the new data is gone), DYNAMIC replaces only the
  * partitions present in the write (absent partitions keep their old
  * files). Every artifact build/compaction in this repo depends on the
  * static meaning — a rebuild over an existing index with fewer
  * cells/shards/buckets must not resurrect the removed ones — so writers
  * must PIN the mode rather than inherit whatever the user session set
  * (`spark.sql.sources.partitionOverwriteMode` is a plain runtime conf).
  * The inverse pin (dynamic, for touched-partition appends) lives at its
  * two deliberate call sites (LinkGraphStore.overwriteBuckets,
  * Similarity.rebalanceIvfIndex), both of which also delete emptied
  * partitions explicitly.
  */
object WriteModes {

  /** Full partitioned overwrite with static semantics regardless of the
    * session's configured mode — via the PER-WRITE DataFrameWriter
    * option, never a session-conf mutation: gates share one session and
    * can run concurrently, and a set/restore of the global conf races
    * other writers into the wrong semantics (the CdcApply.scala:150
    * precedent — a concurrent dynamic touched-partition writer flipped
    * to static would delete its whole table root).
    */
  def staticPartitionOverwrite(df: DataFrame, path: String, cols: String*): Unit =
    df.write.option("partitionOverwriteMode", "static")
      .mode("overwrite").partitionBy(cols: _*).parquet(path)

  /** Same pin for a partitioned JSON overwrite (the JSONL export path). */
  def staticPartitionOverwriteJson(df: DataFrame, path: String, cols: String*): Unit =
    df.write.option("partitionOverwriteMode", "static")
      .mode("overwrite").partitionBy(cols: _*).json(path)
}
