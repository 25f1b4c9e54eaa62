package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

object Tables {
  /** Load a driver-provided table (TESTDATA.md). */
  def t(s: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(s, dir) else s.read.parquet(s"$dir/$name.parquet")

  /** events.parquet has shipped with two physical `ts` layouts across
    * driver generations: TIMESTAMP(NANOS), which Spark's parquet reader
    * rejects (no nanosecond type) unless read as Long via
    * legacy.parquet.nanosAsLong, and TIMESTAMP(MICROS) without UTC
    * adjustment, which Spark reads as TIMESTAMP_NTZ. Dispatch on the
    * loaded type so both generations land on the same session-local
    * TimestampType micros (the session time zone is UTC, so the NTZ cast
    * is wall-clock- and micros-preserving; the nanos path truncates to
    * micros exactly like DuckDB, keeping oracle comparisons aligned).
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampType}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = s.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampType => raw
      case _ => raw.withColumn("ts", col("ts").cast(TimestampType)) // TIMESTAMP_NTZ
    }
  }

  type Q = (SparkSession, String) => DataFrame
}
