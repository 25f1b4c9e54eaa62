package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

object Tables {
  /** Load a driver-provided table (TESTDATA.md). */
  def t(s: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(s, dir) else s.read.parquet(s"$dir/$name.parquet")

  /** events.parquet stores TIMESTAMP(NANOS) which Spark's parquet reader
    * rejects (no nanosecond timestamp type). Read nanos as Long
    * (legacy.parquet.nanosAsLong) and convert to microsecond timestamps —
    * the same truncation DuckDB applies, so oracle comparisons line up.
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.read
      .parquet(s"$dir/events.parquet")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts DIV 1000")))
  }

  type Q = (SparkSession, String) => DataFrame
}
