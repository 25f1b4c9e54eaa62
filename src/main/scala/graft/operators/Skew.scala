package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling aggregation: the two-phase salted pattern for keys whose
  * group sizes are wildly unbalanced (at 100 TB a groupBy on a 3-value key
  * sends a third of the data to one reducer; salting fans each key out to
  * `salts` sub-keys first, then merges).
  *
  * Phase 1 shuffles on (key, salt) — `salts`× more, uniformly sized
  * groups; phase 2 shuffles `salts` rows per key. Associative aggregates
  * only (sum/count/min/max) — the same restriction the reference's domain
  * calculators have (merge-able running state, reference
  * org.knime.core.data.columnar/.../domain/ColumnarDoubleDomainCalculator.java:68-96).
  *
  * Note: Spark's own map-side partial aggregation already de-skews pure
  * aggregations; explicit salting is the tool for when the FINAL per-key
  * groups must be split — huge distinct-sets, collect_list tails, or
  * skewed join keys (pair with AQE skew-join for the join side).
  */
object Skew {

  /** Salted sum: sum(valueCol) grouped by keyCols, computed via a salt
    * fan-out of `salts` sub-groups per key.
    */
  def saltedSum(df: DataFrame, keyCols: Seq[String], valueCol: String, outName: String, salts: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
    salted
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(sum(col(valueCol)).as("__partial"))
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("__partial")).as(outName))
  }

  /** Salted distinct-count for high-cardinality values under skewed keys:
    * phase 1 dedups (key, value) pairs sharded by value hash, phase 2
    * counts — no single reducer ever holds a whole key's value set.
    */
  def saltedCountDistinct(df: DataFrame, keyCols: Seq[String], valueCol: String, outName: String, salts: Int = 16): DataFrame = {
    val sharded = df
      .select((keyCols.map(col) :+ col(valueCol).as("__v")): _*)
      .withColumn("__salt", pmod(xxhash64(col("__v")), lit(salts)))
      .dropDuplicates(keyCols :+ "__v")
    sharded
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(count(lit(1)).as("__partial"))
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("__partial")).as(outName))
  }
}
