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

  /** Salted equi-join for skewed join keys: every row of the LARGE side
    * gets a random-but-deterministic salt in [0, salts); the SMALL(er)
    * side is replicated `salts`× (explode), and the join runs on
    * (key, salt) — a skewed key's rows now spread over `salts` reducers
    * instead of one. Use when AQE's skew-join split doesn't apply (e.g.
    * the skew is in a single key within one partition after other
    * operators, or deterministic layout is needed). Inner/left joins only
    * (right/full would need salt-aware null handling on the replicated
    * side). Cost model: replication multiplies the small side's shuffle
    * volume by `salts` — pick salts ≈ (largest key count / target rows
    * per task), keep the replicated side the smaller one.
    */
  def saltedJoin(
      large: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      joinType: String = "inner",
      salts: Int = 16
  ): DataFrame = {
    require(joinType == "inner" || joinType == "left",
      s"saltedJoin supports inner/left, got $joinType")
    val saltL = "__graft_salt"
    // deterministic per-row salt: hash of partition+offset, uniform, no RNG
    val saltedLarge = large.withColumn(
      saltL, pmod(xxhash64(spark_partition_id(), monotonically_increasing_id()), lit(salts)).cast("int"))
    val replicated = small.withColumn(saltL, explode(sequence(lit(0), lit(salts - 1))))
    saltedLarge.join(replicated, keys :+ saltL, joinType).drop(saltL)
  }
}
