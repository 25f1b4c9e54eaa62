package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fuzzy self-join: pairs of rows whose string key is within a bounded
  * edit distance — the entity-resolution / fuzzy-dedup primitive (near
  * matches of names, titles, URLs).
  *
  * Scale shape: a naive formulation is a cross join (|T|² levenshtein
  * calls). Here candidates come from LOSSLESS length blocking: strings
  * within edit distance d differ in length by at most d, so with bucket
  * width w > d, matching strings land in the same or adjacent length
  * buckets. One side emits its bucket, the other side emits
  * {bucket−1, bucket, bucket+1}; the equi-join on the bucket id is a
  * plain shuffled hash join and ONLY in-bucket pairs pay the levenshtein
  * verify. Completeness is a pigeonhole fact, not a heuristic — the
  * result equals the cross-join formulation exactly (PropertySpec/oracle
  * assert this). Pathological skew (everything the same length) degrades
  * toward per-bucket quadratic work — pre-block further (first-char,
  * n-gram) for such keys.
  */
object FuzzyJoin {

  /** (id_a, id_b, distance) with id_a < id_b and
    * levenshtein(key_a, key_b) ≤ maxDistance.
    */
  def selfJoin(
      df: DataFrame,
      keyCol: String,
      idCol: String,
      maxDistance: Int
  ): DataFrame = {
    require(maxDistance >= 0)
    val w = maxDistance + 1 // bucket width > max length difference
    val base = df.select(col(idCol).as("id"), col(keyCol).as("key"))
      .withColumn("__b", floor(length(col("key")) / w).cast("long"))
    val probe = base.select(
      col("id"), col("key"),
      explode(array(col("__b") - 1, col("__b"), col("__b") + 1)).as("__b"))
    base.as("a")
      .join(probe.as("b"), Seq("__b"))
      .where(col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("a.key").as("ka"), col("b.key").as("kb"))
      // cheap necessary condition first: codegen'd length filter ahead of
      // the O(len²) edit-distance kernel
      .where(abs(length(col("ka")) - length(col("kb"))) <= maxDistance)
      .withColumn("distance", levenshtein(col("ka"), col("kb")))
      .where(col("distance") <= maxDistance)
      .select(col("id_a"), col("id_b"), col("distance"))
      .distinct()
  }
}
