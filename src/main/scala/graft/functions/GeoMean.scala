package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed custom aggregate (the UDAF surface the reference lacks —
  * SURVEY.md §2.4; closest analog is its domain calculators, reference
  * org.knime.core.data.columnar/.../domain/ColumnarDoubleDomainCalculator.java:68-96).
  *
  * Geometric mean via log-sum: associative + commutative buffer merge, so
  * Spark runs it with map-side partial aggregation — the distributed-
  * correctness template for all custom aggregates in this engine.
  */
object GeoMean extends Aggregator[Double, (Double, Long), Double] {
  override def zero: (Double, Long) = (0.0, 0L)
  override def reduce(b: (Double, Long), a: Double): (Double, Long) =
    if (a > 0) (b._1 + math.log(a), b._2 + 1) else b
  override def merge(x: (Double, Long), y: (Double, Long)): (Double, Long) =
    (x._1 + y._1, x._2 + y._2)
  override def finish(b: (Double, Long)): Double =
    if (b._2 == 0) Double.NaN else math.exp(b._1 / b._2)
  override def bufferEncoder: Encoder[(Double, Long)] = Encoders.product[(Double, Long)]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble

  /** Untyped-DataFrame entry point. */
  def asColumn(c: Column): Column = udaf(GeoMean).apply(c)
}
