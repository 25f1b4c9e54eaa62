package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Elementwise-max aggregate over fixed-width `array<int>` register
  * vectors — the HyperBall merge ([[graft.text.HyperBall]]). One
  * m-int buffer updated in a tight loop; associative + commutative, so
  * Spark applies map-side partial aggregation and the shuffle carries
  * ONE register vector per (node, partition) — never per edge.
  */
case class RegisterMaxAggregator(m: Int) extends Aggregator[Seq[Int], Array[Int], Seq[Int]] {
  require(m >= 1, s"RegisterMaxAggregator: m $m < 1")

  override def zero: Array[Int] = new Array[Int](m)

  override def reduce(buf: Array[Int], in: Seq[Int]): Array[Int] = {
    var i = 0
    while (i < m) {
      val v = in(i)
      if (v > buf(i)) buf(i) = v
      i += 1
    }
    buf
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var i = 0
    while (i < m) {
      if (b(i) > a(i)) a(i) = b(i)
      i += 1
    }
    a
  }

  override def finish(buf: Array[Int]): Seq[Int] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Int]] = ExpressionEncoder[Array[Int]]()
  override def outputEncoder: Encoder[Seq[Int]] = ExpressionEncoder[Seq[Int]]()
}
