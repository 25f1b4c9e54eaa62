package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Mergeable quantile sketch aggregate (KLL, DataSketches) — the missing
  * piece of the incremental-domain story: min/max/nominal merge exactly
  * and distinct counts merge through HLL union, but quantile summaries
  * previously required a rescan. KLL sketches merge with preserved error
  * bounds (union of sketches ≡ sketch of the union up to the sketch's
  * normalized rank error, ~1.65% two-sided at k=200), so per-ingest
  * domain artifacts combine into table statistics without touching data
  * again — the analog of the reference's calculator-initialized-from-
  * prior-domain incremental update (DefaultDomainWritableConfig.java:88).
  *
  * Implemented as a [[TypedImperativeAggregate]] — the same shape Spark
  * uses for its own DataSketches HLL aggregate: the buffer IS the sketch
  * object (per-row update is a direct method call, no serialization);
  * bytes only materialize at partial/final exchange boundaries. At 100 TB
  * the pass stays one scan + a 1-row reduce of ~KB-sized sketch states.
  */
case class KllQuantileAgg(
    child: Expression,
    k: Int = 200,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[KllDoublesSketch] with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "kll_quantile_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: NumericType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kll_quantile_agg takes numeric input, got ${other.simpleString(10)}")
  }

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buf.update(child.dataType match {
      case DoubleType => v.asInstanceOf[Double]
      case FloatType => v.asInstanceOf[Float].toDouble
      case IntegerType => v.asInstanceOf[Int].toDouble
      case LongType => v.asInstanceOf[Long].toDouble
      case ShortType => v.asInstanceOf[Short].toDouble
      case ByteType => v.asInstanceOf[Byte].toDouble
      case _: DecimalType => v.asInstanceOf[org.apache.spark.sql.types.Decimal].toDouble
      case other => throw new IllegalStateException(s"unreachable input type $other")
    })
    buf
  }

  override def merge(buf: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buf.merge(other)
    buf
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(org.apache.datasketches.memory.Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): KllQuantileAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllQuantileAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllQuantileAgg =
    copy(child = newChild)
}

object KllQuantileAgg {
  import org.apache.spark.sql.graftbridge.Bridge

  /** Column form: binary KLL sketch of the (null-skipping) numeric input. */
  def kllSketch(c: Column, k: Int = 200): Column =
    Bridge.column(
      KllQuantileAgg(Bridge.expression(c), k).toAggregateExpression(isDistinct = false))

  /** Quantile readout from sketch bytes (driver-side). None when the
    * sketch saw no values (all-null column / empty table — getQuantile
    * throws on an empty sketch).
    */
  def quantile(sketch: Array[Byte], q: Double): Option[Double] = {
    val s = KllDoublesSketch.heapify(org.apache.datasketches.memory.Memory.wrap(sketch))
    if (s.isEmpty) None else Some(s.getQuantile(q))
  }

  /** Merge sketch byte arrays (union preserves KLL error bounds). */
  def mergeBytes(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val s = KllDoublesSketch.heapify(org.apache.datasketches.memory.Memory.wrap(a))
    s.merge(KllDoublesSketch.heapify(org.apache.datasketches.memory.Memory.wrap(b)))
    s.toByteArray
  }
}
