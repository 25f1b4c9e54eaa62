package graft

import java.nio.file.Files

import graft.sources.ArrowIpc
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import scala.jdk.CollectionConverters._

/** ScalaCheck fuzz for the Arrow IPC store: random nested/dict/null
  * schemas and batch splits through write→read must round-trip exactly
  * (the property-test analog of the reference's per-type data-test
  * matrix — the golden files prove known shapes, this hunts unknown
  * ones). Deterministic seed-driven sampling, same style as
  * [[PropertySpec]] (no scalatest-scalacheck bridge offline).
  */
class ArrowIpcFuzzSpec extends SparkSpec {

  private def sample[A](g: Gen[A], seed: Long): A = {
    var s = seed
    var r = g.apply(Gen.Parameters.default, Seed(s))
    while (r.isEmpty) { s += 1; r = g.apply(Gen.Parameters.default, Seed(s)) }
    r.get
  }

  // --- schema generation -------------------------------------------------

  private val leafGen: Gen[DataType] = Gen.oneOf(
    BooleanType, ByteType, ShortType, IntegerType, LongType, FloatType,
    DoubleType, StringType, BinaryType, DateType, TimestampType,
    DecimalType(10, 2))

  private def typeGen(depth: Int): Gen[DataType] =
    if (depth <= 0) leafGen
    else Gen.frequency(
      5 -> leafGen,
      2 -> typeGen(depth - 1).map(ArrayType(_, containsNull = true)),
      2 -> Gen.choose(1, 3).flatMap(n =>
        Gen.listOfN(n, typeGen(depth - 1)).map(ts =>
          StructType(ts.zipWithIndex.map { case (t, i) =>
            StructField(s"f$i", t, nullable = true)
          }))),
      1 -> Gen.zip(Gen.oneOf(IntegerType: DataType, StringType: DataType), typeGen(depth - 1))
        .map { case (k, v) => MapType(k, v, valueContainsNull = true) })

  private val schemaGen: Gen[StructType] = for {
    n <- Gen.choose(1, 4)
    ts <- Gen.listOfN(n, typeGen(2))
  } yield StructType(StructField("id", LongType, nullable = false) +:
    ts.zipWithIndex.map { case (t, i) => StructField(s"c$i", t, nullable = true) })

  // --- value generation --------------------------------------------------

  private def valueGen(dt: DataType, nullable: Boolean): Gen[Any] = {
    val v: Gen[Any] = dt match {
      case BooleanType => Gen.oneOf(true, false)
      case ByteType => Gen.choose(-128, 127).map(_.toByte)
      case ShortType => Gen.choose(-32768, 32767).map(_.toShort)
      case IntegerType => Gen.choose(Int.MinValue, Int.MaxValue)
      case LongType => Gen.choose(Long.MinValue, Long.MaxValue)
      case FloatType => Gen.oneOf(Gen.choose(-1e6f, 1e6f), Gen.oneOf(0.0f, -0.0f, Float.NaN))
      case DoubleType => Gen.oneOf(Gen.choose(-1e12, 1e12), Gen.oneOf(0.0, -0.0, Double.NaN))
      case StringType => Gen.frequency(
        4 -> Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, Gen.alphaNumChar).map(_.mkString)),
        2 -> Gen.oneOf("", "dup", "αβγ ☃ snow", "a\nb\tc"),
        1 -> Gen.const("shared-dict-value")) // repeats exercise dictionaries
      case BinaryType => Gen.choose(0, 16).flatMap(n =>
        Gen.listOfN(n, Gen.choose(-128, 127).map(_.toByte)).map(_.toArray))
      case DateType => Gen.choose(-30000, 30000).map(d =>
        java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(d.toLong)))
      case TimestampType => Gen.choose(-4102444800000L, 4102444800000L)
        .map(ms => new java.sql.Timestamp(ms))
      case d: DecimalType => Gen.choose(-99999999L, 99999999L)
        .map(u => BigDecimal(u, d.scale).bigDecimal)
      case ArrayType(et, cn) => Gen.choose(0, 4).flatMap(n =>
        Gen.listOfN(n, valueGen(et, cn)).map(_.toSeq))
      case st: StructType =>
        Gen.sequence[List[Any], Any](st.fields.map(f => valueGen(f.dataType, f.nullable)).toList)
          .map(vs => Row.fromSeq(vs))
      case MapType(kt, vt, vcn) => Gen.choose(0, 3).flatMap(n =>
        Gen.listOfN(n, Gen.zip(valueGen(kt, nullable = false), valueGen(vt, vcn)))
          .map(_.toMap))
      case other => throw new IllegalArgumentException(other.toString)
    }
    if (nullable) Gen.frequency(4 -> v, 1 -> Gen.const(null)) else v
  }

  private def rowsGen(schema: StructType, n: Int): Gen[List[Row]] =
    Gen.sequence[List[Row], Row]((0 until n).toList.map(i =>
      Gen.sequence[List[Any], Any](schema.fields.toList.map {
        case StructField("id", _, _, _) => Gen.const(i.toLong): Gen[Any]
        case f => valueGen(f.dataType, f.nullable)
      }).map(Row.fromSeq(_))))

  // --- canonical comparison ----------------------------------------------

  private def canon(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (b: Array[Byte], BinaryType) => b.toVector
    case (s: scala.collection.Seq[_], ArrayType(et, _)) => s.map(canon(_, et)).toVector
    case (r: Row, st: StructType) =>
      st.fields.toVector.zipWithIndex.map { case (f, i) => canon(r.get(i), f.dataType) }
    case (m: scala.collection.Map[_, _], MapType(kt, vt, _)) =>
      m.toVector.map { case (k, x) => (canon(k, kt), canon(x, vt)) }
        .sortBy(_._1.toString)
    case (d: java.math.BigDecimal, _: DecimalType) => d.stripTrailingZeros
    case (f: Float, FloatType) => java.lang.Float.floatToIntBits(f)
    case (d: Double, DoubleType) => java.lang.Double.doubleToLongBits(d)
    case (x, _) => x
  }

  private def canonRows(rows: Array[Row], schema: StructType): Seq[Vector[Any]] =
    rows.map(r => schema.fields.toVector.zipWithIndex.map { case (f, i) =>
      canon(r.get(i), f.dataType)
    }).toSeq.sortBy(_.head.toString.toLong)

  // the reader annotates dict-encoded leaves with graft.arrow.* metadata
  // (so a re-write re-encodes them) — erase metadata before comparing
  private def stripMeta(dt: DataType): DataType = dt match {
    case st: StructType => StructType(st.fields.map(f =>
      StructField(f.name, stripMeta(f.dataType), f.nullable)))
    case ArrayType(et, cn) => ArrayType(stripMeta(et), cn)
    case MapType(kt, vt, vcn) => MapType(stripMeta(kt), stripMeta(vt), vcn)
    case o => o
  }

  // dotted dict paths for every string/binary leaf reachable in a schema
  private def dictPaths(dt: DataType, prefix: String): Seq[String] = dt match {
    case StringType | BinaryType => Seq(prefix)
    case ArrayType(et, _) => dictPaths(et, s"$prefix.element")
    case st: StructType => st.fields.toSeq.flatMap(f => dictPaths(f.dataType, s"$prefix.${f.name}"))
    case MapType(kt, vt, _) =>
      dictPaths(kt, s"$prefix.key") ++ dictPaths(vt, s"$prefix.value")
    case _ => Seq.empty
  }

  test("write→read round-trips 100 random schemas exactly (nested, dict, null, multi-batch)") {
    val base = Files.createTempDirectory("graft_arrow_fuzz").toString
    for (caseNo <- 0 until 100) {
      val seed = 1000L + caseNo * 17L
      val schema = sample(schemaGen, seed)
      val nRows = sample(Gen.frequency(5 -> Gen.choose(1, 60), 1 -> Gen.const(0)), seed + 1)
      val rows = sample(rowsGen(schema, nRows), seed + 2)
      val batchRows = sample(Gen.oneOf(1, 3, 7, 64), seed + 3)
      // dictionary-encode a seeded subset of eligible leaves
      val eligible = schema.fields.toSeq.flatMap(f => dictPaths(f.dataType, f.name))
      val dictCols = eligible.zipWithIndex.filter { case (_, i) =>
        (seed + i) % 3 == 0
      }.map(_._1).toSet
      val df = spark.createDataFrame(rows.asJava, schema)
      val out = s"$base/case$caseNo"
      try {
        ArrowIpc.write(df, out, batchRows = batchRows, dictColumns = dictCols)
        val back = ArrowIpc.read(spark, out)
        assert(back.schema.map(f => (f.name, stripMeta(f.dataType), f.nullable)) ==
          schema.map(f => (f.name, stripMeta(f.dataType), f.nullable)),
          s"case $caseNo (seed $seed): schema mismatch\n$schema\n${back.schema}")
        val got = canonRows(back.collect(), schema)
        val want = canonRows(rows.toArray, schema)
        assert(got == want,
          s"case $caseNo (seed $seed, rows $nRows, batch $batchRows, dict $dictCols): data mismatch")
      } catch {
        case e: AssertionError => throw e
        case e: Throwable =>
          fail(s"case $caseNo (seed $seed, batch $batchRows, dict $dictCols, schema $schema): $e")
      }
    }
  }
}
