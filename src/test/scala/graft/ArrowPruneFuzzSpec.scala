package graft

import graft.sources.ArrowIpc
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

import java.nio.file.Files
import scala.util.Random

/** Randomized prune-equivalence net: for random schemas (scalar mix,
  * nested array/struct/map at random depths, dictionary-encoded string
  * columns, heavy nulls), `read(path, columns)` must equal
  * `read(path).select(columns)` for random column subsets including
  * permutations, duplicates, and the empty set. This stresses the wire
  * node/buffer span computation (wireNodeCount/wireBufferCount) across
  * type combinations no hand-written case covers — a wrong span silently
  * binds one column's buffers to another's vector.
  */
class ArrowPruneFuzzSpec extends SparkSpec {

  private def tmp(name: String) =
    Files.createTempDirectory(name).resolve("t").toString

  private def canonVal(v: Any): String = v match {
    case null => "null"
    case b: Array[Byte] => b.map(x => f"$x%02x").mkString
    case r: Row => r.toSeq.map(canonVal).mkString("[", ",", "]")
    case s: scala.collection.Seq[_] => s.map(canonVal).mkString("(", ",", ")")
    case m: scala.collection.Map[_, _] =>
      m.toSeq.map { case (k, x) => canonVal(k) + "->" + canonVal(x) }.sorted.mkString("{", ",", "}")
    case d: java.math.BigDecimal => d.stripTrailingZeros.toPlainString
    case x => x.toString
  }

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(canonVal).mkString("|")).sorted.toSeq

  private def randType(rnd: Random, depth: Int): DataType = {
    val scalars = Seq[DataType](LongType, IntegerType, DoubleType, BooleanType,
      StringType, BinaryType, DateType, TimestampType, DecimalType(12, 3), ShortType, ByteType)
    if (depth >= 2 || rnd.nextInt(3) > 0) scalars(rnd.nextInt(scalars.length))
    else rnd.nextInt(3) match {
      case 0 => ArrayType(randType(rnd, depth + 1), containsNull = true)
      case 1 => StructType((0 to rnd.nextInt(2)).map(i =>
        StructField(s"f$i", randType(rnd, depth + 1), nullable = true)))
      case _ => MapType(StringType, randType(rnd, depth + 1), valueContainsNull = true)
    }
  }

  private def randValue(rnd: Random, dt: DataType, depth: Int): Any =
    if (rnd.nextInt(6) == 0) null
    else dt match {
      case LongType => rnd.nextLong()
      case IntegerType => rnd.nextInt()
      case ShortType => rnd.nextInt().toShort
      case ByteType => rnd.nextInt().toByte
      case DoubleType => Seq(-0.0, 0.0, rnd.nextDouble() * 1e6, -rnd.nextDouble())(rnd.nextInt(4))
      case BooleanType => rnd.nextBoolean()
      case StringType => Seq("", "a", s"w${rnd.nextInt(8)}", "é퟿", "x" * rnd.nextInt(90))(rnd.nextInt(5))
      case BinaryType => Array.fill[Byte](rnd.nextInt(12))(rnd.nextInt().toByte)
      case DateType => java.sql.Date.valueOf(s"20${10 + rnd.nextInt(20)}-0${rnd.nextInt(9) + 1}-1${rnd.nextInt(9)}")
      case TimestampType => new java.sql.Timestamp(rnd.nextInt(Int.MaxValue).toLong * 1000L)
      case d: DecimalType => new java.math.BigDecimal(java.math.BigInteger.valueOf(rnd.nextInt(1000000)), d.scale)
      case ArrayType(et, _) => Seq.fill(rnd.nextInt(4))(randValue(rnd, et, depth + 1))
      case st: StructType => Row(st.fields.map(f => randValue(rnd, f.dataType, depth + 1)).toIndexedSeq: _*)
      case MapType(_, vt, _) =>
        (0 until rnd.nextInt(3)).map(i => s"k$i" -> randValue(rnd, vt, depth + 1)).toMap
      case o => throw new IllegalArgumentException(o.toString)
    }

  test("random schemas x random column subsets: pruned read == full.select, 15 rounds") {
    val rnd = new Random(424242)
    (0 until 15).foreach { round =>
      val nCols = 3 + rnd.nextInt(5)
      val schema = StructType((0 until nCols).map(i =>
        StructField(s"c$i", randType(rnd, 0), nullable = true)))
      val stringCols = schema.fields.filter(_.dataType == StringType).map(_.name)
      val dictCols: Set[String] =
        if (stringCols.nonEmpty && rnd.nextBoolean()) Set(stringCols(rnd.nextInt(stringCols.length)))
        else Set.empty
      val n = 100 + rnd.nextInt(400)
      val rows = (0 until n).map(_ => Row(schema.fields.map(f => randValue(rnd, f.dataType, 0)).toIndexedSeq: _*))
      val out = tmp(s"ipc_prune_fuzz_$round")
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1 + rnd.nextInt(2)), schema)
      ArrowIpc.write(df, out, batchRows = 32 + rnd.nextInt(96), dictColumns = dictCols)
      val full = ArrowIpc.read(spark, out)
      // random subsets: singles, permutations, duplicates, empty
      val names = schema.fieldNames.toSeq
      val subsets: Seq[Seq[String]] = Seq(
        Seq(names(rnd.nextInt(names.length))),
        rnd.shuffle(names),
        rnd.shuffle(names).take(1 + rnd.nextInt(names.length)),
        { val a = names(rnd.nextInt(names.length)); Seq(a, names(rnd.nextInt(names.length)), a) })
      subsets.foreach { cols =>
        val pruned = ArrowIpc.read(spark, out, cols)
        assert(pruned.schema.fieldNames.toSeq == cols, s"round $round schema for $cols ($schema)")
        assert(canon(pruned) == canon(full.select(cols.map(col): _*)),
          s"round $round values for $cols over ${schema.simpleString} dict=$dictCols")
      }
      assert(ArrowIpc.read(spark, out, Nil).count() == n, s"round $round zero-column count")
    }
  }
}
