package graft

import graft.sources.ArrowIpc
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._

import java.nio.file.Files
import scala.util.Random

/** Randomized adversarial net over the batch-statistics skip logic: for
  * random tables (adversarial value pools: signed zeros, empty strings,
  * near-surrogate code points, extreme longs, heavy nulls, all-null
  * batches) and random filter trees, a filtered read must equal the full
  * read under the translated predicate — EXACTLY, every round. The two
  * review-found row-loss bugs (signed-zero ordering, surrogate prefix
  * successor) are the class this hunts: any skip decision that disagrees
  * with Spark's residual semantics loses rows silently.
  */
class ArrowFilterFuzzSpec extends SparkSpec {

  private def tmp(name: String) =
    Files.createTempDirectory(name).resolve("t").toString

  private val longPool = Array(Long.MinValue, -1L, 0L, 1L, 42L, 1000L, Long.MaxValue, 7L, -999999L)
  private val doublePool = Array(-0.0, 0.0, 1.5, -1.5, 1e-300, -1e300, 0.1, 123.456, 2.0)
  private val stringPool = Array("", "a", "a퟿x", "a퟿", "zzz", "cat_1", "CAT_1",
    "élève", "0", "a" * 64, "￿", "b￿￿")

  private def randRows(rnd: Random, n: Int): Seq[Row] = (0 until n).map { _ =>
    Row(
      if (rnd.nextInt(8) == 0) null else longPool(rnd.nextInt(longPool.length)),
      if (rnd.nextInt(6) == 0) null else doublePool(rnd.nextInt(doublePool.length)),
      if (rnd.nextInt(5) == 0) null else stringPool(rnd.nextInt(stringPool.length)),
      // nested struct: struct-null rows AND leaf-null slots both in play
      if (rnd.nextInt(6) == 0) null
      else Row(
        if (rnd.nextInt(7) == 0) null else longPool(rnd.nextInt(longPool.length)),
        if (rnd.nextInt(5) == 0) null else stringPool(rnd.nextInt(stringPool.length))))
  }

  private val schema = StructType(Seq(
    StructField("l", LongType, nullable = true),
    StructField("d", DoubleType, nullable = true),
    StructField("s", StringType, nullable = true),
    StructField("m", StructType(Seq(
      StructField("l2", LongType, nullable = true),
      StructField("s2", StringType, nullable = true))), nullable = true)))

  /** A random filter over one of the three columns, values drawn from the
    * pools (so boundaries are hit constantly) — plus And/Or/Not nests.
    */
  private def randFilter(rnd: Random, depth: Int = 0): Filter = {
    def leaf(): Filter = {
      val c = rnd.nextInt(5)
      val (a, v): (String, Any) = c match {
        case 0 => ("l", longPool(rnd.nextInt(longPool.length)))
        case 1 => ("d", doublePool(rnd.nextInt(doublePool.length)))
        case 2 => ("m.l2", longPool(rnd.nextInt(longPool.length)))
        case 3 => ("m.s2", stringPool(rnd.nextInt(stringPool.length)))
        case _ => ("s", stringPool(rnd.nextInt(stringPool.length)))
      }
      val isString = a == "s" || a == "m.s2"
      rnd.nextInt(8) match {
        case 0 => EqualTo(a, v)
        case 1 => GreaterThan(a, v)
        case 2 => GreaterThanOrEqual(a, v)
        case 3 => LessThan(a, v)
        case 4 => LessThanOrEqual(a, v)
        case 5 => IsNull(a)
        case 6 => IsNotNull(a)
        case _ if isString => StringStartsWith(a, v.toString.take(1 + rnd.nextInt(3)))
        case _ => In(a, Array(v, if (a == "d") doublePool(rnd.nextInt(doublePool.length))
          else longPool(rnd.nextInt(longPool.length))))
      }
    }
    if (depth >= 2) leaf()
    else rnd.nextInt(5) match {
      case 0 => And(randFilter(rnd, depth + 1), randFilter(rnd, depth + 1))
      case 1 => Or(randFilter(rnd, depth + 1), randFilter(rnd, depth + 1))
      case 2 if depth == 0 => Not(randFilter(rnd, depth + 1))
      case _ => leaf()
    }
  }

  private def toColumn(f: Filter): org.apache.spark.sql.Column = f match {
    case EqualTo(a, v) => col(a) === lit(v)
    case GreaterThan(a, v) => col(a) > lit(v)
    case GreaterThanOrEqual(a, v) => col(a) >= lit(v)
    case LessThan(a, v) => col(a) < lit(v)
    case LessThanOrEqual(a, v) => col(a) <= lit(v)
    case In(a, vs) => col(a).isin(vs.toIndexedSeq: _*)
    case IsNull(a) => col(a).isNull
    case IsNotNull(a) => col(a).isNotNull
    case And(x, y) => toColumn(x) && toColumn(y)
    case Or(x, y) => toColumn(x) || toColumn(y)
    case Not(x) => !toColumn(x)
    case StringStartsWith(a, p) => col(a).startsWith(p)
    case o => throw new IllegalArgumentException(o.toString)
  }

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map {
      // print doubles via raw bits so -0.0 vs 0.0 differences in the DATA
      // still compare equal row-for-row between the two paths
      case dd: java.lang.Double => java.lang.Double.doubleToLongBits(dd).toString
      case x => String.valueOf(x)
    }.mkString("|")).sorted.toSeq

  test("random tables x random filters: filtered read == full.where, 40 rounds") {
    val rnd = new Random(20260816)
    (0 until 40).foreach { round =>
      val n = 200 + rnd.nextInt(1200)
      val out = tmp(s"ipc_fuzz_$round")
      val sorted = rnd.nextBoolean() // sorted stores make skips actually fire
      val base = spark.createDataFrame(
        spark.sparkContext.parallelize(randRows(rnd, n), 1 + rnd.nextInt(3)), schema)
      val df =
        if (!sorted) base
        // sometimes sort by the nested leaf so nested-stat skips fire
        else if (rnd.nextBoolean()) base.orderBy("l", "d", "s")
        else base.orderBy(col("m.l2"), col("m.s2"), col("l"))
      ArrowIpc.write(df, out, batchRows = 64 + rnd.nextInt(192))
      val full = ArrowIpc.read(spark, out)
      (0 until 6).foreach { _ =>
        val f = randFilter(rnd)
        val got = canon(ArrowIpc.readFiltered(spark, out, Seq(f)))
        val want = canon(full.where(toColumn(f)))
        assert(got == want,
          s"round $round sorted=$sorted filter=$f: got ${got.size} rows, want ${want.size}")
      }
    }
  }
}
