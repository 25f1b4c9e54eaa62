package graft

import graft.table.{Combine, KTable}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ScalaCheck operator-law coverage (SURVEY.md §5: property tests for
  * composition laws mirroring the reference's virtual-table behavior
  * tests). Deterministic seed-driven sampling (no scalatest-scalacheck
  * bridge in the offline cache).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private lazy val base = {
    val df = (0 until 200).map(i => (i, s"v$i", i * 0.5)).toDF("num", "label", "half").orderBy($"num").cache()
    df.count()
    df
  }

  test("law: slice(a,b)∘slice(c,d) == slice(c+a, min(c+b, d))") {
    val ranges = for {
      c <- Gen.choose(0L, 150L); d <- Gen.choose(c, 200L)
      a <- Gen.choose(0L, d - c); b <- Gen.choose(a, d - c)
    } yield (a, b, c, d)
    samples(ranges, 8).foreach { case (a, b, c, d) =>
      val lhs = KTable(base).slice(c, d).slice(a, b).df.select($"num").collect().map(_.getInt(0)).toSeq
      val rhs = KTable(base).slice(c + a, math.min(c + b, d)).df.select($"num").collect().map(_.getInt(0)).toSeq
      assert(lhs == rhs, s"a=$a b=$b c=$c d=$d")
    }
  }

  test("law: selectColumns(p)∘selectColumns(q) == selectColumns(p∘q)") {
    val perm = Gen.listOfN(3, Gen.choose(0, 2))
    samples(Gen.zip(perm, perm), 8).foreach { case (p, q) =>
      val lhs = KTable(base).selectColumns(p: _*).selectColumns(q: _*)
      val composed = q.map(p(_))
      val rhs = KTable(base).selectColumns(composed: _*)
      assert(lhs.df.collect().map(_.toSeq).toSeq == rhs.df.collect().map(_.toSeq).toSeq, s"p=$p q=$q")
    }
  }

  test("law: concatenate row count is sum of inputs; schema is union") {
    samples(Gen.choose(1, 199), 6).foreach { s =>
      val u = Combine.concatenate(Seq(base.limit(s), base.offset(s)))
      assert(u.count() == 200, s"split=$s")
      assert(u.columns.toSeq == base.columns.toSeq)
    }
  }

  test("law: concatenate(a, b-with-extra-col) nulls the extra for a's rows") {
    samples(Gen.choose(1, 50), 6).foreach { n =>
      val a = base.limit(n)
      val b = base.limit(n).withColumn("extra", lit(1))
      val u = Combine.concatenate(Seq(a, b))
      assert(u.where($"extra".isNull).count() == n)
      assert(u.where($"extra" === 1).count() == n)
    }
  }

  test("law: appendRowIndex values are 0..n-1 regardless of partitioning") {
    samples(Gen.choose(1, 8), 5).foreach { parts =>
      val idx = KTable(base.repartition(parts)).appendRowIndex("ri").df
        .select($"ri").collect().map(_.getLong(0)).sorted.toSeq
      assert(idx == (0L until 200L), s"parts=$parts")
    }
  }

  test("concatenate merges STRUCT columns recursively (union-by-name, typed nulls)") {
    import org.apache.spark.sql.types._
    val a = spark.createDataFrame(
      java.util.List.of(
        org.apache.spark.sql.Row(1L, org.apache.spark.sql.Row("x", 10)),
        org.apache.spark.sql.Row(2L, null)),
      StructType(Seq(
        StructField("id", LongType),
        StructField("info", StructType(Seq(
          StructField("name", StringType), StructField("region", IntegerType)))))))
    val b = spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(3L, org.apache.spark.sql.Row("y", 2.5))),
      StructType(Seq(
        StructField("id", LongType),
        StructField("info", StructType(Seq(
          StructField("name", StringType), StructField("score", DoubleType)))))))
    val u = Combine.concatenate(Seq(a, b)).orderBy($"id")
    val it = u.schema("info").dataType.asInstanceOf[StructType]
    assert(it.fieldNames.toSeq == Seq("name", "region", "score"))
    val rows = u.select($"info.name", $"info.region", $"info.score", $"info").collect()
    assert(rows(0).getString(0) == "x" && rows(0).getInt(1) == 10 && rows(0).isNullAt(2))
    assert(rows(1).isNullAt(3)) // null struct stays null, not struct-of-nulls
    assert(rows(2).getString(0) == "y" && rows(2).isNullAt(1) && rows(2).getDouble(2) == 2.5)
  }

  test("concatenate merges decimal and map column types") {
    import org.apache.spark.sql.types._
    val a = Seq((1, BigDecimal("12.345"))).toDF("id", "d")
      .select($"id", $"d".cast(DecimalType(10, 3)).as("d"), map(lit("k"), lit(1)).as("m"))
    val b = Seq((2, BigDecimal("99999.99"))).toDF("id", "d")
      .select($"id", $"d".cast(DecimalType(18, 2)).as("d"), map(lit("k"), lit(2L)).as("m"))
    val u = Combine.concatenate(Seq(a, b)).orderBy($"id")
    assert(u.schema("d").dataType == DecimalType(19, 3)) // 16 integral digits + 3 scale
    assert(u.schema("m").dataType == MapType(StringType, LongType, valueContainsNull = false))
    val vals = u.select($"d".cast("string")).collect().map(_.getString(0))
    assert(vals.toSeq == Seq("12.345", "99999.990"))
  }

  test("law: upsert is idempotent and right-biased") {
    import graft.operators.Merge
    val target = (0 until 50).map(i => (i, s"t$i")).toDF("k", "v")
    samples(Gen.choose(0, 49), 6).foreach { pivot =>
      val source = (pivot until 50).map(i => (i, s"s$i")).toDF("k", "v")
      val once = Merge.upsert(target, source, Seq("k"))
      val twice = Merge.upsert(once, source, Seq("k"))
      assert(once.orderBy($"k").collect().toSeq == twice.orderBy($"k").collect().toSeq, s"pivot=$pivot")
      // right-biased: every source key shows the source value
      val vals = once.orderBy($"k").collect().map(r => r.getInt(0) -> r.getString(1)).toMap
      (0 until 50).foreach { i =>
        assert(vals(i) == (if (i >= pivot) s"s$i" else s"t$i"))
      }
    }
  }

  test("AQE coalesces the post-shuffle partition count for small data") {
    val out = base.groupBy($"label").count()
    out.count() // materialize so AQE finalizes the plan
    val parts = out.rdd.getNumPartitions
    val configured = spark.conf.get("spark.sql.shuffle.partitions").toInt
    assert(parts < configured, s"AQE left $parts partitions (configured $configured)")
  }

  test("law: chunkTokens covers every token, in order, with the declared stride") {
    import graft.functions.{TextFunctions => T}
    val cases = for {
      nTok <- Gen.choose(0, 30)
      size <- Gen.choose(1, 8)
      step <- Gen.choose(1, 8)
    } yield (nTok, size, step)
    samples(cases, 12).foreach { case (nTok, size, step) =>
      val toks = (0 until nTok).map(i => s"t$i")
      val chunks = Seq(toks.mkString(" ")).toDF("t")
        .select(T.tokenize($"t").as("toks"))
        .select(T.chunkTokens($"toks", size, step).as("c"))
        .head().getSeq[String](0)
      val expected = (0 until nTok by step).map(i => toks.slice(i, math.min(i + size, nTok)).mkString(" "))
      assert(chunks == expected, s"nTok=$nTok size=$size step=$step")
      // coverage: when step <= size every token appears in some chunk
      if (step <= size && nTok > 0)
        assert(chunks.flatMap(_.split(" ")).toSet == toks.toSet)
    }
  }

  test("laws: exactSubstringDupStats fractions bounded, duplication symmetric, self-union invariant") {
    import org.apache.spark.sql.functions.col
    // deterministic subset: unordered limit() evaluates independently per
    // consumer and may pick different rows in the two union branches
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .orderBy(col("doc_id")).limit(60).select(col("doc_id"), col("text"))
    val out = graft.dedup.Dedup.exactSubstringDupStats(docs, "text", "doc_id", minLen = 30)
      .collect()
    out.foreach { r =>
      val nW = r.getAs[Long]("n_windows"); val nD = r.getAs[Long]("n_dup_windows")
      assert(nD >= 0 && nD <= nW, s"dup windows out of range for ${r.get(0)}")
      assert(r.getAs[Double]("dup_window_frac") >= 0.0 && r.getAs[Double]("dup_window_frac") <= 1.0)
      assert(r.getAs[Double]("dup_char_frac") >= 0.0 && r.getAs[Double]("dup_char_frac") <= 1.0)
      // coverage can't be smaller than one window's worth when any window
      // is duplicated, and dup chars never exceed dup_windows·L
      if (nD > 0) assert(r.getAs[Double]("dup_char_frac") > 0.0)
    }
    // duplicating the whole corpus under new ids makes EVERY window a
    // cross-doc duplicate: dup_window_frac must become 1.0 for all docs
    // (offset derived from the data so planted ids can never collide)
    val offset = docs.agg(org.apache.spark.sql.functions.max(col("doc_id"))).head.getLong(0) + 1
    val doubled = docs.unionByName(
      docs.select((col("doc_id") + offset).as("doc_id"), col("text")))
    val all = graft.dedup.Dedup.exactSubstringDupStats(doubled, "text", "doc_id", minLen = 30)
      .collect()
    all.foreach { r =>
      assert(r.getAs[Double]("dup_window_frac") == 1.0, s"doc ${r.get(0)} not fully duplicated")
      assert(r.getAs[Double]("dup_char_frac") == 1.0)
    }
  }
}
