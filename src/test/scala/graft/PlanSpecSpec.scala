package graft

import graft.plans.PlanSpec
import graft.plans.PlanSpec._
import graft.table.{Combine, KTable}
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Plan persistence: a serialized virtual-table DAG must round-trip
  * bit-stably through JSON, replay to exactly the frames the engine
  * operators produce by hand, survive a source-snapshot change (the
  * declarative payoff), and refuse anything it only half-understands.
  */
class PlanSpecSpec extends SparkSpec {
  import spark.implicits._

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq

  private val everyOp = Plan(Vector(
    Source("t"),                                   // 0
    Identity(0),                                   // 1
    FilterRows(1, "v > 1"),                        // 2
    AppendMap(2, Seq("v2" -> "v * 10")),           // 3
    SelectCols(3, Seq(2, 0)),                      // 4  (v2, k)
    DropCols(3, Seq(1)),                           // 5  (k, v2)
    ReplaceMap(5, 1, "v2 + 1"),                    // 6
    Rename(6, Seq("key", "v3")),                   // 7
    Slice(7, 0, 2),                                // 8
    RowIndex(7, "idx", 100),                       // 9
    Concatenate(Seq(7, 7)),                        // 10
    AppendByPosition(7, 7),                        // 11
    AppendMissing(7, Seq("extra" -> "BIGINT", "tags" -> "ARRAY<STRING>")), // 12
    Observe(7, "metrics", Seq("count(1) AS n", "sum(v3) AS s"))            // 13
  ), result = 7)

  test("JSON round-trip preserves every op exactly") {
    val json = PlanSpec.toJson(everyOp)
    val back = PlanSpec.fromJson(json)
    assert(back == everyOp)
    // and the re-serialization is bit-stable
    assert(PlanSpec.toJson(back) == json)
  }

  test("replay equals the hand-written pipeline for every op") {
    val t = Seq(("a", 1L), ("b", 2L), ("c", 3L), ("d", 4L)).toDF("k", "v")
    def run(result: Int) =
      PlanSpec.execute(everyOp.copy(result = result), Map("t" -> t))
    val filtered = t.where(col("v") > 1)
    val appended = filtered.withColumn("v2", col("v") * 10)
    assert(canon(run(2)) == canon(filtered))
    assert(canon(run(3)) == canon(appended))
    assert(canon(run(4)) == canon(appended.select(col("v2"), col("k"))))
    val dropped = appended.select(col("k"), col("v2"))
    assert(canon(run(5)) == canon(dropped))
    val replaced = dropped.withColumn("v2", col("v2") + 1)
    assert(canon(run(6)) == canon(replaced))
    val renamed = replaced.toDF("key", "v3")
    assert(canon(run(7)) == canon(renamed))
    assert(run(8).count() == 2)
    val idx = run(9)
    assert(idx.columns.toSeq == Seq("key", "v3", "idx"))
    assert(idx.agg(min(col("idx"))).head.getLong(0) == 100L)
    assert(canon(run(10)) == canon(renamed.unionAll(renamed)))
    assert(run(11).count() == 3 && run(11).columns.length == 4)
    val missing = run(12)
    assert(missing.schema("extra").dataType.sql == "BIGINT")
    assert(missing.schema("tags").dataType.sql == "ARRAY<STRING>")
    assert(missing.where(col("extra").isNotNull || col("tags").isNotNull).count() == 0)
    assert(canon(run(13).select(col("key"), col("v3"))) == canon(renamed))
  }

  test("save/load through a file; replay over a GROWN source sees the new rows") {
    val path = Files.createTempDirectory("planspec").resolve("plan.json").toString
    PlanSpec.save(spark, everyOp, path)
    val back = PlanSpec.load(spark, path)
    assert(back == everyOp)
    assert(back.sourceTables == Seq("t"))
    val small = Seq(("a", 1L), ("b", 2L)).toDF("k", "v")
    val grown = Seq(("a", 1L), ("b", 2L), ("z", 9L)).toDF("k", "v")
    assert(PlanSpec.execute(back, Map("t" -> small)).count() == 1)
    assert(PlanSpec.execute(back, Map("t" -> grown)).count() == 2) // declarative replay
  }

  test("append_map with 5+ outputs keeps DECLARED column order (review fix: toMap hash-ordered them)") {
    val t = Seq((1L, 2L)).toDF("a", "b")
    val outs = (1 to 6).map(i => s"c$i" -> s"a + $i")
    val plan = Plan(Vector(Source("t"), AppendMap(0, outs)), result = 1)
    val replayed = PlanSpec.execute(PlanSpec.fromJson(PlanSpec.toJson(plan)), Map("t" -> t))
    assert(replayed.columns.toSeq == Seq("a", "b") ++ outs.map(_._1),
      "appended columns must land in declared order - positional ops downstream depend on it")
    // and a positional op downstream binds to the DECLARED layout
    val sel = Plan(plan.nodes :+ SelectCols(1, Seq(2, 7)), result = 2)
    val row = PlanSpec.execute(sel, Map("t" -> t)).head
    assert(row.getLong(0) == 2L && row.getLong(1) == 7L) // c1 = a+1, c6 = a+6
  }

  test("dead branches never execute: a failing off-path node cannot abort the replay (review fix)") {
    val a = Seq(1L, 2L, 3L).toDF("v")
    val b = Seq(1L).toDF("w")
    // node 3 zips tables of DIFFERENT sizes - constructing it eagerly
    // fails its size check; it is off the result path and must not run
    val plan = Plan(Vector(
      Source("a"), Source("b"),
      FilterRows(0, "v > 1"),
      AppendByPosition(0, 1)), result = 2)
    assert(PlanSpec.execute(plan, Map("a" -> a, "b" -> b)).count() == 2)
    // and an unused source table need not even be provided (actually
    // exercised: b is absent here — a dead Source lookup must be skipped)
    assert(PlanSpec.execute(plan, Map("a" -> a)).columns.toSeq == Seq("v"))
  }

  test("strict JSON: missing result/input/from fields fail loud instead of defaulting to 0 (review fix)") {
    val noResult = """{"version":1,"nodes":[{"op":"source","table":"t"}]}"""
    assert(intercept[IllegalArgumentException](
      PlanSpec.fromJson(noResult)).getMessage.contains("result"))
    val noInput = """{"version":1,"result":1,"nodes":[{"op":"source","table":"t"},{"op":"filter","expr":"x > 1"}]}"""
    assert(intercept[IllegalArgumentException](
      PlanSpec.fromJson(noInput)).getMessage.contains("input"))
    val badFrom = """{"version":1,"result":1,"nodes":[{"op":"source","table":"t"},{"op":"slice","input":0,"from":"3x","until":9}]}"""
    assert(intercept[IllegalArgumentException](
      PlanSpec.fromJson(badFrom)).getMessage.contains("from"))
  }

  test("random plans round-trip through JSON exactly (200 fuzz plans)") {
    val rnd = new scala.util.Random(20260816)
    def randName() = s"n${rnd.nextInt(1000)}"
    def randExpr() = Seq("a + 1", "upper(s)", "v * 2.5", "coalesce(x, 0)")(rnd.nextInt(4))
    def randNode(i: Int): Node = {
      def in = rnd.nextInt(i) // any earlier node
      rnd.nextInt(14) match {
        case 0 => Identity(in)
        case 1 => SelectCols(in, Seq.fill(1 + rnd.nextInt(4))(rnd.nextInt(8)))
        case 2 => DropCols(in, Seq.fill(1 + rnd.nextInt(3))(rnd.nextInt(8)))
        case 3 => Slice(in, rnd.nextLong(100), rnd.nextLong(1000))
        case 4 => FilterRows(in, randExpr())
        case 5 => MapCols(in, Seq.fill(1 + rnd.nextInt(5))((randName(), randExpr())))
        case 6 => AppendMap(in, Seq.fill(1 + rnd.nextInt(5))((randName(), randExpr())))
        case 7 => ReplaceMap(in, rnd.nextInt(8), randExpr())
        case 8 => RowIndex(in, randName(), rnd.nextLong(1000))
        case 9 => Rename(in, Seq.fill(1 + rnd.nextInt(5))(randName()))
        case 10 => AppendMissing(in, Seq.fill(1 + rnd.nextInt(3))(
          (randName(), Seq("BIGINT", "STRING", "ARRAY<DOUBLE>")(rnd.nextInt(3)))))
        case 11 => Observe(in, randName(), Seq.fill(1 + rnd.nextInt(2))(s"count(1) AS ${randName()}"))
        case 12 => AppendByPosition(in, in)
        case _ => Concatenate(Seq.fill(1 + rnd.nextInt(3))(rnd.nextInt(i)))
      }
    }
    (0 until 200).foreach { round =>
      val n = 1 + rnd.nextInt(12)
      val src = randName()
      val nodes = Source(src) +: (1 until n).map(randNode)
      // half the plans carry a recorded source schema (the drift gate's
      // persisted form must round-trip bit-stably too)
      val schemas =
        if (rnd.nextBoolean()) Map(src -> "a BIGINT,s STRING,v DOUBLE")
        else Map.empty[String, String]
      // a third of the schema'd plans also carry an evolution block
      // (r17: rename map / widening flag must round-trip bit-stably and
      // stamp format v2)
      val evolution =
        if (schemas.nonEmpty && rnd.nextInt(3) == 0)
          Map(src -> SourceEvolution(
            renames = if (rnd.nextBoolean())
              Map(Seq("a", "s", "v")(rnd.nextInt(3)) -> randName()) else Map.empty,
            allowWidening = rnd.nextBoolean()))
        else Map.empty[String, SourceEvolution]
      val plan = Plan(nodes.toVector, rnd.nextInt(n), schemas, evolution)
      val json = PlanSpec.toJson(plan)
      val back = PlanSpec.fromJson(json)
      assert(back == plan, s"round $round:\n$json")
      assert(PlanSpec.toJson(back) == json, s"round $round: re-serialization drifted")
      val ver = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(json).get("version").asInt
      assert(ver == (if (schemas.nonEmpty || evolution.nonEmpty) 2 else 1),
        s"round $round: wrong version stamp $ver")
    }
  }

  test("recorded source schemas: a reordered/retyped source fails loud, " +
      "nullability deltas pass (drift gate)") {
    val t = Seq(("a", 1L), ("b", 2L)).toDF("k", "v")
    val authored = Plan(Vector(
      Source("t"),
      SelectCols(0, Seq(1)) // positional: index 1 must stay 'v'
    ), result = 1).withSchemasFrom(Map("t" -> t))
    val back = PlanSpec.fromJson(PlanSpec.toJson(authored))
    assert(back == authored)
    // matching source: serves
    assert(PlanSpec.execute(back, Map("t" -> t)).columns.toSeq == Seq("v"))
    // REORDERED source: the index would silently bind to 'k' - refused,
    // naming the table and the first drifted position
    val reordered = t.select(col("v"), col("k"))
    val e1 = intercept[IllegalArgumentException] {
      PlanSpec.execute(back, Map("t" -> reordered))
    }
    assert(e1.getMessage.contains("'t'") && e1.getMessage.contains("drifted"),
      e1.getMessage)
    assert(e1.getMessage.contains("column 0"), e1.getMessage)
    // RETYPED source: same refusal
    val retyped = t.select(col("k"), col("v").cast("int").as("v"))
    val e2 = intercept[IllegalArgumentException] {
      PlanSpec.execute(back, Map("t" -> retyped))
    }
    assert(e2.getMessage.contains("column 1") && e2.getMessage.contains("int"),
      e2.getMessage)
    // column ADDED: count mismatch named
    val widened = t.withColumn("extra", lit(1))
    val e3 = intercept[IllegalArgumentException] {
      PlanSpec.execute(back, Map("t" -> widened))
    }
    assert(e3.getMessage.contains("3 columns"), e3.getMessage)
    // nullability-only delta: passes (snapshot detail, cannot re-bind an index)
    val relaxed = spark.createDataFrame(t.rdd,
      org.apache.spark.sql.types.StructType(t.schema.fields.map(_.copy(nullable = true))))
    assert(PlanSpec.execute(back, Map("t" -> relaxed)).count() == 2)
    // a schema-less plan keeps the old behavior (no check at all)
    val unchecked = Plan(authored.nodes, authored.result)
    assert(PlanSpec.execute(unchecked, Map("t" -> reordered)).columns.toSeq == Seq("k"))
    // array/map sources: DDL cannot round-trip containsNull /
    // valueContainsNull (toDDL drops them, fromDDL defaults true —
    // review-found on Spark 4.1.2), so the check must normalize
    // nullability at EVERY nesting level or a plan refuses its OWN
    // authoring source
    val arrT = t.groupBy(col("k")).agg(
      collect_list(col("v")).as("vs"),                      // ARRAY<BIGINT> containsNull=false
      map_from_arrays(collect_list(col("k")), collect_list(col("v"))).as("kv"),
      struct(col("k").as("ik")).as("st"))
    val arrPlan = Plan(Vector(Source("t"), SelectCols(0, Seq(1, 3))), result = 1)
      .withSchemasFrom(Map("t" -> arrT))
    val arrBack = PlanSpec.fromJson(PlanSpec.toJson(arrPlan))
    assert(PlanSpec.execute(arrBack, Map("t" -> arrT)).columns.toSeq == Seq("vs", "st"),
      "a plan must not refuse its own authoring source over DDL-dropped nullability flags")
    // while a REAL retype inside the array still refuses
    val arrRetyped = arrT.withColumn("vs", col("vs").cast("array<int>"))
    val eArr = intercept[IllegalArgumentException] {
      PlanSpec.execute(arrBack, Map("t" -> arrRetyped))
    }
    assert(eArr.getMessage.contains("drifted"), eArr.getMessage)
  }

  test("malformed sources field / unknown table / bad DDL / empty concatenate fail loud") {
    val badVal = """{"version":1,"result":0,"sources":{"t":123},"nodes":[{"op":"source","table":"t"}]}"""
    assert(intercept[IllegalArgumentException](
      PlanSpec.fromJson(badVal)).getMessage.contains("sources"))
    val badShape = """{"version":1,"result":0,"sources":["t"],"nodes":[{"op":"source","table":"t"}]}"""
    assert(intercept[IllegalArgumentException](
      PlanSpec.fromJson(badShape)).getMessage.contains("sources"))
    // schema recorded for a table no source node reads: author-time typo
    intercept[IllegalArgumentException] {
      Plan(Vector(Source("t")), 0, Map("other" -> "a BIGINT"))
    }
    // unparseable DDL fails at construction/parse, not at execute
    assert(intercept[IllegalArgumentException] {
      Plan(Vector(Source("t")), 0, Map("t" -> "a NOT_A_TYPE<<<"))
    }.getMessage.contains("DDL"))
    // concatenate with no inputs: rejected at parse with the node index,
    // not by Combine.concatenate's bare require at execute (review fix)
    val emptyConcat = """{"version":1,"result":1,"nodes":[{"op":"source","table":"t"},{"op":"concatenate","inputs":[]}]}"""
    val e = intercept[IllegalArgumentException](PlanSpec.fromJson(emptyConcat))
    assert(e.getMessage.contains("concatenate") && e.getMessage.contains("node 1"),
      e.getMessage)
  }

  test("unknown op, wrong version, forward reference, missing source all fail loud") {
    val unknown = """{"version":1,"result":0,"nodes":[{"op":"teleport"}]}"""
    assert(intercept[IllegalArgumentException](
      PlanSpec.fromJson(unknown)).getMessage.contains("unknown op"))
    val newer = """{"version":99,"result":0,"nodes":[{"op":"source","table":"t"}]}"""
    assert(intercept[IllegalArgumentException](
      PlanSpec.fromJson(newer)).getMessage.contains("version"))
    intercept[IllegalArgumentException] { // node 0 reading node 1
      Plan(Vector(Identity(1), Source("t")), result = 0)
    }
    val p = Plan(Vector(Source("missing")), result = 0)
    assert(intercept[IllegalArgumentException](
      PlanSpec.execute(p, Map.empty)).getMessage.contains("missing"))
  }

  test("schema evolution opt-in: renamed/widened sources refused by default, " +
      "bound exactly under a DECLARED SourceEvolution, never beyond it") {
    val t0 = Seq(("a", 1, 2L), ("b", 5, 6L)).toDF("k", "v", "w")
    val authored = Plan(Vector(
      Source("t"),
      SelectCols(0, Seq(1, 0)),                       // positional: (v, k)
      AppendMap(1, Seq("v10" -> "v * 10"))            // SQL text: authored name
    ), result = 2).withSchemasFrom(Map("t" -> t0))
    // the drifted source: 'v' renamed to 'val', 'w' untouched
    val renamed = t0.withColumnRenamed("v", "val")
    val eDefault = intercept[IllegalArgumentException] {
      PlanSpec.execute(authored, Map("t" -> renamed))
    }
    assert(eDefault.getMessage.contains("drifted") &&
      eDefault.getMessage.contains("withEvolution"), eDefault.getMessage)
    // opt-in rename: binds, SQL text replays as authored, output carries
    // the AUTHORED names, values identical to the un-drifted replay
    val evolved = authored.withEvolution("t", renames = Map("v" -> "val"))
    val back = PlanSpec.fromJson(PlanSpec.toJson(evolved)) // v2 round-trip
    assert(back == evolved)
    assert(PlanSpec.toJson(back) == PlanSpec.toJson(evolved))
    val got = PlanSpec.execute(back, Map("t" -> renamed))
    assert(got.columns.toSeq == Seq("v", "k", "v10"))
    assert(canon(got) == canon(PlanSpec.execute(authored, Map("t" -> t0))))
    // the declared rename does NOT wave through a DIFFERENT current name
    val otherName = t0.withColumnRenamed("v", "value")
    intercept[IllegalArgumentException] {
      PlanSpec.execute(back, Map("t" -> otherName))
    }
    // widening: int->long refused by default, exact under allowWidening,
    // and NARROWING is never accepted (long->int under the same flag)
    val widenedSrc = t0.withColumn("v", col("v").cast("bigint"))
    intercept[IllegalArgumentException] {
      PlanSpec.execute(authored, Map("t" -> widenedSrc))
    }
    val widening = authored.withEvolution("t", allowWidening = true)
    val back2 = PlanSpec.fromJson(PlanSpec.toJson(widening))
    val gotW = PlanSpec.execute(back2, Map("t" -> widenedSrc))
    assert(gotW.schema("v").dataType.typeName == "long", "data keeps its wider type")
    assert(canon(gotW) == canon(PlanSpec.execute(authored, Map("t" -> t0))))
    val narrowedSrc = t0.withColumn("w", col("w").cast("int"))
    val eNarrow = intercept[IllegalArgumentException] {
      PlanSpec.execute(back2, Map("t" -> narrowedSrc))
    }
    assert(eNarrow.getMessage.contains("drifted"), eNarrow.getMessage)
    // author-time validation: evolution needs a recorded schema, and its
    // rename keys must be authored columns
    intercept[IllegalArgumentException] {
      Plan(Vector(Source("t")), 0).withEvolution("t", Map("v" -> "val"))
    }
    intercept[IllegalArgumentException] {
      authored.withEvolution("t", renames = Map("nope" -> "val"))
    }
  }

  test("format versions: plain plans still write v1; v2 features stamp v2; " +
      "legacy v1+sources accepted; evolution at v1 refused") {
    // a plan with no v2 feature stays readable by a v1 reader
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    assert(om.readTree(PlanSpec.toJson(everyOp)).get("version").asInt == 1)
    val t0 = Seq(("a", 1L)).toDF("k", "v")
    val schemad = Plan(Vector(Source("t")), 0).withSchemasFrom(Map("t" -> t0))
    assert(om.readTree(PlanSpec.toJson(schemad)).get("version").asInt == 2)
    // the r16 legacy stamping (sources under v1) still loads
    val legacy = """{"version":1,"result":0,"sources":{"t":"k STRING,v BIGINT"},""" +
      """"nodes":[{"op":"source","table":"t"}]}"""
    assert(PlanSpec.fromJson(legacy).sourceSchemas == Map("t" -> "k STRING,v BIGINT"))
    // evolution under v1 is a half-understood plan: refused with the
    // version named (no legacy writer ever produced this shape)
    val evoV1 = """{"version":1,"result":0,"sources":{"t":"k STRING,v BIGINT"},""" +
      """"evolution":{"t":{"allowWidening":true}},""" +
      """"nodes":[{"op":"source","table":"t"}]}"""
    assert(intercept[IllegalArgumentException](
      PlanSpec.fromJson(evoV1)).getMessage.contains("version"))
  }

  test("expressions re-optimize on replay: filter over parquet still pushes down") {
    val dir = Files.createTempDirectory("planspec_pq").resolve("t").toString
    spark.range(0, 1000).select(col("id"), (col("id") % 7).as("m"))
      .write.parquet(dir)
    val plan = Plan(Vector(
      Source("t"),
      FilterRows(0, "id >= 900"),
      MapCols(1, Seq("id" -> "id", "m2" -> "m * 2"))), result = 2)
    val replayed = PlanSpec.execute(
      PlanSpec.fromJson(PlanSpec.toJson(plan)),
      Map("t" -> spark.read.parquet(dir)))
    assert(replayed.count() == 100)
    // the SQL-text filter reaches the parquet scan as a pushed filter —
    // the whole point of persisting logic instead of compiled mappers
    val physical = replayed.queryExecution.executedPlan.toString
    assert(physical.contains("PushedFilters: [IsNotNull(id), GreaterThanOrEqual(id,900)]")
      || physical.contains("GreaterThanOrEqual(id,900)"), physical.take(800))
  }
}
