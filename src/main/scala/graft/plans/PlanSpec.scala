package graft.plans

import graft.table.{Combine, KTable, RowId}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, lit}

/** Persisted virtual-table plans — the reference's TableTransform
  * serialization re-expressed Spark-first.
  *
  * The reference saves a workflow's virtual-table graph as JSON so it
  * re-executes after a restart (reference org.knime.core.data.columnar/
  * …/table/virtual/persist/TableTransformSerializer.java:97-131 — op
  * vocabulary source / identity / select_columns / permute / slice /
  * append / concatenate; TableTransformNodeSettingsPersistor.java:409-459
  * adds row_index / map / append_map via mapper-factory class names +
  * settings). The Spark-first form persists the same DAG shape but keeps
  * row logic DECLARATIVE: every expression is Spark SQL text, which
  * Catalyst re-parses and re-optimizes on every replay against whatever
  * snapshot of the sources exists then — where the reference pins a
  * compiled mapper class, a saved plan here pins only semantics. Custom
  * Scala UDFs are deliberately not serializable (express row logic as
  * SQL; every engine operator does).
  *
  * A [[Plan]] is a topologically ordered node list over NAMED source
  * tables (each node's inputs must be earlier nodes — the same
  * resolve-forward discipline as the reference's
  * `resolveTransformsTree`); `result` names the node whose frame the
  * plan yields. [[toJson]]/[[fromJson]] round-trip bit-stable JSON;
  * unknown ops or versions fail loud — a half-understood plan must never
  * half-execute.
  */
object PlanSpec {

  sealed trait Node { def inputs: Seq[Int] }
  /** A named input table — resolution happens at execute time. */
  final case class Source(table: String) extends Node { def inputs: Seq[Int] = Nil }
  /** Pass-through (the reference serializes these; kept for fidelity). */
  final case class Identity(input: Int) extends Node { def inputs: Seq[Int] = Seq(input) }
  /** Select/permute/duplicate by position ([[KTable.selectColumns]]). */
  final case class SelectCols(input: Int, indices: Seq[Int]) extends Node { def inputs: Seq[Int] = Seq(input) }
  final case class DropCols(input: Int, indices: Seq[Int]) extends Node { def inputs: Seq[Int] = Seq(input) }
  final case class Slice(input: Int, from: Long, until: Long) extends Node { def inputs: Seq[Int] = Seq(input) }
  /** Row filter; `sql` is a boolean Spark SQL expression. */
  final case class FilterRows(input: Int, sql: String) extends Node { def inputs: Seq[Int] = Seq(input) }
  /** Output-only projection: each (name, sql) pair becomes a column. */
  final case class MapCols(input: Int, outputs: Seq[(String, String)]) extends Node { def inputs: Seq[Int] = Seq(input) }
  /** Keep every input column, append the computed ones. FORMAT
    * SEMANTICS: outputs apply in declared order, SEQUENTIALLY — a later
    * output may reference an earlier output's column (including a
    * replaced value); duplicate output names are invalid.
    */
  final case class AppendMap(input: Int, outputs: Seq[(String, String)]) extends Node { def inputs: Seq[Int] = Seq(input) }
  /** Replace the column at `index` in place with `sql`'s value. */
  final case class ReplaceMap(input: Int, index: Int, sql: String) extends Node { def inputs: Seq[Int] = Seq(input) }
  /** Exact contiguous row index (+ offset) in current order. */
  final case class RowIndex(input: Int, name: String, offset: Long) extends Node { def inputs: Seq[Int] = Seq(input) }
  /** Rename ALL columns positionally ([[KTable.renameColumns]]). */
  final case class Rename(input: Int, names: Seq[String]) extends Node { def inputs: Seq[Int] = Seq(input) }
  /** Append all-null columns typed by DDL strings
    * (AppendMissingValuesTransformSpec; types round-trip via
    * `DataType.fromDDL(dt.sql)`).
    */
  final case class AppendMissing(input: Int, fields: Seq[(String, String)]) extends Node { def inputs: Seq[Int] = Seq(input) }
  /** Metric observation ([[KTable.observe]]; `exprs` are aggregate SQL
    * expressions incl. aliases). The reference's ObserverTransformSpec is
    * explicitly NOT persistable (compiled observer instances); SQL-text
    * aggregates are, so it persists here.
    */
  final case class Observe(input: Int, name: String, exprs: Seq[String]) extends Node { def inputs: Seq[Int] = Seq(input) }
  /** Zip two equal-length tables column-wise ([[Combine.appendByPosition]]). */
  final case class AppendByPosition(left: Int, right: Int) extends Node { def inputs: Seq[Int] = Seq(left, right) }
  /** Row-wise concatenation with union-schema merge ([[Combine.concatenate]]). */
  final case class Concatenate(override val inputs: Seq[Int]) extends Node

  /** Explicit, OPT-IN schema-evolution policy for one source table — the
    * escape hatches a real migration needs once the drift gate
    * (`sourceSchemas`) starts refusing a moved-on source. `renames` maps
    * AUTHORED column names to the source's CURRENT names ("the column is
    * the same, its name changed"); at bind time the frame is normalized
    * BACK to the authored names, so the plan's SQL text and positional
    * ops replay exactly as written and the output carries the authored
    * names. `allowWidening` accepts a current type that is a lossless
    * widening of the authored one (byte→short→int→long, float→double —
    * recursively inside struct/array/map); the data keeps its wider
    * current type. Anything else still fails loud. The reference's
    * analog is its versioned per-column factories
    * (ArrowColumnDataFactoryVersion.java) — compat is declared, never
    * guessed.
    */
  final case class SourceEvolution(renames: Map[String, String] = Map.empty,
      allowWidening: Boolean = false)

  /** `sourceSchemas` (optional, name → Spark DDL) pins the source shape a
    * plan's POSITIONAL ops (SelectCols/DropCols/ReplaceMap/Rename) were
    * authored against: filter/map SQL fails loud on a missing column, but
    * an index binds silently to whatever sits at that position, so a
    * reordered/retyped source would replay to WRONG data without a
    * recorded schema to check. The reference persists exactly this with
    * its specs (ValueSchema inside TableTransformNodeSettingsPersistor).
    * [[execute]] verifies name+type positionally per source; nullability
    * and metadata are snapshot details, not binding contracts.
    * `evolution` (optional, per recorded source) relaxes that gate along
    * DECLARED axes only — see [[SourceEvolution]].
    */
  final case class Plan(nodes: IndexedSeq[Node], result: Int,
      sourceSchemas: Map[String, String] = Map.empty,
      evolution: Map[String, SourceEvolution] = Map.empty) {
    require(nodes.nonEmpty, "PlanSpec: empty plan")
    require(result >= 0 && result < nodes.length,
      s"PlanSpec: result $result out of range (${nodes.length} nodes)")
    nodes.zipWithIndex.foreach { case (n, i) =>
      n.inputs.foreach(in => require(in >= 0 && in < i,
        s"PlanSpec: node $i reads input $in - inputs must be earlier nodes " +
          "(topological order, the serializer's resolve-forward rule)"))
      n match {
        // arity at PARSE time: Combine.concatenate would reject an empty
        // list only at execute() with no node context (review-found) —
        // the fail-loud-at-parse contract owns malformed plans
        case Concatenate(ins) => require(ins.nonEmpty,
          s"PlanSpec: node $i (concatenate) has no inputs")
        case _ => ()
      }
    }
    sourceSchemas.foreach { case (t, ddl) =>
      require(nodes.contains(Source(t)),
        s"PlanSpec: sourceSchemas records table '$t' but no source node reads it")
      try org.apache.spark.sql.types.StructType.fromDDL(ddl)
      catch {
        case e: Exception => throw new IllegalArgumentException(
          s"PlanSpec: sourceSchemas['$t'] is not valid DDL: $ddl", e)
      }
    }
    evolution.foreach { case (t, ev) =>
      // evolution is an escape hatch OF the drift gate: without a
      // recorded schema there is nothing to relax against
      require(sourceSchemas.contains(t),
        s"PlanSpec: evolution declared for '$t' but sourceSchemas records " +
          "no schema for it - evolution relaxes the recorded-schema gate")
      val authored = org.apache.spark.sql.types.StructType
        .fromDDL(sourceSchemas(t)).fieldNames.toSet
      ev.renames.keys.foreach(k => require(authored.contains(k),
        s"PlanSpec: evolution for '$t' renames unknown authored column '$k' " +
          s"(recorded: ${authored.toSeq.sorted.mkString(", ")})"))
    }
    /** Every source table name the plan reads. */
    def sourceTables: Seq[String] =
      nodes.collect { case Source(t) => t }.distinct

    /** This plan with source schemas captured from the frames it will run
      * against — call at AUTHOR time so the persisted plan can refuse a
      * drifted source at replay time.
      */
    def withSchemasFrom(sources: Map[String, DataFrame]): Plan =
      copy(sourceSchemas = sourceTables.map { t =>
        t -> sources.getOrElse(t, throw new IllegalArgumentException(
          s"PlanSpec.withSchemasFrom: plan reads source table '$t' but got " +
            s"[${sources.keys.toSeq.sorted.mkString(", ")}]")).schema.toDDL
      }.toMap)

    /** This plan with an explicit evolution policy for `table` — the
      * opt-in that lets [[execute]] bind a renamed and/or widened source
      * (see [[SourceEvolution]]); everything else still refuses.
      */
    def withEvolution(table: String, renames: Map[String, String] = Map.empty,
        allowWidening: Boolean = false): Plan =
      copy(evolution = evolution +
        (table -> SourceEvolution(renames, allowWidening)))
  }

  /** Format versions. v1 is the original node vocabulary; v2 adds the
    * root-level `sources` (recorded schemas) and `evolution` blocks.
    * [[toJson]] stamps the LOWEST version that can carry the plan — a
    * plan using no v2 feature still replays on a v1 reader, while a v1
    * reader meeting a v2 plan refuses loudly instead of silently
    * dropping its drift gate (a v1 reader ignores unknown root fields;
    * review-found). LEGACY exception: this engine's r16 build wrote
    * `sources` while still stamping v1, so v1 + `sources` is accepted on
    * read; `evolution` strictly requires v2.
    */
  private val Version = 2
  private val MinVersion = 1

  // ---- JSON ----

  def toJson(plan: Plan): String = {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.createObjectNode()
    // lowest version that carries the plan (see the Version doc)
    root.put("version",
      if (plan.sourceSchemas.nonEmpty || plan.evolution.nonEmpty) Version
      else MinVersion)
    root.put("result", plan.result)
    if (plan.sourceSchemas.nonEmpty) {
      // sorted for bit-stable re-serialization
      val so = root.putObject("sources")
      plan.sourceSchemas.toSeq.sortBy(_._1).foreach { case (t, ddl) =>
        so.put(t, ddl)
      }
    }
    if (plan.evolution.nonEmpty) {
      val eo = root.putObject("evolution")
      plan.evolution.toSeq.sortBy(_._1).foreach { case (t, ev) =>
        val o = eo.putObject(t)
        if (ev.renames.nonEmpty) {
          val ro = o.putObject("renames")
          ev.renames.toSeq.sortBy(_._1).foreach { case (a, b) => ro.put(a, b) }
        }
        if (ev.allowWidening) o.put("allowWidening", true)
      }
    }
    val arr = root.putArray("nodes")
    plan.nodes.foreach { n =>
      val o = arr.addObject()
      n match {
        case Source(t) => o.put("op", "source"); o.put("table", t)
        case Identity(in) => o.put("op", "identity"); o.put("input", in)
        case SelectCols(in, idx) =>
          o.put("op", "select_columns"); o.put("input", in)
          val a = o.putArray("indices"); idx.foreach(a.add)
        case DropCols(in, idx) =>
          o.put("op", "drop_columns"); o.put("input", in)
          val a = o.putArray("indices"); idx.foreach(a.add)
        case Slice(in, f, u) =>
          o.put("op", "slice"); o.put("input", in); o.put("from", f); o.put("until", u)
        case FilterRows(in, e) =>
          o.put("op", "filter"); o.put("input", in); o.put("expr", e)
        case MapCols(in, outs) =>
          o.put("op", "map"); o.put("input", in); putOutputs(o, outs)
        case AppendMap(in, outs) =>
          o.put("op", "append_map"); o.put("input", in); putOutputs(o, outs)
        case ReplaceMap(in, idx, e) =>
          o.put("op", "replace_map"); o.put("input", in); o.put("index", idx); o.put("expr", e)
        case RowIndex(in, name, off) =>
          o.put("op", "row_index"); o.put("input", in); o.put("name", name); o.put("offset", off)
        case Rename(in, names) =>
          o.put("op", "rename"); o.put("input", in)
          val a = o.putArray("names"); names.foreach(a.add)
        case AppendMissing(in, fields) =>
          o.put("op", "append_missing"); o.put("input", in)
          val a = o.putArray("fields")
          fields.foreach { case (nm, ddl) =>
            val el = a.addObject(); el.put("name", nm); el.put("type", ddl)
          }
        case Observe(in, name, exprs) =>
          o.put("op", "observe"); o.put("input", in); o.put("name", name)
          val a = o.putArray("exprs"); exprs.foreach(a.add)
        case AppendByPosition(l, r) =>
          o.put("op", "append"); o.put("left", l); o.put("right", r)
        case Concatenate(ins) =>
          o.put("op", "concatenate")
          val a = o.putArray("inputs"); ins.foreach(a.add)
      }
    }
    om.writerWithDefaultPrettyPrinter().writeValueAsString(root)
  }

  private def putOutputs(o: com.fasterxml.jackson.databind.node.ObjectNode,
      outs: Seq[(String, String)]): Unit = {
    val a = o.putArray("outputs")
    outs.foreach { case (n, e) =>
      val el = a.addObject(); el.put("name", n); el.put("expr", e)
    }
  }

  def fromJson(json: String): Plan =
    fromNode(new com.fasterxml.jackson.databind.ObjectMapper().readTree(json))

  def fromNode(root: com.fasterxml.jackson.databind.JsonNode): Plan = {
    require(root != null && root.isObject, "PlanSpec: not a JSON object")
    val v = root.path("version").asInt(-1)
    require(v >= MinVersion && v <= Version,
      s"PlanSpec: unsupported plan version $v (this reader: $MinVersion..$Version)")
    val nodesArr = root.path("nodes")
    require(nodesArr.isArray && nodesArr.size > 0, "PlanSpec: missing nodes array")
    import scala.jdk.CollectionConverters._
    // STRICT field access: a missing/mistyped field must fail loud, never
    // default to 0 and replay the wrong DAG (the same contract the
    // unknown-op and version checks enforce; review-found)
    type J = com.fasterxml.jackson.databind.JsonNode
    def req(o: J, f: String): J = {
      val v = o.get(f)
      require(v != null, s"PlanSpec: missing field '$f' in ${o.path("op").asText("(root)")}")
      v
    }
    def reqInt(o: J, f: String): Int = {
      // isIntegralNumber first: canConvertToInt is true for FRACTIONAL
      // doubles (1.9 would silently truncate to 1 — review-found)
      val v = req(o, f)
      require(v.isIntegralNumber && v.canConvertToInt, s"PlanSpec: field '$f' is not an int")
      v.asInt
    }
    def reqLong(o: J, f: String): Long = {
      val v = req(o, f)
      require(v.isIntegralNumber && v.canConvertToLong, s"PlanSpec: field '$f' is not a long")
      v.asLong
    }
    def reqText(o: J, f: String): String = {
      val v = req(o, f); require(v.isTextual, s"PlanSpec: field '$f' is not a string"); v.asText
    }
    def reqArray(o: J, f: String): Seq[J] = {
      val v = req(o, f); require(v.isArray, s"PlanSpec: field '$f' is not an array")
      v.elements().asScala.toSeq
    }
    def outputsOf(o: J): Seq[(String, String)] =
      reqArray(o, "outputs").map(el => (reqText(el, "name"), reqText(el, "expr")))
    def ints(o: J, f: String): Seq[Int] = reqArray(o, f).map { v =>
      require(v.isIntegralNumber && v.canConvertToInt,
        s"PlanSpec: '$f' element is not an int")
      v.asInt
    }
    val nodes = nodesArr.elements().asScala.map { o =>
      reqText(o, "op") match {
        case "source" => Source(reqText(o, "table"))
        case "identity" => Identity(reqInt(o, "input"))
        case "select_columns" => SelectCols(reqInt(o, "input"), ints(o, "indices"))
        case "drop_columns" => DropCols(reqInt(o, "input"), ints(o, "indices"))
        case "slice" => Slice(reqInt(o, "input"), reqLong(o, "from"), reqLong(o, "until"))
        case "filter" => FilterRows(reqInt(o, "input"), reqText(o, "expr"))
        case "map" => MapCols(reqInt(o, "input"), outputsOf(o))
        case "append_map" => AppendMap(reqInt(o, "input"), outputsOf(o))
        case "replace_map" => ReplaceMap(reqInt(o, "input"), reqInt(o, "index"), reqText(o, "expr"))
        case "row_index" => RowIndex(reqInt(o, "input"), reqText(o, "name"), reqLong(o, "offset"))
        case "rename" => Rename(reqInt(o, "input"), reqArray(o, "names").map { v =>
          require(v.isTextual, "PlanSpec: 'names' element is not a string"); v.asText
        })
        case "append_missing" => AppendMissing(reqInt(o, "input"),
          reqArray(o, "fields").map(el => (reqText(el, "name"), reqText(el, "type"))))
        case "observe" => Observe(reqInt(o, "input"), reqText(o, "name"),
          reqArray(o, "exprs").map { v =>
            require(v.isTextual, "PlanSpec: 'exprs' element is not a string"); v.asText
          })
        case "append" => AppendByPosition(reqInt(o, "left"), reqInt(o, "right"))
        case "concatenate" => Concatenate(ints(o, "inputs"))
        case other => throw new IllegalArgumentException(
          s"PlanSpec: unknown op '$other' - refusing to half-execute a " +
            "half-understood plan (newer writer?)")
      }
    }.toIndexedSeq
    // optional sources map (name -> DDL); when present it must be
    // well-formed — a half-readable schema record is a half-understood
    // plan. Accepted at v1 too (the r16 legacy stamping; Version doc)
    val schemas = Option(root.get("sources")).map { so =>
      require(so.isObject, "PlanSpec: field 'sources' is not an object")
      so.properties().asScala.map { e =>
        require(e.getValue.isTextual,
          s"PlanSpec: sources['${e.getKey}'] is not a string")
        e.getKey -> e.getValue.asText
      }.toMap
    }.getOrElse(Map.empty[String, String])
    val evolution = Option(root.get("evolution")).map { eo =>
      require(v >= 2, s"PlanSpec: 'evolution' requires plan version >= 2 (got $v)")
      require(eo.isObject, "PlanSpec: field 'evolution' is not an object")
      eo.properties().asScala.map { e =>
        val o = e.getValue
        require(o.isObject, s"PlanSpec: evolution['${e.getKey}'] is not an object")
        val renames = Option(o.get("renames")).map { ro =>
          require(ro.isObject, s"PlanSpec: evolution['${e.getKey}'].renames is not an object")
          ro.properties().asScala.map { r =>
            require(r.getValue.isTextual,
              s"PlanSpec: evolution['${e.getKey}'].renames['${r.getKey}'] is not a string")
            r.getKey -> r.getValue.asText
          }.toMap
        }.getOrElse(Map.empty[String, String])
        val widening = Option(o.get("allowWidening")).map { w =>
          require(w.isBoolean, s"PlanSpec: evolution['${e.getKey}'].allowWidening is not a boolean")
          w.asBoolean
        }.getOrElse(false)
        e.getKey -> SourceEvolution(renames, widening)
      }.toMap
    }.getOrElse(Map.empty[String, SourceEvolution])
    Plan(nodes, reqInt(root, "result"), schemas, evolution)
  }

  /** Persist to a single JSON file (manifests' [[graft.sources.ArtifactJson]]
    * discipline: real JSON, atomic single-file write).
    */
  def save(spark: SparkSession, plan: Plan, path: String): Unit =
    graft.sources.ArtifactJson.writeFile(spark, path, toJson(plan))

  def load(spark: SparkSession, path: String): Plan =
    fromNode(graft.sources.ArtifactJson.readFile(spark, path))

  /** Replay the plan against `sources` (name → frame). Each node maps to
    * the engine operator that already owns its semantics, so a reloaded
    * plan and hand-written code produce the SAME Catalyst plan — the
    * declarative-serialization payoff.
    */
  def execute(plan: Plan, sources: Map[String, DataFrame]): DataFrame = {
    // build ONLY the result's ancestors: some nodes run eager Spark jobs
    // when constructed (row_index's partition count, append-by-position's
    // size check), so a dead branch must never cost jobs — or abort a
    // valid replay on ITS OWN precondition (review-found)
    val needed = new Array[Boolean](plan.nodes.length)
    def mark(i: Int): Unit = if (!needed(i)) {
      needed(i) = true; plan.nodes(i).inputs.foreach(mark)
    }
    mark(plan.result)
    val out = new Array[DataFrame](plan.nodes.length)
    plan.nodes.zipWithIndex.foreach { case (n, i) =>
      if (needed(i)) out(i) = n match {
        case Source(t) =>
          val df = sources.getOrElse(t,
            throw new IllegalArgumentException(
              s"PlanSpec: plan reads source table '$t' but execute() got " +
                s"[${sources.keys.toSeq.sorted.mkString(", ")}]"))
          plan.sourceSchemas.get(t) match {
            case Some(ddl) => bindSource(t, ddl, df, plan.evolution.get(t))
            case None => df
          }
        case Identity(in) => out(in)
        case SelectCols(in, idx) => KTable(out(in)).selectColumns(idx: _*).df
        case DropCols(in, idx) => KTable(out(in)).dropColumns(idx: _*).df
        case Slice(in, f, u) => KTable(out(in)).slice(f, u).df
        case FilterRows(in, e) => out(in).where(expr(e))
        case MapCols(in, outs) =>
          KTable(out(in)).map(outs.map { case (nm, e) => nm -> expr(e) }: _*).df
        case AppendMap(in, outs) =>
          KTable(out(in)).appendMap(outs.map { case (nm, e) => nm -> expr(e) }: _*).df
        case ReplaceMap(in, idx, e) => KTable(out(in)).replaceMap(idx, expr(e)).df
        case RowIndex(in, name, off) =>
          val indexed = RowId.withRowIndex(out(in), name)
          if (off == 0L) indexed
          else indexed.withColumn(name, col(name) + lit(off))
        case Rename(in, names) => KTable(out(in)).renameColumns(names: _*).df
        case AppendMissing(in, fields) =>
          KTable(out(in)).appendMissingValueColumns(fields.map { case (nm, ddl) =>
            nm -> org.apache.spark.sql.types.DataType.fromDDL(ddl)
          }: _*).df
        case Observe(in, name, exprs) =>
          KTable(out(in)).observe(name, exprs.map(expr): _*).df
        case AppendByPosition(l, r) => Combine.appendByPosition(out(l), out(r))
        case Concatenate(ins) => Combine.concatenate(ins.map(out))
      }
    }
    out(plan.result)
  }

  /** The drift gate: the bound frame must match the recorded schema
    * POSITIONALLY on names and types — the binding contract the plan's
    * index-addressed ops rely on. Nullability/metadata deltas pass (they
    * are snapshot details that cannot re-bind an index). An explicit
    * [[SourceEvolution]] relaxes exactly its declared axes: a recorded
    * rename matches the current name (and the returned frame is
    * normalized BACK to the authored names, so SQL text and output
    * columns replay as authored), and under `allowWidening` the current
    * type may be a lossless widening of the authored one (the data keeps
    * its wider type). Failures name the table and the first differing
    * position.
    */
  private def bindSource(table: String, ddl: String, df: DataFrame,
      ev: Option[SourceEvolution]): DataFrame = {
    val want = org.apache.spark.sql.types.StructType.fromDDL(ddl)
    val got = df.schema
    require(got.length == want.length,
      s"PlanSpec: source '$table' has ${got.length} columns but the plan " +
        s"was authored against ${want.length} (recorded: $ddl) - the source " +
        "drifted; positional ops would bind to wrong columns")
    want.fields.zip(got.fields).zipWithIndex.foreach { case ((w, g), i) =>
      // asNullable on BOTH sides: nullability is a snapshot detail at
      // every nesting level (the documented contract), and DDL itself
      // cannot round-trip ArrayType.containsNull / MapType.valueContainsNull
      // (toDDL drops them, fromDDL defaults true — confirmed on Spark
      // 4.1.2), so a raw dataType compare would refuse a plan's OWN
      // authoring source whenever it carries e.g. collect_list's
      // containsNull=false array (review-found)
      val nameOk = w.name == g.name ||
        ev.exists(_.renames.get(w.name).contains(g.name))
      val typeOk = nullNormalized(w.dataType) == nullNormalized(g.dataType) ||
        ev.exists(_.allowWidening) && widens(w.dataType, g.dataType)
      require(nameOk && typeOk,
        s"PlanSpec: source '$table' column $i is ${g.name}: " +
          s"${g.dataType.simpleString} but the plan was authored against " +
          s"${w.name}: ${w.dataType.simpleString} - the source drifted " +
          "(reordered, renamed, or retyped); refusing to bind positional " +
          "ops against it. If the drift is a pure rename or a lossless " +
          "type widening, declare it explicitly with Plan.withEvolution")
    }
    // normalize a renamed source back to the authored names (positions
    // just verified, so a positional rename is exact); widened columns
    // keep their current, wider type
    if (ev.exists(_.renames.nonEmpty)) df.toDF(want.fieldNames.toIndexedSeq: _*)
    else df
  }

  /** `g` is `w` or a lossless widening of it, recursively. */
  private def widens(w: org.apache.spark.sql.types.DataType,
      g: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    (w, g) match {
      case (a, b) if nullNormalized(a) == nullNormalized(b) => true
      case (ByteType, ShortType | IntegerType | LongType) => true
      case (ShortType, IntegerType | LongType) => true
      case (IntegerType, LongType) => true
      case (FloatType, DoubleType) => true
      case (a: StructType, b: StructType) =>
        a.length == b.length && a.fields.zip(b.fields).forall { case (x, y) =>
          x.name == y.name && widens(x.dataType, y.dataType)
        }
      case (a: ArrayType, b: ArrayType) => widens(a.elementType, b.elementType)
      case (a: MapType, b: MapType) =>
        widens(a.keyType, b.keyType) && widens(a.valueType, b.valueType)
      case _ => false
    }
  }

  /** The type with every nullability flag (and field metadata) forced to
    * its loosest form — the shape the positional contract actually binds.
    */
  private def nullNormalized(dt: org.apache.spark.sql.types.DataType): org.apache.spark.sql.types.DataType = {
    import org.apache.spark.sql.types._
    dt match {
      case s: StructType => StructType(s.fields.map(f =>
        StructField(f.name, nullNormalized(f.dataType), nullable = true)))
      case a: ArrayType => ArrayType(nullNormalized(a.elementType), containsNull = true)
      case m: MapType =>
        MapType(nullNormalized(m.keyType), nullNormalized(m.valueType), valueContainsNull = true)
      case other => other
    }
  }
}
