package graft.queries

import graft.table.{Combine, Domains, KTable, RowId}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Tables._

/** The reference's virtual-table algebra exercised end-to-end
  * (SURVEY.md §2.2–§2.5), each with a DuckDB oracle.
  *
  * Conventions for oracle parity (the driver hash-compares values after
  * sorting columns by name): every query ends in a deterministic ORDER BY
  * present on both sides; computed integers are cast to BIGINT on both
  * sides; floating-point aggregates are rounded on both sides; timestamps
  * are projected as dates or formatted strings.
  */
object CoreQueries {

  /** Session-lifetime cache of Arrow IPC store TEMP dirs keyed by the
    * data dir (the LlmQueries.ivfIndexDirs discipline: built once per
    * (JVM, sfDir), removed by a shutdown hook — re-running a gate
    * measures the pruned READ, not a rewrite). Values are the temp
    * PARENT (what the hook deletes); the store itself lives at
    * `<parent>/docs`, via [[docsIpcStore]] — the single builder all
    * three Arrow gates share, so their store parameters cannot fork.
    */
  private val arrowStoreDirs = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** The session's dictionary-encoded LZ4 IPC copy of `documents`,
    * written once per (JVM, sfDir). The Spark write job runs OUTSIDE the
    * map's bin lock (a full write inside computeIfAbsent would hold it
    * for the job's duration); a lost double-build race costs one extra
    * temp write, and a failed write deletes its temp dir instead of
    * orphaning it (no mapping recorded → the shutdown hook never sees it).
    */
  /** Get-or-build a session-cached temp artifact: build runs OUTSIDE the
    * map lock, a failed build deletes its temp tree (no orphan for the
    * shutdown hook to miss), a lost race deletes the duplicate. Returns
    * the cached PARENT (what the hook deletes) — both Arrow store
    * builders share this protocol so a fix lands once.
    */
  private def cachedTempDir(key: String, prefix: String)(build: String => Unit): String = {
    val cached = arrowStoreDirs.get(key)
    if (cached != null) cached
    else {
      val fresh = java.nio.file.Files.createTempDirectory(prefix).toString
      try build(fresh)
      catch {
        case e: Throwable =>
          try deleteTree(fresh) catch { case _: Exception => () }
          throw e
      }
      val prior = arrowStoreDirs.putIfAbsent(key, fresh)
      if (prior != null) { try deleteTree(fresh) catch { case _: Exception => () }; prior }
      else fresh
    }
  }

  private def docsIpcStore(s: org.apache.spark.sql.SparkSession, dir: String): String =
    cachedTempDir(dir, "graft_arrow_docs") { fresh =>
      // `meta` mirrors (doc_id, n_chars, lang) as a nested struct so the
      // store exercises nested-leaf batch statistics (r15) — the
      // reference's struct-heavy logical-type shape — without a second
      // store; the flat gates never select it, so their selective IO is
      // untouched
      graft.sources.ArrowIpc.write(
        t(s, dir, "documents").withColumn("meta",
          struct(col("doc_id").as("did"), col("n_chars").as("chars"),
            col("lang").as("lang"))),
        s"$fresh/docs",
        batchRows = 2048, dictColumns = Set("lang", "source"))
    } + "/docs"

  /** A TORN copy of the session IPC store for the partial-read gate: the
    * single part file cut 16 bytes INTO record batch 2's message
    * (mid-metadata — a genuine tear, not a clean boundary) when the
    * store has more than two batches, else copied whole. Both regimes
    * serve exactly the `doc_id < 4096` prefix (2048-row batches,
    * id-ordered writes — the order q_provenance pins at every SF), which
    * is the static bound the DuckDB oracle re-derives. Cached per
    * (JVM, sfDir) under the same shutdown-hook discipline.
    */
  private def tornDocsStore(s: org.apache.spark.sql.SparkSession, dir: String): String =
    cachedTempDir(dir + "#torn", "graft_arrow_torn") { fresh =>
      val src = docsIpcStore(s, dir) // ensure the complete store exists
      // the FIRST part file (sorted) holds the table's leading rows;
      // extra splits (empty-partition schema-only files at larger tiers)
      // are dropped from the torn copy, so the kept prefix is still
      // exactly the first file's first two batches
      val srcFiles = new java.io.File(src).listFiles()
        .filter(f => f.isFile && f.getName.endsWith(".arrow")).sortBy(_.getName)
      require(srcFiles.nonEmpty, s"tornDocsStore: no part files under $src")
      val bytes = java.nio.file.Files.readAllBytes(srcFiles.head.toPath)
      val blocks = graft.sources.ArrowIpc.recordBatchBlocks(s, srcFiles.head.toString)
      // >2 batches → tear mid-message inside batch 2 (keeps 4096 rows); a
      // small single-split table is copied whole (all its < 4096 rows).
      // Anything else would silently break the static oracle bound, so it
      // fails loud instead.
      require(blocks.size > 2 || srcFiles.length == 1,
        s"tornDocsStore: first file has ${blocks.size} batches but the store " +
          s"has ${srcFiles.length} part files - the doc_id < 4096 oracle " +
          "bound would not hold; regenerate with a larger first split")
      val cut =
        if (blocks.size > 2) math.min(blocks(2)._1 + 16, bytes.length.toLong).toInt
        else bytes.length
      val d = java.nio.file.Paths.get(fresh, "torn")
      java.nio.file.Files.createDirectories(d)
      java.nio.file.Files.write(d.resolve("part-00000.arrow"),
        java.util.Arrays.copyOf(bytes, cut))
    } + "/torn"

  private def deleteTree(d: String): Unit =
    graft.sources.TempTrees.deleteTree(d)
  locally {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      arrowStoreDirs.values().forEach { d =>
        try deleteTree(d) catch { case _: Exception => () }
      }
    }))
  }

  val queries: Map[String, Q] = Map(
    // Arrow IPC migration read with COLUMN PRUNING: the documents table
    // is written once per session as a dictionary-encoded LZ4-frame IPC
    // store (the reference's native layout), then scanned back selecting
    // only (doc_id, lang, n_chars) — the fat text column's buffers are
    // never read (ArrowIpc.read(columns) slices only the selected fields'
    // byte ranges out of each record batch; ArrowPruneSpec asserts the
    // byte counts). Oracle = the same aggregate over the parquet source,
    // so the gate proves pruned-read VALUES, not just shape.
    "q_arrow_pruned_scan" -> ((s, dir) => {
      graft.sources.ArrowIpc.read(s, docsIpcStore(s, dir), Seq("doc_id", "lang", "n_chars"))
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          min(col("doc_id")).as("min_id"),
          max(col("doc_id")).as("max_id"))
        .orderBy(col("lang"))
    }),

    // Arrow IPC FILTER pushdown: the same store's footer carries
    // per-batch min/max/null statistics (BatchStatsKey), so the doc_id
    // range filter skips every batch outside [100, 300) without reading
    // a body byte (parquet row-group semantics; surviving batches
    // re-filter exactly — ArrowFilterSpec asserts the byte counts and the
    // conservative fallbacks). Oracle = the same filtered aggregate on
    // the parquet source, so a wrongly-skipped batch = missing rows =
    // hash mismatch.
    "q_arrow_filtered_scan" -> ((s, dir) => {
      graft.sources.ArrowIpc.read(s, docsIpcStore(s, dir), Seq("doc_id", "lang", "n_chars"),
          Seq(org.apache.spark.sql.sources.GreaterThanOrEqual("doc_id", 100L),
            org.apache.spark.sql.sources.LessThan("doc_id", 300L)))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
        .orderBy(col("lang"))
    }),

    // Arrow IPC via DataSourceV2 (r18): the SAME store read through
    // `spark.read.format("arrowipc")` with ORDINARY DataFrame ops — no
    // side-channel (columns, filters) API. Catalyst pushes the column
    // selection and the doc_id range into the scan (ArrowDsv2Spec asserts
    // byte-equality with the native q_arrow_filtered_scan path; PlanCheck
    // asserts the BatchScan's PushedFilters/ReadSchema), and every filter
    // re-evaluates exactly post-scan, so stats can only save IO. Same
    // aggregate and oracle as q_arrow_filtered_scan: a divergence between
    // the two read paths = hash mismatch.
    "q_arrow_dsv2" -> ((s, dir) => {
      s.read.format("arrowipc").load(docsIpcStore(s, dir))
        .where(col("doc_id") >= 100L && col("doc_id") < 300L)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
        .orderBy(col("lang"))
    }),

    // Arrow IPC DataSourceV2 WRITE path (r18): documents written through
    // `df.write.format("arrowipc")` (dictionary-encoded, per-batch
    // stats), then read back through the DSv2 scan with a pushed filter —
    // the full Catalyst-integrated round trip in one gate. The store is
    // session-cached like the read gates (ivfIndexDirs amortization);
    // ArrowDsv2WriteSpec pins value-parity with the native writer. Same
    // oracle as the native scans: a writer that dropped/duplicated rows,
    // broke dictionary encoding, or mis-recorded stats = hash mismatch.
    "q_arrow_dsv2_write" -> ((s, dir) => {
      val store = cachedTempDir(dir + "#dsv2w", "graft_arrow_dsv2w") { fresh =>
        t(s, dir, "documents")
          .write.format("arrowipc")
          .option("dictColumns", "lang,source").option("batchRows", "2048")
          .mode("overwrite").save(s"$fresh/docs")
      } + "/docs"
      s.read.format("arrowipc").load(store)
        .where(col("doc_id") >= 100L && col("doc_id") < 300L)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"),
          min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
        .orderBy(col("lang"))
    }),

    // Arrow IPC STREAMING sink (late r18): a REAL bounded Structured
    // Streaming query (file-source epochs over the events parquet,
    // Trigger.AvailableNow) writes the store through
    // `writeStream.format("arrowipc")` — one complete IPC file per
    // (partition, epoch), idempotent replay by deterministic naming
    // (ArrowStreamSinkSpec) — then the DSv2 reader aggregates it against
    // the parquet oracle. A dropped epoch, duplicated replay, or torn
    // file = wrong counts = hash mismatch. Store build session-cached.
    "q_arrow_stream_sink" -> ((s, dir) => {
      val parent = cachedTempDir(dir + "#streamsink", "graft_arrow_streamsink") { fresh =>
        // the tier ships events as ONE parquet file; the file source
        // needs a directory, and 4 splits give the stream 4 genuine
        // epochs under maxFilesPerTrigger=1
        val ev = t(s, dir, "events")
        ev.repartition(4).write.parquet(s"$fresh/src")
        val q = s.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", "1")
          .parquet(s"$fresh/src")
          .writeStream.format("arrowipc")
          .option("checkpointLocation", s"$fresh/ckpt")
          .option("batchRows", "4096")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start(s"$fresh/store")
        q.awaitTermination()
      }
      s.read.format("arrowipc").load(s"$parent/store")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 4).as("sum_value"))
        .orderBy(col("event_type"))
    }),

    // Arrow IPC NESTED-leaf filter pushdown (r15): the store's `meta`
    // struct mirrors (doc_id, n_chars, lang); the range filter on the
    // nested leaf `meta.did` batch-skips via the dotted-path footer
    // statistics (struct-null-aware; ArrowFilterSpec asserts the byte
    // counts), the scan reads ONLY the struct column's buffers, and the
    // oracle re-derives the same aggregate from the flat parquet source —
    // a wrongly-skipped batch = missing rows = hash mismatch.
    "q_arrow_nested_scan" -> ((s, dir) => {
      graft.sources.ArrowIpc.read(s, docsIpcStore(s, dir), Seq("meta"),
          Seq(org.apache.spark.sql.sources.GreaterThanOrEqual("meta.did", 100L),
            org.apache.spark.sql.sources.LessThan("meta.did", 300L)))
        .groupBy(col("meta.lang").as("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("meta.chars")).as("sum_chars"),
          min(col("meta.did")).as("min_id"), max(col("meta.did")).as("max_id"))
        .orderBy(col("lang"))
    }),
    // Arrow IPC PARTIAL read (r15): a copy of the store torn mid-message
    // inside record batch 2 — the crashed-writer / consume-while-producing
    // shape (reference OffHeapArrowPartialFileBatchReadable) — must serve
    // EXACTLY the complete-batch prefix (doc_id < 4096: 2048-row batches,
    // id-ordered writes pinned by q_provenance), which the oracle
    // re-derives from the flat parquet source. A partial batch leaking,
    // a batch dropped, or a stale dictionary = hash mismatch.
    "q_arrow_partial_scan" -> ((s, dir) => {
      graft.sources.ArrowIpc.readPartial(s, tornDocsStore(s, dir))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"),
          max(col("doc_id")).as("max_id"))
        .orderBy(col("lang"))
    }),

    // PRUNED partial read (r16): the same torn store walked selecting
    // only (doc_id, lang, n_chars) — the fat text column's buffers are
    // never read even without a footer (each stream message carries the
    // batch's flatbuffer buffer layout; ArrowPartialSpec asserts the byte
    // counts). Same complete-batch-prefix oracle: a pruned walk that
    // dropped a batch, leaked a torn one, or misaligned buffer spans =
    // hash mismatch.
    "q_arrow_partial_pruned" -> ((s, dir) => {
      graft.sources.ArrowIpc.readPartial(s, tornDocsStore(s, dir),
          Seq("doc_id", "lang", "n_chars"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"),
          max(col("doc_id")).as("max_id"))
        .orderBy(col("lang"))
    }),

    // Plan persistence (r15, reference TableTransformSerializer.java:97-131):
    // a virtual-table DAG serialized to JSON, re-parsed, and REPLAYED must
    // yield the same rows as the SQL the oracle runs — expressions persist
    // as Spark SQL text, so the reloaded plan re-optimizes (filter pushdown
    // asserted in PlanSpecSpec) instead of pinning a compiled mapper.
    "q_plan_persist" -> ((s, dir) => {
      import graft.plans.PlanSpec
      import graft.plans.PlanSpec._
      val plan = Plan(Vector(
        Source("lineitem"),
        FilterRows(0, "l_quantity > 30 AND l_discount <= 0.05"),
        AppendMap(1, Seq("gross" -> "l_quantity * l_extendedprice")),
        MapCols(2, Seq(
          "l_orderkey" -> "l_orderkey",
          "l_linenumber" -> "l_linenumber",
          "l_quantity" -> "l_quantity",
          "gross" -> "gross"))), result = 3)
        // author-time schema capture: the reloaded plan refuses a drifted
        // source instead of binding positional ops silently (r16)
        .withSchemasFrom(Map("lineitem" -> t(s, dir, "lineitem")))
      val reloaded = PlanSpec.fromJson(PlanSpec.toJson(plan)) // real round-trip
      PlanSpec.execute(reloaded, Map("lineitem" -> t(s, dir, "lineitem")))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("gross"))
    }),

    // Multi-input persisted plan: two filtered branches of the same
    // source CONCATENATED (the union-schema merge path) — the DAG shape
    // the reference's serializer exists for — round-tripped through JSON
    // and replayed; the aggregate on top makes the result order-free for
    // the oracle.
    "q_plan_persist_multi" -> ((s, dir) => {
      import graft.plans.PlanSpec
      import graft.plans.PlanSpec._
      val plan = Plan(Vector(
        Source("lineitem"),
        FilterRows(0, "l_quantity > 45"),
        FilterRows(0, "l_quantity < 5"),
        Concatenate(Seq(1, 2)),
        AppendMap(3, Seq("band" -> "CASE WHEN l_quantity > 45 THEN 'hi' ELSE 'lo' END"))),
        result = 4)
      val reloaded = PlanSpec.fromJson(PlanSpec.toJson(plan))
      PlanSpec.execute(reloaded, Map("lineitem" -> t(s, dir, "lineitem")))
        .groupBy(col("l_returnflag"), col("band"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("l_returnflag"), col("band"))
    }),

    // Schema EVOLUTION under the drift gate (r17): the plan is authored
    // with a recorded schema, then replayed over a source that RENAMED a
    // column (l_extendedprice -> price) and WIDENED another
    // (l_linenumber int -> bigint). Default replay refuses both drifts
    // (PlanSpecSpec pins the refusal); with the persisted opt-in
    // (Plan.withEvolution: the rename declared, widening allowed) the
    // replay binds, normalizes the names back to the authored ones, and
    // yields row-identical results — the oracle runs the authored SQL on
    // the UN-drifted table.
    "q_plan_persist_evolve" -> ((s, dir) => {
      import graft.plans.PlanSpec
      import graft.plans.PlanSpec._
      val authored = t(s, dir, "lineitem")
      val plan = Plan(Vector(
        Source("lineitem"),
        FilterRows(0, "l_quantity > 30 AND l_discount <= 0.05"),
        AppendMap(1, Seq("gross" -> "l_quantity * l_extendedprice")),
        MapCols(2, Seq(
          "l_orderkey" -> "l_orderkey",
          "l_linenumber" -> "l_linenumber",
          "l_quantity" -> "l_quantity",
          "gross" -> "gross"))), result = 3)
        .withSchemasFrom(Map("lineitem" -> authored))
        .withEvolution("lineitem",
          renames = Map("l_extendedprice" -> "price"), allowWidening = true)
      val drifted = authored
        .withColumnRenamed("l_extendedprice", "price")
        .withColumn("l_linenumber", col("l_linenumber").cast("bigint"))
      val reloaded = PlanSpec.fromJson(PlanSpec.toJson(plan)) // real round-trip
      PlanSpec.execute(reloaded, Map("lineitem" -> drifted))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("gross"))
    }),

    // §7.1 minimum slice: scan → filter → project → slice.
    // row provenance attach: Spark's hidden _metadata struct surfaces the
    // physical (file, row-offset) identity of every row — the audit /
    // lineage twin of the logical RowId machinery (graft.table.RowId).
    // The oracle recovers the same offsets from the data's write order
    // (doc_id-ordered files — a property this gate also pins down);
    // file_name is the constant lane proving the source identity plumbs
    // through
    "q_provenance" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(
          col("doc_id"),
          col("_metadata.file_name").as("file_name"),
          col("_metadata.row_index").as("row_pos"))
        .orderBy(col("doc_id"))
    }),

    "q_scan_filter_project_slice" -> ((s, dir) => {
      KTable(t(s, dir, "lineitem"))
        .filterRows(col("l_quantity") > 30 && col("l_discount") <= 0.05)
        .map(
          "l_orderkey" -> col("l_orderkey"),
          "l_linenumber" -> col("l_linenumber"),
          "l_quantity" -> col("l_quantity"),
          "l_extendedprice" -> col("l_extendedprice")
        )
        // lineitem's (l_orderkey, l_linenumber) is NOT unique in the synthetic
        // data — extend the sort to a total order so slice is deterministic.
        .df.orderBy(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"), col("l_quantity"))
        .offset(100).limit(200)
    }),

    // selectColumns: project + permute + duplicate (reference ColumnarVirtualTable.java:178-182)
    "q_select_permute" -> ((s, dir) => {
      KTable(t(s, dir, "part"))
        .selectColumns(1, 0, 5, 0) // p_name, p_partkey, p_retailprice, p_partkey again
        .df.orderBy(col("p_partkey"))
    }),

    "q_drop_columns" -> ((s, dir) => {
      KTable(t(s, dir, "customer")).dropColumns(3, 4).df.orderBy(col("c_custkey"))
    }),

    "q_slice" -> ((s, dir) => {
      KTable(t(s, dir, "orders").orderBy(col("o_orderkey")))
        .slice(1000, 1100)
        .selectColumns(0, 1, 3).df
    }),

    "q_filter_rows" -> ((s, dir) => {
      KTable(t(s, dir, "lineitem"))
        .filterRows(
          col("l_returnflag").isin("A", "R") &&
            col("l_quantity").between(10, 20) &&
            col("l_tax") =!= 0.0)
        .df.select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"), col("l_quantity"), col("l_tax"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"), col("l_quantity"), col("l_tax"))
    }),

    // map family (reference ColumnarVirtualTable.java:447-541)
    // NOTE: per-row arithmetic is NOT rounded — identical IEEE expression
    // order makes the doubles bitwise-equal across engines, while rounding
    // decimal-exact products (price×(1±d)) hits .5 boundaries where Spark
    // (HALF_UP) and DuckDB disagree.
    "q_map" -> ((s, dir) => {
      KTable(t(s, dir, "lineitem"))
        .map(
          "l_orderkey" -> col("l_orderkey"),
          "l_linenumber" -> col("l_linenumber"),
          "revenue" -> col("l_extendedprice") * (lit(1) - col("l_discount")),
          "charge" -> col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))
        )
        .df.orderBy(col("l_orderkey"), col("l_linenumber"), col("revenue"))
    }),

    "q_append_map" -> ((s, dir) => {
      KTable(t(s, dir, "supplier"))
        .appendMap(
          "acctbal_tier" -> when(col("s_acctbal") < 0, "negative")
            .when(col("s_acctbal") < 5000, "low")
            .otherwise("high"))
        .df.orderBy(col("s_suppkey"))
    }),

    "q_replace_map" -> ((s, dir) => {
      KTable(t(s, dir, "part"))
        .replaceMap(1, upper(col("p_name"))) // replace p_name in place
        .selectColumns(0, 1, 2).df.orderBy(col("p_partkey"))
    }),

    // exact contiguous row index (reference RowIndexTransformSpec :432-436)
    "q_row_index" -> ((s, dir) => {
      KTable(t(s, dir, "orders").orderBy(col("o_orderkey")).select(col("o_orderkey"), col("o_totalprice")))
        .appendRowIndex("row_index")
        .df.orderBy(col("o_orderkey"))
    }),

    "q_append_missing" -> ((s, dir) => {
      KTable(t(s, dir, "nation"))
        .appendMissingValueColumns("n_comment" -> StringType, "n_bonus" -> DoubleType)
        .df.orderBy(col("n_nationkey"))
    }),

    // cast / retype (reference TableCasterFactory.java:97-118)
    "q_cast" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .select(
          col("l_orderkey"),
          col("l_linenumber"),
          col("l_orderkey").cast(StringType).as("orderkey_str"),
          col("l_linenumber").cast(LongType).as("linenumber_long"),
          floor(col("l_quantity")).cast(LongType).as("quantity_floor"),
          col("l_quantity").cast(StringType).as("quantity_str")
        )
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("quantity_floor"), col("quantity_str"))
    }),

    // concatenate with union-schema merge + typed nulls (reference ColumnarConcatenater)
    "q_concat_schema_merge" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val a = o.where(col("o_totalprice") < 50000)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      val b = o.where(col("o_totalprice") >= 50000)
        .select(col("o_orderkey"), col("o_orderstatus"))
      Combine.concatenate(Seq(a, b)).orderBy(col("o_orderkey"))
    }),

    // concatenate + RowID regeneration (reference ColumnarTableBackend.java:206-215)
    "q_concat_new_rowids" -> ((s, dir) => {
      val n = t(s, dir, "nation")
      val shifted = n.select((col("n_nationkey") + 100).cast(IntegerType).as("n_nationkey"), col("n_name"), col("n_regionkey"))
      val unioned = Combine.concatenate(Seq(n, shifted)).orderBy(col("n_nationkey"))
      RowId.regenerateRowIds(unioned).orderBy(col("n_nationkey"))
    }),

    // RowID uniquify with _dup suffixes (reference ColumnarConcatenater.java:275-281)
    "q_rowid_uniquify" -> ((s, dir) => {
      val base = t(s, dir, "nation")
        .select(
          concat(lit("R"), (col("n_nationkey") % 3).cast(StringType)).as("row_id"),
          col("n_nationkey"),
          col("n_name"))
        .orderBy(col("n_nationkey"))
      RowId.uniquifyRowIds(base).orderBy(col("n_nationkey"))
    }),

    // RowID duplicate check (reference DuplicateCheckWritable.java:87-110)
    "q_dup_check" -> ((s, dir) => {
      RowId.duplicateKeys(t(s, dir, "orders"), "o_custkey").orderBy(col("o_custkey"))
    }),

    // append-by-position (reference AppendTransformSpec, TableTransformUtils.appendTables:83-110)
    "q_append_position" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val left = c.orderBy(col("c_custkey")).select(col("c_custkey"), col("c_name"))
      val right = c.orderBy(col("c_custkey").desc).select(col("c_acctbal"), col("c_mktsegment"))
      // edge orderBy supplies the canonical order — skip the internal sort
      Combine.appendByPosition(left, right, sortedOutput = false).orderBy(col("c_custkey"))
    }),

    // single-pass numeric domain statistics (reference domain/ calculators)
    "q_domain_stats" -> ((s, dir) => {
      Domains.domainTable(t(s, dir, "lineitem"))
    }),

    // capped nominal domains (reference ColumnarStringDomainCalculator.java:67)
    "q_nominal_domain" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .agg(
          array_join(sort_array(collect_set(col("l_returnflag"))), ",").as("rf"),
          array_join(sort_array(collect_set(col("l_linestatus"))), ",").as("ls")
        )
        .select(expr(
          "stack(2, 'l_returnflag', rf, 'l_linestatus', ls) as (column_name, domain_values)"))
        .orderBy(col("column_name"))
    }),

    // cell-factory analog: one struct-valued UDF producing k columns,
    // evaluated once per row (reference ColumnarRearranger.java:468-527)
    "q_multi_out_udf" -> ((s, dir) => {
      val factory = udf((name: String) => (name.length, name.toUpperCase)).asNondeterministic()
      KTable(t(s, dir, "part"))
        .selectColumns(0, 1)
        .appendMultiOutput(factory(col("p_name")).cast("struct<name_len:long,name_upper:string>"))
        .df.orderBy(col("p_partkey"))
    }),

    // map with absolute row index (reference
    // WrappedColumnarMapperWithRowIndexFactory :309-342)
    "q_map_row_index" -> ((s, dir) => {
      KTable(t(s, dir, "orders").orderBy(col("o_orderkey")).select(col("o_orderkey"), col("o_totalprice")))
        .mapWithRowIndex("__ri") { d =>
          d.withColumn("price_plus_index", col("o_totalprice") + col("__ri"))
        }
        .df.orderBy(col("o_orderkey"))
    }),

    // metadata-only schema replacement (reference replaceSchema :272-281)
    "q_rename_schema" -> ((s, dir) => {
      KTable(t(s, dir, "region"))
        .renameColumns("region_id", "region_name")
        .df.orderBy(col("region_id"))
    }),

    // skew-safe two-phase aggregation (salting; —absent— in the reference,
    // core at 100 TB for low-cardinality keys)
    "q_salted_agg" -> ((s, dir) => {
      graft.operators.Skew
        .saltedSum(t(s, dir, "lineitem"), Seq("l_returnflag"), "l_quantity", "sum_qty", salts = 16)
        .withColumn("sum_qty", round(col("sum_qty"), 2))
        .orderBy(col("l_returnflag"))
    }),

    "q_salted_distinct" -> ((s, dir) => {
      graft.operators.Skew
        .saltedCountDistinct(t(s, dir, "lineitem"), Seq("l_returnflag"), "l_partkey", "n_parts", salts = 16)
        .orderBy(col("l_returnflag"))
    }),

    // observe: metrics piggy-backed on an action (reference ObserverTransformSpec)
    "q_observe" -> ((s, dir) => {
      KTable(t(s, dir, "region"))
        .observe("region_metrics", count(lit(1)).as("n"))
        .df.orderBy(col("r_regionkey"))
    })
  )

  val oracles: Map[String, String] = Map(
    // the IPC store is a faithful copy of documents, so the oracle runs
    // the same aggregate on the parquet source
    "q_arrow_pruned_scan" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  min(doc_id) AS min_id, max(doc_id) AS max_id
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "q_arrow_filtered_scan" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents WHERE doc_id >= 100 AND doc_id < 300
        |GROUP BY lang ORDER BY lang""".stripMargin,
    // the DSv2 path must land on the identical result via spark.read
    "q_arrow_dsv2" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents WHERE doc_id >= 100 AND doc_id < 300
        |GROUP BY lang ORDER BY lang""".stripMargin,
    // the STREAMED store is a faithful copy of events, so the oracle
    // re-derives the same aggregate from the parquet source
    "q_arrow_stream_sink" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
        |  round(sum(value), 4) AS sum_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    // the DSv2-WRITTEN store is a faithful copy of documents, so the
    // oracle re-derives the same filtered aggregate from the parquet source
    "q_arrow_dsv2_write" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  min(doc_id) AS min_id, max(doc_id) AS max_id
        |FROM documents WHERE doc_id >= 100 AND doc_id < 300
        |GROUP BY lang ORDER BY lang""".stripMargin,
    // the plan's SQL-text expressions are the same arithmetic DuckDB runs
    // (raw per-row doubles; no rounding - the float-parity rule)
    "q_plan_persist" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
        |  l_quantity * l_extendedprice AS gross
        |FROM lineitem WHERE l_quantity > 30 AND l_discount <= 0.05
        |ORDER BY l_orderkey, l_linenumber, l_quantity, gross""".stripMargin,
    "q_plan_persist_multi" ->
      """SELECT l_returnflag,
        |  CASE WHEN l_quantity > 45 THEN 'hi' ELSE 'lo' END AS band,
        |  CAST(count(*) AS BIGINT) AS n,
        |  sum(l_quantity) AS sum_qty
        |FROM (
        |  SELECT * FROM lineitem WHERE l_quantity > 45
        |  UNION ALL
        |  SELECT * FROM lineitem WHERE l_quantity < 5)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // the evolved replay must equal the AUTHORED query on the un-drifted
    // table (names normalized back; l_linenumber rides wider as BIGINT)
    "q_plan_persist_evolve" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |  l_quantity, l_quantity * l_extendedprice AS gross
        |FROM lineitem WHERE l_quantity > 30 AND l_discount <= 0.05
        |ORDER BY l_orderkey, l_linenumber, l_quantity, gross""".stripMargin,
    // the torn store holds exactly batches 0-1 = the first 4096 doc_ids
    "q_arrow_partial_scan" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  max(doc_id) AS max_id
        |FROM documents WHERE doc_id < 4096
        |GROUP BY lang ORDER BY lang""".stripMargin,
    // the pruned walk serves the same complete-batch prefix
    "q_arrow_partial_pruned" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  max(doc_id) AS max_id
        |FROM documents WHERE doc_id < 4096
        |GROUP BY lang ORDER BY lang""".stripMargin,
    // the meta struct is a faithful mirror of (doc_id, n_chars, lang), so
    // the nested-leaf filtered aggregate re-derives from the flat source
    "q_arrow_nested_scan" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  min(doc_id) AS min_id, max(doc_id) AS max_id
        |FROM documents WHERE doc_id >= 100 AND doc_id < 300
        |GROUP BY lang ORDER BY lang""".stripMargin,
    // physical row offsets recovered from the id-ordered write order of
    // the test files (probed to hold at every SF); file_name pins the
    // source identity
    "q_provenance" ->
      """SELECT doc_id, 'documents.parquet' AS file_name,
        |  row_number() OVER (ORDER BY doc_id) - 1 AS row_pos
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_scan_filter_project_slice" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem WHERE l_quantity > 30 AND l_discount <= 0.05
        |ORDER BY l_orderkey, l_linenumber, l_extendedprice, l_quantity
        |LIMIT 200 OFFSET 100""".stripMargin,
    "q_select_permute" ->
      """SELECT p_name, p_partkey, p_retailprice, p_partkey AS p_partkey_1
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_drop_columns" ->
      "SELECT c_custkey, c_name, c_nationkey FROM customer ORDER BY c_custkey",
    "q_slice" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM (SELECT * FROM orders ORDER BY o_orderkey LIMIT 100 OFFSET 1000)
        |ORDER BY o_orderkey""".stripMargin,
    "q_filter_rows" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity, l_tax
        |FROM lineitem
        |WHERE l_returnflag IN ('A','R') AND l_quantity BETWEEN 10 AND 20 AND l_tax <> 0.0
        |ORDER BY l_orderkey, l_linenumber, l_returnflag, l_quantity, l_tax""".stripMargin,
    "q_map" ->
      """SELECT l_orderkey, l_linenumber,
        |  l_extendedprice * (1 - l_discount) AS revenue,
        |  l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, revenue""".stripMargin,
    "q_append_map" ->
      """SELECT s_suppkey, s_name, s_nationkey, s_acctbal,
        |  CASE WHEN s_acctbal < 0 THEN 'negative'
        |       WHEN s_acctbal < 5000 THEN 'low' ELSE 'high' END AS acctbal_tier
        |FROM supplier ORDER BY s_suppkey""".stripMargin,
    "q_replace_map" ->
      "SELECT p_partkey, upper(p_name) AS p_name, p_brand FROM part ORDER BY p_partkey",
    "q_row_index" ->
      """SELECT o_orderkey, o_totalprice,
        |  CAST(row_number() OVER (ORDER BY o_orderkey) - 1 AS BIGINT) AS row_index
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_append_missing" ->
      """SELECT n_nationkey, n_name, n_regionkey,
        |  CAST(NULL AS VARCHAR) AS n_comment, CAST(NULL AS DOUBLE) AS n_bonus
        |FROM nation ORDER BY n_nationkey""".stripMargin,
    "q_cast" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(l_orderkey AS VARCHAR) AS orderkey_str,
        |  CAST(l_linenumber AS BIGINT) AS linenumber_long,
        |  CAST(floor(l_quantity) AS BIGINT) AS quantity_floor,
        |  CAST(l_quantity AS VARCHAR) AS quantity_str
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, quantity_floor, quantity_str""".stripMargin,
    "q_concat_schema_merge" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, CAST(NULL AS VARCHAR) AS o_orderstatus
        |FROM orders WHERE o_totalprice < 50000
        |UNION ALL
        |SELECT o_orderkey, NULL, NULL, o_orderstatus
        |FROM orders WHERE o_totalprice >= 50000
        |ORDER BY o_orderkey""".stripMargin,
    "q_concat_new_rowids" ->
      """WITH u AS (
        |  SELECT n_nationkey, n_name, n_regionkey FROM nation
        |  UNION ALL
        |  SELECT CAST(n_nationkey + 100 AS INT), n_name, n_regionkey FROM nation
        |)
        |SELECT 'Row' || CAST(row_number() OVER (ORDER BY n_nationkey) - 1 AS VARCHAR) AS row_id,
        |  n_nationkey, n_name, n_regionkey
        |FROM u ORDER BY n_nationkey""".stripMargin,
    "q_rowid_uniquify" ->
      """WITH base AS (
        |  SELECT 'R' || CAST(n_nationkey % 3 AS VARCHAR) AS row_id, n_nationkey, n_name
        |  FROM nation
        |)
        |SELECT row_id || repeat('_dup',
        |    CAST(row_number() OVER (PARTITION BY row_id ORDER BY n_nationkey) - 1 AS INT)) AS row_id,
        |  n_nationkey, n_name
        |FROM base ORDER BY n_nationkey""".stripMargin,
    "q_dup_check" ->
      "SELECT o_custkey FROM orders GROUP BY o_custkey HAVING count(*) > 1 ORDER BY o_custkey",
    "q_append_position" ->
      """WITH l AS (
        |  SELECT c_custkey, c_name, row_number() OVER (ORDER BY c_custkey) AS rn FROM customer
        |), r AS (
        |  SELECT c_acctbal, c_mktsegment, row_number() OVER (ORDER BY c_custkey DESC) AS rn FROM customer
        |)
        |SELECT l.c_custkey, l.c_name, r.c_acctbal, r.c_mktsegment
        |FROM l JOIN r USING (rn) ORDER BY l.c_custkey""".stripMargin,
    "q_domain_stats" ->
      """SELECT column_name, min_value, max_value, null_count, non_null_count FROM (
        |  SELECT 'l_discount' AS column_name, CAST(min(l_discount) AS DOUBLE) AS min_value, CAST(max(l_discount) AS DOUBLE) AS max_value, CAST(count(CASE WHEN l_discount IS NULL THEN 1 END) AS BIGINT) AS null_count, CAST(count(l_discount) AS BIGINT) AS non_null_count FROM lineitem
        |  UNION ALL SELECT 'l_extendedprice', CAST(min(l_extendedprice) AS DOUBLE), CAST(max(l_extendedprice) AS DOUBLE), CAST(count(CASE WHEN l_extendedprice IS NULL THEN 1 END) AS BIGINT), CAST(count(l_extendedprice) AS BIGINT) FROM lineitem
        |  UNION ALL SELECT 'l_linenumber', CAST(min(l_linenumber) AS DOUBLE), CAST(max(l_linenumber) AS DOUBLE), CAST(count(CASE WHEN l_linenumber IS NULL THEN 1 END) AS BIGINT), CAST(count(l_linenumber) AS BIGINT) FROM lineitem
        |  UNION ALL SELECT 'l_orderkey', CAST(min(l_orderkey) AS DOUBLE), CAST(max(l_orderkey) AS DOUBLE), CAST(count(CASE WHEN l_orderkey IS NULL THEN 1 END) AS BIGINT), CAST(count(l_orderkey) AS BIGINT) FROM lineitem
        |  UNION ALL SELECT 'l_partkey', CAST(min(l_partkey) AS DOUBLE), CAST(max(l_partkey) AS DOUBLE), CAST(count(CASE WHEN l_partkey IS NULL THEN 1 END) AS BIGINT), CAST(count(l_partkey) AS BIGINT) FROM lineitem
        |  UNION ALL SELECT 'l_quantity', CAST(min(l_quantity) AS DOUBLE), CAST(max(l_quantity) AS DOUBLE), CAST(count(CASE WHEN l_quantity IS NULL THEN 1 END) AS BIGINT), CAST(count(l_quantity) AS BIGINT) FROM lineitem
        |  UNION ALL SELECT 'l_suppkey', CAST(min(l_suppkey) AS DOUBLE), CAST(max(l_suppkey) AS DOUBLE), CAST(count(CASE WHEN l_suppkey IS NULL THEN 1 END) AS BIGINT), CAST(count(l_suppkey) AS BIGINT) FROM lineitem
        |  UNION ALL SELECT 'l_tax', CAST(min(l_tax) AS DOUBLE), CAST(max(l_tax) AS DOUBLE), CAST(count(CASE WHEN l_tax IS NULL THEN 1 END) AS BIGINT), CAST(count(l_tax) AS BIGINT) FROM lineitem
        |) ORDER BY column_name""".stripMargin,
    "q_nominal_domain" ->
      """SELECT column_name, domain_values FROM (
        |  SELECT 'l_returnflag' AS column_name, string_agg(DISTINCT l_returnflag, ',' ORDER BY l_returnflag) AS domain_values FROM lineitem
        |  UNION ALL
        |  SELECT 'l_linestatus', string_agg(DISTINCT l_linestatus, ',' ORDER BY l_linestatus) FROM lineitem
        |) ORDER BY column_name""".stripMargin,
    "q_map_row_index" ->
      """SELECT o_orderkey, o_totalprice,
        |  o_totalprice + (row_number() OVER (ORDER BY o_orderkey) - 1) AS price_plus_index
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_rename_schema" ->
      "SELECT r_regionkey AS region_id, r_name AS region_name FROM region ORDER BY region_id",
    "q_salted_agg" ->
      """SELECT l_returnflag, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_salted_distinct" ->
      """SELECT l_returnflag, CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_multi_out_udf" ->
      """SELECT p_partkey, p_name,
        |  CAST(length(p_name) AS BIGINT) AS name_len,
        |  upper(p_name) AS name_upper
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_observe" ->
      "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey"
  )
}
