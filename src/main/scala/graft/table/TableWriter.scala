package graft.table

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._


/** The engine's write pipeline — the Spark re-expression of the reference's
  * decorated store stack (reference
  * org.knime.core.data.columnar/.../table/DefaultColumnarBatchStore.java:272-308:
  * ReadDataCache → DictEncoding → DuplicateCheck → DomainCalc → HeapBadger →
  * LZ4 Arrow file, four async executor hops inside one JVM — SURVEY.md §3.1).
  *
  * In Spark all of that collapses into ONE distributed write job:
  *  - Parquet provides the columnar layout, dictionary encoding,
  *    compression, and footer statistics (the Arrow-file + LZ4 + batch-offset
  *    footer roles).
  *  - Per-column domains AND the row count come from one aggregation over
  *    the source (the DomainWritable analog) — the written output is
  *    never re-read.
  *  - RowID uniqueness is checked distributed (the DuplicateCheckWritable
  *    analog) — one aggregation, fails fast before publishing.
  *  - Domains/statistics are persisted as a JSON sidecar next to the data
  *    (the reference attaches domains to the table spec on finish —
  *    ColumnarRowContainer / AbstractColumnarContainerTable).
  *
  * At 100 TB: the write is embarrassingly parallel per partition; the only
  * coordination is the domain aggregation's final reduce and the optional
  * dup-check shuffle on the RowID (uniform key).
  */
object TableWriter {

  final case class WriteResult(
      path: String,
      rowCount: Long,
      domains: Seq[Domains.ColumnDomain]
  )

  /** Write `df` as the canonical store format with write-time statistics.
    * Two scans of the SOURCE total — the parquet write and the single
    * domains+row-count aggregation — and none of the written output.
    *
    * @param checkRowIdUnique when true, fails (IllegalArgumentException)
    *   if the RowID column contains duplicates — reference
    *   DuplicateCheckWritable semantics. Requires the column to exist:
    *   synthesizing fresh ids just to check them would always pass while
    *   the written table carried no RowID at all.
    */
  def write(
      df: DataFrame,
      path: String,
      checkRowIdUnique: Boolean = false,
      nominalCap: Int = Domains.DefaultNominalCap
  ): WriteResult = {
    if (checkRowIdUnique) {
      require(
        df.columns.contains(RowId.RowIdCol),
        s"checkRowIdUnique: no ${RowId.RowIdCol} column to check — add one (RowId.ensureRowId) first")
      RowId.assertUniqueRowIds(df)
    }
    df.write.mode("overwrite").parquet(path)
    val (domains, rowCount) = Domains.computeWithRowCount(df, nominalCap)
    persistDomains(df.sparkSession, path, rowCount, domains)
    WriteResult(path, rowCount, domains)
  }

  private def escape(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x" // any other control char
    case c => c.toString
  } + "\""

  private def fmt(v: Any): String = v match {
    case null => "null"
    case s: String => escape(s)
    case b: Boolean => b.toString
    case n: java.lang.Number => n.toString
    case other => escape(other.toString)
  }

  /** Persist domains as `_graft_domains.json` inside the table directory
    * (ignored by Spark's parquet reader: underscore prefix = hidden file).
    * The HLL distinct sketch rides along base64-encoded — it is the
    * artifact that makes per-ingest statistics MERGEABLE across jobs
    * ([[Domains.merge]] unions deserialized sketches; see
    * [[readDistinctSketches]]).
    */
  def persistDomains(spark: SparkSession, path: String, rowCount: Long, domains: Seq[Domains.ColumnDomain]): Unit = {
    val cols = domains.map { d =>
      val nominal = d.nominal.map(_.map(fmt).mkString("[", ",", "]")).getOrElse("null")
      val sketch = d.distinctSketch
        .map(b => "\"" + java.util.Base64.getEncoder.encodeToString(b) + "\"")
        .getOrElse("null")
      val qsketch = d.quantileSketch
        .map(b => "\"" + java.util.Base64.getEncoder.encodeToString(b) + "\"")
        .getOrElse("null")
      s"""{"column":${fmt(d.column)},"type":${fmt(d.dataType.simpleString)},""" +
        s""""min":${d.min.map(fmt).getOrElse("null")},"max":${d.max.map(fmt).getOrElse("null")},""" +
        s""""nominal":$nominal,"null_count":${d.nullCount},"approx_distinct":${d.approxDistinct},""" +
        s""""distinct_sketch":$sketch,"quantile_sketch":$qsketch}"""
    }
    val json = s"""{"row_count":$rowCount,"columns":[${cols.mkString(",")}]}"""
    // Hadoop FileSystem, not java.nio: the table path may be s3a/hdfs —
    // the sidecar must land next to the data wherever it lives
    val p = new org.apache.hadoop.fs.Path(path, "_graft_domains.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Read back the domain sidecar (raw JSON string; structured re-parse is
    * the caller's concern — the engine treats it as table metadata).
    */
  def readDomainsJson(spark: SparkSession, path: String): Option[String] = {
    val p = new org.apache.hadoop.fs.Path(path, "_graft_domains.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8))
      finally in.close()
    }
  }

  /** Deserialize the per-column HLL sketches from a table's sidecar:
    * column → sketch bytes (absent for non-sketchable columns / old
    * sidecars). Regex-scoped parse of the sidecar's own writer format.
    */
  def readDistinctSketches(spark: SparkSession, path: String): Map[String, Array[Byte]] =
    readDomainsJson(spark, path) match {
      case None => Map.empty
      case Some(json) =>
        val entry =
          """"column":"((?:[^"\\]|\\.)*)".*?"distinct_sketch":(?:"([A-Za-z0-9+/=]+)"|null)""".r
        entry.findAllMatchIn(json).flatMap { m =>
          Option(m.group(2)).map(b64 =>
            m.group(1).replace("\\\"", "\"").replace("\\\\", "\\") ->
              java.util.Base64.getDecoder.decode(b64))
        }.toMap
    }
}
