package graft.sources

import com.fasterxml.jackson.databind.JsonNode
import org.apache.spark.sql.SparkSession

/** Shared manifest/meta plumbing for the persisted-artifact family
  * (IVF/PQ, BM25, link graph, MinHash stores and the streaming delta
  * logs): read a small JSON file fully through the Hadoop FS (works on
  * s3a/hdfs, not just local disk), REAL Jackson parse (never a regex —
  * the Export epoch-field precedent), fail-fast typed field access, and
  * the create-truncate write the manifest-last discipline uses. One
  * implementation so a fix (or a future atomic temp-file-rename commit)
  * lands once, not four times.
  */
object ArtifactJson {

  private lazy val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Read and parse one JSON file; fails fast on absence or malformed
    * content (artifact manifests are load-bearing — a silent default
    * would mask a torn layout).
    */
  def readFile(spark: SparkSession, path: String): JsonNode = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p), s"ArtifactJson: missing $path")
    val in = fs.open(p)
    val text = try {
      val buf = new java.io.ByteArrayOutputStream()
      val chunk = new Array[Byte](8192)
      var n = in.read(chunk)
      while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
      buf.toString("UTF-8")
    } finally in.close()
    val node = mapper.readTree(text)
    require(node != null && node.isObject, s"ArtifactJson: malformed JSON at $path")
    node
  }

  /** Required integral field, fail-fast with the artifact location. */
  def long(node: JsonNode, field: String, where: String): Long = {
    val v = node.get(field)
    require(v != null && v.isIntegralNumber,
      s"ArtifactJson: field '$field' missing or non-integral under $where")
    v.longValue()
  }

  /** Create/truncate a small metadata file (manifest-last discipline:
    * callers invoke this AFTER their data writes).
    */
  def writeFile(spark: SparkSession, path: String, text: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write((if (text.isEmpty) "" else text + "\n").getBytes("UTF-8"))
    finally out.close()
  }
}
