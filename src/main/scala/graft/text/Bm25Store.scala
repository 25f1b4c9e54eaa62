package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted BM25 inverted-index artifact — the serving shape a
  * retrieval corpus maintains between jobs, completing [[Bm25]]'s
  * in-memory `Index`/`mergeIndex` story the same way the IVF sidecar
  * completed the ANN build ([[graft.similarity.Similarity.saveIvfIndexAppendable]]):
  * build once, append segments, score many. Reference analog: the batch
  * store's write-once/read-many contract with footer-certified metadata
  * (reference org.knime.core.columnar.arrow/…/ArrowBatchStore.java:57-62).
  *
  * == Layout ==
  * {{{
  *   dir/postings/bucket=B/  (doc_id, term, tf, len)   term-hash bucketed
  *   dir/dfs/bucket=B/       (term, df)                same bucketing
  *   dir/_manifest.json      {version, nBuckets, nDocs, sumLen, maxDocId}
  * }}}
  * Postings are partitioned by a term-hash bucket, so (a) a segment
  * append is a pure per-partition FILE APPEND — postings rows are
  * per-(doc, term) facts that never change, the Lucene segment shape
  * with the bucket union free of shuffles — and (b) a query's term set
  * prunes the scan to its terms' buckets ([[scoreTopKPersisted]]): a
  * 5-term query against a 10⁹-posting corpus reads ~5/nBuckets of the
  * index, the inverted-index access pattern expressed as partition
  * pruning. The df surface is vocabulary-sized; appends rewrite only its
  * touched buckets (dynamic partition overwrite). Corpus scalars ride
  * the manifest, written LAST (data-first / manifest-last, the Export
  * discipline — a crash leaves data under-certified, never phantom).
  *
  * Df pruning stays SCORE-time ([[Bm25]] scaladoc: the `floor(n·f)` cap
  * depends on the corpus size, which appending changes), so the stored
  * df surface is unpruned and append ≡ rebuild holds exactly
  * (Bm25StoreSpec + the q_bm25_index_append oracle prove it).
  *
  * Append contract: segments must index DISJOINT doc-id sets
  * ([[Bm25.mergeIndex]]'s contract, made fail-fast): appended doc ids
  * must sort above the manifest's `maxDocId`.
  */
object Bm25Store {

  final case class Manifest(version: Int, nBuckets: Int, nDocs: Long,
      sumLen: Long, maxDocId: Long)

  /** Persist an in-memory [[Bm25.Index]]. */
  def save(index: Bm25.Index, dir: String, nBuckets: Int = 64): Unit = {
    require(nBuckets >= 1, s"Bm25Store.save: nBuckets $nBuckets < 1")
    val spark = index.postings.sparkSession
    // pin: consumed by the write AND the maxDocId probe
    val posts = index.postings.localCheckpoint(true)
    try {
      posts.withColumn("bucket", termBucket(nBuckets))
        .write.mode("overwrite").partitionBy("bucket").parquet(s"$dir/postings")
      index.dfTab.withColumn("bucket", termBucket(nBuckets))
        .write.mode("overwrite").partitionBy("bucket").parquet(s"$dir/dfs")
      val mx = posts.agg(max(col("doc_id").cast("long"))).head() match {
        case r if r.isNullAt(0) => Long.MinValue
        case r => r.getLong(0)
      }
      writeManifest(spark, dir, Manifest(1, nBuckets, index.nDocs, index.sumLen, mx))
    } finally posts.unpersist()
  }

  /** Build from a corpus and persist — [[Bm25.buildIndex]] + [[save]]. */
  def build(corpus: DataFrame, textCol: String, idCol: String, dir: String,
      nBuckets: Int = 64): Unit =
    save(Bm25.buildIndex(corpus, textCol, idCol), dir, nBuckets)

  /** Load the artifact back as an in-memory [[Bm25.Index]] — plugs into
    * [[Bm25.scoreTopK]] (and [[Bm25.mergeIndex]]) unchanged.
    */
  def load(spark: SparkSession, dir: String): Bm25.Index = {
    val m = loadManifest(spark, dir)
    Bm25.Index(
      readPostings(spark, dir).select(col("doc_id"), col("term"), col("tf"), col("len")),
      spark.read.schema(dfsSchema).parquet(s"$dir/dfs").select(col("term"), col("df")),
      m.nDocs, m.sumLen)
  }

  /** Fold a new segment (disjoint doc ids, built with
    * [[Bm25.buildIndex]] over the NEW documents only) into the artifact:
    * postings are appended file-wise into their term buckets (no rewrite
    * of existing data), the df surface is merged bucket-wise (only the
    * segment's touched buckets rewritten), scalars add in the manifest —
    * cost proportional to the SEGMENT, never the corpus.
    */
  def append(segment: Bm25.Index, dir: String): Unit = {
    val spark = segment.postings.sparkSession
    val m = loadManifest(spark, dir)
    val seg = segment.postings.localCheckpoint(true)
    try {
      val bounds = seg.agg(count(lit(1)).as("n"),
        min(col("doc_id").cast("long")).as("lo"),
        max(col("doc_id").cast("long")).as("hi")).head()
      if (bounds.getLong(0) == 0L && segment.nDocs == 0L) return
      if (bounds.getLong(0) > 0L) require(bounds.getLong(1) > m.maxDocId,
        s"Bm25Store.append: segment doc ids start at ${bounds.getLong(1)} but the " +
          s"index already contains ids up to ${m.maxDocId} - segments must index " +
          "disjoint doc-id sets (re-indexing an updated doc is delete + add)")
      seg.withColumn("bucket", termBucket(m.nBuckets))
        .write.mode("append").partitionBy("bucket").parquet(s"$dir/postings")
      // df merge, touched buckets only
      val segDf = segment.dfTab.localCheckpoint(true)
      try {
        val tb = segDf.select(termBucket(m.nBuckets).as("b")).distinct()
          .collect().map(_.getInt(0)).sorted
        if (tb.nonEmpty) {
          val oldDfs = spark.read.schema(dfsSchema).parquet(s"$dir/dfs")
            .where(col("bucket").isInCollection(tb))
            .select(col("term"), col("df").as("__olddf"))
          val merged = oldDfs.join(segDf.select(col("term"), col("df").as("__segdf")),
              Seq("term"), "full_outer")
            .select(col("term"),
              (coalesce(col("__olddf"), lit(0L)) + coalesce(col("__segdf"), lit(0L)))
                .as("df"))
            .localCheckpoint(true) // pinned: the write replaces the files it reads
          try {
            val prevMode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
            try merged.withColumn("bucket", termBucket(m.nBuckets))
              .write.mode("overwrite").partitionBy("bucket").parquet(s"$dir/dfs")
            finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", prevMode)
          } finally merged.unpersist()
        }
        writeManifest(spark, dir, m.copy(
          nDocs = m.nDocs + segment.nDocs,
          sumLen = m.sumLen + segment.sumLen,
          maxDocId = math.max(m.maxDocId,
            if (bounds.getLong(0) == 0L) Long.MinValue else bounds.getLong(2))))
      } finally segDf.unpersist()
    } finally seg.unpersist()
  }

  /** Score queries against the PERSISTED artifact with term-bucket
    * pruning: the query vocabulary's buckets are computed up front
    * (driver-bounded — a query set's distinct term-bucket count is at
    * most nBuckets) and the postings scan is pruned to them, so serving
    * reads ~|query buckets|/nBuckets of the index — the inverted-index
    * access pattern as partition pruning. Scores are identical to
    * [[Bm25.scoreTopK]] over [[load]] (inner joins drop the unread
    * buckets' rows anyway; Bm25StoreSpec asserts both equality and the
    * pruned scan).
    */
  def scoreTopKPersisted(spark: SparkSession, dir: String, queries: DataFrame,
      textCol: String, idCol: String, k: Int = 5, k1: Double = 1.2, b: Double = 0.75,
      maxDfFraction: Option[Double] = Some(0.5)): DataFrame = {
    import graft.functions.{TextFunctions => T}
    val m = loadManifest(spark, dir)
    val qb = queries.select(explode(T.tokenize(col(textCol))).as("term"))
      .select(pmod(xxhash64(col("term")), lit(m.nBuckets.toLong)).cast("int").as("b"))
      .distinct().collect().map(_.getInt(0)).sorted
    val posts = readPostings(spark, dir)
      .where(col("bucket").isInCollection(qb))
      .select(col("doc_id"), col("term"), col("tf"), col("len"))
    val dfsPruned = spark.read.schema(dfsSchema).parquet(s"$dir/dfs")
      .where(col("bucket").isInCollection(qb))
      .select(col("term"), col("df"))
    Bm25.scoreTopK(Bm25.Index(posts, dfsPruned, m.nDocs, m.sumLen),
      queries, textCol, idCol, k, k1, b, maxDfFraction)
  }

  def loadManifest(spark: SparkSession, dir: String): Manifest = {
    val path = new org.apache.hadoop.fs.Path(dir, "_manifest.json")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(path), s"Bm25Store: no _manifest.json under $dir - " +
      "build the artifact with Bm25Store.build/save")
    val in = fs.open(path)
    val text = try {
      val buf = new java.io.ByteArrayOutputStream()
      val chunk = new Array[Byte](8192)
      var n = in.read(chunk)
      while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
      buf.toString("UTF-8")
    } finally in.close()
    val node = mapper.readTree(text) // a real JSON parse, not a regex
    require(node != null && node.isObject, s"Bm25Store: malformed manifest under $dir")
    def num(f: String): Long = {
      val v = node.get(f)
      require(v != null && v.isIntegralNumber,
        s"Bm25Store: manifest field '$f' missing or non-integral under $dir")
      v.longValue()
    }
    Manifest(num("version").toInt, num("nBuckets").toInt, num("nDocs"),
      num("sumLen"), num("maxDocId"))
  }

  private lazy val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def writeManifest(spark: SparkSession, dir: String, m: Manifest): Unit = {
    val json = s"""{"version":${m.version},"nBuckets":${m.nBuckets},""" +
      s""""nDocs":${m.nDocs},"sumLen":${m.sumLen},"maxDocId":${m.maxDocId}}"""
    val path = new org.apache.hadoop.fs.Path(dir, "_manifest.json")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(path, true)
    try out.write((json + "\n").getBytes("UTF-8")) finally out.close()
  }

  private def termBucket(nBuckets: Int) =
    pmod(xxhash64(col("term")), lit(nBuckets.toLong)).cast("int")

  import org.apache.spark.sql.types._
  private val postingsSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("term", StringType),
    StructField("tf", LongType), StructField("len", IntegerType),
    StructField("bucket", IntegerType)))
  private val dfsSchema = StructType(Seq(
    StructField("term", StringType), StructField("df", LongType),
    StructField("bucket", IntegerType)))

  private def readPostings(spark: SparkSession, dir: String): DataFrame =
    spark.read.schema(postingsSchema).parquet(s"$dir/postings")
}
