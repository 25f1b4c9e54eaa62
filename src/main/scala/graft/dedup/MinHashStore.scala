package graft.dedup

import graft.functions.{HashFunctions => H}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted MinHash near-dup index — the serving artifact for
  * [[Dedup.minHashIncrementalAgainst]]'s "~100 B/doc signature table a
  * pipeline stores between ingests", completing the dedup lifecycle the
  * same way [[graft.text.Bm25Store]] completed retrieval's: build once
  * over the corpus, APPEND each admitted batch (pure file appends — the
  * signature artifact has no deletions, unlike the link graph), and
  * dedup every incoming batch against the store at batch-proportional
  * cost. Reference analog: the write-once/read-many batch store
  * (reference org.knime.core.columnar.arrow/…/ArrowBatchStore.java:57-62).
  *
  * == Layout ==
  * {{{
  *   dir/sigs/pb=B/      (id, sig: array<long>, shset: array<long>)
  *                       pb = pmod(xxhash64(id), nBuckets)
  *   dir/postings/pb=B/  (band, bucket, id)  — LSH band keys, one row per
  *                       (doc, band); pb = pmod(xxhash64(band, bucket), nBuckets)
  *   dir/_manifest.json  {version, nBuckets, shingleSize, numHashes,
  *                        bands, nDocs, maxId}
  * }}}
  * The band-posting surface is the INVERTED index of the LSH join: a
  * batch's band keys prune the posting scan to their hash buckets, the
  * surviving candidate ids prune the signature scan to THEIR buckets,
  * and only the candidates' (id, shset) rows flow into the exact
  * verification — per-batch reads scale with the batch's band fan-out,
  * never the corpus. Candidate generation from the store is a SUPERSET
  * of the in-memory path's (the store posts every doc; the in-memory
  * path bands only set-group representatives) — verification is exact,
  * so extra candidates can never flip a verdict, and
  * [[dedupBatch]] ≡ [[Dedup.minHashIncremental]] bit-for-bit (the
  * q_minhash_store gate shares q_minhash_incremental's oracle).
  *
  * Append contract: batch ids sort above the manifest's `maxId` (the
  * artifact-family id discipline). Write ordering is data-first /
  * manifest-last throughout.
  */
object MinHashStore {

  final case class Manifest(version: Int, nBuckets: Int, shingleSize: Int,
      numHashes: Int, bands: Int, nDocs: Long, maxId: Long)

  /** Build the store from a corpus. */
  def build(corpus: DataFrame, textCol: String, idCol: String, dir: String,
      shingleSize: Int = 3, numHashes: Int = 64, bands: Int = 16,
      nBuckets: Int = 64): Unit = {
    require(numHashes % bands == 0,
      s"MinHashStore.build: numHashes $numHashes not divisible by bands $bands")
    require(nBuckets >= 1, s"MinHashStore.build: nBuckets $nBuckets < 1")
    val sigs = Dedup.minHashSignatureTable(corpus, textCol, idCol, shingleSize, numHashes)
      .localCheckpoint(true)
    try {
      writeSurfaces(sigs, dir, bands, numHashes / bands, nBuckets, append = false)
      val stats = sigs.agg(count(lit(1)).as("n"), max(col("id")).as("mx")).head()
      writeManifest(sigs.sparkSession, dir, Manifest(1, nBuckets, shingleSize,
        numHashes, bands, nDocs = stats.getLong(0),
        maxId = if (stats.isNullAt(1)) Long.MinValue else stats.getLong(1)))
    } finally graft.Pins.release(sigs)
  }

  /** Fold a batch of NEW documents (typically [[dedupBatch]] survivors)
    * into the store: signatures and band postings are PURE per-partition
    * file appends — nothing existing is read or rewritten. Cost: one
    * signature pass over the batch + two bucketed appends.
    */
  def append(newDocs: DataFrame, textCol: String, idCol: String, dir: String): Unit = {
    val spark = newDocs.sparkSession
    val m = loadManifest(spark, dir)
    val sigs = Dedup.minHashSignatureTable(newDocs, textCol, idCol,
        m.shingleSize, m.numHashes)
      .localCheckpoint(true)
    try {
      val stats = sigs.agg(count(lit(1)).as("n"), min(col("id")).as("lo"),
        max(col("id")).as("hi"), count_distinct(col("id")).as("nd")).head()
      if (stats.getLong(0) == 0L) return // empty batch: store untouched
      require(stats.getLong(0) == stats.getLong(3),
        s"MinHashStore.append: batch ids are not unique (${stats.getLong(0)} rows, " +
          s"${stats.getLong(3)} distinct)")
      require(stats.getLong(1) > m.maxId,
        s"MinHashStore.append: batch ids start at ${stats.getLong(1)} but the store " +
          s"already contains ids up to ${m.maxId} - appended ids must sort above " +
          "every stored id")
      writeSurfaces(sigs, dir, m.bands, m.numHashes / m.bands, m.nBuckets, append = true)
      writeManifest(spark, dir, m.copy(
        nDocs = m.nDocs + stats.getLong(0), maxId = stats.getLong(2)))
    } finally graft.Pins.release(sigs)
  }

  /** Batch survivors against the store — bit-identical to
    * [[Dedup.minHashIncremental]] over the full stored corpus, at
    * bucket-pruned cost (see class doc).
    */
  def dedupBatch(spark: SparkSession, dir: String, batch: DataFrame,
      textCol: String, idCol: String, threshold: Double = 0.7): DataFrame = {
    val m = loadManifest(spark, dir)
    val rows = m.numHashes / m.bands
    val batchSigs = Dedup.minHashSignatureTable(batch, textCol, idCol,
        m.shingleSize, m.numHashes)
      .localCheckpoint(true)
    try {
      // batch band keys (empty shingle sets never band — the sentinel
      // collision rule shared with the in-memory path's collapse)
      val bandKeys = batchSigs.where(size(col("shset")) > 0)
        .select(posexplode(H.bandHashes(col("sig"), m.bands, rows)).as(Seq("band", "bucket")))
        .distinct()
        .localCheckpoint(true)
      try {
        val tb = bandKeys.select(postingBucket(m.nBuckets).as("b")).distinct()
          .collect().map(_.getInt(0)).sorted
        val candIds =
          if (tb.isEmpty) spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType))))
          else spark.read.schema(postingsSchema).parquet(s"$dir/postings")
            .where(col("pb").isInCollection(tb))
            .join(bandKeys, Seq("band", "bucket"))
            .select(col("id")).distinct()
        val pinned = candIds.localCheckpoint(true)
        try {
          val sb = pinned.select(sigBucket(m.nBuckets).as("b")).distinct()
            .collect().map(_.getInt(0)).sorted
          val candSigs =
            if (sb.isEmpty) emptySigs(spark)
            else spark.read.schema(sigsSchema).parquet(s"$dir/sigs")
              .where(col("pb").isInCollection(sb))
              .join(pinned, Seq("id"))
              .select(col("id"), col("sig"), col("shset"))
          Dedup.minHashIncrementalSigs(candSigs, batchSigs, batch, idCol,
            m.numHashes, m.bands, threshold)
        } finally graft.Pins.release(pinned)
      } finally graft.Pins.release(bandKeys)
    } finally graft.Pins.release(batchSigs)
  }

  def loadManifest(spark: SparkSession, dir: String): Manifest = {
    import graft.sources.{ArtifactJson => J}
    val path = new org.apache.hadoop.fs.Path(dir, "_manifest.json")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(path), s"MinHashStore: no _manifest.json under $dir - " +
      "build the store with MinHashStore.build")
    val node = J.readFile(spark, s"$dir/_manifest.json")
    def num(f: String): Long = J.long(node, f, dir)
    Manifest(num("version").toInt, num("nBuckets").toInt, num("shingleSize").toInt,
      num("numHashes").toInt, num("bands").toInt, num("nDocs"), num("maxId"))
  }

  private def writeManifest(spark: SparkSession, dir: String, m: Manifest): Unit =
    graft.sources.ArtifactJson.writeFile(spark, s"$dir/_manifest.json",
      s"""{"version":${m.version},"nBuckets":${m.nBuckets},""" +
        s""""shingleSize":${m.shingleSize},"numHashes":${m.numHashes},""" +
        s""""bands":${m.bands},"nDocs":${m.nDocs},"maxId":${m.maxId}}""")

  /** Write (or append) both surfaces from a pinned signature table. */
  private def writeSurfaces(sigs: DataFrame, dir: String, bands: Int, rows: Int,
      nBuckets: Int, append: Boolean): Unit = {
    val mode = if (append) "append" else "overwrite"
    sigs.withColumn("pb", sigBucket(nBuckets))
      .repartition(col("pb"))
      .write.mode(mode).partitionBy("pb").parquet(s"$dir/sigs")
    sigs.where(size(col("shset")) > 0)
      .select(col("id"), posexplode(H.bandHashes(col("sig"), bands, rows)).as(Seq("band", "bucket")))
      .withColumn("pb", postingBucket(nBuckets))
      .repartition(col("pb"))
      .write.mode(mode).partitionBy("pb").parquet(s"$dir/postings")
  }

  private def sigBucket(nBuckets: Int) =
    pmod(xxhash64(col("id")), lit(nBuckets.toLong)).cast("int")

  private def postingBucket(nBuckets: Int) =
    pmod(xxhash64(col("band"), col("bucket")), lit(nBuckets.toLong)).cast("int")

  import org.apache.spark.sql.types._
  private val sigsSchema = StructType(Seq(
    StructField("id", LongType),
    StructField("sig", ArrayType(LongType, containsNull = false)),
    StructField("shset", ArrayType(LongType, containsNull = false)),
    StructField("pb", IntegerType)))
  private val postingsSchema = StructType(Seq(
    StructField("band", IntegerType), StructField("bucket", LongType),
    StructField("id", LongType), StructField("pb", IntegerType)))

  private def emptySigs(spark: SparkSession): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("id", LongType),
        StructField("sig", ArrayType(LongType, containsNull = false)),
        StructField("shset", ArrayType(LongType, containsNull = false)))))
}
