package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** Dev probe (optimization round 19): where the q_arrow_dsv2 vs
  * q_arrow_filtered_scan delta goes — table resolution + inferSchema
  * (the DataFrame construction) vs scan execution.
  */
object Dsv2Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = args.headOption.map(_.toInt).getOrElse(5)
    val spark = GraftSession
      .builder(master = s"local[$cpus]", shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // same store shape as CoreQueries.docsIpcStore (private): documents +
    // a nested meta struct, written once to a temp dir
    val store = {
      val fresh = java.nio.file.Files.createTempDirectory("graft_dsv2_prof").toString
      val docs = graft.queries.Tables.t(spark, sfDir, "documents")
      graft.sources.ArrowIpc.write(
        docs.withColumn("meta",
          struct(col("doc_id").as("did"), col("n_chars").as("chars"),
            col("lang").as("lang"))),
        s"$fresh/docs")
      s"$fresh/docs"
    }
    def time(tag: String)(f: => Unit): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      System.err.println(f"[dsv2prof] $tag%-16s min=${ts.min}%.3f s  all=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    // warm
    spark.read.format("arrowipc").load(store).count()
    time("resolve-only") { spark.read.format("arrowipc").load(store).schema }
    time("dsv2-count") { spark.read.format("arrowipc").load(store).count() }
    time("dsv2-lane") {
      spark.read.format("arrowipc").load(store)
        .where(col("doc_id") >= 100L && col("doc_id") < 300L)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
        .orderBy(col("lang")).count()
    }
    time("native-lane") {
      graft.sources.ArrowIpc.read(spark, store, Seq("doc_id", "lang", "n_chars"),
          Seq(org.apache.spark.sql.sources.GreaterThanOrEqual("doc_id", 100L),
            org.apache.spark.sql.sources.LessThan("doc_id", 300L)))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
        .orderBy(col("lang")).count()
    }
    spark.stop()
  }
}
