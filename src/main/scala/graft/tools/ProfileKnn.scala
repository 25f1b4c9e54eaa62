package graft.tools

import graft.queries.Tables
import org.apache.spark.sql.functions._

/** Throwaway stage-by-stage timer for q_text_knn (r3 investigation). */
object ProfileKnn {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.builder(master = "local[32]", shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    val docs = Tables.t(spark, sfDir, "documents")
    time("warm count")(docs.count())
    time("tokenize+explode+group (bucketCounts corpus)") {
      graft.text.TfVectors.bucketCounts(docs, "text", "doc_id", 256).count()
    }
    time("full old config dim=256 unpruned") {
      graft.text.TfVectors.cosineTopK(docs, docs.where(col("doc_id") < 5), "text", "doc_id",
        dim = 256, k = 5, maxDfFraction = None).count()
    }
    time("full old config again (warm)") {
      graft.text.TfVectors.cosineTopK(docs, docs.where(col("doc_id") < 5), "text", "doc_id",
        dim = 256, k = 5, maxDfFraction = None).count()
    }
    time("new config dim=2048 bigram frac=0.1") {
      graft.text.TfVectors.cosineTopK(docs, docs.where(col("doc_id") < 5), "text", "doc_id",
        dim = 2048, k = 5, ngramN = 2).count()
    }
    time("new config again (warm)") {
      graft.text.TfVectors.cosineTopK(docs, docs.where(col("doc_id") < 5), "text", "doc_id",
        dim = 2048, k = 5, ngramN = 2).count()
    }
    val plan = graft.text.TfVectors.cosineTopK(docs, docs.where(col("doc_id") < 5), "text", "doc_id",
      dim = 2048, k = 5, ngramN = 2)
    val formatted = plan.queryExecution.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    System.err.println("[prof] ReusedExchange in plan: " + formatted.contains("ReusedExchange"))
    System.err.println("[prof] WindowGroupLimit in plan: " + formatted.contains("WindowGroupLimit"))
    spark.stop()
  }
}
