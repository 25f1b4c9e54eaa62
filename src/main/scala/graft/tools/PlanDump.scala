package graft.tools

import graft.{GraftSession, SparkEntry}
import org.apache.spark.sql.execution.ExplainMode
import java.nio.file.{Files, Paths}

/** Dev tool (optimization rounds): dump `.explain("formatted")` for a set
  * of declared queries to files — the before/after plan evidence the
  * optimization deliverable commits under plans/r<N>/.
  *
  * usage: PlanDump <outDir> <suffix> <query[,query...]|ALL>
  * env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
  *        SPARK_GRAFT_CPUS   (default 32)
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(outDir, suffix, namesArg) = args.take(3)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession
      .builder(master = s"local[$cpus]", shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    val names =
      if (namesArg == "ALL") SparkEntry.queries.keys.toSeq.sorted
      else namesArg.split(",").toSeq
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => System.err.println(s"[plandump] unknown query: $name")
        case Some(fn) =>
          try {
            val df = fn(spark, sfDir)
            val txt = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
            Files.writeString(Paths.get(outDir, s"${name}_$suffix.txt"), txt)
            System.err.println(s"[plandump] $name -> ${name}_$suffix.txt")
          } catch {
            case e: Throwable =>
              System.err.println(s"[plandump] $name FAILED: ${e.getMessage}")
          }
      }
    }
    spark.stop()
  }
}
