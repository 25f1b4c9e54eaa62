package graft.tools
object DupCheck {
  def main(args: Array[String]): Unit = {
    import graft.queries._
    val maps = Seq(
      "Core" -> CoreQueries.queries.keySet, "Relational" -> RelationalQueries.queries.keySet,
      "Function" -> FunctionQueries.queries.keySet, "Llm" -> LlmQueries.queries.keySet,
      "Extra" -> ExtraQueries.queries.keySet, "Stat" -> StatQueries.queries.keySet)
    val all = maps.flatMap { case (n, ks) => ks.map(_ -> n) }
    val dups = all.groupBy(_._1).filter(_._2.size > 1)
    System.err.println(s"[dupcheck] total=${all.size} merged=${graft.SparkEntry.queries.size} dups=${dups.map { case (k, v) => s"$k(${v.map(_._2).mkString(",")})" }.mkString(" ")}")
    val oracleOrphans = graft.SparkEntry.oracleSql.keySet -- graft.SparkEntry.queries.keySet
    System.err.println(s"[dupcheck] oracle entries without queries: $oracleOrphans")
  }
}
