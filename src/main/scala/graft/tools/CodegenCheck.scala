package graft.tools

import graft.GraftSession
import graft.functions.{TextFunctions => T, VectorFunctions => V}
import org.apache.spark.sql.functions._

/** Dev tool: assert the custom expressions really participate in
  * whole-stage codegen (Spark silently falls back to interpreted mode on
  * generated-code compile errors, so green tests alone don't prove it).
  * Prints the generated code markers and fails loudly if the codegen
  * compile logs an error.
  */
object CodegenCheck {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    // non-literal inputs so constant folding can't pre-evaluate the
    // expressions out of the physical plan
    val df = spark.range(8)
      .select(
        array(col("id").cast("float"), lit(2.0f), lit(3.0f)).as("a"),
        array(lit(1.0f), col("id").cast("float"), lit(3.5f)).as("b"),
        concat(lit("the quick brown fox jumps over a lazy dog number "), col("id")).as("t"))
      .select(
        V.cosine(col("a"), col("b")).as("cos"),
        V.l2Distance(col("a"), col("b")).as("dist"),
        V.lshBits(col("a"), 16).as("lsh"),
        T.shingleHashes(col("t"), 3).as("sh"),
        graft.text.TfVectors.termVector(col("t"), 2, 64).as("tv"))
      .select(col("cos"), col("dist"), col("lsh"), col("tv"),
        graft.functions.HashFunctions.minHashSigFromHashes(col("sh"), 8).as("sig"))
      .select(col("cos"), col("dist"), col("lsh"), col("tv"),
        graft.functions.HashFunctions.bandHashes(col("sig"), 4, 2).as("bands"),
        graft.functions.HashFunctions.simHashFromHashes(col("sig")).as("simhash"))
    val zdf = spark.range(8).select(
      org.apache.spark.sql.graftbridge.Bridge.column(graft.expressions.ZOrder(Seq(
        org.apache.spark.sql.graftbridge.Bridge.expression(col("id").cast("int")),
        org.apache.spark.sql.graftbridge.Bridge.expression((col("id") * 7).cast("int"))))).as("z"))
    val genZ = org.apache.spark.sql.execution.debug.codegenString(zdf.queryExecution.executedPlan)
    if (!genZ.contains("interleave")) sys.error("[codegen] ZOrder NOT in generated code")
    zdf.head()
    // PQ hot path: encode, ADC table, ADC score (m=3 subspaces, k=2, dsub=1)
    val b = org.apache.spark.sql.graftbridge.Bridge
    val cent = Array.tabulate(3, 2)((j, c) => Array((j + c).toDouble))
    val pqDf = spark.range(8)
      .select(array(col("id").cast("double"), lit(2.0), lit(3.0)).as("v"))
      .select(
        b.column(graft.expressions.PqEncode(b.expression(col("v")), cent)).as("codes"),
        b.column(graft.expressions.PqAdcTable(b.expression(col("v")), cent)).as("tab"))
      .select(b.column(graft.expressions.PqAdc(
        b.expression(col("codes")), b.expression(col("tab")), 2)).as("adc"))
    val genPq = org.apache.spark.sql.execution.debug.codegenString(pqDf.queryExecution.executedPlan)
    val pqNeedles = Seq("evalCodes", "evalTable", "PqExpressions.adcScore")
    val pqMissing = pqNeedles.filterNot(genPq.contains)
    if (pqMissing.nonEmpty) {
      System.err.println(genPq.take(6000))
      sys.error(s"[codegen] PQ kernels NOT in generated code: $pqMissing")
    }
    pqDf.head()
    // int8 quantize/dequantize round-trip stays codegen'd
    val qzDf = spark.range(8)
      .select(array(col("id").cast("double"), lit(-3.5), lit(2.25)).as("v"))
      .select(graft.functions.VectorFunctions.dequantizeInt8(
        graft.functions.VectorFunctions.quantizeInt8(col("v"))).as("dq"))
    val genQz = org.apache.spark.sql.execution.debug.codegenString(qzDf.queryExecution.executedPlan)
    val qzNeedles = Seq("evalQuant", "evalDequant")
    val qzMissing = qzNeedles.filterNot(genQz.contains)
    if (qzMissing.nonEmpty) {
      System.err.println(genQz.take(6000))
      sys.error(s"[codegen] int8 quant kernels NOT in generated code: $qzMissing")
    }
    qzDf.head()
    val gen = org.apache.spark.sql.execution.debug.codegenString(df.queryExecution.executedPlan)
    val needles = Seq("VectorOps.cosine", "VectorOps.l2dist", "evalBits", "evalHashes", "evalVec", "evalSig", "evalBands", "evalFp")
    val missing = needles.filterNot(gen.contains)
    if (missing.nonEmpty) {
      System.err.println(gen.take(6000))
      sys.error(s"[codegen] expressions NOT in generated code: $missing")
    }
    // round-11 kernels: PII scans, blocklist automaton, MMR selection
    val txtDf = spark.range(8)
      .select(concat(lit("a"), col("id"), lit("@b.co +1-555-0042 10.0.0."), col("id")).as("t"))
      .select(
        T.piiRedact(col("t")).as("red"),
        T.piiCounts(col("t")).as("pc"),
        graft.text.Blocklist.hits(col("t"), Seq("555", "@b")).as("bh"),
        graft.text.Blocklist.totalHits(col("t"), Seq("555", "@b")).as("bt"))
    val genTxt = org.apache.spark.sql.execution.debug.codegenString(txtDf.queryExecution.executedPlan)
    val txtNeedles = Seq("evalRedact", "evalCounts", "evalHits", "evalCount")
    val txtMissing = txtNeedles.filterNot(genTxt.contains)
    if (txtMissing.nonEmpty) {
      System.err.println(genTxt.take(6000))
      sys.error(s"[codegen] round-11 text kernels NOT in generated code: $txtMissing")
    }
    txtDf.head()
    // HTML extraction kernels (round-11 session 3)
    val htmlDf = spark.range(8)
      .select(concat(lit("<p a=\"x\">n"), col("id"), lit("</p><script>s</script> &amp;")).as("h"))
      .select(T.htmlToText(col("h")).as("clean"), T.htmlTagCount(col("h")).as("nt"))
    val genHtml = org.apache.spark.sql.execution.debug.codegenString(htmlDf.queryExecution.executedPlan)
    val htmlMissing = Seq("evalHtml", "HtmlTagCount").filterNot(genHtml.contains)
    if (htmlMissing.nonEmpty) {
      System.err.println(genHtml.take(6000))
      sys.error(s"[codegen] HTML kernels NOT in generated code: $htmlMissing")
    }
    htmlDf.head()
    val mmrDf = spark.range(8)
      .select(
        array(struct(col("id").as("id"), (col("id") * 0.1).as("rel")),
          struct((col("id") + 100).as("id"), lit(0.5).as("rel"))).as("c"),
        expr("CAST(array() AS array<struct<ia:bigint,ib:bigint,s:double>>)").as("p"))
      .select(b.column(graft.expressions.MmrSelect(
        b.expression(col("c")), b.expression(col("p")), 2, 0.7, 0.3)).as("sel"))
    val genMmr = org.apache.spark.sql.execution.debug.codegenString(mmrDf.queryExecution.executedPlan)
    if (!genMmr.contains("evalMmr")) {
      System.err.println(genMmr.take(6000))
      sys.error("[codegen] MmrSelect NOT in generated code")
    }
    mmrDf.head()
    val row = df.head()
    System.err.println(s"[codegen] OK — all custom kernels present in generated code; sample row: $row")
    spark.stop()
  }
}
