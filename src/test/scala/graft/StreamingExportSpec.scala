package graft

import graft.sources.Export
import graft.streaming.StreamingExport
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming epoch export: per-micro-batch epochs under one root,
  * manifest certifies only committed epochs, replay converges, frozen
  * vocabulary keeps ids stable across batches.
  */
class StreamingExportSpec extends SparkSpec {
  import spark.implicits._

  private val L = 16

  private def doc(id: Long, src: String, text: String) = (id, src, text)

  private val all = Seq(
    doc(0L, "web", "alpha beta gamma delta"),
    doc(1L, "web", ("tok " * 20).trim),
    doc(2L, "books", "beta beta alpha"),
    doc(3L, "books", "omega psi chi phi upsilon tau sigma rho"),
    doc(4L, "code", "alpha beta gamma delta epsilon"),
    doc(5L, "code", "zeta eta theta iota kappa")
  )

  test("stream of micro-batches exports per-batch epochs with a merged certificate") {
    val dir = java.nio.file.Files.createTempDirectory("sexp").toString
    val (vocabDir, outDir) = (s"$dir/vocab", s"$dir/out")
    val allDf = all.toDF("doc_id", "source", "text")
    StreamingExport.freezeVocabulary(allDf, "text", vocabDir)

    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, String, String)]
    val q = StreamingExport
      .writer(source.toDF.toDF("doc_id", "source", "text"),
        "doc_id", "text", "source", vocabDir, seqLen = L, nShards = 2, outDir = outDir)
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    source.addData(all.take(3): _*)
    q.processAllAvailable()
    source.addData(all.drop(3): _*)
    q.processAllAvailable()
    q.stop()

    val man = Export.readManifest(spark, outDir)
    val epochs = man.select($"epoch").distinct().collect().map(_.getLong(0)).sorted.toSeq
    assert(epochs == Seq(0L, 1L), s"two micro-batches → two certified epochs, got $epochs")
    val back = Export.readPackedShards(spark, outDir)
    // every certified count matches the epoch's data
    epochs.foreach { ep =>
      val manTok = man.where($"epoch" === ep).collect().map(_.getAs[Long]("n_tokens")).sum
      val dataTok = back.where($"epoch" === ep).agg(sum($"n_real")).head.getLong(0)
      assert(manTok == dataTok, s"epoch $ep certificate")
    }
    // the frozen vocabulary saw every token → no OOV sentinels anywhere
    val flat = back.select(explode($"tokens").as("t")).where($"t" === -1L).count()
    assert(flat == 0L, "frozen vocab covers the stream")
    // token ids are STABLE across epochs: same token → same id everywhere
    val vocab = StreamingExport.readVocabulary(spark, vocabDir).collect()
      .map(r => r.getAs[String]("token") -> r.getAs[Long]("token_id")).toMap
    val alphaId = vocab("alpha")
    val seqs = back.where($"epoch" === 1).select($"tokens").collect()
      .flatMap(_.getSeq[Long](0))
    assert(seqs.contains(alphaId), "epoch 1 uses the same id for 'alpha' as the frozen vocab")
  }

  test("replayed micro-batch converges; crash-before-manifest leaves the epoch uncertified") {
    val dir = java.nio.file.Files.createTempDirectory("sexp2").toString
    val (vocabDir, outDir) = (s"$dir/vocab", s"$dir/out")
    val allDf = all.toDF("doc_id", "source", "text")
    StreamingExport.freezeVocabulary(allDf, "text", vocabDir)

    StreamingExport.applyBatch(all.take(3).toDF("doc_id", "source", "text"), 0L,
      "doc_id", "text", "source", vocabDir, L, 2, outDir)
    // simulate a crash mid-epoch-1: data only, no manifest commit
    val b1 = all.drop(3).toDF("doc_id", "source", "text")
    Export.packTokensWithVocab(b1, "doc_id", "text",
      StreamingExport.readVocabulary(spark, vocabDir), L, 2)
      .write.mode("overwrite").partitionBy("shard").parquet(s"$outDir/epoch=1")
    val manAfterCrash = Export.readManifest(spark, outDir)
    assert(manAfterCrash.select($"epoch").distinct().collect().map(_.getLong(0)).toSeq == Seq(0L),
      "uncommitted epoch never certified")
    // restart replays the batch: same epoch id, converges and certifies
    StreamingExport.applyBatch(b1, 1L, "doc_id", "text", "source", vocabDir, L, 2, outDir)
    StreamingExport.applyBatch(b1, 1L, "doc_id", "text", "source", vocabDir, L, 2, outDir) // twice
    val man = Export.readManifest(spark, outDir).collect()
    assert(man.count(_.getAs[Long]("epoch") == 1L) ==
      man.filter(_.getAs[Long]("epoch") == 1L).map(_.getAs[Long]("shard")).distinct.length,
      "exactly one generation of epoch-1 lines")
    val back = Export.readPackedShards(spark, outDir)
    val manTok = man.filter(_.getAs[Long]("epoch") == 1L).map(_.getAs[Long]("n_tokens")).sum
    assert(manTok == back.where($"epoch" === 1).agg(sum($"n_real")).head.getLong(0))
  }

  test("OOV tokens in a batch outside the frozen vocab surface as -1 sentinels") {
    val dir = java.nio.file.Files.createTempDirectory("sexp3").toString
    val (vocabDir, outDir) = (s"$dir/vocab", s"$dir/out")
    StreamingExport.freezeVocabulary(all.take(2).toDF("doc_id", "source", "text"), "text", vocabDir)
    StreamingExport.applyBatch(all.drop(4).toDF("doc_id", "source", "text"), 0L,
      "doc_id", "text", "source", vocabDir, L, 2, outDir)
    val back = Export.readPackedShards(spark, outDir)
    val oov = back.select(explode($"tokens").as("t")).where($"t" === -1L).count()
    assert(oov > 0, "unseen tokens must surface as the OOV sentinel, not vanish")
  }
}
