package graft

import java.nio.file.Files

import graft.functions.{TextFunctions => T}
import graft.sources.Export
import graft.text.Packing
import org.apache.spark.sql.functions._

/** Export laws: packed shards must reconstruct the exact corpus token
  * stream, the manifest must certify what the data files contain, and a
  * write→read round trip must be lossless.
  */
class ExportSpec extends SparkSpec {
  import spark.implicits._

  private val L = 16

  // small corpus with empty docs, repeats, and multi-sequence docs
  private def docs = Seq(
    (0L, "alpha beta gamma delta", "web"),
    (1L, "", "web"),
    (2L, ("tok " * 40).trim, "books"),
    (3L, "beta beta alpha", "books"),
    (4L, "omega psi chi phi upsilon tau sigma rho", "web"),
    (5L, "alpha beta gamma delta", "code")
  ).toDF("doc_id", "text", "source")

  test("packTokens: every sequence is exactly seqLen; reals reconstruct the corpus stream") {
    val packed = Export.packTokens(docs, "doc_id", "text", "source", seqLen = L, nShards = 3)
      .orderBy($"seq_id").collect()
    // vocabulary inverse for decode
    val vocab = Export.vocabulary(docs, "text").collect()
      .map(r => r.getAs[Long]("token_id") -> r.getAs[String]("token")).toMap
    val corpus = docs.orderBy($"doc_id")
      .select(T.tokenize($"text").as("t")).collect()
      .flatMap(_.getSeq[String](0))
    val stream = packed.flatMap { r =>
      val toks = r.getSeq[Long](r.fieldIndex("tokens"))
      assert(toks.length == L, s"seq ${r.getAs[Long]("seq_id")}: ${toks.length} tokens")
      val nReal = r.getAs[Long]("n_real")
      assert(toks.drop(nReal.toInt).forall(_ == 0L), "padding must be zero")
      assert(toks.take(nReal.toInt).forall(_ > 0L), "real ids are 1-based")
      assert(r.getAs[Int]("shard") == (r.getAs[Long]("seq_id") % 3).toInt)
      toks.take(nReal.toInt).map(vocab)
    }
    assert(stream.toSeq == corpus.toSeq, "decoded stream == doc_id-ordered corpus tokens")
    // only the final sequence may be short
    assert(packed.dropRight(1).forall(_.getAs[Long]("n_real") == L))
  }

  test("packTokens provenance spans reassemble each sequence exactly") {
    val packed = Export.packTokens(docs, "doc_id", "text", "source", seqLen = L, nShards = 3)
      .collect()
    packed.foreach { r =>
      val prov = r.getSeq[org.apache.spark.sql.Row](r.fieldIndex("provenance"))
      val end = prov.foldLeft(0L) { (pos, p) =>
        assert(p.getAs[Long]("seq_offset") == pos,
          s"seq ${r.getAs[Long]("seq_id")}: provenance gap at $pos")
        pos + p.getAs[Long]("span_len")
      }
      assert(end == r.getAs[Long]("n_real"), "spans cover exactly the real tokens")
    }
  }

  test("writePackedShards round-trips and the manifest certifies the data") {
    val dir = Files.createTempDirectory("graft_export").toString
    val spans = Packing.packSequences(docs, "doc_id", T.tokenCount($"text"), seqLen = L)
    val packed = Export.packTokens(docs, "doc_id", "text", "source", seqLen = L, nShards = 3)
    Export.writePackedShards(packed, spans, docs, "doc_id", "source", seqLen = L,
      nShards = 3, outDir = dir)

    val back = Export.readPackedShards(spark, dir)
    assert(back.count() == packed.count())
    val a = packed.orderBy($"seq_id").select($"seq_id", $"n_real", $"tokens").collect().map(_.toSeq)
    val b = back.orderBy($"seq_id").select($"seq_id", $"n_real", $"tokens").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq, "data files round-trip")

    val man = Export.readManifest(spark, dir).collect()
    assert(man.length == back.select($"shard").distinct().count().toInt)
    val bySeqTotal = back.agg(sum($"n_real")).head.getLong(0)
    val manTotal = man.map(_.getAs[Long]("n_tokens")).sum
    assert(manTotal == bySeqTotal, "manifest token totals == data token totals")
    man.foreach { m =>
      val sh = m.getAs[Long]("shard")
      val nSeq = back.where($"shard" === sh).count()
      assert(m.getAs[Long]("n_sequences") == nSeq, s"shard $sh sequence count")
      assert(m.getAs[Long]("seq_len") == L)
      // source mix nested lane sums to the shard total
      val mix = m.getSeq[org.apache.spark.sql.Row](m.fieldIndex("sources"))
      assert(mix.map(_.getAs[Long]("n_tokens")).sum == m.getAs[Long]("n_tokens"), s"shard $sh mix")
    }
  }

  test("writeJsonlShards round-trips docs and balances token weight") {
    val dir = Files.createTempDirectory("graft_jsonl").toString
    Export.writeJsonlShards(docs, "doc_id", "text", nShards = 2, outDir = dir)
    val back = spark.read.json(dir + "/shard=*")
    assert(back.count() == docs.count())
    assert(back.select($"doc_id", $"text").orderBy($"doc_id").collect().map(_.toSeq).toSeq ==
      docs.select($"doc_id", $"text").orderBy($"doc_id").collect().map(_.toSeq).toSeq)
    val man = Export.readManifest(spark, dir).collect()
    assert(man.map(_.getAs[Long]("n_docs")).sum == docs.count())
    // sorted round-robin bound: shard totals differ by at most the max weight
    val totals = man.map(_.getAs[Long]("n_tokens"))
    val maxW = docs.select(T.tokenCount($"text").cast("long")).collect().map(_.getLong(0)).max
    assert(totals.max - totals.min <= maxW, s"balance bound: $totals vs max $maxW")
  }
}
