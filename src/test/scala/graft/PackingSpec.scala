package graft

import graft.text.Packing
import org.apache.spark.sql.functions._

/** Sequence-packing laws: the span table must reassemble both every
  * document and every sequence exactly, and be a pure function of
  * (ids, token counts, seqLen) — independent of partitioning.
  */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  private val L = 16

  private def docs(n: Int) =
    (0 until n).map { i =>
      // token counts 0..40ish with zeros sprinkled in
      (i.toLong, if (i % 11 == 4) 0L else (i * 7 % 41).toLong)
    }.toDF("id", "n")

  private def spans(df: org.apache.spark.sql.DataFrame) =
    Packing.packSequences(df, "id", col("n"), seqLen = L)

  test("every document's spans cover [0, n) contiguously in seq order") {
    val out = spans(docs(200)).orderBy($"id", $"seq_id").collect()
      .groupBy(_.getLong(0))
    val counts = docs(200).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    counts.foreach { case (id, n) =>
      val ss = out.getOrElse(id, Array.empty)
      if (n == 0) assert(ss.isEmpty, s"doc $id: zero tokens must emit no spans")
      else {
        assert(ss.head.getAs[Long]("doc_offset") == 0, s"doc $id: first span offset")
        val end = ss.foldLeft(0L) { (pos, r) =>
          assert(r.getAs[Long]("doc_offset") == pos, s"doc $id: gap at $pos")
          assert(r.getAs[Long]("span_len") > 0, s"doc $id: empty span")
          pos + r.getAs[Long]("span_len")
        }
        assert(end == n, s"doc $id: spans cover $end of $n tokens")
        // consecutive sequence ids: a doc occupies a contiguous run
        val ids = ss.map(_.getAs[Long]("seq_id"))
        assert(ids.zip(ids.tail).forall { case (a, b) => b == a + 1 }, s"doc $id: seq ids $ids")
      }
    }
  }

  test("every sequence is exactly full (except the last) with non-overlapping spans") {
    val out = spans(docs(200)).collect()
    val total = docs(200).agg(sum($"n")).head.getLong(0)
    val bySeq = out.groupBy(_.getAs[Long]("seq_id"))
    val lastSeq = (total - 1) / L
    bySeq.foreach { case (seq, ss) =>
      val sorted = ss.sortBy(_.getAs[Long]("seq_offset"))
      val end = sorted.foldLeft(0L) { (pos, r) =>
        assert(r.getAs[Long]("seq_offset") == pos, s"seq $seq: gap/overlap at $pos")
        pos + r.getAs[Long]("span_len")
      }
      if (seq < lastSeq) assert(end == L, s"seq $seq: filled $end of $L")
      else assert(end == total - lastSeq * L, s"last seq $seq: $end")
    }
    assert(bySeq.keySet == (0L to lastSeq).toSet, "sequence ids are contiguous from 0")
  }

  test("partitioning-independent: identical spans at repartition(3) vs repartition(17)") {
    val d = docs(500)
    val a = spans(d.repartition(3)).orderBy($"id", $"seq_id").collect().map(_.toSeq)
    val b = spans(d.repartition(17)).orderBy($"id", $"seq_id").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }

  test("packEfficiency agrees with per-group packSequences and is partition-independent") {
    val d = docs(300).withColumn("src", concat(lit("s"), $"id" % 3))
    val eff = Packing.packEfficiency(d, "id", col("n"), "src", seqLen = L)
      .orderBy($"src").collect()
    assert(eff.length == 3)
    // reference: pack each group alone and derive the same metrics from spans
    eff.foreach { r =>
      val g = r.getAs[String]("src")
      val grp = d.where($"src" === g)
      val sp = Packing.packSequences(grp, "id", col("n"), seqLen = L)
        .collect()
      val nDocs = sp.map(_.getLong(0)).distinct.length.toLong
      val nTokens = sp.map(_.getAs[Long]("span_len")).sum
      val nSeq = sp.map(_.getAs[Long]("seq_id")).max + 1
      val nSplit = sp.groupBy(_.getLong(0)).count(_._2.length > 1).toLong
      assert(r.getAs[Long]("n_docs") == nDocs, s"$g n_docs")
      assert(r.getAs[Long]("n_tokens") == nTokens, s"$g n_tokens")
      assert(r.getAs[Long]("n_sequences") == nSeq, s"$g n_sequences")
      assert(r.getAs[Long]("pad_tokens") == nSeq * L - nTokens, s"$g pad_tokens")
      assert(r.getAs[Long]("n_split_docs") == nSplit, s"$g n_split_docs")
      assert(r.getAs[Double]("utilization") == nTokens.toDouble / (nSeq * L), s"$g utilization")
      assert(r.getAs[Double]("split_ratio") == nSplit.toDouble / nDocs, s"$g split_ratio")
    }
    val again = Packing.packEfficiency(d.repartition(13), "id", col("n"), "src", seqLen = L)
      .orderBy($"src").collect()
    assert(eff.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }
}
