package graft

import graft.text.QualityLr
import org.apache.spark.sql.functions._

class QualityLrSpec extends SparkSpec {
  import spark.implicits._

  test("features are exact ratios; diverse long docs outscore repetitive short ones") {
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog near riverbank meadows"),
      (1L, "spam spam spam spam spam spam spam spam"),
      (2L, "")
    ).toDF("doc_id", "text")
    val out = QualityLr.score(docs, "text", "doc_id").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(!out.contains(2L), "token-less docs are excluded")
    // doc 1: 8 tokens all 'spam' -> ttr = 1/8, avg_len = 4 exactly
    assert(out(1L).getDouble(3) == 0.125 && out(1L).getDouble(2) == 4.0)
    assert(out(0L).getDouble(4) > out(1L).getDouble(4),
      s"diverse doc must outscore repetitive: ${out(0L)} vs ${out(1L)}")
    // keep flag thresholds the rounded score
    out.values.foreach(r => assert(r.getBoolean(5) == (r.getDouble(4) >= 0.5)))
  }

  test("keepTopPerSource keeps exactly ceil(frac*n) per source, by score") {
    // two sources with different sizes and score spreads
    val docs = ((0L until 9L).map(i => (i, ("alpha beta gamma " * (i.toInt + 1)).trim, "a")) ++
      (9L until 13L).map(i => (i, ("delta epsilon " * (i.toInt - 7)).trim, "b")))
      .toDF("doc_id", "text", "source")
    val out = QualityLr.keepTopPerSource(docs, "text", "doc_id", "source", frac = 0.5)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
    val bys = out.groupBy(_._2).view.mapValues(_.sortBy(_._4)).toMap
    // a: ceil(9/2) = 5 kept, b: ceil(4/2) = 2 kept
    assert(bys("a").size == 5 && bys("b").size == 2, s"got $out")
    // ranks contiguous from 1; kept scores are each source's best
    bys.values.foreach { rows =>
      assert(rows.map(_._4).toSeq == (1L to rows.size).toSeq)
    }
    val all = QualityLr.score(docs, "text", "doc_id", passthrough = Seq("source"))
      .collect().map(r => (r.getLong(0), r.getAs[String]("source"), r.getAs[Double]("score")))
    bys.foreach { case (src, kept) =>
      val worstKept = kept.map(_._3).min
      val dropped = all.filter(t => t._2 == src && !kept.exists(_._1 == t._1))
      assert(dropped.forall(_._3 <= worstKept), s"source $src dropped a better doc")
    }
  }

  test("scores are identical across partitionings and weights shift verdicts") {
    val docs = (0L until 30L).map(i => (i, s"word$i " * (i.toInt + 1))).toDF("doc_id", "text")
    def run(p: Int) = QualityLr.score(docs.repartition(p), "text", "doc_id")
      .orderBy($"id").collect().map(_.toSeq).toSeq
    assert(run(2) == run(7))
    val strict = QualityLr.Weights(bias = -10.0, wTokens = 0.0, wAvgLen = 0.0, wTtr = 0.0)
    val none = QualityLr.score(docs, "text", "doc_id", strict)
      .where($"keep").count()
    assert(none == 0L, "an all-bias negative model must keep nothing")
  }
}
