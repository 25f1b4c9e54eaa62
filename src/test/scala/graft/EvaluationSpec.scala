package graft

import graft.similarity.Evaluation
import org.apache.spark.sql.functions._

class EvaluationSpec extends SparkSpec {
  import spark.implicits._

  private def ranking(rows: (Long, Long, Int)*) =
    rows.toDF("query_id", "neighbor_id", "rank")

  test("recallAtK: identical lists give 1.0, disjoint give 0.0, partial counts hits") {
    val exact = ranking((0L, 10L, 1), (0L, 11L, 2), (1L, 20L, 1), (1L, 21L, 2), (2L, 30L, 1), (2L, 31L, 2))
    val same = Evaluation.recallAtK(exact, exact, k = 2)
      .orderBy($"query_id").collect()
    assert(same.forall(r => r.getLong(1) == 2L && r.getDouble(2) == 1.0))
    // approx misses query 2 entirely and gets 1 of 2 for query 1
    val approx = ranking((0L, 10L, 1), (0L, 11L, 2), (1L, 20L, 1), (1L, 99L, 2))
    val out = Evaluation.recallAtK(exact, approx, k = 2)
      .orderBy($"query_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq ==
      Seq((0L, 2L, 1.0), (1L, 1L, 0.5), (2L, 0L, 0.0)))
  }

  test("rankingMetrics: perfect ranking gives ndcg 1.0, a swap pays the discount, misses zero out") {
    val exact = ranking((0L, 10L, 1), (0L, 11L, 2), (1L, 20L, 1), (1L, 21L, 2), (2L, 30L, 1), (2L, 31L, 2))
    // query 0 perfect, query 1 swapped, query 2 missed entirely
    val approx = ranking((0L, 10L, 1), (0L, 11L, 2), (1L, 21L, 1), (1L, 20L, 2), (2L, 99L, 1), (2L, 98L, 2))
    val out = Evaluation.rankingMetrics(exact, approx, k = 2)
      .orderBy($"query_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    val l2 = (x: Double) => StrictMath.log(x) / StrictMath.log(2.0)
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val idcg = 2.0 / l2(2.0) + 1.0 / l2(3.0)
    assert(out(0) == ((0L, 1L, 1.0, r6(idcg), 1.0)))
    // swapped order: rel 1 at rank 1, rel 2 discounted by log2(3)
    val swapped = 1.0 / l2(2.0) + 2.0 / l2(3.0)
    assert(out(1) == ((1L, 1L, 1.0, r6(swapped), r6(swapped / idcg))))
    assert(out(2) == ((2L, 0L, 0.0, 0.0, 0.0)))
  }

  test("rrfFuse: item ranked by both systems beats single-system items; ties on item_id") {
    val a = ranking((0L, 1L, 1), (0L, 2L, 2)).withColumnRenamed("neighbor_id", "item_id")
    val b = ranking((0L, 1L, 2), (0L, 3L, 1)).withColumnRenamed("neighbor_id", "item_id")
    val out = Evaluation.rrfFuse(Seq(a, b), k = 10).orderBy($"rank").collect()
    // item 1: 1/61 + 1/62 ≈ 0.0325 beats item 3 (1/61) and item 2 (1/62)
    assert(out.map(_.getLong(1)).toSeq == Seq(1L, 3L, 2L), out.mkString(","))
    // same rank in both systems → same score → smaller item id first
    val t1 = ranking((0L, 5L, 1)).withColumnRenamed("neighbor_id", "item_id")
    val t2 = ranking((0L, 4L, 1)).withColumnRenamed("neighbor_id", "item_id")
    val tie = Evaluation.rrfFuse(Seq(t1, t2), k = 10).orderBy($"rank").collect()
    assert(tie.map(_.getLong(1)).toSeq == Seq(4L, 5L))
  }

  test("rrfFuse is identical across partitionings") {
    val a = ranking((0L, 1L, 1), (0L, 2L, 2), (1L, 3L, 1)).withColumnRenamed("neighbor_id", "item_id")
    val b = ranking((0L, 2L, 1), (1L, 4L, 1), (1L, 3L, 2)).withColumnRenamed("neighbor_id", "item_id")
    def run(p: Int) = Evaluation.rrfFuse(Seq(a.repartition(p), b.repartition(p)), k = 5)
      .orderBy($"query_id", $"rank").collect().map(_.toSeq).toSeq
    assert(run(2) == run(7))
  }

  test("knnClassify: planted separable clusters classify perfectly; planted outlier fails") {
    // two tight clusters along orthogonal axes + one mislabeled vector
    // sitting inside cluster 0 — its neighbors all vote label 0
    val rows = (0 until 8).map { i =>
      val base = if (i < 4) Array(1f, 0f, 0.1f * i) else Array(0f, 1f, 0.1f * (i - 4))
      (i.toLong, base.toSeq, if (i < 4) 0 else 1)
    } :+ (8L, Seq(1f, 0f, 0.05f), 7)
    val df = rows.toDF("vec_id", "embedding", "label")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val out = Evaluation.knnClassify(df, df, "embedding", "vec_id", "label", k = 3)
      .orderBy($"query_id").collect()
    val byId = out.map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getLong(3))).toMap
    (0L to 3L).foreach(i => assert(byId(i) == ((0, 0, 1L)), s"vec $i: ${byId(i)}"))
    (4L to 7L).foreach(i => assert(byId(i) == ((1, 1, 1L)), s"vec $i: ${byId(i)}"))
    assert(byId(8L) == ((0, 7, 0L)), s"outlier: ${byId(8L)}")
  }

  test("knnClassify rejects an over-cap query side fast (bounded-queries contract)") {
    // a full-corpus self-probe is the measured 911 s footgun: the guard
    // must fail BEFORE any distance work, from a limit(cap+1) count only
    val df = spark.range(0, 60)
      .select(col("id").as("vec_id"),
        array(col("id").cast("float"), lit(1f)).as("embedding"),
        (col("id") % 2).cast("int").as("label"))
    val e = intercept[IllegalArgumentException] {
      Evaluation.knnClassify(df, df, "embedding", "vec_id", "label", k = 3, maxQueries = 50)
    }
    assert(e.getMessage.contains("maxQueries"), e.getMessage)
    assert(e.getMessage.contains("eval SLICE"), e.getMessage)
    // an explicit raise accepts the cost knowingly — same call succeeds
    val out = Evaluation.knnClassify(df, df, "embedding", "vec_id", "label",
      k = 3, maxQueries = 60)
    assert(out.count() == 60)
  }

  test("hardNegatives only returns other-label vectors, ranked among negatives") {
    // cluster 0 along x, cluster 1 along y; vec 4 is a label-1 vector
    // placed INSIDE cluster 0 — it must be everyone-in-cluster-0's top
    // hard negative, while same-label vectors never appear
    val df = Seq(
      (0L, Seq(1f, 0f), 0), (1L, Seq(1f, 0.01f), 0), (2L, Seq(1f, -0.01f), 0),
      (3L, Seq(0f, 1f), 1), (4L, Seq(1f, 0.02f), 1)
    ).toDF("vec_id", "embedding", "label")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val out = Evaluation.hardNegatives(df, df.where($"vec_id" < 3), "embedding", "vec_id", "label", k = 2)
      .orderBy($"query_id", $"rank").collect()
    assert(out.forall(r => Set(3L, 4L).contains(r.getLong(1))), out.mkString(","))
    val top = out.filter(_.getInt(3) == 1).map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(top == Map(0L -> 4L, 1L -> 4L, 2L -> 4L), top.toString)
  }

  test("similarityMargin is negative exactly when the nearest neighbor crosses labels") {
    val df = Seq(
      (0L, Seq(1f, 0f), 0), (1L, Seq(0.9f, 0.1f), 0),
      (2L, Seq(0f, 1f), 1), (3L, Seq(0.1f, 0.9f), 1),
      (4L, Seq(0.95f, 0.05f), 1) // label-1 planted inside cluster 0
    ).toDF("vec_id", "embedding", "label")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val out = Evaluation.similarityMargin(df, df, "embedding", "vec_id", "label")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out(4L) < 0, s"planted boundary vector must have negative margin: ${out(4L)}")
    assert(out(2L) > 0 && out(3L) > 0, s"clean cluster-1 vectors: $out")
    // margin must equal best_pos - best_neg exactly (difference of rounded maxima)
    val full = Evaluation.similarityMargin(df, df, "embedding", "vec_id", "label").collect()
    full.foreach(r => assert(r.getDouble(3) == r.getDouble(1) - r.getDouble(2)))
  }

  test("lshRecall: exact Jaccard is right, identical docs are always found, lsh ⊆ exact") {
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (0L, a),
      (1L, a),                                       // J = 1 with doc 0
      (2L, "alpha beta gamma delta epsilon zeta different tail words here entirely"),
      (3L, "totally unrelated content with no shared trigrams at all present")
    ).toDF("doc_id", "text")
    val out = graft.similarity.Evaluation
      .lshRecall(docs, "text", "doc_id", threshold = 0.2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getDouble(2), r.getBoolean(3))).toMap
    // identical pair: J=1, banding cannot miss it
    assert(out((0L, 1L)) == ((1.0, true)), out.toString)
    // doc 3 shares no trigram with anyone -> absent from the exact side
    assert(!out.keySet.exists { case (x, y) => x == 3L || y == 3L })
    // hand-check one Jaccard: the 6-token common prefix gives 4 shared
    // trigrams; doc 0 has 8 distinct trigrams, doc 2 has 9 -> 4/13
    val j02 = out((0L, 2L))._1
    assert(math.abs(j02 - 4.0 / 13.0) < 1e-6, s"J(0,2)=$j02")
    // every reported pair meets the threshold
    assert(out.values.forall(_._1 >= 0.2))
  }

  test("lshPrecision: candidates ⊇ verified pairs; passed flag matches the threshold") {
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (0L, a), (1L, a),
      (2L, "alpha beta gamma delta epsilon zeta different tail words here entirely")
    ).toDF("doc_id", "text")
    val cand = graft.similarity.Evaluation
      .lshPrecision(docs, "text", "doc_id", threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getDouble(2), r.getBoolean(3))).toMap
    assert(cand((0L, 1L)) == ((1.0, true)))
    cand.foreach { case (_, (j, p)) => assert(p == (j >= 0.9), s"flag mismatch at $j") }
    // every pair the production dedup verifies at 0.9 must be a candidate
    val verified = graft.dedup.Dedup.minHashPairs(docs, "text", "doc_id", threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(verified.subsetOf(cand.keySet))
    assert(verified.forall(p => cand(p)._2), "verified pairs must carry passed=true")
  }

  test("clusterPurity computes majority labels, tie to the smaller label, exact purity") {
    val assigned = Seq(
      (0, 5), (0, 5), (0, 5), (0, 9),      // cluster 0: 3/4 label 5
      (1, 2), (1, 3),                      // cluster 1: 1-1 tie -> label 2
      (2, 7)                               // singleton
    ).toDF("cluster", "label")
    val out = Evaluation.clusterPurity(assigned, "cluster", "label")
      .orderBy($"cluster").collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getInt(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out(0) == ((4L, 5, 3L, 0.75)))
    assert(out(1) == ((2L, 2, 1L, 0.5)))
    assert(out(2) == ((1L, 7, 1L, 1.0)))
  }

  test("adjustedRandIndex: 1.0 for identical partitions (up to relabeling), ~0 for independent") {
    import graft.similarity.Evaluation
    def ari(rows: Seq[(Int, Int)]) =
      Evaluation.adjustedRandIndex(rows.toDF("cluster", "label"), "cluster", "label")
        .collect().head.getDouble(4)
    val perfect = Seq((0, 7), (0, 7), (0, 7), (1, 3), (1, 3), (2, 9))
    assert(ari(perfect) == 1.0, "identical partitions under relabeling must score 1")
    // single cluster against an even label split: chance-corrected to 0
    val indep = Seq((0, 0), (0, 1), (0, 0), (0, 1))
    assert(math.abs(ari(indep)) < 1e-12)
    // hand-computed: clusters {a,a,b,b}, labels {0,1,0,1} ->
    // sum_cl = 0, sum_c = sum_l = 2, nPairs = 6, exp = 4/6
    // ari = (0 - 2/3) / (2 - 2/3) = -0.5
    val anti = Seq((0, 0), (0, 1), (1, 0), (1, 1))
    assert(math.abs(ari(anti) - (-0.5)) < 1e-12, s"got ${ari(anti)}")
  }

  test("adjustedRandIndex: empty and single-item inputs define ari = 1.0, never NaN") {
    import graft.similarity.Evaluation
    def ari(rows: Seq[(Int, Int)]) =
      Evaluation.adjustedRandIndex(rows.toDF("cluster", "label"), "cluster", "label")
        .collect().head.getDouble(4)
    assert(ari(Seq((0, 7))) == 1.0, "single item: nPairs = 0 must not divide")
    assert(ari(Seq.empty[(Int, Int)]) == 1.0, "empty input: nPairs = 0 must not divide")
  }

  test("bounded-dimension caps fail fast on degenerate keys BEFORE pulling the cell table") {
    import graft.similarity.Evaluation
    // cluster = item id: (cluster × label) cells = n rows — the degenerate
    // choice the cap exists for; the collect itself is limit(cap+1), so
    // this fails with the cap message instead of materializing n rows
    val degenerate = spark.range(1000001L)
      .selectExpr("id AS cluster", "CAST(id % 7 AS INT) AS label")
    val e1 = intercept[IllegalArgumentException] {
      Evaluation.adjustedRandIndex(degenerate, "cluster", "label")
    }
    assert(e1.getMessage.contains("bounded-dimension cap"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      Evaluation.normalizedMutualInfo(degenerate, "cluster", "label")
    }
    assert(e2.getMessage.contains("bounded-dimension cap"), e2.getMessage)
    val refSnap = spark.range(1000001L)
      .selectExpr("id AS g", "CAST(id % 10 AS DOUBLE) AS v")
    val e3 = intercept[IllegalArgumentException] {
      Evaluation.populationStability(refSnap, refSnap.limit(0), "v", "g",
        lo = 0.0, width = 1.0, nBins = 10)
    }
    assert(e3.getMessage.contains("bounded-dimension cap"), e3.getMessage)
  }

  test("normalizedMutualInfo: 1.0 for identical partitions, 0.0 for independent, degenerate cases") {
    import graft.similarity.Evaluation
    def nmi(rows: Seq[(Int, Int)]) =
      Evaluation.normalizedMutualInfo(rows.toDF("cluster", "label"), "cluster", "label")
        .collect().head
    // identical partitions under relabeling: MI = H_c = H_l -> nmi 1
    val perfect = nmi(Seq((0, 7), (0, 7), (0, 7), (1, 3), (1, 3), (2, 9)))
    assert(perfect.getDouble(4) == 1.0, s"got $perfect")
    // single cluster vs even label split: MI = 0, H_c = 0 -> nmi 0 by convention
    val oneCluster = nmi(Seq((0, 0), (0, 1), (0, 0), (0, 1)))
    assert(oneCluster.getDouble(1) == 0.0 && oneCluster.getDouble(2) == 0.0)
    assert(oneCluster.getDouble(4) == 0.0)
    // 1x1: both entropies zero -> nmi 1 (a partition agrees with itself)
    assert(nmi(Seq((5, 5), (5, 5))).getDouble(4) == 1.0)
    // hand-computed independent 2x2: MI = 0 exactly (uniform product table)
    val indep = nmi(Seq((0, 0), (0, 1), (1, 0), (1, 1)))
    assert(indep.getDouble(1) == 0.0 && indep.getDouble(4) == 0.0, s"got $indep")
    // hand-computed diagonal-heavy 2x2 {3,1;1,3}: check against direct formula
    val skew = nmi(Seq.fill(3)((0, 0)) ++ Seq((0, 1), (1, 0)) ++ Seq.fill(3)((1, 1)))
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // same accumulation order as the engine fold: cells (0,0),(0,1),(1,0),(1,1)
    val t3 = (3.0 / 8.0) * math.log((8.0 * 3.0) / (4.0 * 4.0))
    val t1 = (1.0 / 8.0) * math.log((8.0 * 1.0) / (4.0 * 4.0))
    val miExp = r6(0.0 + t3 + t1 + t1 + t3)
    val hExp = r6(math.log(2.0))
    assert(skew.getDouble(1) == miExp, s"mi ${skew.getDouble(1)} vs $miExp")
    assert(skew.getDouble(2) == hExp && skew.getDouble(3) == hExp)
    assert(skew.getDouble(4) == r6(miExp / math.sqrt(hExp * hExp)))
  }

  test("knnClassify majority tie breaks to the smaller label") {
    // query 0 with k=2: one neighbor labeled 2, one labeled 1, both at
    // identical distance shape -> 1-1 tie -> predict 1
    val df = Seq(
      (0L, Seq(1f, 0f), 9),
      (1L, Seq(1f, 0.1f), 2),
      (2L, Seq(1f, -0.1f), 1)
    ).toDF("vec_id", "embedding", "label")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val out = Evaluation.knnClassify(df, df.where($"vec_id" === 0), "embedding", "vec_id", "label", k = 2)
      .collect()
    assert(out.length == 1 && out(0).getInt(1) == 1, out.mkString(","))
  }

  test("populationStability: identical snapshots give psi 0; a planted shift is flagged at its bin") {
    def snap(rows: (String, Long)*) = rows.toDF("src", "v")
    val ref = snap(("a", 10L), ("a", 110L), ("a", 110L), ("a", 210L), ("b", 10L), ("b", 10L))
    val same = Evaluation.populationStability(ref, ref, "v", "src", lo = 0.0, width = 100.0, nBins = 4)
      .orderBy($"group").collect()
    assert(same.map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq ==
      Seq(("a", 4L, 4L, 0.0), ("b", 2L, 2L, 0.0)))
    // current snapshot moves all of a's mass into bin 3 (clamped top bin)
    val cur = snap(("a", 310L), ("a", 500L), ("a", 390L), ("a", 320L), ("b", 10L), ("b", 10L))
    val shifted = Evaluation.populationStability(ref, cur, "v", "src", lo = 0.0, width = 100.0, nBins = 4)
      .orderBy($"group").collect()
    val a = shifted.find(_.getString(0) == "a").get
    assert(a.getDouble(3) > 0.25, s"shifted psi ${a.getDouble(3)} not above the alert threshold")
    assert(a.getLong(4) == 3L, s"top_shift_bin ${a.getLong(4)} != 3")
    assert(shifted.find(_.getString(0) == "b").get.getDouble(3) == 0.0)
  }

  test("populationStability: hand-computed two-bin case and one-sided groups") {
    // ref a: [3, 1] cur a: [1, 3]; smoothed p = (4/6, 2/6), q = (2/6, 4/6)
    val ref = Seq(("a", 0L), ("a", 0L), ("a", 0L), ("a", 5L), ("only_ref", 0L)).toDF("src", "v")
    val cur = Seq(("a", 0L), ("a", 5L), ("a", 5L), ("a", 5L)).toDF("src", "v")
    val out = Evaluation.populationStability(ref, cur, "v", "src", lo = 0.0, width = 5.0, nBins = 2)
      .collect().map(r => r.getString(0) -> r).toMap
    val expected = {
      val t0 = (4.0 / 6 - 2.0 / 6) * math.log((4.0 / 6) / (2.0 / 6))
      val t1 = (2.0 / 6 - 4.0 / 6) * math.log((2.0 / 6) / (4.0 / 6))
      BigDecimal(t0 + t1).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(out("a").getDouble(3) == expected, s"${out("a").getDouble(3)} != $expected")
    // a group with no current rows still reports (all-smoothing psi)
    val or = out("only_ref")
    assert(or.getLong(1) == 1L && or.getLong(2) == 0L && or.getDouble(3) > 0.0)
  }

  test("calibration: hand-computed bins, score 1.0 folds into the top bin") {
    // bin 0: scores .00/.05, labels F/T → n=2, mean .025, rate .5
    // bin 9: scores .95/1.0/1.0, labels T/T/F → n=3 (1.0 FOLDS IN), rate 2/3
    // bin 5: single score .55 label F → gap = mean_score
    val scored = Seq(
      (0.00, false), (0.05, true),
      (0.95, true), (1.0, true), (1.0, false),
      (0.55, false)).toDF("score", "label")
    val out = Evaluation.calibration(scored, "score", "label", nBins = 10)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == Set(0L, 5L, 9L), s"bins ${out.keySet}")
    assert(out(0L).getLong(1) == 2L && out(0L).getDouble(2) == 0.025 &&
      out(0L).getDouble(3) == 0.5)
    assert(out(9L).getLong(1) == 3L, "score 1.0 must fold into bin nBins-1")
    assert(out(9L).getDouble(2) == 0.983333) // (0.95+1+1)/3 rounded HALF_UP at 6
    assert(math.abs(out(9L).getDouble(3) - 2.0 / 3) < 1e-15)
    assert(out(9L).getDouble(4) == BigDecimal(2.0 / 3 - 0.983333)
      .abs.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(out(5L).getLong(1) == 1L && out(5L).getDouble(3) == 0.0 &&
      out(5L).getDouble(4) == 0.55)
    // ECE folds out of the table: Σ (n_b/N)·gap_b
    val ece = out.values.map(r => r.getLong(1) * r.getDouble(4)).sum / 6
    assert(ece > 0.0 && ece < 1.0)

    // the summary reproduces the hand fold + the exact Brier mean
    val sm = Evaluation.calibrationSummary(scored, "score", "label", nBins = 10).head()
    assert(sm.getLong(0) == 6L)
    val expectEce = {
      val terms = Seq(0L, 5L, 9L).map(b => out(b).getLong(1).toDouble / 6 * out(b).getDouble(4))
      BigDecimal(terms.sum).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(sm.getDouble(1) == expectEce, s"ece ${sm.getDouble(1)} != $expectEce")
    val expectBrier = {
      val sq = Seq(0.0 - 0, 0.05 - 1, 0.95 - 1, 1.0 - 1, 1.0 - 0, 0.55 - 0).map(d => d * d)
      BigDecimal(sq.sum / 6).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(sm.getDouble(2) == expectBrier, s"brier ${sm.getDouble(2)} != $expectBrier")
  }

  test("mmrRerank: diversification flips the near-duplicate out of slot 2") {
    import spark.implicits._
    // query (1,0); 1=(0.8,0.6) rel .8; 2=(1.6,1.2) SAME direction as 1
    // (rel .8, sim 1.0); 3=(0.6,-0.8) rel .6 but orthogonal to 1 (sim 0)
    val corpus = Seq(
      (0L, Seq(1.0f, 0.0f)),
      (1L, Seq(0.8f, 0.6f)),
      (2L, Seq(1.6f, 1.2f)),
      (3L, Seq(0.6f, -0.8f))).toDF("vec_id", "embedding")
    val out = Evaluation.mmrRerank(corpus, corpus.where($"vec_id" === 0),
        "embedding", "vec_id", nCandidates = 3, k = 2)
      .orderBy($"mmr_rank").collect()
    // pick 1: rel tie .8/.8 between ids 1,2 → smaller id; score .7·.8
    assert(out(0).getLong(1) == 1L && out(0).getInt(2) == 1)
    assert(math.abs(out(0).getDouble(3) - 0.56) < 1e-9)
    // pick 2: near-dup 2 scores .7·.8−.3·1.0=.26 < orthogonal 3's
    // .7·.6−.3·0=.42 — pure top-k would keep 2, MMR flips to 3
    assert(out(1).getLong(1) == 3L && out(1).getInt(2) == 2)
    assert(math.abs(out(1).getDouble(3) - 0.42) < 1e-9)
    // k > candidates truncates gracefully; single-candidate query works
    val solo = Evaluation.mmrRerank(
      Seq((0L, Seq(1.0f, 0.0f)), (1L, Seq(0.5f, 0.5f))).toDF("vec_id", "embedding"),
      Seq((0L, Seq(1.0f, 0.0f))).toDF("vec_id", "embedding"),
      "embedding", "vec_id", nCandidates = 5, k = 5).collect()
    assert(solo.length == 1 && solo(0).getInt(2) == 1)
  }

  test("MmrSelect: pair referencing a non-candidate id reads as similarity 0") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    // candidates 1 (rel .8) and 2 (rel .8, max-similar to 1); plus a
    // stray pair naming id 99 which is NOT a candidate. The documented
    // contract: missing/foreign pairs read as similarity 0 — a vacuous
    // null guard would map 99 to order position 0 (the top-relevance
    // candidate) and corrupt the penalty.
    val cands = new GenericArrayData(Array[Any](
      new GenericInternalRow(Array[Any](1L, 0.8)),
      new GenericInternalRow(Array[Any](2L, 0.8)),
      new GenericInternalRow(Array[Any](3L, 0.6))))
    val pairs = new GenericArrayData(Array[Any](
      new GenericInternalRow(Array[Any](1L, 2L, 1.0)),
      new GenericInternalRow(Array[Any](99L, 3L, 1.0)))) // foreign id
    val e = graft.expressions.MmrSelect(
      org.apache.spark.sql.catalyst.expressions.Literal(1),
      org.apache.spark.sql.catalyst.expressions.Literal(1), k = 2,
      lam = 0.7, penWeight = 0.3)
    val out = e.evalMmr(cands, pairs)
    // pick 1: id 1 (rel tie, smaller id). pick 2: id 2 penalized by
    // sim(1,2)=1.0 → .7·.8−.3 = .26; id 3's ONLY pair is the foreign one,
    // which must be IGNORED → .7·.6−0 = .42 → id 3 wins. If the foreign
    // pair aliased position 0 (id 1, already selected), id 3 would be
    // penalized .3·1.0 → .12 and id 2 would wrongly win.
    assert(out.getStruct(0, 3).getLong(0) == 1L)
    assert(out.getStruct(1, 3).getLong(0) == 3L)
    assert(math.abs(out.getStruct(1, 3).getDouble(2) - 0.42) < 1e-9)
  }
}
