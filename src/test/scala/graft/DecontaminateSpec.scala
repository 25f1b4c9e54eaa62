package graft

import graft.dedup.Decontaminate
import org.apache.spark.sql.functions._

/** Invariant tests for eval-set decontamination: planted verbatim span
  * overlap must be flagged; clean docs and short docs must survive.
  */
class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  private val leaked =
    "what is the capital of france the capital of france is paris a city on the seine"
  private val clean1 =
    "spark engines shuffle data across partitions with hash exchanges and sort merge joins at scale"
  private val clean2 =
    "completely unrelated content about astronomy telescopes galaxies nebulae and the expansion of space"

  private def train = Seq(
    (0L, s"intro paragraph then $leaked and some trailing commentary"), // contains eval span
    (1L, clean1),
    (2L, clean2),
    (3L, "tiny doc") // < w tokens: no spans
  ).toDF("doc_id", "text")

  private def evalSet = Seq((100L, leaked)).toDF("doc_id", "text")

  test("overlapStats flags only the doc sharing eval spans") {
    val stats = Decontaminate.overlapStats(train, evalSet, "text", "doc_id", w = 8)
    val flagged = stats.where($"n_eval_spans" > 0).select($"id").as[Long].collect().toSet
    assert(flagged == Set(0L))
    val row = stats.where($"id" === 0L).head()
    assert(row.getAs[Long]("n_eval_spans") > 0)
    assert(row.getAs[Double]("overlap_ratio") > 0 && row.getAs[Double]("overlap_ratio") <= 1.0)
  }

  test("overlapStatsBloom ≡ overlapStats (bit-identical rows); empty eval set → zero hits") {
    val exact = Decontaminate.overlapStats(train, evalSet, "text", "doc_id", w = 8)
      .orderBy($"id").collect().toSeq
    val bloom = Decontaminate.overlapStatsBloom(train, evalSet, "text", "doc_id", w = 8)
      .orderBy($"id").collect().toSeq
    assert(bloom == exact, s"bloom=$bloom exact=$exact")
    // a saturated-fpp bloom (tiny bit budget) may pass extra candidates to
    // the exact join but must never change the result
    val coarse = Decontaminate.overlapStatsBloom(train, evalSet, "text", "doc_id", w = 8, fpp = 0.5)
      .orderBy($"id").collect().toSeq
    assert(coarse == exact)
    // empty eval set: the zero-row bloom aggregate yields a null sketch —
    // every doc reports zero hits instead of the operator throwing
    val none = Decontaminate.overlapStatsBloom(
        train, evalSet.where($"doc_id" < 0), "text", "doc_id", w = 8)
      .orderBy($"id").collect()
    assert(none.forall(r => r.getAs[Long]("n_eval_spans") == 0L && r.getAs[Double]("overlap_ratio") == 0.0))
    assert(none.map(_.getAs[Long]("id")).toSet == Set(0L, 1L, 2L)) // short doc 3 has no spans
  }

  test("overlapStatsAuto: both branches fire on the right corpora and match the exact path bit-identically") {
    val exact = Decontaminate.overlapStats(train, evalSet, "text", "doc_id", w = 8)
      .orderBy($"id").collect().toSeq
    // saturated corpus (every train doc IS the eval doc) → exact path
    val hot = Seq((0L, leaked), (1L, leaked), (2L, leaked)).toDF("doc_id", "text")
    val pHot = Decontaminate.probePolicy(hot, evalSet, "text", "doc_id",
      w = 8, probeDocs = 1000, densityCutoff = 0.5)
    assert(pHot.path == "exact" && pHot.estHitDensity == 1.0, pHot.toString)
    // normal low-density corpus → bloom path
    val pCold = Decontaminate.probePolicy(train, evalSet, "text", "doc_id",
      w = 8, probeDocs = 1000, densityCutoff = 0.5)
    assert(pCold.path == "bloom" && pCold.estHitDensity < 0.5, pCold.toString)
    // eval span set past the broadcast threshold → bloom, no density probe
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64")
      val pBig = Decontaminate.probePolicy(train, evalSet, "text", "doc_id",
        w = 8, probeDocs = 1000, densityCutoff = 0.5)
      assert(pBig.path == "bloom" && pBig.estHitDensity == -1.0, pBig.toString)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
    // whatever the policy picks, results are the exact path's rows
    val viaBloom = Decontaminate.overlapStatsAuto(train, evalSet, "text", "doc_id", w = 8)
      .orderBy($"id").collect().toSeq
    assert(viaBloom == exact, s"auto(bloom)=$viaBloom exact=$exact")
    val hotExact = Decontaminate.overlapStats(hot, evalSet, "text", "doc_id", w = 8)
      .orderBy($"id").collect().toSeq
    val viaExact = Decontaminate.overlapStatsAuto(hot, evalSet, "text", "doc_id", w = 8)
      .orderBy($"id").collect().toSeq
    assert(viaExact == hotExact)
  }

  test("evalContaminationBloom ≡ evalContamination; empty eval set handled") {
    val evalTwo = evalSet.union(Seq((101L, clean2 + " extra tail words here")).toDF("doc_id", "text"))
    val exact = Decontaminate.evalContamination(train, evalTwo, "text", "doc_id", w = 8)
      .orderBy($"eval_id").collect().toSeq
    val bloom = Decontaminate.evalContaminationBloom(train, evalTwo, "text", "doc_id", w = 8)
      .orderBy($"eval_id").collect().toSeq
    assert(bloom == exact, s"bloom=$bloom exact=$exact")
    val none = Decontaminate.evalContaminationBloom(
        train, evalSet.where($"doc_id" < 0), "text", "doc_id", w = 8)
      .collect()
    assert(none.isEmpty, "no eval docs → empty report")
  }

  test("evalContamination reports the leak from the eval side; zero-hit eval docs stay") {
    val evalTwo = evalSet.union(Seq((101L, clean2 + " extra tail words here")).toDF("doc_id", "text"))
    val out = Decontaminate.evalContamination(train, evalTwo, "text", "doc_id", w = 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    // eval 100 is fully contained in train doc 0: every span hits, one train doc
    val (n100, hit100, docs100, ratio100) = out(100L)
    assert(hit100 == n100 && ratio100 == 1.0 && docs100 == 1L, s"got ${out(100L)}")
    // eval 101 shares spans with train doc 2 (clean2 is a prefix of it)
    val (n101, hit101, docs101, ratio101) = out(101L)
    assert(hit101 > 0 && hit101 < n101 && docs101 == 1L && ratio101 < 1.0, s"got ${out(101L)}")
    // an eval doc with no overlap at all still appears, zero-filled
    val lone = Decontaminate.evalContamination(train,
        Seq((102L, "eleven totally novel words that never appear anywhere in the training corpus at all")).toDF("doc_id", "text"),
        "text", "doc_id", w = 8)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getDouble(4))).toSeq
    assert(lone == Seq((102L, 0L, 0L, 0.0)), s"got $lone")
  }

  test("clean drops contaminated docs, keeps clean and short docs") {
    val out = Decontaminate.clean(train, evalSet, "text", "doc_id", w = 8)
    val ids = out.select($"doc_id").as[Long].collect().toSet
    assert(ids == Set(1L, 2L, 3L))
  }

  test("no eval overlap → everything survives") {
    val out = Decontaminate.clean(train.where($"doc_id" =!= 0L), evalSet, "text", "doc_id", w = 8)
    assert(out.count() == 3)
  }

  test("transitive contamination: min-hop BFS, bounded hops, early stop, isolated seeds") {
    def pairs(rows: (Long, Long)*) = rows.toDF("id_a", "id_b")
    def seeds(ids: Long*) = ids.toDF("id")
    // chain 1-2-3-4 cut at maxHops 2: doc 4 stays out
    val chain = Decontaminate.transitiveContamination(
        pairs((1L, 2L), (2L, 3L), (3L, 4L)), seeds(1L), maxHops = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(chain == Map(1L -> 0, 2L -> 1, 3L -> 2))
    // diamond 1-2, 1-3, 2-4, 3-4: hop of 4 is the MINIMUM (2), one row
    val diamond = Decontaminate.transitiveContamination(
        pairs((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L)), seeds(1L), maxHops = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(diamond == Map(1L -> 0, 2L -> 1, 3L -> 1, 4L -> 2))
    // an isolated seed (not in the graph) stays at hop 0; edges touching
    // no seed contribute nothing; convergence stops before maxHops
    val iso = Decontaminate.transitiveContamination(
        pairs((7L, 8L)), seeds(5L), maxHops = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(iso == Map(5L -> 0))
    // maxHops 0 = direct contamination only
    val direct = Decontaminate.transitiveContamination(
        pairs((1L, 2L)), seeds(1L), maxHops = 0)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(direct == Map(1L -> 0))
  }
}
