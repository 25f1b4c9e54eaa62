package graft

import graft.dedup.Dedup
import graft.functions.{HashFunctions => H, TextFunctions => T}
import org.apache.spark.sql.functions._

/** Invariant tests for the hash-based dedup operators (no SQL oracle is
  * possible for xxhash64-based MinHash/SimHash, so planted-duplicate
  * invariants are the correctness check).
  */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog while the cat sleeps on the warm mat near the door"
  private val nearDup = base.replace("warm", "cold") // 1-token change
  private val distinct1 =
    "spark engines shuffle data across partitions with hash exchanges and sort merge joins at scale"
  private val distinct2 =
    "completely unrelated content about astronomy telescopes galaxies nebulae and the expansion of space"

  private def docs = Seq(
    (0L, base), (1L, nearDup), (2L, distinct1), (3L, distinct2), (4L, base)
  ).toDF("doc_id", "text")

  test("exact dedup keeps lowest id of identical docs") {
    val out = Dedup.exact(docs, "text", "doc_id").select($"doc_id").collect().map(_.getLong(0)).sorted
    assert(out.toSeq == Seq(0L, 1L, 2L, 3L)) // doc 4 == doc 0 dropped
  }

  test("minhash finds planted near-duplicates and exact duplicates, not distinct docs") {
    val pairs = Dedup.minHashPairs(docs, "text", "doc_id", threshold = 0.5)
      .select($"id_a", $"id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 4L)))
    assert(pairs.contains((0L, 1L)) || pairs.contains((1L, 4L)))
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("minhash jaccard estimate tracks exact jaccard") {
    val sh = docs.select($"doc_id", T.shingles($"text", 3).as("sh"))
      .withColumn("sig", H.minHashSignature($"sh", 128))
    val a = sh.where($"doc_id" === 0).select($"sh", $"sig").head()
    val b = sh.where($"doc_id" === 1).select($"sh", $"sig").head()
    val exact = docs.sparkSession.range(1).select(
      H.jaccard(typedLit(a.getSeq[String](0)), typedLit(b.getSeq[String](0)))).head().getDouble(0)
    val est = docs.sparkSession.range(1).select(
      H.minHashJaccard(typedLit(a.getSeq[Long](1)), typedLit(b.getSeq[Long](1)))).head().getDouble(0)
    assert(math.abs(exact - est) < 0.2, s"exact=$exact est=$est")
  }

  test("simhash: near-dups within small hamming distance, distinct docs far") {
    val fps = docs.select($"doc_id", H.simHash64(T.tokenize($"text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(fps(0L), fps(4L)) == 0) // identical
    assert(ham(fps(0L), fps(1L)) <= 12) // near-dup
    assert(ham(fps(0L), fps(3L)) > 12) // distinct
  }

  test("simhash pairs operator surfaces the exact duplicate") {
    val pairs = Dedup.simHashPairs(docs, "text", "doc_id", maxHamming = 3)
      .select($"id_a", $"id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 4L)))
  }

  test("simhash pairs derives a compliant banding from maxHamming alone") {
    // maxHamming = 6 under the old fixed default (4 bands) violated the
    // pigeonhole bound and threw; the auto default derives the smallest
    // divisor of 64 exceeding maxHamming (here 8) instead
    val pairs = Dedup.simHashPairs(docs, "text", "doc_id", maxHamming = 6)
      .select($"id_a", $"id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 4L)))
    // an EXPLICIT non-compliant banding still fails fast (silently
    // widening a stated banding would change its collision cost)
    val e = intercept[IllegalArgumentException] {
      Dedup.simHashPairs(docs, "text", "doc_id", maxHamming = 6, bands = 4)
    }
    assert(e.getMessage.contains("full recall"), e.getMessage)
  }

  test("ngram jaccard pairs finds near-dup") {
    val pairs = Dedup.ngramJaccardPairs(docs, "text", "doc_id", threshold = 0.5)
      .select($"id_a", $"id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 4L)) && pairs.contains((0L, 1L)))
  }

  test("cluster representatives: transitive closure to min id") {
    val pairs = Seq((0L, 1L, 1.0), (1L, 4L, 1.0), (7L, 8L, 1.0))
      .toDF("id_a", "id_b", "jaccard_sim")
    val reps = Dedup.clusterRepresentatives(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(reps(0L) == 0L && reps(1L) == 0L && reps(4L) == 0L)
    assert(reps(7L) == 7L && reps(8L) == 7L)
  }

  test("end-to-end minhash dedup removes dup cluster members only") {
    val out = Dedup.minHashDedup(docs, "text", "doc_id", threshold = 0.5)
      .select($"doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(out.head == 0L) // representative survives
    assert(out.contains(2L) && out.contains(3L)) // distinct docs survive
    assert(!out.contains(4L)) // exact dup dropped
  }

  test("keep-best survivor policy: longest cluster member wins, ties to lowest id") {
    // cluster {0, 1, 4}: doc 1 (nearDup) same length as base; doc 5 is
    // base with an extra tail — the LONGEST member and NOT the min id
    val longer = base + " and a longer trailing sentence follows here"
    val d = Seq(
      (0L, base), (1L, nearDup), (2L, distinct1), (3L, distinct2), (4L, base), (5L, longer)
    ).toDF("doc_id", "text")
    val best = Dedup.minHashDedupKeepBest(d, "text", "doc_id",
        T.tokenCount($"text").cast("long"), threshold = 0.5)
      .select($"doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(best == Seq(2L, 3L, 5L), s"longest member must win the cluster: $best")
    // min-id policy on the same corpus keeps 0 instead — the policies differ
    val minId = Dedup.minHashDedup(d, "text", "doc_id", threshold = 0.5)
      .select($"doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(minId == Seq(0L, 2L, 3L), s"min-id baseline: $minId")
    // equal scores everywhere → tie-break reduces to min id: same verdicts
    val tied = Dedup.minHashDedupKeepBest(docs, "text", "doc_id",
        lit(7L), threshold = 0.5)
      .select($"doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val baseline = Dedup.minHashDedup(docs, "text", "doc_id", threshold = 0.5)
      .select($"doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(tied == baseline, s"tied=$tied baseline=$baseline")
  }

  test("keep-best works with STRING ids (tie-break has no arithmetic negation)") {
    // same corpus keyed by strings; ties everywhere → min (string) id wins
    val longer = base + " and a longer trailing sentence follows here"
    val d = Seq(
      ("a0", base), ("a1", nearDup), ("b2", distinct1), ("b3", distinct2),
      ("a4", base), ("a5", longer)
    ).toDF("doc_id", "text")
    val best = Dedup.minHashDedupKeepBest(d, "text", "doc_id",
        T.tokenCount($"text").cast("long"), threshold = 0.5)
      .select($"doc_id").collect().map(_.getString(0)).sorted.toSeq
    assert(best == Seq("a5", "b2", "b3"), s"longest member wins with string ids: $best")
    val tied = Dedup.minHashDedupKeepBest(d, "text", "doc_id", lit(1L), threshold = 0.5)
      .select($"doc_id").collect().map(_.getString(0)).sorted.toSeq
    assert(tied == Seq("a0", "b2", "b3"), s"all-tied falls back to min string id: $tied")
  }

  test("leakage-safe split: near-dup clusters never straddle the split; clean docs match the plain split") {
    val out = Dedup.leakageSafeSplit(docs, "text", "doc_id", threshold = 0.5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    // the {0, 1, 4} cluster shares one key (the min id 0) and one side
    assert(Seq(0L, 1L, 4L).map(out(_)._1).distinct == Seq(0L), "cluster shares split_key 0")
    assert(Seq(0L, 1L, 4L).map(out(_)._2).distinct.size == 1, "cluster lands on one side")
    // unclustered docs keep their own key and the plain md5 predicate
    for (id <- Seq(2L, 3L)) {
      assert(out(id)._1 == id)
      val expect = if (java.security.MessageDigest.getInstance("MD5")
          .digest(id.toString.getBytes).map("%02x".format(_)).mkString.take(4) < "cccd")
        "train" else "test"
      assert(out(id)._2 == expect, s"doc $id plain-split side")
    }
    // without near-dups the operator IS the plain doc-level split
    val clean = Seq((10L, distinct1), (11L, distinct2)).toDF("doc_id", "text")
    val plain = Dedup.leakageSafeSplit(clean, "text", "doc_id", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(plain == Seq((10L, 10L), (11L, 11L)))
  }

  test("clean corpus (no near-duplicates) survives end-to-end — empty pair graph (ADVICE r1)") {
    val clean = Seq((0L, distinct1), (1L, distinct2)).toDF("doc_id", "text")
    // used to NPE: agg(max(chg)) over an empty label set returned null
    val out = Dedup.minHashDedup(clean, "text", "doc_id", threshold = 0.5)
      .select($"doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(out == Seq(0L, 1L))
    val reps = Dedup.clusterRepresentatives(
      Seq.empty[(Long, Long, Double)].toDF("id_a", "id_b", "jaccard_sim"))
    assert(reps.isEmpty)
  }

  test("dedup releases every DataFrame cache it takes (ADVICE r1 leak class)") {
    // persist()/cache() register in the session CacheManager and leave it
    // on unpersist(); localCheckpoint blocks do NOT go through it — so an
    // empty CacheManager after the op proves the MEMORY_AND_DISK entries
    // (signatures, pair caches, label-propagation iterates) were released
    assert(spark.sharedState.cacheManager.isEmpty, "pre-existing cache entries — fix the test env")
    val docs = (0L until 40L).map(i => (i, s"document number $i with some shared words plus token$i"))
      .toDF("doc_id", "text")
    Dedup.minHashDedup(docs, "text", "doc_id", threshold = 0.5).count()
    assert(spark.sharedState.cacheManager.isEmpty, "dedup left DataFrame cache entries registered")
  }

  test("duplicated-passage detection flags shared 8-token spans only") {
    val passage = "one two three four five six seven eight nine ten"
    val docs = Seq(
      (0L, s"intro words here $passage trailing alpha"),
      (1L, s"different opening text $passage other ending beta"),
      (2L, "totally unrelated content with enough tokens to have spans of its own here now")
    ).toDF("doc_id", "text")
    val stats = Dedup.spanDupStats(docs, "text", "doc_id", w = 8)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(stats(0L)._2 >= 1, s"doc 0 should have dup spans: $stats")   // shared passage
    assert(stats(1L)._2 >= 1, s"doc 1 should have dup spans: $stats")
    assert(stats(2L)._2 == 0, s"doc 2 has no shared spans: $stats")
    val common = Dedup.duplicatedSpans(docs, "text", "doc_id", w = 8)
      .collect()
    assert(common.nonEmpty && common.forall(_.getLong(1) == 2)) // each shared span in exactly 2 docs
  }

  test("incremental exact dedup: corpus hits and batch-internal dups dropped, novel kept") {
    val corpus = Seq((0L, base), (1L, distinct1)).toDF("doc_id", "text")
    val batch = Seq(
      (10L, base),      // exact dup of corpus doc 0 → dropped
      (11L, distinct2), // novel → kept
      (12L, distinct2), // batch-internal dup of 11 → dropped
      (13L, nearDup)    // near but not exact → kept (exact dedup only)
    ).toDF("doc_id", "text")
    val out = Dedup.exactIncremental(corpus, batch, "text", "doc_id")
      .select($"doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(out == Seq(11L, 13L))
  }

  test("bloom-prefiltered incremental dedup result-identical to exact variant") {
    val corpus = Seq((0L, base), (1L, distinct1)).toDF("doc_id", "text")
    val corpusFps = corpus.select(T.fingerprint($"text").as("__fp")).distinct()
    val batch = Seq(
      (10L, base), (11L, distinct2), (12L, distinct2), (13L, nearDup)
    ).toDF("doc_id", "text")
    val viaBloom = Dedup.exactIncrementalBloom(corpusFps, batch, "text", "doc_id", expectedCorpusSize = 2)
      .select($"doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val viaExact = Dedup.exactIncrementalAgainst(corpusFps, batch, "text", "doc_id")
      .select($"doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(viaBloom == viaExact && viaBloom == Seq(11L, 13L))
  }

  test("incremental minhash dedup: near-dups of corpus and of lower-id batch docs dropped") {
    val corpus = Seq((0L, base), (1L, distinct1)).toDF("doc_id", "text")
    val batch = Seq(
      (10L, nearDup),   // near-dup of corpus doc 0 → dropped
      (11L, distinct2), // novel → kept
      (12L, distinct2)  // dup of batch doc 11 → dropped
    ).toDF("doc_id", "text")
    val out = Dedup.minHashIncremental(corpus, batch, "text", "doc_id", threshold = 0.5)
      .select($"doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(out == Seq(11L))
  }

  test("embedding pairs: identical and near-identical vectors pair up") {
    val v = (0 until 16).map(_.toFloat / 16f).toArray
    val vNear = v.clone(); vNear(0) = vNear(0) + 0.001f
    val vFar = (0 until 16).map(i => ((i * 37) % 16).toFloat / 16f - 0.5f).toArray
    val emb = Seq((0L, v.toSeq), (1L, vNear.toSeq), (2L, vFar.toSeq)).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingPairs(emb, "embedding", "vec_id", threshold = 0.99)
      .select($"id_a", $"id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)))
    assert(!pairs.exists(p => p._2 == 2L))
  }

  test("exact substring dedup: any >= L verbatim duplicate is detected, coverage exact") {
    import org.apache.spark.sql.functions.col
    // 61 lowercase chars of shared boilerplate (> L = 40) embedded
    // verbatim in docs 1 and 2 at different offsets; doc 3 is clean
    val boiler = "shared boilerplate sentence that appears verbatim in two docs"
    assert(boiler.length == 61)
    val docs = Seq(
      (1L, s"alpha unique preamble text here $boiler and a unique alpha tail section"),
      (2L, s"totally different beta document opening words $boiler closing beta remarks"),
      (3L, "this third document shares nothing with the others at all in any window of text")
    ).toDF("doc_id", "text")
    val out = Dedup.exactSubstringDupStats(docs, "text", "doc_id", minLen = 40, minDocs = 2)
      .collect().map(r => r.getLong(0) -> r).toMap
    // suffix-array equivalence: the >= L duplicate is found in BOTH docs
    assert(out(1L).getAs[Long]("n_dup_windows") > 0, "duplicate missed in doc 1")
    assert(out(2L).getAs[Long]("n_dup_windows") > 0, "duplicate missed in doc 2")
    assert(out(3L).getAs[Long]("n_dup_windows") == 0, "false positive in clean doc")
    assert(out(3L).getAs[Double]("dup_char_frac") == 0.0)
    // coverage: the maximal shared run is " boiler " (the single-space
    // separators flank it identically in both docs) = |boiler| + 2 chars,
    // yielding run - L + 1 duplicated windows whose interval union is
    // exactly `run` chars — merged-interval math must not overcount
    val run = boiler.length + 2
    val expectedWindows = run - 40 + 1
    assert(out(1L).getAs[Long]("n_dup_windows") == expectedWindows,
      s"doc1 windows: ${out(1L).getAs[Long]("n_dup_windows")} vs $expectedWindows")
    val normLen1 = out(1L).getAs[Long]("n_windows") + 40 - 1
    val expectedFrac1 = BigDecimal(run.toDouble / normLen1)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(1L).getAs[Double]("dup_char_frac") == expectedFrac1,
      s"doc1 coverage ${out(1L).getAs[Double]("dup_char_frac")} vs $expectedFrac1")
    // docs shorter than L produce no windows and are absent, not wrong
    val short = Seq((9L, "tiny")).toDF("doc_id", "text")
    assert(Dedup.exactSubstringDupStats(short, "text", "doc_id", minLen = 40).count() == 0)
  }

  test("chunk dedup rewrite: global keep-first, within-doc repeats, empty docs") {
    val d = Seq(
      (0L, "a b c d"),       // chunks [a b][c d] — all first occurrences
      (1L, "a b x y"),       // [a b] loses to (0,0) → "x y"
      (2L, "p q p q p q"),   // within-doc repeats: keep first [p q] only
      (3L, ""),              // no chunks
      (4L, "c d a b"),       // both chunks lose → fully emptied
      (5L, "z z z")          // [z z][z] — distinct units, both kept
    ).toDF("doc_id", "text")
    val out = Dedup.chunkDedupRewrite(d, "text", "doc_id", w = 2)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(0L).getString(1) == "a b c d" && out(0L).getLong(3) == 0)
    assert(out(1L).getString(1) == "x y" && out(1L).getLong(3) == 1)
    assert(out(2L).getString(1) == "p q" && out(2L).getLong(2) == 3 && out(2L).getLong(3) == 2)
    assert(out(3L).getString(1) == "" && out(3L).getLong(2) == 0 && out(3L).getLong(3) == 0)
    assert(out(4L).getString(1) == "" && out(4L).getLong(3) == 2)
    assert(out(5L).getString(1) == "z z z" && out(5L).getLong(2) == 2 && out(5L).getLong(3) == 0)
    // kept chunks preserve original order (not dedup-winner order)
    val d2 = Seq((0L, "m n o p"), (1L, "q r m n s t")).toDF("doc_id", "text")
    val r1 = Dedup.chunkDedupRewrite(d2, "text", "doc_id", w = 2)
      .where($"id" === 1L).head()
    assert(r1.getString(1) == "q r s t")
    // partition independence: the verdicts are a pure function of content
    val shuffled = Dedup.chunkDedupRewrite(d.repartition(7), "text", "doc_id", w = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val straight = out.values.map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(shuffled == straight)
  }

  test("drop attribution points every dropped occurrence at the global first occurrence") {
    val d = Seq((0L, "a b c d"), (1L, "a b x y"), (2L, "p q p q")).toDF("doc_id", "text")
    val attr = Dedup.chunkDropAttribution(d, "text", "doc_id", w = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // doc 1's [a b] lost to (0,0); doc 2's second [p q] lost to its own idx 0
    assert(attr == Set((1L, 0L, 0L, 0L), (2L, 1L, 2L, 0L)))
    // consistency: attribution rows == the rewrite's dropped counts per doc
    val byDoc = attr.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val rewrite = Dedup.chunkDedupRewrite(d, "text", "doc_id", w = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(rewrite.forall { case (id, n) => byDoc.getOrElse(id, 0L) == n })
  }

  test("boilerplate rewrite removes every copy at the df threshold; within-doc repeats count once") {
    val d = Seq(
      (0L, "a b c d"), // [a b] in docs {0,1,2} → boilerplate everywhere
      (1L, "a b x y"), // [x y] in docs {1,3} only → df 2 < 3, survives
      (2L, "a b a b e f"), // within-doc repeat still counts doc 2 ONCE toward df
      (3L, "x y g h")
    ).toDF("doc_id", "text")
    val out = Dedup.boilerplateRewrite(d, "text", "doc_id", w = 2, minDocs = 3)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(0L).getString(1) == "c d" && out(0L).getLong(3) == 1)
    assert(out(1L).getString(1) == "x y" && out(1L).getLong(3) == 1)
    // doc 2: BOTH [a b] copies removed (no keep-first here)
    assert(out(2L).getString(1) == "e f" && out(2L).getLong(3) == 2)
    assert(out(3L).getString(1) == "x y g h" && out(3L).getLong(3) == 0)
    // below the threshold nothing is boilerplate: df([a b]) = 3 < 4
    val none = Dedup.boilerplateRewrite(d, "text", "doc_id", w = 2, minDocs = 4)
      .agg(sum($"n_dropped")).head().getLong(0)
    assert(none == 0L)
  }

  // --- giant-duplicate-cluster collapse (the sf1skew guard, SCALE.md):
  // identical signatures/fingerprints/vectors emit a STAR anchored at the
  // min id, never a clique — linear in cluster size, same components

  test("minhash giant cluster: star pairs only, connectivity to outside docs preserved") {
    val m = 60
    val all = ((100L until 100L + m).map(i => (i, base)) ++
      Seq((500L, distinct1), (501L, distinct2), (502L, nearDup))).toDF("doc_id", "text")
    val pairs = Dedup.minHashPairs(all, "text", "doc_id", threshold = 0.5)
      .select($"id_a", $"id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val inCluster = (x: Long) => x >= 100L && x < 100L + m
    val intra = pairs.filter(p => inCluster(p._1) && inCluster(p._2))
    assert(intra.length == m - 1, s"expected ${m - 1} star pairs, got ${intra.length}")
    assert(intra.forall(_._1 == 100L)) // all anchored at the representative
    // the near-dup attaches to the cluster through the representative
    assert(pairs.exists(p => p == ((100L, 502L)) || p == ((502L, 100L))))
    // distinct docs stay isolated
    assert(!pairs.exists(p => Set(p._1, p._2).exists(x => x == 500L || x == 501L)))
  }

  test("simhash giant cluster: star pairs at hamming 0, anchored at min id") {
    val m = 40
    val all = ((100L until 100L + m).map(i => (i, base)) ++ Seq((500L, distinct1)))
      .toDF("doc_id", "text")
    val rows = Dedup.simHashPairs(all, "text", "doc_id", maxHamming = 3).collect()
    val intra = rows.filter(r => r.getLong(0) >= 100L && r.getLong(1) < 100L + m)
    assert(intra.length == m - 1)
    assert(intra.forall(r => r.getLong(0) == 100L && r.getInt(2) == 0))
  }

  test("embedding giant cluster: identical vectors star to min id, verdict partition-independent") {
    val v = (0 until 16).map(_.toFloat / 16f).toSeq
    val vFar = (0 until 16).map(i => ((i * 37) % 16).toFloat / 16f - 0.5f).toSeq
    val emb = ((0L until 40L).map(i => (i, v)) ++ Seq((100L, vFar))).toDF("vec_id", "embedding")
    def run(df: org.apache.spark.sql.DataFrame) =
      Dedup.embeddingPairs(df, "embedding", "vec_id", threshold = 0.95)
        .select($"id_a", $"id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pairs = run(emb)
    assert(pairs.size == 39 && pairs.forall(_._1 == 0L))
    assert(run(emb.repartition(7)) == pairs)
  }

  test("incremental minhash giant batch cluster: all dups of the corpus die, novel survives") {
    val corpus = Seq((0L, base), (1L, distinct1)).toDF("doc_id", "text")
    val m = 50
    val batch = ((10L until 10L + m).map(i => (i, base)) ++ Seq((200L, distinct2)))
      .toDF("doc_id", "text")
    val out = Dedup.minHashIncremental(corpus, batch, "text", "doc_id", threshold = 0.5)
      .select($"doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(out == Seq(200L))
  }

  test("incremental minhash batch-internal giant cluster with NO corpus hit: rep survives, members die") {
    val corpus = Seq((0L, distinct1)).toDF("doc_id", "text")
    val m = 30
    val batch = ((10L until 10L + m).map(i => (i, base)) ++ Seq((200L, distinct2)))
      .toDF("doc_id", "text")
    val out = Dedup.minHashIncremental(corpus, batch, "text", "doc_id", threshold = 0.5)
      .select($"doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(out == Seq(10L, 200L)) // 10 = min-id rep of the cluster
  }
}
