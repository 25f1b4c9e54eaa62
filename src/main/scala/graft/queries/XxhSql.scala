package graft.queries

/** DuckDB SQL generation for the engine's 64-bit hash stack — XXH64 with
  * seed 42 (Spark's `xxhash64`, the shingle/token hash of
  * [[graft.expressions.ShingleHashes]]) and the splitmix64 lane finalizer
  * of [[graft.expressions.MinHashSig]] — so the MinHash/SimHash dedup
  * lanes get FULLY independent DuckDB oracles: the oracle recomputes
  * shingle hashes, signatures, candidate bands, and verification from the
  * raw parquet text, with no engine-produced inputs anywhere.
  *
  * DuckDB has no wrapping 64-bit arithmetic (BIGINT overflow raises), so
  * all hash state lives in HUGEINT (int128) in the canonical unsigned
  * domain [0, 2^64). Multiplication by a constant decomposes into 32-bit
  * halves (the 128-bit product of two arbitrary 64-bit values would
  * overflow HUGEINT); rotation splits into disjoint shifted halves whose
  * sum is the rotated value. `xor`/`>>` work natively on HUGEINT.
  *
  * LSH band keys need NO hash emulation: two documents share a band
  * bucket iff their signatures agree on every component of that band
  * (the engine's band hash is injective in intent; a 64-bit band-hash
  * collision would only ever ADD a verified-anyway candidate), so the
  * oracle joins bands on the raw signature components.
  */
object XxhSql {
  private val M = BigInt(1) << 64
  private val HALF = BigInt(1) << 63
  private val MM = s"$M::HUGEINT"

  // standard XXH64 primes (unsigned)
  private val P1 = BigInt("11400714785074694791")
  private val P2 = BigInt("14029467366897019727")
  private val P3 = BigInt("1609587929392839161")
  private val P4 = BigInt("9650029242287828579")
  private val P5 = BigInt("2870177450012600261")
  private val SEED = BigInt(42)
  /** 0x9E3779B97F4A7C15 — the lane-seed stride of MinHashSig. */
  private val GOLDEN = BigInt("11400714819323198485")

  // ---- wrapping u64 arithmetic over HUGEINT ----------------------------
  // All reductions mod 2^64 / 2^32 are bitwise AND with the mask, and the
  // 32-bit split uses shifts — int128 division/modulo is ~10× slower than
  // AND in DuckDB and dominated the oracle runtime in the % formulation.

  private val MASK = "18446744073709551615::HUGEINT" // 2^64 - 1

  private def add(a: String, b: String) = s"(($a + $b) & $MASK)"

  /** x * c mod 2^64 via 32-bit halves (x < 2^64, c a compile-time const). */
  private def mulc(x: String, c: BigInt): String = {
    val cl = c & 0xFFFFFFFFL
    val ch = c >> 32
    s"((($x & 4294967295) * $cl + ((($x & 4294967295) * $ch + ($x >> 32) * $cl) & 4294967295) * 4294967296) & $MASK)"
  }

  private def xor(a: String, b: String) = s"xor($a, $b)"
  private def shr(x: String, n: Int) = s"($x >> $n)"

  /** Left-rotate: high part (x·2^r mod 2^64, low r bits zero) + wrapped
    * top bits (< 2^r) — disjoint bit ranges, so + is |.
    */
  private def rotl(x: String, r: Int) =
    s"((($x * ${BigInt(1) << r}) & $MASK) + ($x >> ${64 - r}))"

  /** Unsigned HUGEINT in [0,2^64) → the engine's signed BIGINT value. */
  private def toSigned(x: String) =
    s"(CASE WHEN $x >= $HALF::HUGEINT THEN ($x - $MM)::BIGINT ELSE $x::BIGINT END)"

  // ---- XXH64 pieces ----------------------------------------------------

  /** SQL "let": bind `expr` to lambda variable `v` so `body` references it
    * by name. Textual duplication in the generated arithmetic otherwise
    * means literal RE-EVALUATION (DuckDB does no common-subexpression
    * elimination across an expression tree) — wrapping each fold step's
    * input/intermediate this way cut the oracle from ~95 s to seconds.
    */
  private def let1(expr: String, v: String, body: String) =
    s"list_transform([$expr], $v -> $body)[1]"

  private def xxhRound(acc: String, inp: String) =
    let1(inp, "xi", let1(add(acc, mulc("xi", P2)), "xt", mulc(rotl("xt", 31), P1)))
  private def xxhRound0(inp: String) =
    let1(mulc(inp, P2), "xr", mulc(rotl("xr", 31), P1))
  private def mergeRound(acc: String, v: String) =
    let1(xxhRound0(v), "xm", add(mulc(xor(acc, "xm"), P1), s"$P4"))
  private def step8(acc: String, inp: String) =
    let1(inp, "i8", let1(xor(acc, xxhRound0("i8")), "t8", add(mulc(rotl("t8", 27), P1), s"$P4")))
  private def step4(acc: String, inp: String) =
    let1(inp, "i4", let1(xor(acc, mulc("i4", P1)), "t4", add(mulc(rotl("t4", 23), P2), s"$P3")))
  private def step1(acc: String, inp: String) =
    let1(xor(acc, mulc(inp, P5)), "t1", mulc(rotl("t1", 11), P1))

  /** Little-endian u64 read of bytes `off..off+7` (0-based) from list
    * column `by` (HUGEINT byte values, 1-based list).
    */
  private def le64(off: String) =
    (0 to 7).map(k => s"by[CAST($off AS INTEGER) + ${k + 1}] * ${BigInt(256).pow(k)}")
      .mkString("(", " + ", ")")
  private def le32(off: String) =
    (0 to 3).map(k => s"by[CAST($off AS INTEGER) + ${k + 1}] * ${BigInt(256).pow(k)}")
      .mkString("(", " + ", ")")

  /** splitmix64 finalizer, inlined (z0 should be a short expression —
    * textual duplication is ~70×).
    */
  private def mix64(z0: String): String = {
    val z1 = mulc(xor(z0, shr(z0, 30)), BigInt("BF58476D1CE4E5B9", 16))
    val z2 = mulc(xor(z1, shr(z1, 27)), BigInt("94D049BB133111EB", 16))
    xor(z2, shr(z2, 31))
  }

  /** Wrap `inner` (must expose key columns plus string column `s`,
    * non-null) with the XXH64(seed 42) pipeline; the result exposes the
    * key columns plus `hu` (HUGEINT, unsigned hash of `s`'s bytes —
    * `s` must be pure ASCII, which post-normalization text is).
    *
    * Built as a chain of named-column subselects so every stage
    * references its predecessor by NAME — inlining the whole hash as one
    * expression would duplicate subtrees multiplicatively.
    */
  def xxh64Over(inner: String, keyCols: Seq[String]): String = {
    val keys = keyCols.mkString(", ")
    val v1i = (SEED + P1 + P2) % M
    val v2i = (SEED + P2) % M
    val v3i = SEED
    val v4i = (SEED - P1 + M) % M
    def stripeFold(init: BigInt, lane: Int) =
      s"""CASE WHEN len >= 32 THEN list_reduce(
         |  list_prepend($init::HUGEINT, [CAST(i AS HUGEINT) FOR i IN range(0, len // 32)]),
         |  (acc, i) -> ${xxhRound("acc", le64(s"i*32 + ${8 * lane}"))})
         |ELSE 0::HUGEINT END""".stripMargin
    val mergedBase = add(add(rotl("v1", 1), rotl("v2", 7)), add(rotl("v3", 12), rotl("v4", 18)))
    s"""SELECT $keys, hu FROM (
       |SELECT $keys, ${xor("a2", shr("a2", 32))} AS hu FROM (
       |SELECT $keys, a1, ${mulc(xor("a1", shr("a1", 29)), P3)} AS a2 FROM (
       |SELECT $keys, h4, ${mulc(xor("h4", shr("h4", 33)), P2)} AS a1 FROM (
       |SELECT $keys, h3, CASE WHEN len - boff = 0 THEN h3 ELSE list_reduce(
       |    list_prepend(h3, [CAST(j AS HUGEINT) FOR j IN range(0, len - boff)]),
       |    (acc, j) -> ${step1("acc", "by[CAST(boff + j AS INTEGER) + 1]")}) END AS h4, len, by, boff FROM (
       |SELECT $keys, h2, CASE WHEN len - toff - n8*8 >= 4 THEN ${step4("h2", le32("toff + n8*8"))} ELSE h2 END AS h3,
       |  toff + n8*8 + (CASE WHEN len - toff - n8*8 >= 4 THEN 4 ELSE 0 END) AS boff, len, by FROM (
       |SELECT $keys, h1, CASE WHEN n8 = 0 THEN h1 ELSE list_reduce(
       |    list_prepend(h1, [CAST(j AS HUGEINT) FOR j IN range(0, n8)]),
       |    (acc, j) -> ${step8("acc", le64("toff + j*8"))}) END AS h2, toff, n8, len, by FROM (
       |SELECT $keys, ${add("h0", "len::HUGEINT")} AS h1, (len // 32) * 32 AS toff,
       |  (len - (len // 32) * 32) // 8 AS n8, len, by FROM (
       |SELECT $keys, CASE WHEN len >= 32 THEN hm4 ELSE ${(SEED + P5) % M}::HUGEINT END AS h0, len, by FROM (
       |SELECT $keys, ${mergeRound("hm3", "v4")} AS hm4, len, by FROM (
       |SELECT $keys, ${mergeRound("hm2", "v3")} AS hm3, v4, len, by FROM (
       |SELECT $keys, ${mergeRound("hm1", "v2")} AS hm2, v3, v4, len, by FROM (
       |SELECT $keys, ${mergeRound("hm0", "v1")} AS hm1, v2, v3, v4, len, by FROM (
       |SELECT $keys, $mergedBase AS hm0, v1, v2, v3, v4, len, by FROM (
       |SELECT $keys, ${stripeFold(v1i, 0)} AS v1, ${stripeFold(v2i, 1)} AS v2,
       |  ${stripeFold(v3i, 2)} AS v3, ${stripeFold(v4i, 3)} AS v4, len, by FROM (
       |SELECT $keys, length(s) AS len,
       |  [unicode(substr(s, i, 1))::HUGEINT FOR i IN range(1, length(s) + 1)] AS by
       |FROM ($inner)
       |)))))))))))))))""".stripMargin
  }

  /** MinHash signature column over a per-doc list column `hl` of unsigned
    * HUGEINT hashes: `array<bigint>` of `k` signed lanes, lane i =
    * min_signed over hashes of splitmix64(h + GOLDEN·(i+1)) — exactly
    * [[graft.expressions.MinHashSig]].
    */
  def sigExpr(k: Int): String = {
    val lane = mix64(add("h", s"((11400714819323198485::HUGEINT * (i + 1)) % $MM)"))
    s"list_transform(range(0, $k), i -> list_min(list_transform(hl, h -> ${toSigned(lane)})))"
  }

  /** Signed 64-bit SimHash fingerprint over a per-doc list column `tl` of
    * struct(u HUGEINT hash, c BIGINT count) token rows — bit j set iff the
    * weighted ±1 vote sum is > 0 (exactly [[graft.expressions.SimHash]]).
    */
  def simhashExpr: String = {
    val vote = "list_sum(list_transform(tl, t -> CASE WHEN (t.u >> CAST(j AS INTEGER)) & 1 = 1 THEN t.c ELSE -t.c END))"
    toSigned(s"coalesce(list_sum(list_transform(range(0, 64), j -> CASE WHEN $vote > 0 THEN (1::HUGEINT << CAST(j AS INTEGER)) ELSE 0::HUGEINT END)), 0::HUGEINT)")
  }

  /** Unsigned HUGEINT view of a signed BIGINT column. */
  def toUnsigned(x: String): String =
    s"(CASE WHEN $x < 0 THEN $x::HUGEINT + $MM ELSE $x::HUGEINT END)"

  // ---- full dedup-lane oracles ------------------------------------------

  private val normSql =
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g'))"
  private val toksSql = s"string_split($normSql, ' ')"

  /** DISTINCT (doc_id, s) word n-gram shingles from relation `src`
    * (needs doc_id + text columns).
    */
  private def wordShingles(n: Int, src: String = "documents"): String = {
    val join = (0 until n).map(k => s"toks[i + $k]").mkString(" || ' ' || ")
    s"""SELECT DISTINCT doc_id, sh AS s FROM (
       |  SELECT doc_id, unnest([$join FOR i IN range(1, greatest(len(toks) - ${n - 2}, 1))]) AS sh
       |  FROM (SELECT doc_id, list_filter($toksSql, x -> x <> '') AS toks
       |        FROM $src WHERE text IS NOT NULL))""".stripMargin
  }

  /** HyperBall oracle ([[graft.text.HyperBall.neighborhoodEstimate]]):
    * because max-merge is idempotent, d rounds of register propagation
    * equal the elementwise max over the EXACT d-hop ball — so the oracle
    * computes ball membership explicitly (the q_link_score hop-join
    * chain), replays each node's splitmix64 register (HUGEINT mixer +
    * integer-only trailing-zero rho via bit_count — no float logs), and
    * folds the estimate in pinned register order. Every value including
    * the double estimate is bit-exact across engines.
    */
  /** Shared CTE prefix of the HyperBall oracles: the edge/hop chain,
    * the HUGEINT register replay (idx, rho per node), and, per hop
    * depth `d` in `depths`, a `fold$d` CTE holding each root's
    * pinned-order `Σ 2^-m` over its exact ≤d-hop ball (`fold0` = the
    * singleton ball) and the zero-register count.
    */
  private def hyperBallCtes(w: Int, hops: Int, depths: Seq[Int]): String = {
    val sl = w - 1
    val hopCtes = (2 to hops).map { d =>
      s"""r$d AS MATERIALIZED (
         |  SELECT DISTINCT a.src, b.dst FROM r${d - 1} a JOIN r1 b ON a.dst = b.src
         |  WHERE b.dst <> a.src),""".stripMargin
    }.mkString("\n")
    val hvSql = let1(s"(CAST(doc_id AS HUGEINT) & $MASK)", "z0", mix64("z0"))
    val foldCtes = depths.map { d =>
      val ball =
        if (d == 0) "SELECT doc_id AS root, doc_id AS member FROM documents"
        else {
          val memUnion = (1 to d).map(i => s"SELECT src, dst FROM r$i").mkString(" UNION ALL ")
          s"""SELECT src AS root, dst AS member FROM (SELECT DISTINCT src, dst FROM ($memUnion))
             |   UNION ALL SELECT doc_id, doc_id FROM documents""".stripMargin
        }
      s"""ballreg$d AS MATERIALIZED (
         |  SELECT b.root, r.idx, max(r.rho) AS m
         |  FROM ($ball) b JOIN reg0 r ON r.member = b.member GROUP BY b.root, r.idx),
         |regfull$d AS (
         |  SELECT d.doc_id AS root, j.j, coalesce(br.m, 0) AS m
         |  FROM documents d
         |  CROSS JOIN (SELECT unnest(range(0, 64)) AS j) j
         |  LEFT JOIN ballreg$d br ON br.root = d.doc_id AND br.idx = j.j),
         |fold$d AS MATERIALIZED (
         |  SELECT root,
         |    list_reduce(list_prepend(0.0, list(1.0 / CAST(1::BIGINT << m AS DOUBLE) ORDER BY j)),
         |      (a, x) -> a + x) AS s,
         |    CAST(sum(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS INTEGER) AS n_zero
         |  FROM regfull$d GROUP BY root),""".stripMargin
    }.mkString("\n")
    s"""tk AS (
       |  SELECT doc_id, list_filter($toksSql, x -> x <> '') AS toks FROM documents),
       |sp0 AS MATERIALIZED (
       |  SELECT DISTINCT doc_id,
       |    unnest([array_to_string(toks[i:i+$sl], ' ') FOR i IN range(1, greatest(len(toks) - ${sl - 1}, 1))]) AS span
       |  FROM tk),
       |rare AS MATERIALIZED (
       |  SELECT span FROM sp0 GROUP BY span HAVING count(*) BETWEEN 2 AND 32),
       |sp AS MATERIALIZED (SELECT doc_id, span FROM sp0 JOIN rare USING (span)),
       |r1 AS MATERIALIZED (
       |  SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
       |  FROM sp a JOIN sp b ON a.span = b.span AND a.doc_id <> b.doc_id),
       |$hopCtes
       |h2 AS MATERIALIZED (
       |  SELECT member, hv, (hv >> 6) AS wv FROM (
       |    SELECT doc_id AS member, $hvSql AS hv FROM documents)),
       |reg0 AS MATERIALIZED (
       |  SELECT member, CAST(hv & 63 AS INTEGER) AS idx,
       |    CASE WHEN wv = 0 THEN 59
       |      ELSE 1 + bit_count(CAST((wv & (xor(wv, $MASK) + 1)) AS BIGINT) - 1) END AS rho
       |  FROM h2),
       |$foldCtes""".stripMargin
  }

  def hyperBallSql(w: Int, hops: Int): String = {
    require(hops >= 1)
    s"""WITH ${hyperBallCtes(w, hops, Seq(hops))}
       |unused AS (SELECT 1)
       |SELECT root AS doc_id, CAST(0.709 AS DOUBLE) * 4096.0 / s AS est_ball, n_zero
       |FROM fold$hops ORDER BY doc_id""".stripMargin
  }

  /** Neighborhood-function oracle: per-hop estimates + the left-to-right
    * harmonic readout `Σ_d (est_d − est_(d−1)) / d` (est_0 = singleton),
    * mirroring [[graft.text.HyperBall.neighborhoodFunction]] exactly.
    */
  def hyperBallHarmonicSql(w: Int, hops: Int): String = {
    require(hops >= 1)
    val joins = (0 to hops).map(d =>
      if (d == 0) "fold0 f0" else s"JOIN fold$d f$d ON f$d.root = f0.root").mkString(" ")
    val ests = (0 to hops).map(d =>
      s"(CAST(0.709 AS DOUBLE) * 4096.0) / f$d.s AS e$d").mkString(", ")
    val harmonic = (1 to hops).map(d => s"(e$d - e${d - 1}) / $d.0").mkString(" + ")
    val estCols = (1 to hops).map(d => s"e$d AS est_$d").mkString(", ")
    s"""WITH ${hyperBallCtes(w, hops, 0 to hops)}
       |ests AS (SELECT f0.root, $ests FROM $joins)
       |SELECT root AS doc_id, $estCols, $harmonic AS harmonic_est
       |FROM ests ORDER BY doc_id""".stripMargin
  }

  /** Distance-distribution oracle
    * ([[graft.text.HyperBall.distanceDistribution]]): per-hop fixed-point
    * sums `Σ floor(est · scale)` (exact BIGINT addition — the
    * order-independence trick), fraction and reach-q flag from single
    * divisions of those exact longs.
    */
  def hyperBallDistanceSql(w: Int, hops: Int, q: String, scale: Long): String = {
    require(hops >= 1)
    val sums = (0 to hops).map(d =>
      s"""SELECT $d AS hop,
         |  CAST(sum(CAST(floor((CAST(0.709 AS DOUBLE) * 4096.0 / s) * $scale.0) AS BIGINT)) AS BIGINT) AS nf_fp
         |FROM fold$d""".stripMargin).mkString("\nUNION ALL\n")
    s"""WITH ${hyperBallCtes(w, hops, 0 to hops)}
       |nf AS ($sums),
       |tot AS (SELECT nf_fp AS t FROM nf WHERE hop = $hops)
       |SELECT CAST(hop AS BIGINT) AS hop, nf_fp,
       |  CAST(nf_fp AS DOUBLE) / CAST(t AS DOUBLE) AS frac,
       |  (CAST(nf_fp AS DOUBLE) / CAST(t AS DOUBLE)) >= $q AS reaches_q
       |FROM nf CROSS JOIN tot ORDER BY hop""".stripMargin
  }

  /** DISTINCT (doc_id, s) character n-gram shingles (spaces included —
    * matches the charLevel ShingleHashes kernel over the normalized
    * buffer).
    */
  private def charShingles(n: Int): String =
    s"""SELECT DISTINCT doc_id, sh AS s FROM (
       |  SELECT doc_id, unnest([substr(norm, i, $n) FOR i IN range(1, greatest(length(norm) - ${n - 2}, 1))]) AS sh
       |  FROM (SELECT doc_id, $normSql AS norm FROM documents WHERE text IS NOT NULL))""".stripMargin

  /** Shared CTE block: shingles → hashes → signatures → band keys →
    * verified pairs (exact set-Jaccard over shingle STRING sets, which
    * equals the engine's hash-set Jaccard absent 64-bit collisions).
    * Mirrors the engine's set-group collapse ([[graft.dedup.Dedup]]
    * lshVerifiedPairs): docs with an identical SORTED SHINGLE SET shrink
    * to their min-id representative — star pairs within a group, banding
    * (`bandr`) between representatives only. The engine keys the group
    * on xxhash64 of the sorted hash set; the oracle groups on the sorted
    * string set directly — identical partitioning absent 64-bit
    * collisions, the same caveat the verification Jaccard already
    * carries. Emits CTEs: ssh (doc_id, s), sig (doc_id, sig), bandk
    * (ALL docs — the incremental oracle keys corpus probes off it),
    * cand (id_a, id_b), ver (id_a, id_b, j).
    */
  private def pairCtes(shingleSql: String, k: Int, bands: Int, rows: Int): String = {
    val bandKeyCols = (1 to rows).map(r => s"sig[b*$rows + $r] AS k$r").mkString(", ")
    val bandJoin = (1 to rows).map(r => s"a.k$r = b.k$r").mkString(" AND ")
    s"""ssh AS MATERIALIZED ($shingleSql),
       |hashed AS MATERIALIZED (${xxh64Over("SELECT doc_id, s FROM ssh", Seq("doc_id"))}),
       |sigl AS MATERIALIZED (
       |  SELECT doc_id, lane, min(${toSigned("z3")}) AS mn FROM (
       |    SELECT doc_id, lane, ${xor("z2", shr("z2", 31))} AS z3 FROM (
       |    SELECT doc_id, lane, ${mulc(xor("z1", shr("z1", 27)), BigInt("94D049BB133111EB", 16))} AS z2 FROM (
       |    SELECT doc_id, lane, ${mulc(xor("z0", shr("z0", 30)), BigInt("BF58476D1CE4E5B9", 16))} AS z1 FROM (
       |    SELECT doc_id, lane, ${add("hu", s"((11400714819323198485::HUGEINT * (lane + 1)) & $MASK)")} AS z0
       |    FROM hashed, (SELECT unnest(range(0, $k)) AS lane)))))
       |  GROUP BY doc_id, lane),
       |sig AS MATERIALIZED (SELECT doc_id, list(mn ORDER BY lane) AS sig FROM sigl GROUP BY doc_id),
       |ss AS MATERIALIZED (SELECT doc_id, list(s) AS ss FROM ssh GROUP BY doc_id),
       |setk AS MATERIALIZED (SELECT doc_id, list_sort(ss) AS sk FROM ss),
       |srep AS MATERIALIZED (SELECT sk, min(doc_id) AS rep FROM setk GROUP BY sk),
       |swr AS MATERIALIZED (SELECT s.doc_id, r.rep FROM setk s JOIN srep r ON s.sk = r.sk),
       |bandk AS MATERIALIZED (
       |  SELECT doc_id, b, $bandKeyCols
       |  FROM sig, (SELECT unnest(range(0, $bands)) AS b)),
       |bandr AS MATERIALIZED (
       |  SELECT bandk.* FROM bandk JOIN srep ON bandk.doc_id = srep.rep),
       |cand AS (
       |  SELECT DISTINCT id_a, id_b FROM (
       |    SELECT rep AS id_a, doc_id AS id_b FROM swr WHERE doc_id <> rep
       |    UNION ALL
       |    SELECT a.doc_id AS id_a, b.doc_id AS id_b
       |    FROM bandr a JOIN bandr b ON a.b = b.b AND $bandJoin AND a.doc_id < b.doc_id)),
       |ver AS (
       |  SELECT id_a, id_b,
       |    CAST(len(list_intersect(sa.ss, sb.ss)) AS DOUBLE)
       |      / (len(sa.ss) + len(sb.ss) - len(list_intersect(sa.ss, sb.ss))) AS j
       |  FROM cand JOIN ss sa ON sa.doc_id = cand.id_a JOIN ss sb ON sb.doc_id = cand.id_b)""".stripMargin
  }

  /** Oracle for q_transitive_contamination
    * ([[graft.dedup.Decontaminate.transitiveContamination]]): BFS closure
    * over the banding near-dup graph of the train+planted corpus, seeded
    * by direct 8-token-span overlap with the eval slice, hops unrolled
    * (maxHops = 2). Planted docs (+300000) replace every 8th token with a
    * positional 'qq<i>' junk token: zero shared 8-spans with anything
    * (never a seed) but ~0.45 3-shingle Jaccard with their original —
    * reachable only transitively. Banding misses at J≈0.45 are identical
    * on both sides (same signatures), so the graphs coincide exactly.
    */
  def transitiveContaminationSql(n: Int, k: Int, bands: Int, threshold: Double): String = {
    def trainSrc(alias: String) =
      s"""(SELECT doc_id, text FROM documents WHERE doc_id % 5 <> 0
         |      UNION ALL
         |      SELECT doc_id + 300000 AS doc_id,
         |        array_to_string([CASE WHEN (i - 1) % 8 = 0 THEN 'qq' || CAST(i - 1 AS VARCHAR) ELSE toks[i] END
         |                         FOR i IN range(1, len(toks) + 1)], ' ') AS text
         |      FROM (SELECT doc_id, list_filter($toksSql, x -> x <> '') AS toks
         |            FROM documents WHERE doc_id % 5 <> 0 AND text IS NOT NULL)
         |      UNION ALL
         |      SELECT doc_id + 600000 AS doc_id,
         |        array_to_string([CASE WHEN (i - 1) % 8 = 0 THEN 'qq' || CAST(i - 1 AS VARCHAR)
         |                              WHEN (i - 1) % 8 = 4 THEN 'rr' || CAST(i - 1 AS VARCHAR)
         |                              ELSE toks[i] END
         |                         FOR i IN range(1, len(toks) + 1)], ' ') AS text
         |      FROM (SELECT doc_id, list_filter($toksSql, x -> x <> '') AS toks
         |            FROM documents WHERE doc_id % 5 <> 0 AND text IS NOT NULL)) $alias""".stripMargin
    s"""WITH ${pairCtes(wordShingles(n, trainSrc("tr")), k, bands, k / bands)},
       |pe AS MATERIALIZED (SELECT id_a, id_b FROM ver WHERE j >= $threshold),
       |edges AS MATERIALIZED (
       |  SELECT id_a AS src, id_b AS dst FROM pe UNION ALL SELECT id_b AS src, id_a AS dst FROM pe),
       |tsp AS MATERIALIZED (
       |  SELECT doc_id, unnest(list_distinct(
       |    [array_to_string(toks[i:i+7], ' ') FOR i IN range(1, greatest(len(toks) - 6, 1))])) AS span
       |  FROM (SELECT doc_id, $toksSql AS toks FROM ${trainSrc("tr2")} WHERE $normSql <> '')),
       |esp AS MATERIALIZED (
       |  SELECT DISTINCT span FROM (
       |    SELECT unnest(list_distinct(
       |      [array_to_string(toks[i:i+7], ' ') FOR i IN range(1, greatest(len(toks) - 6, 1))])) AS span
       |    FROM (SELECT $toksSql AS toks FROM documents WHERE doc_id % 5 = 0 AND $normSql <> ''))),
       |seeds AS MATERIALIZED (SELECT DISTINCT tsp.doc_id AS id FROM tsp JOIN esp USING (span)),
       |h1 AS MATERIALIZED (
       |  SELECT DISTINCT dst AS id FROM edges JOIN seeds ON edges.src = seeds.id
       |  WHERE dst NOT IN (SELECT id FROM seeds)),
       |h2 AS (
       |  SELECT DISTINCT dst AS id FROM edges JOIN h1 ON edges.src = h1.id
       |  WHERE dst NOT IN (SELECT id FROM seeds) AND dst NOT IN (SELECT id FROM h1))
       |SELECT id, CAST(0 AS BIGINT) AS hop FROM seeds
       |UNION ALL SELECT id, CAST(1 AS BIGINT) AS hop FROM h1
       |UNION ALL SELECT id, CAST(2 AS BIGINT) AS hop FROM h2
       |ORDER BY id""".stripMargin
  }

  /** Oracle for [[graft.dedup.Dedup.minHashPairs]] /
    * [[graft.dedup.Dedup.ngramJaccardPairs]]-shaped queries.
    */
  def minhashPairsSql(charLevel: Boolean, n: Int, k: Int, bands: Int, threshold: Double): String = {
    val sh = if (charLevel) charShingles(n) else wordShingles(n)
    s"""WITH ${pairCtes(sh, k, bands, k / bands)}
       |SELECT id_a, id_b, round(j, 6) AS jaccard_sim FROM ver
       |WHERE j >= $threshold ORDER BY id_a, id_b""".stripMargin
  }

  /** Oracle for [[graft.similarity.Evaluation.lshRecall]]: exact
    * all-pairs Jaccard over the slice's shingle STRING sets (inverted-
    * index join — a pair above any positive threshold must share a
    * shingle) left-joined with the full banding pipeline's verified
    * pairs, both computed from the same slice-restricted `ssh` CTE.
    */
  def lshRecallSql(n: Int, k: Int, bands: Int, threshold: Double, idMax: Int): String = {
    // the gate plants a half-prefix variant of every slice doc at
    // +200000: J(doc, variant) ≈ 0.5, the regime where 16×4 banding
    // genuinely misses (~35% per pair) — without them the synthetic
    // corpus only contains J ≥ 0.9 near-dups and `found` is vacuous
    val src =
      s"""(SELECT doc_id, text FROM documents WHERE doc_id < $idMax
         |      UNION ALL
         |      SELECT doc_id + 200000 AS doc_id,
         |        substr(text, 1, CAST(floor(length(text) / 2) AS INTEGER)) AS text
         |      FROM documents WHERE doc_id < $idMax) sl""".stripMargin
    s"""WITH ${pairCtes(wordShingles(n, src), k, bands, k / bands)},
       |inter AS MATERIALIZED (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS ni
       |  FROM ssh a JOIN ssh b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |sz AS MATERIALIZED (SELECT doc_id, count(*) AS n FROM ssh GROUP BY doc_id),
       |exact AS MATERIALIZED (
       |  SELECT id_a, id_b, CAST(ni AS DOUBLE) / (sa.n + sb.n - ni) AS j
       |  FROM inter JOIN sz sa ON sa.doc_id = inter.id_a JOIN sz sb ON sb.doc_id = inter.id_b)
       |SELECT e.id_a, e.id_b, round(e.j, 6) AS jaccard_sim, (v.id_a IS NOT NULL) AS found
       |FROM exact e LEFT JOIN (SELECT id_a, id_b FROM ver WHERE j >= $threshold) v
       |  ON v.id_a = e.id_a AND v.id_b = e.id_b
       |WHERE e.j >= $threshold
       |ORDER BY e.id_a, e.id_b""".stripMargin
  }

  /** Oracle for [[graft.similarity.Evaluation.lshPrecision]]: every
    * banded candidate pair (the `ver` CTE unfiltered) with a pass flag
    * on the ROUNDED Jaccard — same planted half-prefix slice as
    * [[lshRecallSql]].
    */
  def lshPrecisionSql(n: Int, k: Int, bands: Int, threshold: Double, idMax: Int): String = {
    val src =
      s"""(SELECT doc_id, text FROM documents WHERE doc_id < $idMax
         |      UNION ALL
         |      SELECT doc_id + 200000 AS doc_id,
         |        substr(text, 1, CAST(floor(length(text) / 2) AS INTEGER)) AS text
         |      FROM documents WHERE doc_id < $idMax) sl""".stripMargin
    s"""WITH ${pairCtes(wordShingles(n, src), k, bands, k / bands)}
       |SELECT id_a, id_b, round(j, 6) AS jaccard_sim,
       |  round(j, 6) >= $threshold AS passed
       |FROM ver ORDER BY id_a, id_b""".stripMargin
  }

  /** Oracle for [[graft.dedup.Dedup.minHashDedup]] survivors: connected
    * components over the verified pairs via a recursive transitive
    * closure, drop every doc whose component minimum is a lower id.
    */
  def minhashSurvivorsSql(n: Int, k: Int, bands: Int, threshold: Double): String =
    s"""WITH RECURSIVE ${pairCtes(wordShingles(n), k, bands, k / bands)},
       |edges AS MATERIALIZED (
       |  SELECT id_a AS a, id_b AS b FROM ver WHERE j >= $threshold
       |  UNION SELECT id_b, id_a FROM ver WHERE j >= $threshold),
       |reach(src, dst) AS (
       |  SELECT a, b FROM edges
       |  UNION SELECT reach.src, e.b FROM reach JOIN edges e ON reach.dst = e.a),
       |losers AS (SELECT src AS id FROM reach GROUP BY src HAVING min(dst) < src)
       |SELECT doc_id FROM documents WHERE doc_id NOT IN (SELECT id FROM losers)
       |ORDER BY doc_id""".stripMargin

  /** Oracle for [[graft.sources.Export.maskSpans]] over the packed token
    * stream: the pack pipeline (global-position packing, lexicographic
    * vocabulary — mirrors the q_export_pack oracle), then the block-mask
    * replay — key = splitmix64((seq_id·131071 + b) mod 2^64) in HUGEINT
    * arithmetic, signed pmod threshold — and the input/target stream
    * reconstruction with row_number positions.
    */
  def maskedExportSql(seqLen: Int, blockLen: Int, maskNum: Int, maskDen: Int,
      sentinelBase: Long): String = {
    val keySql = toSigned(let1(
      s"((CAST(seq_id AS HUGEINT) * 131071 + CAST(b AS HUGEINT)) & $MASK)", "z0", mix64("z0")))
    s"""WITH d AS (
       |  SELECT doc_id, list_filter($toksSql, x -> x <> '') AS toks FROM documents),
       |d2 AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n FROM d),
       |c AS MATERIALIZED (
       |  SELECT doc_id, toks, n,
       |    CAST(coalesce(sum(n) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS prev
       |  FROM d2 WHERE n > 0),
       |vocab AS MATERIALIZED (
       |  SELECT token, CAST(row_number() OVER (ORDER BY token) AS BIGINT) AS token_id
       |  FROM (SELECT DISTINCT unnest(toks) AS token FROM d)),
       |tok AS (
       |  SELECT prev + i AS gpos, toks[CAST(i AS INTEGER) + 1] AS token
       |  FROM (SELECT prev, toks, unnest(range(n)) AS i FROM c)),
       |real AS MATERIALIZED (
       |  SELECT CAST(gpos // $seqLen AS BIGINT) AS seq_id,
       |    CAST(gpos % $seqLen AS BIGINT) AS seq_pos, v.token_id
       |  FROM tok JOIN vocab v USING (token)),
       |nr AS (SELECT seq_id, CAST(count(*) AS BIGINT) AS n_real FROM real GROUP BY seq_id),
       |blocks AS (
       |  SELECT seq_id, CAST(unnest(range((n_real + ${blockLen - 1}) // $blockLen)) AS BIGINT) AS b
       |  FROM nr),
       |mk AS MATERIALIZED (
       |  SELECT seq_id, b,
       |    ((($keySql) % $maskDen) + $maskDen) % $maskDen < $maskNum AS masked
       |  FROM blocks),
       |maskedb AS MATERIALIZED (
       |  SELECT seq_id, b,
       |    row_number() OVER (PARTITION BY seq_id ORDER BY b) - 1 AS mrank
       |  FROM mk WHERE masked),
       |inp_raw AS (
       |  SELECT k.seq_id, t.seq_pos AS sk, t.token_id
       |  FROM mk k JOIN real t ON t.seq_id = k.seq_id AND t.seq_pos // $blockLen = k.b
       |  WHERE NOT k.masked
       |  UNION ALL
       |  SELECT seq_id, CAST(b * $blockLen AS BIGINT), $sentinelBase + mrank FROM maskedb),
       |inp AS (
       |  SELECT seq_id, 'input' AS stream,
       |    row_number() OVER (PARTITION BY seq_id ORDER BY sk) - 1 AS pos, token_id
       |  FROM inp_raw),
       |tgt_raw AS (
       |  SELECT seq_id, CAST(b * $blockLen * 2 AS BIGINT) AS sk, $sentinelBase + mrank AS token_id
       |  FROM maskedb
       |  UNION ALL
       |  SELECT m.seq_id, CAST(t.seq_pos * 2 + 1 AS BIGINT), t.token_id
       |  FROM maskedb m JOIN real t ON t.seq_id = m.seq_id AND t.seq_pos // $blockLen = m.b),
       |tgt AS (
       |  SELECT seq_id, 'target' AS stream,
       |    row_number() OVER (PARTITION BY seq_id ORDER BY sk) - 1 AS pos, token_id
       |  FROM tgt_raw)
       |SELECT seq_id, stream, CAST(pos AS BIGINT) AS pos, token_id
       |FROM (SELECT * FROM inp UNION ALL SELECT * FROM tgt)
       |ORDER BY seq_id, stream, pos""".stripMargin
  }

  /** Oracle for [[graft.dedup.Dedup.cdcDedupRewrite]]: replay the
    * content-defined boundary walk exactly — token start offsets by
    * cumulative token length, window eligibility by the replayed
    * xxhash64 of the `hashW`-char substring at each token start (low
    * `maskBits` bits zero), the sequential min/max-clamped cut loop as a
    * recursive CTE over a precomputed next-eligible-index table, then
    * the shared keep-first rewrite tail.
    */
  def cdcRewriteSql(hashW: Int, maskBits: Int, minT: Int, maxT: Int): String = {
    val mask = (1L << maskBits) - 1L
    s"""WITH RECURSIVE d2 AS MATERIALIZED (
       |  SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS nt, array_to_string(toks, ' ') AS norm
       |  FROM (SELECT doc_id, list_filter($toksSql, x -> x <> '') AS toks FROM documents)),
       |tokpos AS MATERIALIZED (
       |  SELECT doc_id, u.i AS i, u.spos AS spos FROM (
       |    SELECT doc_id, unnest([{'i': CAST(i - 1 AS BIGINT),
       |                            'spos': CAST(1 + len(array_to_string(toks[1:CAST(i - 1 AS INTEGER)], ' '))
       |                                    + (CASE WHEN i > 1 THEN 1 ELSE 0 END) AS BIGINT)}
       |                           FOR i IN range(1, len(toks) + 1)]) AS u
       |    FROM d2)),
       |wstr AS MATERIALIZED (
       |  SELECT t.doc_id, t.i, substr(d.norm, CAST(t.spos AS INTEGER), $hashW) AS s,
       |    (t.spos + $hashW - 1 <= len(d.norm)) AS fits
       |  FROM tokpos t JOIN d2 d USING (doc_id)),
       |wh AS MATERIALIZED (
       |  ${xxh64Over("SELECT doc_id, i, s FROM wstr WHERE fits", Seq("doc_id", "i"))}),
       |eligt AS MATERIALIZED (
       |  SELECT w.doc_id, w.i,
       |    coalesce(w.fits AND (h.hu & $mask::HUGEINT) = 0::HUGEINT, FALSE) AS elig
       |  FROM wstr w LEFT JOIN wh h ON w.doc_id = h.doc_id AND w.i = h.i),
       |nextc AS MATERIALIZED (
       |  SELECT doc_id, i,
       |    min(CASE WHEN elig THEN i END) OVER (
       |      PARTITION BY doc_id ORDER BY i
       |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nc
       |  FROM eligt),
       |cuts AS (
       |  SELECT doc_id, CAST(0 AS BIGINT) AS b FROM d2 WHERE nt > 0
       |  UNION ALL
       |  SELECT c.doc_id,
       |    CASE WHEN n.nc IS NOT NULL AND n.nc < least(c.b + $maxT, d.nt) THEN n.nc
       |         ELSE least(c.b + $maxT, d.nt) END AS b
       |  FROM cuts c
       |  JOIN d2 d ON d.doc_id = c.doc_id
       |  LEFT JOIN nextc n ON n.doc_id = c.doc_id AND n.i = c.b + $minT
       |  WHERE c.b < d.nt),
       |u AS (
       |  SELECT ch.doc_id,
       |    row_number() OVER (PARTITION BY ch.doc_id ORDER BY ch.b) - 1 AS idx,
       |    array_to_string(d.toks[CAST(ch.b + 1 AS INTEGER):CAST(ch.e AS INTEGER)], ' ') AS chunk
       |  FROM (
       |    SELECT doc_id, b, lead(b) OVER (PARTITION BY doc_id ORDER BY b) AS e
       |    FROM cuts) ch
       |  JOIN d2 d USING (doc_id) WHERE ch.e IS NOT NULL),
       |k AS (
       |  SELECT doc_id, idx, chunk,
       |    row_number() OVER (PARTITION BY chunk ORDER BY doc_id, idx) AS rn
       |  FROM u)
       |SELECT d2.doc_id AS id,
       |  coalesce(string_agg(CASE WHEN k.rn = 1 THEN k.chunk END, ' ' ORDER BY k.idx), '') AS clean_text,
       |  CAST(count(k.chunk) AS BIGINT) AS n_chunks,
       |  CAST(coalesce(sum(CASE WHEN k.rn > 1 THEN 1 END), 0) AS BIGINT) AS n_dropped
       |FROM d2 LEFT JOIN k ON d2.doc_id = k.doc_id
       |GROUP BY d2.doc_id ORDER BY d2.doc_id""".stripMargin
  }

  /** Oracle for [[graft.dedup.Dedup.leakageSafeSplit]]: closure labels
    * over the verified pair graph, split by md5 prefix of the cluster
    * representative (own id when unclustered).
    */
  def leakageSafeSplitSql(n: Int, k: Int, bands: Int, threshold: Double,
      trainPrefix: String): String =
    s"""WITH RECURSIVE ${pairCtes(wordShingles(n), k, bands, k / bands)},
       |edges AS MATERIALIZED (
       |  SELECT id_a AS a, id_b AS b FROM ver WHERE j >= $threshold
       |  UNION SELECT id_b, id_a FROM ver WHERE j >= $threshold),
       |reach(src, dst) AS (
       |  SELECT a, b FROM edges
       |  UNION SELECT reach.src, e.b FROM reach JOIN edges e ON reach.dst = e.a),
       |labels AS (SELECT src AS id, least(src, min(dst)) AS rep FROM reach GROUP BY src)
       |SELECT d.doc_id, coalesce(l.rep, d.doc_id) AS split_key,
       |  CASE WHEN substr(md5(CAST(coalesce(l.rep, d.doc_id) AS VARCHAR)), 1, 4) < '$trainPrefix'
       |    THEN 'train' ELSE 'test' END AS split
       |FROM documents d LEFT JOIN labels l ON l.id = d.doc_id
       |ORDER BY d.doc_id""".stripMargin

  /** Oracle for [[graft.dedup.Dedup.minHashDedupKeepBest]] with
    * score = token count: component labels from the full transitive
    * closure, keeper = highest token count (ties to lowest id).
    */
  def minhashKeepBestSql(n: Int, k: Int, bands: Int, threshold: Double): String =
    s"""WITH RECURSIVE ${pairCtes(wordShingles(n), k, bands, k / bands)},
       |edges AS MATERIALIZED (
       |  SELECT id_a AS a, id_b AS b FROM ver WHERE j >= $threshold
       |  UNION SELECT id_b, id_a FROM ver WHERE j >= $threshold),
       |reach(src, dst) AS (
       |  SELECT a, b FROM edges
       |  UNION SELECT reach.src, e.b FROM reach JOIN edges e ON reach.dst = e.a),
       |labels AS (SELECT src AS id, least(src, min(dst)) AS rep FROM reach GROUP BY src),
       |score AS (
       |  SELECT doc_id AS id,
       |    CAST(CASE WHEN $normSql = '' THEN 0 ELSE len($toksSql) END AS BIGINT) AS sc
       |  FROM documents),
       |keep AS (
       |  SELECT rep, id AS keeper FROM (
       |    SELECT l.rep, l.id,
       |      row_number() OVER (PARTITION BY l.rep ORDER BY s.sc DESC, l.id ASC) AS rn
       |    FROM labels l JOIN score s USING (id)) WHERE rn = 1),
       |losers AS (
       |  SELECT l.id FROM labels l JOIN keep k ON l.rep = k.rep AND l.id <> k.keeper)
       |SELECT doc_id FROM documents WHERE doc_id NOT IN (SELECT id FROM losers)
       |ORDER BY doc_id""".stripMargin

  /** Oracle for the [[graft.dedup.Dedup.minHashIncremental]] query shape:
    * corpus = doc_id % 3 = 0, batch = rest; batch docs survive unless a
    * verified near-dup exists against the corpus or a LOWER-id batch doc
    * (the engine's greedy drop-higher-id policy).
    */
  def minhashIncrementalSql(n: Int, k: Int, bands: Int, threshold: Double): String = {
    val rows = k / bands
    val bandJoin = (1 to rows).map(r => s"a.k$r = o.k$r").mkString(" AND ")
    s"""WITH ${pairCtes(wordShingles(n), k, bands, rows)},
       |bb AS (SELECT * FROM bandk WHERE doc_id % 3 <> 0),
       |bc AS (SELECT * FROM bandk WHERE doc_id % 3 = 0),
       |candi AS (
       |  SELECT DISTINCT a.doc_id AS id_b, o.doc_id AS id_o
       |  FROM bb a JOIN bc o ON a.b = o.b AND $bandJoin
       |  UNION
       |  SELECT DISTINCT o.doc_id AS id_b, a.doc_id AS id_o
       |  FROM bb a JOIN bb o ON a.b = o.b AND $bandJoin AND a.doc_id < o.doc_id),
       |losers AS (
       |  SELECT DISTINCT id_b FROM candi
       |  JOIN ss sa ON sa.doc_id = candi.id_b JOIN ss sb ON sb.doc_id = candi.id_o
       |  WHERE CAST(len(list_intersect(sa.ss, sb.ss)) AS DOUBLE)
       |      / (len(sa.ss) + len(sb.ss) - len(list_intersect(sa.ss, sb.ss))) >= $threshold)
       |SELECT doc_id FROM documents
       |WHERE doc_id % 3 <> 0 AND doc_id NOT IN (SELECT id_b FROM losers)
       |ORDER BY doc_id""".stripMargin
  }

  /** Oracle for the [[graft.dedup.CurationPipeline]] query shape
    * (quality gate → exact dedup → MinHash near-dedup survivors).
    * `qualitySelectSql` must produce (doc_id, quality) with the engine's
    * UNROUNDED quality score (bit-identical doubles — proven by the
    * q_text_quality hash match), so thresholding classifies identically.
    */
  def curationPipelineSql(qualitySelectSql: String, minQuality: Double, n: Int, k: Int, bands: Int, threshold: Double): String =
    s"""WITH RECURSIVE curquality AS MATERIALIZED ($qualitySelectSql),
       |curq AS MATERIALIZED (
       |  SELECT d.* FROM documents d JOIN curquality q USING (doc_id)
       |  WHERE q.quality >= $minQuality),
       |curex AS MATERIALIZED (
       |  SELECT doc_id, lang, n_chars, text FROM (
       |    SELECT doc_id, lang, n_chars, text,
       |      row_number() OVER (PARTITION BY md5($normSql) ORDER BY doc_id) AS rn
       |    FROM curq WHERE text IS NOT NULL) WHERE rn = 1
       |  UNION ALL
       |  SELECT doc_id, lang, n_chars, text FROM curq WHERE text IS NULL),
       |${pairCtes(wordShingles(n, "curex"), k, bands, k / bands)},
       |edges AS MATERIALIZED (
       |  SELECT id_a AS a, id_b AS b FROM ver WHERE j >= $threshold
       |  UNION SELECT id_b, id_a FROM ver WHERE j >= $threshold),
       |reach(src, dst) AS (
       |  SELECT a, b FROM edges
       |  UNION SELECT reach.src, e.b FROM reach JOIN edges e ON reach.dst = e.a),
       |losers AS (SELECT src AS id FROM reach GROUP BY src HAVING min(dst) < src)
       |SELECT doc_id, lang, n_chars FROM curex
       |WHERE doc_id NOT IN (SELECT id FROM losers) ORDER BY doc_id""".stripMargin

  /** Oracle for the [[graft.multimodal.Multimodal.decodeImages]] query
    * shape over UTF-8 text payloads: byte length, the 31·h+b rolling hash
    * over SIGNED bytes (Java byte semantics), unsigned-byte mean.
    */
  def multimodalDecodeSql: String = {
    // acc' = (31·acc + signed(b) + 2^64) & mask — adding 2^64 keeps the
    // intermediate non-negative for b ∈ [-128,127]
    val step = s"((((acc << 5) - acc & $MASK) + (CASE WHEN x >= 128 THEN x - 256 ELSE x END) + 18446744073709551616::HUGEINT) & $MASK)"
    s"""WITH bytes AS MATERIALIZED (
       |  SELECT doc_id,
       |    CAST(octet_length(encode(coalesce(text, ''))) AS BIGINT) AS byte_length,
       |    [CAST(CAST(('0x' || substr(hex(encode(coalesce(text, ''))), 2*i - 1, 2)) AS INTEGER) AS HUGEINT)
       |     FOR i IN range(1, octet_length(encode(coalesce(text, ''))) + 1)] AS bl
       |  FROM documents),
       |hashed AS (
       |  SELECT doc_id, byte_length,
       |    ${toSigned("list_reduce(list_prepend(1125899906842597::HUGEINT, bl), (acc, x) -> " + step + ")")} AS content_hash,
       |    CASE WHEN byte_length = 0 THEN 0.0
       |         ELSE list_sum(list_transform(bl, b -> b::BIGINT))::DOUBLE / byte_length END AS mi
       |  FROM bytes)
       |SELECT doc_id, byte_length, content_hash, round(mi, 6) AS mean_intensity
       |FROM hashed ORDER BY doc_id""".stripMargin
  }

  /** Oracle for [[graft.similarity.Similarity.sketchTopK]]: hyperplane-LSH
    * sketches (splitmix64 plane coordinates, 53-bit-exact doubles,
    * sequential-fold dot products matching the engine's accumulation
    * order), Hamming shortlist, exact cosine re-rank.
    */
  def annSketchSql(dim: Int, nBits: Int, k: Int, oversample: Int, nQueries: Int): String = {
    val planeInput = s"((p*1000003 + j + 11400714819323198485::HUGEINT) & $MASK)"
    s"""WITH planes AS MATERIALIZED (
       |  SELECT p, j, ((${mix64(planeInput)} >> 11)::DOUBLE / 9007199254740992) * 2 - 1 AS coord
       |  FROM (SELECT unnest(range(0, $nBits)) AS p), (SELECT unnest(range(0, $dim)) AS j)),
       |plane_l AS MATERIALIZED (SELECT p, list(coord ORDER BY j) AS pl FROM planes GROUP BY p),
       |vecs AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |proj AS MATERIALIZED (
       |  SELECT vec_id, p,
       |    list_reduce(list_prepend(0.0::DOUBLE, [v[j] * pl[j] FOR j IN range(1, $dim + 1)]), (a, x) -> a + x) AS pr
       |  FROM vecs, plane_l),
       |sk AS MATERIALIZED (
       |  SELECT vec_id, ${toSigned(s"sum(CASE WHEN pr >= 0 THEN (1::HUGEINT << CAST(p AS INTEGER)) ELSE 0::HUGEINT END)")} AS sk
       |  FROM proj GROUP BY vec_id),
       |shortlist AS (
       |  SELECT query_id, neighbor_id, qv, cv FROM (
       |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, qs.v AS qv, cs.v AS cv,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY bit_count(xor(q.sk, c.sk)) ASC, c.vec_id) AS srn
       |    FROM sk q JOIN sk c ON q.vec_id < $nQueries AND c.vec_id <> q.vec_id
       |    JOIN vecs qs ON qs.vec_id = q.vec_id JOIN vecs cs ON cs.vec_id = c.vec_id)
       |  WHERE srn <= ${k * oversample})
       |SELECT query_id, neighbor_id, cosine_sim, CAST(rank AS BIGINT) AS rank FROM (
       |  SELECT query_id, neighbor_id,
       |    round(list_cosine_similarity(qv, cv), 6) AS cosine_sim,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY round(list_cosine_similarity(qv, cv), 6) DESC, neighbor_id) AS rank
       |  FROM shortlist)
       |WHERE rank <= $k ORDER BY query_id, rank""".stripMargin
  }

  /** Shared PQ CTE block: vecs, seed codebook, per-subspace distances,
    * argmin codes (ties to the lowest code).
    */
  /** Lloyd-refinement CTE layers shared by [[annPqRefinedSql]] and
    * [[semDedupSql]]: per iteration, recompute each (j, c) centroid as
    * the mean of its member subvectors with component sums folded
    * SEQUENTIALLY in vec-id order (the engine's deterministic
    * accumulation order), then re-assign. Expects the [[pqCtes]] CTEs
    * (`vecs`, `cents`, `codes`); produces `cents_N` / `codes_N`.
    */
  private def refineLayers(dsub: Int, iters: Int): String =
    (1 to iters).map { it =>
      val prevCents = if (it == 1) "cents" else s"cents_${it - 1}"
      val prevCodes = if (it == 1) "codes" else s"codes_${it - 1}"
      s"""cellsub_$it AS MATERIALIZED (
         |  SELECT cd.j, cd.c, count(*) AS n,
         |    list([vv.v[cd.j*$dsub + t] FOR t IN range(1, ${dsub + 1})] ORDER BY cd.vec_id) AS subs
         |  FROM $prevCodes cd JOIN vecs vv ON vv.vec_id = cd.vec_id
         |  GROUP BY cd.j, cd.c),
         |refc_$it AS (
         |  SELECT j, c, t,
         |    list_reduce(list_prepend(0.0::DOUBLE, list_transform(subs, s -> s[t])), (a, x) -> a + x) / n AS comp
         |  FROM cellsub_$it, (SELECT unnest(range(1, ${dsub + 1})) AS t)),
         |ref_$it AS MATERIALIZED (SELECT j, c, list(comp ORDER BY t) AS cent FROM refc_$it GROUP BY j, c),
         |cents_$it AS MATERIALIZED (
         |  SELECT p.j, p.c, coalesce(r.cent, p.cent) AS cent
         |  FROM $prevCents p LEFT JOIN ref_$it r ON r.j = p.j AND r.c = p.c),
         |subd_$it AS MATERIALIZED (
         |  SELECT vec_id, j, c,
         |    list_reduce(list_prepend(0.0::DOUBLE,
         |      [(v[j*$dsub + t] - cent[t]) * (v[j*$dsub + t] - cent[t]) FOR t IN range(1, ${dsub + 1})]),
         |      (a, x) -> a + x) AS d2
         |  FROM vecs, cents_$it),
         |codes_$it AS MATERIALIZED (
         |  SELECT vec_id, j, c FROM (
         |    SELECT vec_id, j, c, row_number() OVER (PARTITION BY vec_id, j ORDER BY d2 ASC, c ASC) AS rn
         |    FROM subd_$it) WHERE rn = 1)""".stripMargin
    }.mkString(",\n")

  /** Oracle for cluster purity over [[graft.dedup.SemDedup]]'s
    * deterministic k-means: the same clustering CTEs as [[semDedupSql]],
    * then per-cluster majority label (ties to the smaller label) joined
    * against `embeddings.label` — purity is two exact integers divided.
    */
  def clusterPuritySql(d: Int, kc: Int, iters: Int): String = {
    require(iters >= 1)
    s"""WITH ${pqCtes(d, 1, kc)},
       |${refineLayers(d, iters)},
       |assign AS MATERIALIZED (SELECT vec_id, c AS cluster FROM codes_$iters),
       |cl AS MATERIALIZED (
       |  SELECT a.cluster, e.label, count(*) AS n
       |  FROM assign a JOIN embeddings e ON e.vec_id = a.vec_id
       |  GROUP BY 1, 2),
       |members AS (SELECT cluster, CAST(sum(n) AS BIGINT) AS n_members FROM cl GROUP BY 1),
       |top AS (
       |  SELECT cluster, label AS majority_label, CAST(n AS BIGINT) AS n_majority FROM (
       |    SELECT cluster, label, n,
       |      row_number() OVER (PARTITION BY cluster ORDER BY n DESC, label) AS rn
       |    FROM cl) WHERE rn = 1)
       |SELECT CAST(t.cluster AS INTEGER) AS cluster, m.n_members, t.majority_label, t.n_majority,
       |  t.n_majority / CAST(m.n_members AS DOUBLE) AS purity
       |FROM top t JOIN members m USING (cluster)
       |ORDER BY cluster""".stripMargin
  }

  /** Oracle for [[graft.similarity.Evaluation.adjustedRandIndex]] over
    * the deterministic k-means assignment: every term is an exact
    * integer pair count; the final arithmetic mirrors the engine's
    * fixed operation order so the double matches bit-for-bit.
    */
  def clusterAriSql(d: Int, kc: Int, iters: Int): String = {
    require(iters >= 1)
    s"""WITH ${pqCtes(d, 1, kc)},
       |${refineLayers(d, iters)},
       |assign AS MATERIALIZED (SELECT vec_id, c AS cluster FROM codes_$iters),
       |cells AS MATERIALIZED (
       |  SELECT a.cluster, e.label, count(*) AS n
       |  FROM assign a JOIN embeddings e ON e.vec_id = a.vec_id
       |  GROUP BY 1, 2),
       |s AS (SELECT
       |  (SELECT CAST(sum(n) AS BIGINT) FROM cells) AS n_items,
       |  (SELECT CAST(sum(n * (n - 1) // 2) AS BIGINT) FROM cells) AS sum_cl,
       |  (SELECT CAST(sum(na * (na - 1) // 2) AS BIGINT) FROM
       |     (SELECT sum(n) AS na FROM cells GROUP BY cluster)) AS sum_c,
       |  (SELECT CAST(sum(nb * (nb - 1) // 2) AS BIGINT) FROM
       |     (SELECT sum(n) AS nb FROM cells GROUP BY label)) AS sum_l)
       |SELECT n_items, sum_cl, sum_c, sum_l,
       |  CASE WHEN (CAST(sum_c AS DOUBLE) + CAST(sum_l AS DOUBLE)) / 2.0E0
       |            - CAST(sum_c AS DOUBLE) * CAST(sum_l AS DOUBLE)
       |              / CAST(n_items * (n_items - 1) // 2 AS DOUBLE) = 0.0E0
       |       THEN 1.0E0
       |       ELSE (CAST(sum_cl AS DOUBLE)
       |             - CAST(sum_c AS DOUBLE) * CAST(sum_l AS DOUBLE)
       |               / CAST(n_items * (n_items - 1) // 2 AS DOUBLE))
       |          / ((CAST(sum_c AS DOUBLE) + CAST(sum_l AS DOUBLE)) / 2.0E0
       |             - CAST(sum_c AS DOUBLE) * CAST(sum_l AS DOUBLE)
       |               / CAST(n_items * (n_items - 1) // 2 AS DOUBLE))
       |  END AS ari
       |FROM s""".stripMargin
  }

  /** Oracle for [[graft.similarity.Evaluation.normalizedMutualInfo]]
    * over the deterministic k-means assignment: MI and the entropies
    * are `list_reduce` left folds over (count ratio)·ln(count ratio)
    * terms in ascending (cluster, label) VARCHAR order — exactly the
    * engine's driver-side fold — each rounded to 6 (ln ulp parity, the
    * q_audio_mfcc precedent); nmi recombines the ROUNDED components so
    * sqrt/divide see engine-identical inputs.
    */
  def clusterNmiSql(d: Int, kc: Int, iters: Int): String = {
    require(iters >= 1)
    s"""WITH ${pqCtes(d, 1, kc)},
       |${refineLayers(d, iters)},
       |assign AS MATERIALIZED (SELECT vec_id, c AS cluster FROM codes_$iters),
       |cells AS MATERIALIZED (
       |  SELECT a.cluster, e.label, count(*) AS n
       |  FROM assign a JOIN embeddings e ON e.vec_id = a.vec_id
       |  GROUP BY 1, 2),
       |cagg AS MATERIALIZED (SELECT cluster, CAST(sum(n) AS BIGINT) AS nc FROM cells GROUP BY cluster),
       |lagg AS MATERIALIZED (SELECT label, CAST(sum(n) AS BIGINT) AS nl FROM cells GROUP BY label),
       |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nt FROM cells),
       |mi AS (
       |  SELECT round(list_reduce(list_prepend(0.0E0,
       |    list((CAST(c.n AS DOUBLE) / CAST(t.nt AS DOUBLE))
       |         * ln((CAST(t.nt AS DOUBLE) * CAST(c.n AS DOUBLE))
       |               / (CAST(ca.nc AS DOUBLE) * CAST(la.nl AS DOUBLE)))
       |      ORDER BY CAST(c.cluster AS VARCHAR), CAST(c.label AS VARCHAR))),
       |    (acc, x) -> acc + x), 6) AS mi
       |  FROM cells c JOIN cagg ca USING (cluster) JOIN lagg la USING (label), tot t),
       |hc AS (
       |  SELECT round(-list_reduce(list_prepend(0.0E0,
       |    list((CAST(nc AS DOUBLE) / CAST(t.nt AS DOUBLE))
       |         * ln(CAST(nc AS DOUBLE) / CAST(t.nt AS DOUBLE))
       |      ORDER BY CAST(cluster AS VARCHAR))),
       |    (acc, x) -> acc + x), 6) AS h_cluster
       |  FROM cagg, tot t),
       |hl AS (
       |  SELECT round(-list_reduce(list_prepend(0.0E0,
       |    list((CAST(nl AS DOUBLE) / CAST(t.nt AS DOUBLE))
       |         * ln(CAST(nl AS DOUBLE) / CAST(t.nt AS DOUBLE))
       |      ORDER BY CAST(label AS VARCHAR))),
       |    (acc, x) -> acc + x), 6) AS h_label
       |  FROM lagg, tot t)
       |SELECT t.nt AS n_items, mi.mi, hc.h_cluster, hl.h_label,
       |  CASE WHEN hc.h_cluster = 0.0E0 AND hl.h_label = 0.0E0 THEN 1.0E0
       |       WHEN hc.h_cluster = 0.0E0 OR hl.h_label = 0.0E0 THEN 0.0E0
       |       ELSE round(mi.mi / sqrt(hc.h_cluster * hl.h_label), 6)
       |  END AS nmi
       |FROM tot t, mi, hc, hl""".stripMargin
  }

  /** Oracle for [[graft.dedup.SemDedup.semDedup]]: full-vector k-means is
    * PQ with m = 1 (one subspace = the whole vector), so clustering
    * reuses [[pqCtes]] + [[refineLayers]] verbatim; the pruning pass then
    * joins same-cluster id-ordered pairs and drops the higher id of any
    * pair with rounded cosine ≥ `tau` — exactly the engine's verdict.
    */
  def semDedupSql(d: Int, kc: Int, iters: Int, tau: Double): String = {
    require(iters >= 1)
    // the gate plants exact copies of the 10 lowest ids at +100000 (the
    // q_dedup_embedding offset) — mirror the union, then point pqCtes at it
    s"""WITH embx AS (
       |  SELECT vec_id, embedding FROM embeddings
       |  UNION ALL
       |  SELECT vec_id + 100000 AS vec_id, embedding FROM embeddings WHERE vec_id < 10
       |),
       |${pqCtes(d, 1, kc, src = "embx")},
       |${refineLayers(d, iters)},
       |assign AS MATERIALIZED (SELECT vec_id, c AS cluster FROM codes_$iters),
       |dropped AS MATERIALIZED (
       |  SELECT DISTINCT b.vec_id AS b_id
       |  FROM assign a JOIN assign b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
       |  JOIN vecs va ON va.vec_id = a.vec_id
       |  JOIN vecs vb ON vb.vec_id = b.vec_id
       |  WHERE round(list_cosine_similarity(va.v, vb.v), 6) >= $tau)
       |SELECT s.vec_id, CAST(s.cluster AS INTEGER) AS cluster, (p.b_id IS NULL) AS kept
       |FROM assign s LEFT JOIN dropped p ON p.b_id = s.vec_id
       |ORDER BY s.vec_id""".stripMargin
  }

  /** Oracle for the [[graft.dedup.SemDedupStore]] serving gate: train
    * the deterministic k-means on the BASE corpus only (vec_id % 4 <> 0
    * - the store's build input), then assign the probe batch (the
    * remaining quarter plus planted exact copies at +100000/+200000 of
    * low base ids and +300000 of low batch ids) against the FROZEN
    * centroids and replay the exact drop rule: same cluster and rounded
    * cosine >= tau vs any base vector (the stored state) or any lower-id
    * batch peer. The +300000 plants die ONLY via the in-batch rule (their
    * source is in the batch, not the state), so both lanes are
    * non-vacuous.
    */
  def semDedupStoreSql(d: Int, kc: Int, iters: Int, tau: Double): String = {
    require(iters >= 1)
    s"""WITH embx AS (
       |  SELECT vec_id, embedding FROM embeddings WHERE vec_id % 4 <> 0
       |),
       |${pqCtes(d, 1, kc, src = "embx")},
       |${refineLayers(d, iters)},
       |statea AS MATERIALIZED (SELECT vec_id, c AS cluster FROM codes_$iters),
       |batchv AS MATERIALIZED (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM (
       |    SELECT vec_id, embedding FROM embeddings WHERE vec_id % 4 = 0
       |    UNION ALL
       |    SELECT vec_id + 100000 AS vec_id, embedding FROM embeddings
       |    WHERE vec_id % 4 <> 0 AND vec_id < 10
       |    UNION ALL
       |    SELECT vec_id + 200000 AS vec_id, embedding FROM embeddings
       |    WHERE vec_id % 4 <> 0 AND vec_id < 10
       |    UNION ALL
       |    SELECT vec_id + 300000 AS vec_id, embedding FROM embeddings
       |    WHERE vec_id % 4 = 0 AND vec_id < 10)),
       |bsubd AS MATERIALIZED (
       |  SELECT vec_id, c,
       |    list_reduce(list_prepend(0.0::DOUBLE,
       |      [(v[t] - cent[t]) * (v[t] - cent[t]) FOR t IN range(1, ${d + 1})]),
       |      (a, x) -> a + x) AS d2
       |  FROM batchv, cents_$iters),
       |bassign AS MATERIALIZED (
       |  SELECT vec_id, c AS cluster FROM (
       |    SELECT vec_id, c, row_number() OVER (PARTITION BY vec_id ORDER BY d2 ASC, c ASC) AS rn
       |    FROM bsubd) WHERE rn = 1),
       |dropped AS MATERIALIZED (
       |  SELECT DISTINCT d_id FROM (
       |    SELECT b.vec_id AS d_id
       |    FROM bassign b JOIN statea a ON a.cluster = b.cluster
       |    JOIN vecs va ON va.vec_id = a.vec_id
       |    JOIN batchv vb ON vb.vec_id = b.vec_id
       |    WHERE round(list_cosine_similarity(va.v, vb.v), 6) >= $tau
       |    UNION ALL
       |    SELECT b.vec_id AS d_id
       |    FROM bassign b JOIN bassign a ON a.cluster = b.cluster AND a.vec_id < b.vec_id
       |    JOIN batchv va ON va.vec_id = a.vec_id
       |    JOIN batchv vb ON vb.vec_id = b.vec_id
       |    WHERE round(list_cosine_similarity(va.v, vb.v), 6) >= $tau))
       |SELECT s.vec_id, CAST(s.cluster AS INTEGER) AS cluster, (p.d_id IS NULL) AS kept
       |FROM bassign s LEFT JOIN dropped p ON p.d_id = s.vec_id
       |ORDER BY s.vec_id""".stripMargin
  }

  /** Oracle CTEs for [[graft.similarity.Pca]]: mean and every
    * power-iteration step as id-ordered sequential folds (per
    * dimension), per-row dots as component-order folds — the engine's
    * exact accumulation orders, so the learned component and all
    * projections are bit-identical. Produces `vecs`, `mu` (`m` list) and
    * `p_$iters` (`p` list).
    */
  private def pcaCtes(d: Int, iters: Int): String = {
    require(iters >= 1)
    val v0 = {
      // same start vector the engine computes (1/sqrt(d)), shortest
      // round-trip E-notation so DuckDB parses DOUBLE
      val s = java.lang.Double.toString(1.0 / math.sqrt(d.toDouble))
      if (s.indexOf('E') >= 0) s else s + "E0"
    }
    val layers = (1 to iters).map { it =>
      val prev = if (it == 1) "p0" else s"p_${it - 1}"
      s"""dot_$it AS MATERIALIZED (
         |  SELECT vec_id, list_reduce(list_prepend(0.0::DOUBLE,
         |    [(v[t] - m[t]) * p[t] FOR t IN range(1, ${d + 1})]), (a, x) -> a + x) AS dot
         |  FROM vecs, mu, $prev),
         |nv_$it AS MATERIALIZED (
         |  SELECT t, list_reduce(list_prepend(0.0::DOUBLE,
         |      list((v[t] - m[t]) * dot ORDER BY vec_id)), (a, x) -> a + x) AS comp
         |  FROM vecs JOIN dot_$it USING (vec_id), mu, dims GROUP BY t),
         |nrm_$it AS (
         |  SELECT sqrt(list_reduce(list_prepend(0.0::DOUBLE, list(comp * comp ORDER BY t)),
         |    (a, x) -> a + x)) AS nrm FROM nv_$it),
         |p_$it AS MATERIALIZED (SELECT list(comp / nrm ORDER BY t) AS p FROM nv_$it, nrm_$it)""".stripMargin
    }.mkString(",\n")
    s"""vecs AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |dims AS (SELECT unnest(range(1, ${d + 1})) AS t),
       |mu0 AS MATERIALIZED (
       |  SELECT t, list_reduce(list_prepend(0.0::DOUBLE, list(v[t] ORDER BY vec_id)),
       |    (a, x) -> a + x) / (SELECT count(*) FROM vecs) AS comp
       |  FROM vecs, dims GROUP BY t),
       |mu AS MATERIALIZED (SELECT list(comp ORDER BY t) AS m FROM mu0),
       |p0 AS (SELECT [$v0 FOR i IN range(0, $d)] AS p),
       |$layers""".stripMargin
  }

  /** Oracle for q_pca_project: per-vector `(x−μ)·pc` after `iters` power
    * steps, rounded at the edge.
    */
  def pcaProjectSql(d: Int, iters: Int): String =
    s"""WITH ${pcaCtes(d, iters)}
       |SELECT vec_id, round(list_reduce(list_prepend(0.0::DOUBLE,
       |    [(v[t] - m[t]) * p[t] FOR t IN range(1, ${d + 1})]), (a, x) -> a + x), 6) AS pc_score
       |FROM vecs, mu, p_$iters ORDER BY vec_id""".stripMargin

  /** Oracle for q_pca_component: the learned loadings (0-based dim). */
  def pcaComponentSql(d: Int, iters: Int): String =
    s"""WITH ${pcaCtes(d, iters)}
       |SELECT CAST(t - 1 AS BIGINT) AS dim, round(p[t], 6) AS loading
       |FROM p_$iters, dims ORDER BY dim""".stripMargin

  private def pqCtes(d: Int, m: Int, kc: Int, src: String = "embeddings"): String = {
    val dsub = d / m
    s"""vecs AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM $src),
       |cents AS MATERIALIZED (
       |  SELECT j, rn - 1 AS c, [v[j*$dsub + t] FOR t IN range(1, ${dsub + 1})] AS cent
       |  FROM (SELECT v, row_number() OVER (ORDER BY vec_id) AS rn FROM vecs ORDER BY vec_id LIMIT $kc),
       |       (SELECT unnest(range(0, $m)) AS j)),
       |subd AS MATERIALIZED (
       |  SELECT vec_id, j, c,
       |    list_reduce(list_prepend(0.0::DOUBLE,
       |      [(v[j*$dsub + t] - cent[t]) * (v[j*$dsub + t] - cent[t]) FOR t IN range(1, ${dsub + 1})]),
       |      (a, x) -> a + x) AS d2
       |  FROM vecs, cents),
       |codes AS MATERIALIZED (
       |  SELECT vec_id, j, c FROM (
       |    SELECT vec_id, j, c, row_number() OVER (PARTITION BY vec_id, j ORDER BY d2 ASC, c ASC) AS rn
       |    FROM subd) WHERE rn = 1)""".stripMargin
  }

  /** Shared shortlist → exact-cosine re-rank tail (expects CTEs `adc`
    * (query_id, neighbor_id, adc) and `vecs`).
    */
  private def pqRerankTail(k: Int, oversample: Int): String =
    s"""short AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |      row_number() OVER (PARTITION BY query_id ORDER BY adc ASC, neighbor_id) AS srn
       |    FROM adc) WHERE srn <= ${k * oversample})
       |SELECT query_id, neighbor_id, cosine_sim, CAST(rank AS BIGINT) AS rank FROM (
       |  SELECT query_id, neighbor_id,
       |    round(list_cosine_similarity(qv.v, nv.v), 6) AS cosine_sim,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY round(list_cosine_similarity(qv.v, nv.v), 6) DESC, neighbor_id) AS rank
       |  FROM short JOIN vecs qv ON qv.vec_id = short.query_id
       |  JOIN vecs nv ON nv.vec_id = short.neighbor_id)
       |WHERE rank <= $k ORDER BY query_id, rank""".stripMargin

  /** Oracle for the [[graft.similarity.Similarity.pqTopK]] query shape
    * with a seed-trained codebook ([[graft.similarity.Similarity.pqTrain]]
    * — subvectors of the `kc` lowest-id corpus vectors, no RNG): encode =
    * argmin squared-L2 per subspace (ties to the lowest code), ADC
    * shortlist, exact cosine re-rank. Every float reduction is a
    * sequential fold in the engine's accumulation order, so doubles are
    * bit-identical.
    */
  def annPqSql(d: Int, m: Int, kc: Int, k: Int, oversample: Int, nQueries: Int): String =
    s"""WITH ${pqCtes(d, m, kc)},
       |adcp AS MATERIALIZED (
       |  SELECT s.vec_id AS query_id, cd.vec_id AS neighbor_id, cd.j, s.d2
       |  FROM codes cd JOIN subd s ON s.j = cd.j AND s.c = cd.c
       |  WHERE s.vec_id < $nQueries AND cd.vec_id <> s.vec_id),
       |adc AS (
       |  SELECT query_id, neighbor_id,
       |    list_reduce(list_prepend(0.0::DOUBLE, list(d2 ORDER BY j)), (a, x) -> a + x) AS adc
       |  FROM adcp GROUP BY query_id, neighbor_id),
       |${pqRerankTail(k, oversample)}""".stripMargin

  /** Oracle for the Lloyd-REFINED PQ query
    * ([[graft.similarity.Similarity.pqRefineDeterministic]]): starts from
    * the seed codebook of [[annPqSql]], then per iteration recomputes each
    * (subspace j, code c) centroid as the mean of its member subvectors
    * with the component sums folded SEQUENTIALLY in vec-id order — the
    * exact accumulation order the engine's deterministic refinement uses,
    * so refined centroids (and therefore codes, ADC distances, and the
    * final ranking) are bit-identical. Empty cells keep their previous
    * centroid; assignment ties break to the lowest code.
    */
  def annPqRefinedSql(d: Int, m: Int, kc: Int, k: Int, oversample: Int,
      nQueries: Int, iters: Int): String = {
    require(iters >= 1)
    val layers = refineLayers(d / m, iters)
    s"""WITH ${pqCtes(d, m, kc)},
       |$layers,
       |adcp AS MATERIALIZED (
       |  SELECT s.vec_id AS query_id, cd.vec_id AS neighbor_id, cd.j, s.d2
       |  FROM codes_$iters cd JOIN subd_$iters s ON s.j = cd.j AND s.c = cd.c
       |  WHERE s.vec_id < $nQueries AND cd.vec_id <> s.vec_id),
       |adc AS (
       |  SELECT query_id, neighbor_id,
       |    list_reduce(list_prepend(0.0::DOUBLE, list(d2 ORDER BY j)), (a, x) -> a + x) AS adc
       |  FROM adcp GROUP BY query_id, neighbor_id),
       |${pqRerankTail(k, oversample)}""".stripMargin
  }

  /** Oracle for [[graft.similarity.Similarity.ivfPqTopK]]: IVF assignment
    * + probe (rounded-cosine argmax, ties to the lowest cell — matching
    * ivfBuild/ivfTopK), ADC over probed-cell members only, cosine
    * re-rank.
    */
  def annIvfPqSql(d: Int, m: Int, kc: Int, k: Int, oversample: Int, nQueries: Int,
      nlist: Int, nprobe: Int): String =
    s"""WITH ${pqCtes(d, m, kc)},
       |cent AS MATERIALIZED (SELECT vec_id AS cell, v AS centroid FROM vecs WHERE vec_id < $nlist),
       |assign AS MATERIALIZED (
       |  SELECT vec_id, cell FROM (
       |    SELECT vv.vec_id, c.cell,
       |      row_number() OVER (PARTITION BY vv.vec_id
       |        ORDER BY round(list_cosine_similarity(vv.v, c.centroid), 6) DESC, c.cell) AS rn
       |    FROM vecs vv CROSS JOIN cent c) WHERE rn = 1),
       |probe AS MATERIALIZED (
       |  SELECT query_id, cell FROM (
       |    SELECT q.vec_id AS query_id, c.cell,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY round(list_cosine_similarity(q.v, c.centroid), 6) DESC, c.cell) AS rn
       |    FROM vecs q CROSS JOIN cent c WHERE q.vec_id < $nQueries) WHERE rn <= $nprobe),
       |adcp AS MATERIALIZED (
       |  SELECT p.query_id, cd.vec_id AS neighbor_id, cd.j, s.d2
       |  FROM codes cd
       |  JOIN assign a ON a.vec_id = cd.vec_id
       |  JOIN probe p ON p.cell = a.cell
       |  JOIN subd s ON s.vec_id = p.query_id AND s.j = cd.j AND s.c = cd.c
       |  WHERE cd.vec_id <> p.query_id),
       |adc AS (
       |  SELECT query_id, neighbor_id,
       |    list_reduce(list_prepend(0.0::DOUBLE, list(d2 ORDER BY j)), (a, x) -> a + x) AS adc
       |  FROM adcp GROUP BY query_id, neighbor_id),
       |${pqRerankTail(k, oversample)}""".stripMargin

  /** Oracle for [[graft.similarity.Similarity.ivfRefinedTopK]]: the
    * Lloyd-refined coarse quantizer (the [[refineLayers]] k-means replay,
    * m = 1 so codes span full vectors), then the q_ann_ivf probe shape
    * against the REFINED centroid set — assignment and probe both by
    * rounded cosine (ties to the lower cell ordinal), exact member
    * scoring, per-query top-k.
    */
  def annIvfRefinedSql(d: Int, nlist: Int, iters: Int, k: Int, nprobe: Int,
      nQueries: Int): String = {
    require(iters >= 1)
    s"""WITH ${pqCtes(d, 1, nlist)},
       |${refineLayers(d, iters)},
       |cent AS MATERIALIZED (SELECT c AS cell, cent AS centroid FROM cents_$iters),
       |assign AS MATERIALIZED (
       |  SELECT vec_id, cell FROM (
       |    SELECT vv.vec_id, ct.cell,
       |      row_number() OVER (PARTITION BY vv.vec_id
       |        ORDER BY round(list_cosine_similarity(vv.v, ct.centroid), 6) DESC, ct.cell) AS rn
       |    FROM vecs vv CROSS JOIN cent ct) WHERE rn = 1),
       |queries AS MATERIALIZED (
       |  SELECT vec_id AS query_id, v AS qvec FROM vecs WHERE vec_id < $nQueries),
       |probe AS MATERIALIZED (
       |  SELECT query_id, cell FROM (
       |    SELECT q.query_id, ct.cell,
       |      row_number() OVER (PARTITION BY q.query_id
       |        ORDER BY round(list_cosine_similarity(q.qvec, ct.centroid), 6) DESC, ct.cell) AS rn
       |    FROM queries q CROSS JOIN cent ct) WHERE rn <= $nprobe),
       |cand AS (
       |  SELECT p.query_id, c.vec_id AS neighbor_id,
       |    round(list_cosine_similarity(q.qvec, c.v), 6) AS cosine_sim
       |  FROM probe p
       |  JOIN queries q ON q.query_id = p.query_id
       |  JOIN assign a ON a.cell = p.cell
       |  JOIN vecs c ON c.vec_id = a.vec_id
       |  WHERE c.vec_id <> p.query_id)
       |SELECT query_id, neighbor_id, cosine_sim, CAST(rank AS BIGINT) AS rank FROM (
       |  SELECT query_id, neighbor_id, cosine_sim,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id) AS rank
       |  FROM cand)
       |WHERE rank <= $k ORDER BY query_id, rank""".stripMargin
  }

  /** Oracle for the refined-build → [[graft.similarity.Similarity
    * .rebalanceIvfIndex]] → persisted-probe composition: the
    * [[annIvfRefinedSql]] quantizer replay feeding the rebalance chain
    * (hot cells at the `budgetNum·n // budgetDen` budget,
    * farthest-member split centroids, constrained re-argmax), then the
    * probe over the FINAL centroid set — proving the two maintenance
    * operators compose on one artifact end to end.
    */
  def annIvfRefinedRebalanceSql(d: Int, nlist: Int, iters: Int, k: Int, nprobe: Int,
      nQueries: Int, budgetNum: Int, budgetDen: Int): String = {
    require(iters >= 1)
    s"""WITH ${pqCtes(d, 1, nlist)},
       |${refineLayers(d, iters)},
       |cent AS MATERIALIZED (SELECT c AS cell, cent AS centroid FROM cents_$iters),
       |assign AS MATERIALIZED (
       |  SELECT vec_id, vec, cell FROM (
       |    SELECT vv.vec_id, vv.v AS vec, ct.cell,
       |      row_number() OVER (PARTITION BY vv.vec_id
       |        ORDER BY round(list_cosine_similarity(vv.v, ct.centroid), 6) DESC, ct.cell) AS rn
       |    FROM vecs vv CROSS JOIN cent ct) WHERE rn = 1),
       |hot AS MATERIALIZED (
       |  SELECT cell FROM assign GROUP BY cell
       |  HAVING count(*) > (SELECT $budgetNum * count(*) // $budgetDen FROM vecs)),
       |newcent AS MATERIALIZED (
       |  SELECT old_cell, vec_id AS new_cell, vec AS centroid FROM (
       |    SELECT a.cell AS old_cell, a.vec_id, a.vec,
       |      row_number() OVER (PARTITION BY a.cell
       |        ORDER BY round(list_cosine_similarity(a.vec, ct.centroid), 6) ASC, a.vec_id) AS rn
       |    FROM assign a JOIN cent ct ON ct.cell = a.cell
       |    WHERE a.cell IN (SELECT cell FROM hot)) WHERE rn = 1),
       |cand AS MATERIALIZED (
       |  SELECT n.old_cell, n.old_cell AS cand_cell, ct.centroid
       |  FROM newcent n JOIN cent ct ON ct.cell = n.old_cell
       |  UNION ALL
       |  SELECT old_cell, new_cell AS cand_cell, centroid FROM newcent),
       |resplit AS MATERIALIZED (
       |  SELECT vec_id, vec, cand_cell AS cell FROM (
       |    SELECT a.vec_id, a.vec, cd.cand_cell,
       |      row_number() OVER (PARTITION BY a.vec_id
       |        ORDER BY round(list_cosine_similarity(a.vec, cd.centroid), 6) DESC, cd.cand_cell) AS rn
       |    FROM assign a JOIN cand cd ON cd.old_cell = a.cell) WHERE rn = 1),
       |final AS MATERIALIZED (
       |  SELECT vec_id, vec, cell FROM assign WHERE cell NOT IN (SELECT cell FROM hot)
       |  UNION ALL SELECT vec_id, vec, cell FROM resplit),
       |fcent AS MATERIALIZED (
       |  SELECT cell, centroid FROM cent
       |  UNION ALL SELECT new_cell, centroid FROM newcent),
       |queries AS (
       |  SELECT vec_id AS query_id, v AS qvec FROM vecs WHERE vec_id < $nQueries),
       |probe AS (
       |  SELECT query_id, cell FROM (
       |    SELECT q.query_id, ct.cell,
       |      row_number() OVER (PARTITION BY q.query_id
       |        ORDER BY round(list_cosine_similarity(q.qvec, ct.centroid), 6) DESC, ct.cell) AS rn
       |    FROM queries q CROSS JOIN fcent ct) WHERE rn <= $nprobe),
       |candq AS (
       |  SELECT p.query_id, f.vec_id AS neighbor_id,
       |    round(list_cosine_similarity(q.qvec, f.vec), 6) AS cosine_sim
       |  FROM probe p
       |  JOIN queries q ON q.query_id = p.query_id
       |  JOIN final f ON f.cell = p.cell
       |  WHERE f.vec_id <> p.query_id)
       |SELECT query_id, neighbor_id, cosine_sim, CAST(rank AS BIGINT) AS rank FROM (
       |  SELECT query_id, neighbor_id, cosine_sim,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id) AS rank
       |  FROM candq)
       |WHERE rank <= $k ORDER BY query_id, rank""".stripMargin
  }

  /** Oracle for [[graft.dedup.Dedup.simHashPairs]]: token-multiset SimHash
    * fingerprints, byte-band bucketing, Hamming verification. Mirrors the
    * engine's fingerprint-group collapse: identical fps shrink to their
    * min-id representative — members pair with their rep at Hamming 0,
    * only representatives band.
    */
  def simhashPairsSql(maxHamming: Int, bands: Int): String = {
    val width = 64 / bands
    s"""WITH tokc AS MATERIALIZED (
       |  SELECT doc_id, s, count(*) AS c FROM (
       |    SELECT doc_id, unnest(list_filter($toksSql, x -> x <> '')) AS s
       |    FROM documents WHERE text IS NOT NULL)
       |  GROUP BY doc_id, s),
       |hashed AS MATERIALIZED (${xxh64Over("SELECT doc_id, c, s FROM tokc", Seq("doc_id", "c"))}),
       |tl AS (SELECT doc_id, list(struct_pack(u := hu, c := c)) AS tl FROM hashed GROUP BY doc_id),
       |fp AS MATERIALIZED (
       |  SELECT doc_id, $simhashExpr AS fp FROM tl
       |  UNION ALL
       |  SELECT doc_id, 0::BIGINT AS fp FROM documents
       |  WHERE text IS NOT NULL AND len(list_filter($toksSql, x -> x <> '')) = 0),
       |frep AS MATERIALIZED (SELECT fp AS gfp, min(doc_id) AS rep FROM fp GROUP BY fp),
       |bandk AS MATERIALIZED (
       |  SELECT doc_id, fp, b, (${toUnsigned("fp")} >> (b*$width)) & ${(BigInt(1) << width) - 1} AS bucket
       |  FROM (SELECT f.doc_id, f.fp FROM fp f JOIN frep r ON f.fp = r.gfp AND f.doc_id = r.rep) fp,
       |       (SELECT unnest(range(0, $bands)) AS b)),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.fp AS fp_a, b.fp AS fp_b
       |  FROM bandk a JOIN bandk b ON a.b = b.b AND a.bucket = b.bucket AND a.doc_id < b.doc_id)
       |SELECT rep AS id_a, doc_id AS id_b, 0 AS hamming
       |FROM fp JOIN frep ON fp.fp = frep.gfp WHERE doc_id <> rep
       |UNION ALL
       |SELECT id_a, id_b, CAST(bit_count(xor(fp_a, fp_b)) AS INTEGER) AS hamming
       |FROM cand WHERE bit_count(xor(fp_a, fp_b)) <= $maxHamming
       |ORDER BY id_a, id_b""".stripMargin
  }
}
