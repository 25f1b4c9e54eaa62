package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic hashing primitives for dedup: MinHash signatures, LSH
  * banding, and SimHash — all expression-level (xxhash64 is Spark's
  * codegen'd 64-bit XXH64), no RNG, no UDFs, reproducible across runs,
  * executors, and cluster sizes.
  */
object HashFunctions {

  /** MinHash signature of a set of string shingles.
    *
    * The classic k-permutation MinHash: permutation i is simulated by
    * seeding the hash with i (`xxhash64(i, shingle)`), and the signature
    * component is the minimum over the shingle set. Runs entirely inside
    * one `transform` over `sequence(0, k-1)` — per-row cost k·|shingles|
    * hash evaluations, no shuffle, no state. Empty shingle sets get a
    * sentinel signature of Long.MaxValue components — note TWO empty-set
    * sentinels are EQUAL, so filter empty sets out before LSH banding
    * (the engine's dedup pipelines do; their true Jaccard is 0).
    */
  def minHashSignature(shingleArr: Column, k: Int): Column =
    transform(
      sequence(lit(0), lit(k - 1)),
      i =>
        coalesce(
          array_min(transform(shingleArr, s => xxhash64(i, s))),
          lit(Long.MaxValue)
        )
    )

  /** LSH band keys for a MinHash signature: split into `bands` bands of
    * `rows` components, hash each band → array of (band#, bandHash) structs.
    * Two documents land in the same bucket for band b iff their signatures
    * agree on all `rows` components of that band — the standard S-curve
    * tradeoff (b bands × r rows; Broder / Leskovec-Rajaraman-Ullman,
    * Mining of Massive Datasets ch.3).
    */
  def lshBands(signature: Column, bands: Int, rows: Int): Column =
    transform(
      sequence(lit(0), lit(bands - 1)),
      b =>
        struct(
          b.as("band"),
          xxhash64(b, concat_ws(",", transform(slice(signature, b * rows + 1, lit(rows)), _.cast("string"))))
            .as("bucket")
        )
    )

  // Spark 4 Column↔Expression bridge
  private def col2e(c: Column) = org.apache.spark.sql.graftbridge.Bridge.expression(c)
  private def e2col(e: org.apache.spark.sql.catalyst.expressions.Expression) =
    org.apache.spark.sql.graftbridge.Bridge.column(e)

  /** `splitmix64(a·131071 + b)` — the deterministic (sequence, block)
    * mask key of the span-corruption export; see
    * [[graft.expressions.SplitMixKey]].
    */
  def splitmixKey(a: Column, b: Column): Column =
    e2col(graft.expressions.SplitMixKey(col2e(a), col2e(b)))

  /** Per-row k-lane MinHash signature from pre-hashed shingles (native
    * expression; lanes identical to MinHashAggregator). With
    * [[graft.functions.TextFunctions.shingleHashes]] this makes signature
    * computation a narrow map — no explode, no aggregate shuffle.
    */
  def minHashSigFromHashes(shingleHashArr: Column, k: Int): Column =
    e2col(graft.expressions.MinHashSig(col2e(shingleHashArr), k))

  /** Per-row 64-bit SimHash from pre-hashed tokens (native expression;
    * votes identical to SimHashAggregator).
    */
  def simHashFromHashes(tokenHashArr: Column): Column =
    e2col(graft.expressions.SimHash(col2e(tokenHashArr)))

  /** Native LSH band bucket hashes (array<long>, element b = hash of band
    * b's `rows` components). Consume with posexplode → (band, bucket).
    */
  def bandHashes(signature: Column, bands: Int, rows: Int): Column =
    e2col(graft.expressions.BandHashes(col2e(signature), bands, rows))

  /** Estimated Jaccard similarity from two MinHash signatures: fraction of
    * agreeing components. Two EMPTY-set sentinel signatures agree on every
    * lane (estimate 1.0) though their true Jaccard is 0 — exclude empty
    * shingle sets upstream.
    */
  def minHashJaccard(sigA: Column, sigB: Column): Column =
    aggregate(
      zip_with(sigA, sigB, (a, b) => when(a === b, 1).otherwise(0)),
      lit(0),
      (acc, v) => acc + v
    ).cast("double") / size(sigA)

  /** Exact Jaccard similarity of two shingle arrays (arrays treated as
    * sets). The verification step after LSH candidate generation.
    */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = size(array_union(a, b)).cast("double")
    when(union === 0, lit(0.0)).otherwise(inter / union)
  }

  /** 64-bit SimHash of a token array (Charikar's similarity hash): each
    * token votes ±1 on each of 64 bit positions according to its xxhash64;
    * the fingerprint takes the sign of each position's vote sum. Near-
    * duplicate documents differ in few bits (small Hamming distance).
    * Expression-only: one pass accumulating a 64-counter array per row.
    */
  def simHash64(tokens: Column): Column = {
    // shiftright/shiftleft with a column-valued amount: use call_function
    // (the Scala wrappers only take Int amounts; the SQL expression is
    // general).
    def shr(x: Column, n: Column): Column = call_function("shiftright", x, n)
    def shl(x: Column, n: Column): Column = call_function("shiftleft", x, n)
    val counters = aggregate(
      tokens,
      array_repeat(lit(0), 64),
      (acc, tok) => {
        val h = xxhash64(tok)
        zip_with(
          acc,
          sequence(lit(0), lit(63)),
          (a, j) => a + when(shr(h, j).bitwiseAND(1) === 1, 1).otherwise(-1)
        )
      }
    )
    aggregate(
      zip_with(counters, sequence(lit(0), lit(63)), (cnt, j) => when(cnt > 0, shl(lit(1L), j)).otherwise(lit(0L))),
      lit(0L),
      (acc, v) => acc.bitwiseOR(v)
    )
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Band keys for SimHash fingerprints: split the 64 bits into `bands`
    * chunks; near-dups within Hamming radius (bands-1) share at least one
    * chunk (pigeonhole) → exact-match bucketing candidates.
    */
  def simHashBands(fp: Column, bands: Int): Column =
    bandKeys64(fp, bands, 64 / bands)

  /** (band, bucket) keys from a 64-bit fingerprint with an explicit chunk
    * width — the shared kernel of [[simHashBands]] and embedding-LSH
    * banding. `width = 64` masks with -1L directly: `1L << 64` WRAPS to 1
    * on the JVM (shift counts are mod 64), which would silently zero the
    * mask for the bands=1 case.
    */
  def bandKeys64(fp: Column, bands: Int, width: Int): Column = {
    require(bands >= 1 && width >= 1 && bands * width <= 64, s"bad banding ($bands × $width bits)")
    val mask = if (width >= 64) -1L else (1L << width) - 1
    transform(
      sequence(lit(0), lit(bands - 1)),
      b => struct(b.as("band"), call_function("shiftright", fp, b * width).bitwiseAND(mask).as("bucket"))
    )
  }
}
