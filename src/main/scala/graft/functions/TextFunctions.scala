package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines:
  * tokenization, token counting, language ID (n-gram/stopword heuristic),
  * quality scoring, and document fingerprinting. All are pure Catalyst
  * expression compositions (`org.apache.spark.sql.functions`) — codegen'd,
  * shuffle-free, and pushdown-transparent, so they run at scan speed over
  * 100 TB (no UDFs, no driver round-trips).
  *
  * The reference has no text operators (its compute escape hatch is the
  * per-row mapper, reference
  * org.knime.core.data.columnar/.../table/virtual/ColumnarVirtualTable.java:447-451);
  * these are north-star extensions expressed through that same "row-wise
  * map" surface.
  */
object TextFunctions {

  /** Lowercase, strip non-alphanumerics (keeping spaces), squeeze runs of
    * whitespace, trim. The canonical normalization used by dedup and
    * fingerprinting.
    */
  def normalizeText(c: Column): Column =
    e2col(graft.expressions.NormalizeText(col2e(c)))

  /** Whitespace tokenization over normalized text → array<string>.
    * Char-scan kernel ([[graft.expressions.TokenizeText]]): one fused
    * pass over the raw bytes. The regex formulation this replaced
    * (`array_remove(split(two-regexp-chain, " "), "")`) was both more
    * work per row and a measured thread-scalability hazard —
    * `Matcher.replaceAll` ran at 2% parallel efficiency across 32 cores
    * on the reference VM, serializing every tokenizing operator no
    * matter how well the scan partitioned (SCALE.md round 10).
    */
  def tokenize(c: Column): Column =
    e2col(graft.expressions.TokenizeText(col2e(c)))

  /** Token count: whitespace tokens over normalized text — the
    * zero-allocation counting kernel (never materializes tokens).
    */
  def tokenCount(c: Column): Column = e2col(graft.expressions.TokenCount(col2e(c)))

  /** BPE-ish subword count estimate: word-boundary pieces plus an extra
    * piece per 4 chars of long words (a public rule-of-thumb approximation
    * of byte-pair tokenizers; deterministic, no vocab needed).
    */
  def subwordCountEstimate(c: Column): Column =
    aggregate(
      tokenize(c),
      lit(0),
      (acc, tok) => acc + lit(1) + (length(tok) / lit(4)).cast("int")
    )

  /** n-gram construction by zip-concatenating n shifted copies of the
    * element array.
    *
    * PERFORMANCE-CRITICAL SHAPE: a naive
    * `transform(sequence(0, size-n), i => f(arr, i))` lambda references the
    * upstream array expression per ELEMENT, and since higher-order
    * functions are interpreted (CodegenFallback) while CollapseProject
    * inlines the upstream chain, the full tokenize/normalize pipeline would
    * re-run once per output element (O(len²) regex work per row). Here each
    * `zip_with`/`filter` lambda touches only its lambda variables, so the
    * source array chain is evaluated O(n) times per row, not O(len).
    * Incomplete tail shingles are null (null-propagating `concat`) and
    * filtered out; `zip_with` pads the shorter side with nulls.
    */
  private def zipShingles(arr: Column, n: Int, sep: String): Column = {
    require(n >= 1)
    val shifted = (0 until n).map(i => slice(arr, lit(i + 1), greatest(size(arr) - i, lit(0))))
    val zipped = shifted.reduce((a, b) => zip_with(a, b, (x, y) => concat(x, lit(sep), y)))
    array_distinct(filter(zipped, x => x.isNotNull))
  }

  /** Word n-gram shingles (n consecutive tokens joined by a space). Empty
    * array when fewer than n tokens.
    */
  def shingles(c: Column, n: Int): Column = zipShingles(tokenize(c), n, " ")

  /** Character n-gram shingles over normalized text. */
  def charShingles(c: Column, n: Int): Column =
    zipShingles(split(normalizeText(c), ""), n, "")

  /** Email redaction — `regexp_replace(c, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', repl)`
    * as a codegen char scan (bit-compatible; see
    * [[graft.expressions.PiiScan]] for the regex thread-scalability
    * hazard this sidesteps).
    */
  def redactEmails(c: Column, repl: String = "[EMAIL]"): Column =
    e2col(graft.expressions.RedactEmails(col2e(c), repl))

  /** Dashed-phone redaction (`\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}`) — see
    * [[redactEmails]].
    */
  def redactPhones(c: Column, repl: String = "[PHONE]"): Column =
    e2col(graft.expressions.RedactPhones(col2e(c), repl))

  /** IPv4-shape redaction (`[0-9]{1,3}(\.[0-9]{1,3}){3}`) — see
    * [[redactEmails]].
    */
  def redactIpv4(c: Column, repl: String = "[IP]"): Column =
    e2col(graft.expressions.RedactIpv4(col2e(c), repl))

  /** Full PII redaction pass: emails, then phones, then IPv4 shapes —
    * sequential-rewrite semantics identical to the nested
    * `regexp_replace` chain, one fused codegen stage instead of three
    * serialized regex passes.
    */
  def piiRedact(c: Column): Column = redactIpv4(redactPhones(redactEmails(c)))

  /** Per-row PII match counts over the raw text:
    * `struct<n_emails, n_phones, n_ips>` (independent per-class counts —
    * the audit/reporting contract).
    */
  def piiCounts(c: Column): Column = e2col(graft.expressions.PiiCounts(col2e(c)))

  /** Markup → text extraction: script/style blocks and comments dropped,
    * tags → single space, the standard named entities decoded — one
    * fused codegen scan whose semantics are pinned to an explicit
    * regexp_replace + replace chain the oracle replays verbatim (see
    * [[graft.expressions.HtmlScan]] for the chain and the regex
    * thread-scalability hazard this sidesteps).
    */
  def htmlToText(c: Column): Column = e2col(graft.expressions.HtmlToText(col2e(c)))

  /** Count of `<[^>]*>` tag matches over the RAW markup — the markup-
    * density audit lane (`len(regexp_extract_all(s, '<[^>]*>'))`).
    */
  def htmlTagCount(c: Column): Column = e2col(graft.expressions.HtmlTagCount(col2e(c)))

  // Spark 4 Column↔Expression bridge
  private def col2e(c: Column) = org.apache.spark.sql.graftbridge.Bridge.expression(c)
  private def e2col(e: org.apache.spark.sql.catalyst.expressions.Expression) =
    org.apache.spark.sql.graftbridge.Bridge.column(e)

  /** Distinct xxhash64 values of the word n-gram shingles, fused into one
    * native pass per row (graft.expressions.ShingleHashes) — the MinHash
    * hot path. Equals `array_distinct(transform(shingles(c,n), xxhash64))`
    * but ~50× cheaper (see TextHashExpressions Scaladoc).
    */
  def shingleHashes(c: Column, n: Int): Column =
    e2col(graft.expressions.ShingleHashes(col2e(c), n, charLevel = false, distinct = true))

  /** Distinct xxhash64 values of the character n-gram shingles (fused). */
  def charShingleHashes(c: Column, n: Int): Column =
    e2col(graft.expressions.ShingleHashes(col2e(c), n, charLevel = true, distinct = true))

  /** ALL character n-gram window hashes in POSITION order (element i =
    * hash of the window starting at normalized-text offset i) — the
    * positional form exact-substring dedup needs (fused).
    */
  def charWindowHashes(c: Column, n: Int): Column =
    e2col(graft.expressions.ShingleHashes(col2e(c), n, charLevel = true, distinct = false))

  /** Content-defined chunks of the normalized token stream (fused; see
    * [[graft.expressions.CdcChunks]]): boundaries where the text's own
    * rolling hash passes the mask test, clamped to [minTokens,
    * maxTokens] — edit-robust chunking for dedup (an insertion re-chunks
    * only its neighborhood; fixed chunking shifts everything after it).
    */
  def cdcChunks(c: Column, hashW: Int, maskBits: Int, minTokens: Int, maxTokens: Int): Column =
    e2col(graft.expressions.CdcChunks(col2e(c), hashW, maskBits, minTokens, maxTokens))

  /** xxhash64 values of the token MULTISET (duplicates kept — SimHash
    * voting needs them), fused.
    */
  def tokenHashes(c: Column): Column =
    e2col(graft.expressions.ShingleHashes(col2e(c), 1, charLevel = false, distinct = false))

  private val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "for", "with", "was", "on", "are", "as", "at"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "los", "del", "las", "un", "por", "con", "una", "su", "para"),
    "de" -> Seq("der", "die", "und", "das", "von", "zu", "den", "mit", "ist", "im", "für", "auf", "des", "ein", "nicht"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "en", "un", "du", "une", "que", "est", "pour", "qui", "dans")
  )

  /** Language ID via stopword-hit ratios (the classic cheap n-gram/stopword
    * heuristic). Returns the language whose stopword list overlaps the
    * token set most; "und" (undetermined) when nothing matches.
    * Deterministic tie-break: lexicographic language code.
    */
  def langId(c: Column): Column = {
    val toks = tokenize(c)
    val scored = stopwords.toSeq.sortBy(_._1).map { case (lang, words) =>
      val hits = size(array_intersect(toks, array(words.map(lit): _*)))
      struct(hits.as("hits"), lit(lang).as("lang"))
    }
    // array_max on struct picks highest hits, then LAST lang lexicographically;
    // reverse sort order of lang for deterministic preference of earlier code.
    val best = array_max(array(scored: _*))
    // null text: hits are all null, `null <= 0` is null and the guard
    // would fall through to a language name — null-check first
    when(c.isNull || best.getField("hits") <= 0, lit("und")).otherwise(best.getField("lang"))
  }

  /** Remove a language's stopwords from the token stream (duplicates and
    * order of the remaining tokens preserved — unlike `array_except`,
    * which dedups). Per-token filter; the hot-path variant would hash
    * tokens first, but stopword removal is a curation step, not a shuffle
    * key producer.
    */
  def removeStopwords(c: Column, lang: String): Column = {
    val stops = stopwords.getOrElse(lang, Seq.empty)
    filter(tokenize(c), t => !t.isInCollection(stops))
  }

  /** Sentence split on terminal punctuation runs ([.!?]+), trimmed, empty
    * segments dropped. Operates on the RAW text (normalization would strip
    * the punctuation the splitter needs).
    */
  def sentences(c: Column): Column =
    e2col(graft.expressions.SentenceSplit(col2e(coalesce(c, lit("")))))

  /** Character-trigram language-ID profiles (common trigrams of each
    * language over NORMALIZED text — ASCII, single spaces; space-bearing
    * trigrams like " de" are the most discriminative). Public-knowledge
    * frequency tables, same spirit as the stopword lists.
    */
  private[graft] val trigramProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "ing", "ion", "tio", "ent", "for", "her", " th", "he "),
    "es" -> Seq("que", " de", "de ", "la ", " la", "cio", "ado", "os ", " co", "ent"),
    "de" -> Seq("der", "ein", "ich", "sch", "die", "und", "en ", "er ", "ch ", " ge"),
    "fr" -> Seq("les", " le", "de ", "ent", "que", " pa", "eur", "ais", "ons", " et")
  )

  /** Language ID via character-trigram profile hits — works on short texts
    * where whole-stopword matching is sparse. The document's trigram set
    * comes from the fused [[charShingleHashes]] expression; each profile
    * is pre-hashed at plan-build time (same XXH64), so the per-row work is
    * one native pass + four codegen'd array_intersects over 10-element
    * literal arrays. Tie-break matches [[langId]]: highest hits, then
    * lexicographically larger code; 'und' when nothing matches.
    */
  def langIdNgram(c: Column): Column = {
    val docTris = charShingleHashes(c, 3)
    val scored = trigramProfiles.toSeq.sortBy(_._1).map { case (lang, tris) =>
      val hashes = tris.map { t =>
        val b = t.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
        graft.expressions.TextHash.hashRange(b, 0, b.length)
      }
      val hits = size(array_intersect(docTris, typedlit(hashes)))
      struct(hits.as("hits"), lit(lang).as("lang"))
    }
    val best = array_max(array(scored: _*))
    when(c.isNull || best.getField("hits") <= 0, lit("und")).otherwise(best.getField("lang"))
  }

  /** Per-language trigram hit count (the langIdNgram scores, exposed for
    * inspection/oracles).
    */
  def trigramHits(c: Column, lang: String): Column = {
    val hashes = trigramProfiles(lang).map { t =>
      val b = t.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      graft.expressions.TextHash.hashRange(b, 0, b.length)
    }
    size(array_intersect(charShingleHashes(c, 3), typedlit(hashes)))
  }

  /** Composite quality score in [0,1]: mean of
    *  - length score  (1 at ≥200 chars, linear below),
    *  - alpha ratio   (alphanumeric+space chars / chars),
    *  - stopword hit  (any stopword present),
    *  - word-length sanity (mean token length in [2,12]).
    * Deterministic, expression-only — a practical pre-training quality
    * gate in the spirit of public pipeline heuristics (C4/Gopher rules).
    */
  def qualityScore(c: Column): Column = {
    val raw = coalesce(c, lit(""))
    val len = length(raw).cast("double")
    val lengthScore = least(len / lit(200.0), lit(1.0))
    val alphaCount =
      e2col(graft.expressions.AsciiAlnumSpaceCount(col2e(raw))).cast("double")
    val alphaRatio = when(len === 0, lit(0.0)).otherwise(alphaCount / len)
    val toks = tokenize(c)
    val allStops = array(stopwords.values.flatten.toSeq.distinct.map(lit): _*)
    val stopHit = when(size(array_intersect(toks, allStops)) > 0, lit(1.0)).otherwise(lit(0.0))
    val meanTokLen = when(size(toks) === 0, lit(0.0))
      .otherwise(aggregate(toks, lit(0L), (a, t) => a + length(t)).cast("double") / size(toks))
    val tokLenScore = when(meanTokLen >= 2 && meanTokLen <= 12, lit(1.0)).otherwise(lit(0.0))
    // raw double (no rounding): identical expression order across engines
    // makes this bitwise-reproducible; callers round for display
    (lengthScore + alphaRatio + stopHit + tokLenScore) / lit(4.0)
  }

  /** Gopher-style rule battery (Rae et al. 2021, arXiv:2112.11446 —
    * public paper): per-document filter verdicts as a struct of exact
    * stats and booleans — word count bounds, mean word length bounds,
    * distinct-word (repetition) floor, minimum distinct-stopword count,
    * and the conjunction `passes`. Every stat is an integer count or a
    * ratio of exact integers, so verdicts are bit-identical across
    * engines with NO rounding anywhere.
    *
    * PASS A MATERIALIZED ARRAY COLUMN (select `tokenize` into a column
    * first) — same CollapseProject trap as [[chunks]].
    */
  def gopherRules(toks: Column,
      minWords: Int = 50, maxWords: Int = 100000,
      minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
      minDistinctRatio: Double = 0.3, minStopwords: Int = 2): Column = {
    val nWords = size(toks).cast("long")
    val meanLen = when(size(toks) === 0, lit(0.0))
      .otherwise(aggregate(toks, lit(0L), (a, t) => a + length(t)).cast("double") / size(toks))
    val distinctRatio = when(size(toks) === 0, lit(0.0))
      .otherwise(size(array_distinct(toks)).cast("double") / size(toks))
    val allStops = array(stopwords.values.flatten.toSeq.distinct.map(lit): _*)
    val nStop = size(array_intersect(toks, allStops)).cast("long")
    val rWords = nWords >= minWords && nWords <= maxWords
    val rMeanLen = meanLen >= minMeanLen && meanLen <= maxMeanLen
    val rRepetition = distinctRatio >= minDistinctRatio
    val rStop = nStop >= minStopwords
    struct(
      nWords.as("n_words"),
      meanLen.as("mean_word_len"),
      distinctRatio.as("distinct_ratio"),
      nStop.as("n_stop"),
      rWords.as("r_word_count"),
      rMeanLen.as("r_mean_word_len"),
      rRepetition.as("r_repetition"),
      rStop.as("r_stop"),
      (rWords && rMeanLen && rRepetition && rStop).as("passes"))
  }

  /** Overlapping token chunks (the RAG/context-window chunking shape):
    * windows of `chunkSize` tokens starting every `step` tokens, joined by
    * single spaces; the final windows may be shorter; empty input → no
    * chunks. `step` < `chunkSize` gives overlap.
    *
    * PASS A MATERIALIZED ARRAY COLUMN (select `tokenize` into a column
    * first): the window lambdas reference `toks` per chunk, and inlining
    * the tokenize chain here would re-run it once per chunk
    * (CollapseProject + interpreted HOF — the §scale trap).
    */
  def chunkTokens(toks: Column, chunkSize: Int, step: Int): Column = {
    require(chunkSize >= 1 && step >= 1, s"bad chunking ($chunkSize, $step)")
    filter(
      transform(
        sequence(lit(0), greatest(size(toks) - 1, lit(0)), lit(step)),
        i => array_join(slice(toks, i + 1, lit(chunkSize)), " ")),
      c => c =!= "")
  }

  /** Word-n-gram repetition statistics, one fused pass per row
    * (graft.expressions.NgramRepetitionStats):
    * struct(n_ngrams, n_distinct, max_count, max_count_chars). The
    * building block of the Gopher/C4-style repetition filters — see
    * [[repetitionSignals]] for the derived fractions.
    */
  def ngramStats(c: Column, n: Int): Column =
    e2col(graft.expressions.NgramRepetitionStats(col2e(c), n))

  /** Line-repetition statistics over raw text, one fused pass per row
    * (graft.expressions.LineRepetitionStats):
    * struct(n_lines, n_distinct, dup_chars, total_chars). Lines = input
    * split on '\n' (pre-map other delimiters to '\n' for
    * paragraph/sentence granularity).
    */
  def lineStats(c: Column): Column =
    e2col(graft.expressions.LineRepetitionStats(col2e(c)))

  /** The standard repetition-filter signals as named columns (fractions in
    * [0,1], 0 for empty/degenerate docs):
    *  - `top_word_frac`        multiplicity of the most frequent token / token count
    *  - `top_bigram_char_frac` chars covered by the most frequent word bigram / non-space chars
    *  - `dup_trigram_frac`     duplicated word trigrams / trigram count
    * Public pipelines drop documents above thresholds (e.g. Gopher: most
    * common 2-gram > 0.20 of chars). All per-row, shuffle-free.
    */
  def repetitionSignals(c: Column): Seq[(String, Column)] = {
    val w = ngramStats(c, 1)
    val bg = ngramStats(c, 2)
    val tri = ngramStats(c, 3)
    // normalized text has exactly (tokens-1) single spaces: the non-space
    // char count is pure arithmetic, no regex strip needed
    val nospaceChars =
      (length(normalizeText(c)) - greatest(tokenCount(c) - 1, lit(0))).cast("double")
    def frac(num: Column, den: Column): Column =
      when(den <= 0, lit(0.0)).otherwise(num.cast("double") / den)
    Seq(
      "top_word_frac" -> frac(w.getField("max_count"), w.getField("n_ngrams").cast("double")),
      // overlapping occurrences share characters, so the raw ratio can
      // exceed 1 ("spam spam spam…"); clamp to the documented [0,1]
      "top_bigram_char_frac" -> least(frac(bg.getField("max_count_chars"), nospaceChars), lit(1.0)),
      "dup_trigram_frac" ->
        frac(tri.getField("n_ngrams") - tri.getField("n_distinct"), tri.getField("n_ngrams").cast("double")))
  }

  /** Document fingerprint: md5 of the canonical token stream. Two documents
    * with the same normalized content collide — the exact-dedup key.
    * md5 (not xxhash) so the oracle (DuckDB md5) reproduces it bit-for-bit.
    * The normalized text IS the tokens joined by single spaces, so no
    * split/re-join round-trip is needed.
    */
  def fingerprint(c: Column): Column = md5(normalizeText(c))

  /** 64-bit rolling-hash fingerprint (xxhash64 over normalized text) —
    * cheaper than md5 when oracle parity is not needed.
    */
  def fingerprint64(c: Column): Column = xxhash64(normalizeText(c))
}
