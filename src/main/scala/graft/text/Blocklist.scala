package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-pattern blocklist matching — the C4/Gopher-style "bad phrase"
  * curation stage: given a list of terms/phrases, count every occurrence
  * of every term in one pass per document and filter/score on the result.
  *
  * Scale design: the naive formulation is one `regexp_count`/`contains`
  * pass PER TERM — a 10k-term blocklist over 100 TB would mean 10k scans
  * of the corpus (and `java.util.regex` additionally serializes across
  * threads on this VM class — SCALE.md round 10). Here the term list is
  * compiled ONCE into an Aho–Corasick automaton ([[AcAutomaton]]: trie +
  * BFS failure links flattened into a complete byte-transition DFA) that
  * rides inside a codegen'd expression: one automaton walk per document,
  * O(bytes + matches) regardless of term count, with the read-only
  * transition arrays shared across all executor threads. This is the
  * standard multi-pattern kernel (Aho & Corasick 1975, public domain
  * algorithm) re-expressed as a Catalyst expression.
  *
  * Matching is over RAW UTF-8 bytes (case-sensitive, substring semantics,
  * self-overlapping occurrences all counted) — normalize/lowercase the
  * column first for case-insensitive matching. Multi-byte UTF-8 is safe:
  * byte-level matches of valid UTF-8 patterns can only align on
  * character boundaries (UTF-8 self-synchronization).
  *
  * Reference frame: the reference engine has no text operators; its
  * escape hatch is the per-row mapper (reference
  * org.knime.core.data.columnar/.../virtual/ColumnarVirtualTable.java:447-451);
  * this is that row-wise-map surface carrying a compiled automaton.
  */
object Blocklist {

  /** Per-term hit counts as `array<int>` aligned with `terms` order —
    * one automaton pass per row.
    */
  def hits(c: Column, terms: Seq[String]): Column =
    e2col(graft.expressions.BlocklistHits(col2e(c), terms))

  /** Total hit count across all terms — the filter-threshold scalar. */
  def totalHits(c: Column, terms: Seq[String]): Column =
    e2col(graft.expressions.BlocklistCount(col2e(c), terms))

  /** Redact every blocklisted term (non-overlapping, leftmost-start,
    * pattern-order priority — `regexp_replace(c, 't1|t2|…', repl)`
    * semantics in one automaton pass). The softer sibling of
    * [[filterClean]] for terms that should be masked, not drop the doc.
    */
  def redactTerms(c: Column, terms: Seq[String], repl: String = "[BLOCKED]"): Column =
    e2col(graft.expressions.BlocklistRedact(col2e(c), terms, repl))

  /** Corpus-level blocklist report: per term, total occurrences and the
    * number of documents containing it. One scan + one shuffle on the
    * (tiny) term dimension.
    */
  def report(docs: DataFrame, textCol: String, terms: Seq[String]): DataFrame = {
    val termArr = array(terms.map(lit): _*)
    docs
      .select(hits(col(textCol), terms).as("__h"))
      .select(posexplode(col("__h")).as(Seq("__i", "n")))
      .select(element_at(termArr, col("__i") + 1).as("term"), col("n"))
      .groupBy(col("term"))
      .agg(
        sum(col("n")).as("n_hits"),
        sum(when(col("n") > 0, 1L).otherwise(0L)).as("n_docs"))
  }

  /** The filter stage: keep documents with at most `maxHits` blocklist
    * occurrences (0 = the C4 drop-if-any policy). Narrow, shuffle-free.
    */
  def filterClean(docs: DataFrame, textCol: String, terms: Seq[String],
      maxHits: Int = 0): DataFrame =
    docs.where(totalHits(col(textCol), terms) <= maxHits)

  private def col2e(c: Column) = org.apache.spark.sql.graftbridge.Bridge.expression(c)
  private def e2col(e: org.apache.spark.sql.catalyst.expressions.Expression) =
    org.apache.spark.sql.graftbridge.Bridge.column(e)
}

/** Aho–Corasick automaton over bytes, flattened to a complete DFA:
  * `delta` is a `nodes × 256` transition table, `term(s)` the pattern
  * index ending at state `s` (or -1), `dictLink(s)` the nearest proper
  * suffix state that is terminal (0 = none). All arrays are immutable
  * after construction — safe to share across threads with no locking
  * (the property java.util.regex lacks in practice on this VM class).
  */
final class AcAutomaton(patternsIn: Seq[Array[Byte]],
    maxNodes: Int = AcAutomaton.MaxTrieNodes) extends Serializable {
  require(patternsIn.nonEmpty, "AcAutomaton: empty pattern list")
  require(patternsIn.forall(_.nonEmpty), "AcAutomaton: empty pattern")

  val nPatterns: Int = patternsIn.length

  private val (delta, term, dictLink) = {
    val pats = patternsIn.toArray
    // trie build with growable arrays
    val buf = scala.collection.mutable.ArrayBuffer(new Array[Int](256))
    val trm = scala.collection.mutable.ArrayBuffer(-1)
    java.util.Arrays.fill(buf(0), -1)
    var pi = 0
    while (pi < pats.length) {
      var s = 0
      val p = pats(pi)
      var i = 0
      while (i < p.length) {
        val c = p(i) & 0xff
        if (buf(s)(c) < 0) {
          // fail fast on automaton size (the simHashPairs/knnClassify
          // guard pattern): the flat 256-wide DFA costs ~2 KB of executor
          // heap per trie node (goto row + flattened transition row), and
          // the automaton may be rebuilt per task — a megabyte-scale
          // pattern set silently allocating gigabytes must be a measured
          // decision (a goto-hashmap variant), not a surprise. The check
          // runs DURING the build, before the fat arrays grow past the
          // bound; the default (128k nodes ≈ 256 MB peak) admits 10k+
          // phrase curation blocklists — raise `maxNodes` explicitly to
          // accept more.
          if (buf.length >= maxNodes) throw new IllegalArgumentException(
            s"AcAutomaton: pattern set needs more than $maxNodes trie nodes " +
              s"(~2 KB heap each, ~${maxNodes.toLong * 2048 / (1 << 20)} MB) - " +
              "pass a larger maxNodes to accept the memory cost knowingly")
          val fresh = new Array[Int](256)
          java.util.Arrays.fill(fresh, -1)
          buf += fresh
          trm += -1
          buf(s)(c) = buf.length - 1
        }
        s = buf(s)(c)
        i += 1
      }
      require(trm(s) < 0, s"AcAutomaton: duplicate pattern at index $pi")
      trm(s) = pi
      pi += 1
    }
    val n = buf.length
    val d = new Array[Int](n * 256)
    val fail = new Array[Int](n)
    val dict = new Array[Int](n)
    val t = trm.toArray
    // BFS: complete the root, then propagate failure + dict links while
    // flattening missing transitions via the (already complete) fail state
    val queue = new java.util.ArrayDeque[Int]()
    var c = 0
    while (c < 256) {
      val v = buf(0)(c)
      d(c) = if (v < 0) 0 else v
      if (v >= 0) { fail(v) = 0; queue.add(v) }
      c += 1
    }
    while (!queue.isEmpty) {
      val u = queue.poll()
      dict(u) = if (t(fail(u)) >= 0) fail(u) else dict(fail(u))
      var c2 = 0
      while (c2 < 256) {
        val v = buf(u)(c2)
        if (v < 0) d(u * 256 + c2) = d(fail(u) * 256 + c2)
        else {
          fail(v) = d(fail(u) * 256 + c2)
          d(u * 256 + c2) = v
          queue.add(v)
        }
        c2 += 1
      }
    }
    (d, t, dict)
  }

  /** Add every match's count into `out` (length [[nPatterns]]). */
  def countsInto(text: Array[Byte], out: Array[Int]): Unit = {
    var s = 0
    var i = 0
    while (i < text.length) {
      s = delta(s * 256 + (text(i) & 0xff))
      var u = if (term(s) >= 0) s else dictLink(s)
      while (u > 0) {
        out(term(u)) += 1
        u = dictLink(u)
      }
      i += 1
    }
  }

  /** Total match count across all patterns. */
  def totalCount(text: Array[Byte]): Int = {
    var s = 0
    var i = 0
    var c = 0
    while (i < text.length) {
      s = delta(s * 256 + (text(i) & 0xff))
      var u = if (term(s) >= 0) s else dictLink(s)
      while (u > 0) { c += 1; u = dictLink(u) }
      i += 1
    }
    c
  }

  private val lens: Array[Int] = patternsIn.map(_.length).toArray

  /** Non-overlapping redaction, bit-compatible with
    * `Matcher.replaceAll` over the alternation `t1|t2|…` (both
    * java.util.regex and RE2 use leftmost-start, PATTERN-ORDER-priority
    * alternation semantics — NOT longest-match): collect every AC match,
    * sort by (start, pattern index) — one packed Long comparison — then
    * greedily take the first match at or after the cursor and resume at
    * its end. Terms must therefore be listed in the same order as the
    * oracle's alternation.
    */
  def redact(text: Array[Byte], repl: Array[Byte]): Array[Byte] = {
    // collect packed (start << 32 | patternIdx); starts and idx are
    // non-negative so Long order == (start, idx) lexicographic order
    var ms: Array[Long] = new Array[Long](8)
    var nMs = 0
    var s = 0
    var i = 0
    while (i < text.length) {
      s = delta(s * 256 + (text(i) & 0xff))
      var u = if (term(s) >= 0) s else dictLink(s)
      while (u > 0) {
        val idx = term(u)
        val start = i - lens(idx) + 1
        if (nMs == ms.length) ms = java.util.Arrays.copyOf(ms, nMs * 2)
        ms(nMs) = (start.toLong << 32) | idx.toLong
        nMs += 1
        u = dictLink(u)
      }
      i += 1
    }
    if (nMs == 0) return text
    java.util.Arrays.sort(ms, 0, nMs)
    val out = new java.io.ByteArrayOutputStream(text.length + 16)
    var cursor = 0
    var m = 0
    while (m < nMs) {
      val start = (ms(m) >>> 32).toInt
      if (start >= cursor) {
        val idx = (ms(m) & 0xffffffffL).toInt
        out.write(text, cursor, start - cursor)
        out.write(repl, 0, repl.length)
        cursor = start + lens(idx)
      }
      m += 1
    }
    out.write(text, cursor, text.length - cursor)
    out.toByteArray
  }
}

object AcAutomaton {
  /** Default trie-node bound (~256 MB peak executor heap) — see the
    * in-build guard.
    */
  val MaxTrieNodes: Int = 131072
}
