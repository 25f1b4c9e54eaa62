package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** HTML-to-text extraction as char-scan kernels — the web-corpus
  * ingestion step that precedes every text-quality / dedup / tokenize
  * pass, without a regex in the hot path (java.util.regex serializes
  * across threads on this VM class — SCALE.md round 10; an HTML strip
  * over 100 TB of crawl is exactly the pass that must scale with cores).
  *
  * The semantics are PINNED to an explicit sequential rewrite chain so
  * the DuckDB oracle can replay it verbatim (RE2 and java.util.regex
  * agree on every pattern here; a randomized differential spec vs
  * `java.util.regex` enforces bit-compatibility, HtmlSpec):
  *
  *  1. `(?is)<script\b[^>]*>.*?</script>` → ``  (global)
  *  2. `(?is)<style\b[^>]*>.*?</style>`  → ``  (global)
  *  3. `(?s)<!--.*?-->`                  → ``  (global)
  *  4. `<[^>]*>`                         → ` ` (global — tags separate
  *     words; gluing them would weld `…</td><td>…` into one token)
  *  5. literal entity decodes, in this exact order: `&lt;`→`<`,
  *     `&gt;`→`>`, `&quot;`→`"`, `&apos;`→`'`, `&#39;`→`'`,
  *     `&nbsp;`→` `, and `&amp;`→`&` LAST (the standard order that
  *     leaves double-encoded `&amp;lt;` as the literal text `&lt;`
  *     rather than re-decoding it).
  *
  * Each step is its own materialized pass (replaceAll semantics: leftmost
  * match, resume after the match in the ORIGINAL string, no rescanning of
  * spliced output within a pass) — equivalence with the regex chain is
  * per-pass by construction. Multi-byte UTF-8 is inert to every scan:
  * continuation bytes have the high bit set and never collide with the
  * ASCII metacharacters.
  *
  * Reference frame: KNIME's web/text readers normalize markup before
  * values reach `knime-core-columnar` string columns; this is that
  * ingestion step re-expressed as a fused Spark codegen scan.
  */
object HtmlScan {

  @inline private def lower(b: Byte): Byte =
    if (b >= 'A' && b <= 'Z') (b + 32).toByte else b

  @inline private def isWord(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') ||
      (b >= '0' && b <= '9') || b == '_'

  /** Case-insensitive match of lowercase `lit` at `p` (no bounds check
    * beyond length).
    */
  private def matchesCi(in: Array[Byte], p: Int, lit: Array[Byte]): Boolean = {
    if (p + lit.length > in.length) return false
    var i = 0
    while (i < lit.length) {
      if (lower(in(p + i)) != lit(i)) return false
      i += 1
    }
    true
  }

  /** One `(?is)<tag\b[^>]*>.*?</tag>` → "" global pass (`tag` lowercase
    * ASCII). Returns the input array unchanged (same reference) when
    * nothing matches.
    */
  def stripBlocks(in: Array[Byte], tag: Array[Byte]): Array[Byte] = {
    val n = in.length
    val close = new Array[Byte](tag.length + 3)
    close(0) = '<'; close(1) = '/'
    System.arraycopy(tag, 0, close, 2, tag.length)
    close(close.length - 1) = '>'
    var out: java.io.ByteArrayOutputStream = null
    var from = 0 // start of the not-yet-copied region
    var i = 0
    // quadratic-input guard: candidate starts only advance, so once one
    // close-search exhausts the remainder, every later candidate fails
    // too — without this, a doc stuffed with unclosed openers costs
    // O(n · starts) (the decode-bomb class the fuzz specs police).
    // Output is unchanged: failed candidates are skipped either way.
    var noCloseRemains = false
    var noGtRemains = false // same argument for the '>' scan
    // memoized '>' position: candidate attribute scans start at
    // monotonically advancing j, and the region (prev j, gtAt) holds no
    // '>' — so any later candidate with j' <= gtAt can reuse gtAt
    // directly. Without this, repeated openers sharing one distant '>'
    // cost O(n · candidates) in the attribute scan alone (the gap the
    // close-literal memoization left open).
    var gtAt = -1
    while (i < n) {
      if (in(i) == '<' && !noGtRemains && matchesCi(in, i + 1, tag) &&
          (i + 1 + tag.length >= n || !isWord(in(i + 1 + tag.length)))) {
        // attribute run [^>]* then '>'
        var j = i + 1 + tag.length
        if (gtAt >= j) j = gtAt
        else {
          while (j < n && in(j) != '>') j += 1
          if (j < n) gtAt = j
        }
        if (j >= n) noGtRemains = true
        if (j < n && !noCloseRemains) {
          // non-greedy body: the EARLIEST closing literal
          var k = j + 1
          var closeAt = -1
          while (closeAt < 0 && k + close.length <= n) {
            if (in(k) == '<' && matchesCi(in, k, close)) closeAt = k
            k += 1
          }
          if (closeAt >= 0) {
            if (out == null) out = new java.io.ByteArrayOutputStream(n)
            out.write(in, from, i - from)
            from = closeAt + close.length
            i = from
          } else { noCloseRemains = true; i += 1 }
        } else i += 1 // no '>' before EOF, or no close can remain
      } else i += 1
    }
    if (out == null) in
    else { out.write(in, from, n - from); out.toByteArray }
  }

  /** One `(?s)<!--.*?-->` → "" global pass. */
  def stripComments(in: Array[Byte]): Array[Byte] = {
    val n = in.length
    var out: java.io.ByteArrayOutputStream = null
    var from = 0
    var i = 0
    var noCloseRemains = false // see stripBlocks — same quadratic guard
    while (i + 4 <= n) {
      if (in(i) == '<' && in(i + 1) == '!' && in(i + 2) == '-' && in(i + 3) == '-' &&
          !noCloseRemains) {
        var k = i + 4
        var closeAt = -1
        while (closeAt < 0 && k + 3 <= n) {
          if (in(k) == '-' && in(k + 1) == '-' && in(k + 2) == '>') closeAt = k
          k += 1
        }
        if (closeAt >= 0) {
          if (out == null) out = new java.io.ByteArrayOutputStream(n)
          out.write(in, from, i - from)
          from = closeAt + 3
          i = from
        } else { noCloseRemains = true; i += 1 }
      } else i += 1
    }
    if (out == null) in
    else { out.write(in, from, n - from); out.toByteArray }
  }

  /** One `<[^>]*>` → " " global pass; also counts matches (the tag-count
    * audit lane reuses the scan). Returns (result, count).
    */
  def stripTags(in: Array[Byte]): (Array[Byte], Int) = {
    val n = in.length
    var out: java.io.ByteArrayOutputStream = null
    var from = 0
    var i = 0
    var c = 0
    while (i < n) {
      if (in(i) == '<') {
        var j = i + 1
        while (j < n && in(j) != '>') j += 1
        if (j < n) {
          if (out == null) out = new java.io.ByteArrayOutputStream(n)
          out.write(in, from, i - from)
          out.write(' ')
          c += 1
          from = j + 1
          i = from
        } else i = n // no '>' until EOF: no later '<' can match either
      } else i += 1
    }
    if (out == null) (in, 0)
    else { out.write(in, from, n - from); (out.toByteArray, c) }
  }

  /** One literal find→replace pass (String.replace semantics — identical
    * to DuckDB `replace()`).
    */
  def replaceLiteral(in: Array[Byte], find: Array[Byte], repl: Array[Byte]): Array[Byte] = {
    val n = in.length
    var out: java.io.ByteArrayOutputStream = null
    var from = 0
    var i = 0
    while (i + find.length <= n) {
      var m = 0
      while (m < find.length && in(i + m) == find(m)) m += 1
      if (m == find.length) {
        if (out == null) out = new java.io.ByteArrayOutputStream(n)
        out.write(in, from, i - from)
        out.write(repl, 0, repl.length)
        from = i + find.length
        i = from
      } else i += 1
    }
    if (out == null) in
    else { out.write(in, from, n - from); out.toByteArray }
  }

  private val Script = "script".getBytes("UTF-8")
  private val Style = "style".getBytes("UTF-8")
  private val Entities: Array[(Array[Byte], Array[Byte])] = Array(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&apos;" -> "'",
    "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&" // amp LAST — see scaladoc
  ).map { case (f, r) => f.getBytes("UTF-8") -> r.getBytes("UTF-8") }

  /** The full extraction chain (steps 1–5 above). */
  def toText(s: UTF8String): UTF8String = {
    var b = stripBlocks(s.getBytes, Script)
    b = stripBlocks(b, Style)
    b = stripComments(b)
    b = stripTags(b)._1
    var i = 0
    while (i < Entities.length) {
      b = replaceLiteral(b, Entities(i)._1, Entities(i)._2)
      i += 1
    }
    UTF8String.fromBytes(b)
  }

  /** Count of `<[^>]*>` matches on the RAW markup (the audit lane —
    * DuckDB: `len(regexp_extract_all(s, '<[^>]*>'))`).
    */
  def tagCount(s: UTF8String): Int = stripTags(s.getBytes)._2
}

/** Markup → text extraction (the 5-step pinned chain — see [[HtmlScan]]). */
case class HtmlToText(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult = TextHash.checkString(child.dataType)

  override def nullSafeEval(v: Any): Any = evalHtml(v.asInstanceOf[UTF8String])

  def evalHtml(s: UTF8String): UTF8String = HtmlScan.toText(s)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("htmlToText", this, classOf[HtmlToText].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.evalHtml($a);")
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Tag count over raw markup — see [[HtmlScan.tagCount]]. */
case class HtmlTagCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult = TextHash.checkString(child.dataType)

  override def nullSafeEval(v: Any): Any = evalCount(v.asInstanceOf[UTF8String])

  def evalCount(s: UTF8String): Int = HtmlScan.tagCount(s)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("htmlTagCount", this, classOf[HtmlTagCount].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.evalCount($a);")
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}
