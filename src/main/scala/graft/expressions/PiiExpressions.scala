package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** PII char-scan kernels — email / dashed-phone / IPv4 detection and
  * redaction as single-pass byte scans.
  *
  * Why not `regexp_replace`: `java.util.regex.Matcher` is a measured
  * thread-scalability hazard on this class of VM (2% parallel efficiency
  * at 32 threads — SCALE.md round 10 finding), so a regex-based PII pass
  * over a 100 TB corpus runs effectively single-core per executor no
  * matter how it is partitioned. These kernels are allocation-light byte
  * scans that scale with cores, and they are BIT-COMPATIBLE with the
  * exact regexes below under `Matcher.replaceAll` semantics (leftmost
  * match, greedy with backtracking, resume after the replacement) —
  * proven by a randomized differential spec against `java.util.regex`
  * (PiiSpec) on top of the DuckDB oracle gates.
  *
  * The three pattern classes (the standard web-corpus PII redaction set):
  *  - email  `[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}`
  *  - phone  `\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}`   (international dashed form)
  *  - ipv4   `[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}`
  *
  * Scan-equivalence notes (the regex-to-scan reasoning, kept here because
  * it is the correctness argument):
  *  - email: a match must contain an '@'; the local part `[...]+` cannot
  *    consume '@', so the leftmost match start is the start of the maximal
  *    local-char run ending at the '@' (clamped to the scan resume point).
  *    The domain `[a-z0-9.-]+\.[a-z]{2,}` backtracks from the longest
  *    prefix of the maximal domain-char run, so the winning '.' is the
  *    RIGHTMOST dot (at offset ≥ 2 past the '@') followed by ≥ 2 letters;
  *    `[a-z]{2,}` then extends over the maximal letter run.
  *  - phone/ipv4: `[0-9]{k,3}` greedy followed by a literal ('-' or '.')
  *    can only close at the END of a digit run (every shorter backtrack
  *    lands on another digit), so each group matches iff its maximal run
  *    length is in [k,3] — except a trailing `{1,3}` group with no
  *    follower, which consumes min(3, run).
  *  - multi-byte UTF-8 is inert: every byte of a multi-byte sequence has
  *    the high bit set and can never collide with the ASCII classes.
  *
  * Reference frame: KNIME ships value-level transformation nodes over its
  * columnar tables (e.g. string replacers riding
  * `knime-core-columnar`'s `StringWriteData`); the redaction semantic
  * here is that capability re-expressed as a Spark-codegen scan.
  */
object PiiScan {

  @inline private def isLocal(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9') ||
      b == '.' || b == '_' || b == '%' || b == '+' || b == '-'

  @inline private def isDomain(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9') || b == '.' || b == '-'

  @inline private def isLetter(b: Byte): Boolean = b >= 'a' && b <= 'z'

  @inline private def isDigit(b: Byte): Boolean = b >= '0' && b <= '9'

  /** Leftmost email match starting at or after `from`. Returns
    * `(start, end)` packed as a Long (`start << 32 | end`, exclusive
    * end), or -1 if none.
    */
  def findEmail(in: Array[Byte], from: Int): Long = {
    val n = in.length
    var q = from
    while (q < n) {
      if (in(q) == '@' && q > from) {
        // maximal local-char run ending at q, clamped to the resume point
        var p = q
        while (p > from && isLocal(in(p - 1))) p -= 1
        if (p < q) {
          // maximal domain-char run after q
          var r = q + 1
          while (r < n && isDomain(in(r))) r += 1
          // rightmost '.' at index >= q+2 followed by >= 2 letters
          var d = r - 2
          var end = -1
          while (d >= q + 2 && end < 0) {
            if (in(d) == '.' && isLetter(in(d + 1)) && d + 2 < n && isLetter(in(d + 2))) {
              var e = d + 2
              while (e + 1 < n && isLetter(in(e + 1))) e += 1
              end = e + 1
            }
            d -= 1
          }
          if (end > 0) return (p.toLong << 32) | end.toLong
        }
      }
      q += 1
    }
    -1L
  }

  /** Leftmost phone match (`\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}`) at or after
    * `from`, packed like [[findEmail]].
    */
  def findPhone(in: Array[Byte], from: Int): Long = {
    val n = in.length
    var p = from
    while (p < n) {
      if (in(p) == '+') {
        var l1 = 0
        while (p + 1 + l1 < n && isDigit(in(p + 1 + l1))) l1 += 1
        if (l1 >= 1 && l1 <= 3 && p + 1 + l1 < n && in(p + 1 + l1) == '-') {
          val m = p + 2 + l1
          var l2 = 0
          while (m + l2 < n && isDigit(in(m + l2))) l2 += 1
          if (l2 == 3 && m + 3 < n && in(m + 3) == '-') {
            var l3 = 0
            while (m + 4 + l3 < n && isDigit(in(m + 4 + l3)) && l3 < 4) l3 += 1
            if (l3 == 4) return (p.toLong << 32) | (m + 8).toLong
          }
        }
      }
      p += 1
    }
    -1L
  }

  /** Leftmost IPv4-shaped match
    * (`[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}`) at or after
    * `from`, packed like [[findEmail]].
    */
  def findIpv4(in: Array[Byte], from: Int): Long = {
    val n = in.length
    var p = from
    while (p < n) {
      // positions INSIDE a digit run can still start a match (a run
      // longer than 3 matches from its last-3 suffix); tryIpv4At is
      // O(1)-bounded, so attempt every digit position like java's find()
      if (isDigit(in(p))) {
        val e = tryIpv4At(in, p)
        if (e > 0) return (p.toLong << 32) | e.toLong
      }
      p += 1
    }
    -1L
  }

  /** Match attempt at exactly `p`; returns exclusive end or -1. */
  private def tryIpv4At(in: Array[Byte], p: Int): Int = {
    val n = in.length
    var pos = p
    var g = 0
    while (g < 3) {
      var l = 0
      while (pos + l < n && isDigit(in(pos + l))) l += 1
      // greedy {1,3} then literal '.': only the full run can close, and
      // only when the run is <= 3 (shorter backtracks land on digits)
      if (l < 1 || l > 3 || pos + l >= n || in(pos + l) != '.') return -1
      pos += l + 1
      g += 1
    }
    var l = 0
    while (pos + l < n && isDigit(in(pos + l)) && l < 3) l += 1
    if (l < 1) return -1
    pos + l
  }

  /** `replaceAll`-equivalent rewrite using `find`: leftmost match,
    * replace, resume at the match end.
    */
  def redact(s: UTF8String, repl: Array[Byte],
      find: (Array[Byte], Int) => Long): UTF8String = {
    val in = s.getBytes
    var m = find(in, 0)
    if (m < 0) return s
    val out = new java.io.ByteArrayOutputStream(in.length + 16)
    var from = 0
    while (m >= 0) {
      val start = (m >>> 32).toInt
      val end = (m & 0xffffffffL).toInt
      out.write(in, from, start - from)
      out.write(repl, 0, repl.length)
      from = end
      m = if (end < in.length) find(in, end) else -1L
    }
    out.write(in, from, in.length - from)
    UTF8String.fromBytes(out.toByteArray)
  }

  /** Count of non-overlapping matches (the `replaceAll` match count). */
  def count(s: UTF8String, find: (Array[Byte], Int) => Long): Int = {
    val in = s.getBytes
    var c = 0
    var from = 0
    var m = find(in, 0)
    while (m >= 0) {
      c += 1
      from = (m & 0xffffffffL).toInt
      m = if (from < in.length) find(in, from) else -1L
    }
    c
  }
}

/** Email redaction — the `regexp_replace(text, EMAIL_RE, repl)` twin as a
  * codegen char scan (see [[PiiScan]] for the regex hazard + equivalence
  * argument).
  */
case class RedactEmails(child: Expression, repl: String) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult = TextHash.checkString(child.dataType)

  private lazy val replBytes = repl.getBytes("UTF-8")

  override def nullSafeEval(v: Any): Any = evalRedact(v.asInstanceOf[UTF8String])

  def evalRedact(s: UTF8String): UTF8String = PiiScan.redact(s, replBytes, PiiScan.findEmail)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("redactEmails", this, classOf[RedactEmails].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.evalRedact($a);")
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Dashed-phone redaction (`\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}`) — see
  * [[PiiScan]].
  */
case class RedactPhones(child: Expression, repl: String) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult = TextHash.checkString(child.dataType)

  private lazy val replBytes = repl.getBytes("UTF-8")

  override def nullSafeEval(v: Any): Any = evalRedact(v.asInstanceOf[UTF8String])

  def evalRedact(s: UTF8String): UTF8String = PiiScan.redact(s, replBytes, PiiScan.findPhone)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("redactPhones", this, classOf[RedactPhones].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.evalRedact($a);")
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** IPv4 redaction (`[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}`) —
  * see [[PiiScan]]. Shape-based (no 0-255 octet range check), matching
  * the standard redaction regex.
  */
case class RedactIpv4(child: Expression, repl: String) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult = TextHash.checkString(child.dataType)

  private lazy val replBytes = repl.getBytes("UTF-8")

  override def nullSafeEval(v: Any): Any = evalRedact(v.asInstanceOf[UTF8String])

  def evalRedact(s: UTF8String): UTF8String = PiiScan.redact(s, replBytes, PiiScan.findIpv4)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("redactIpv4", this, classOf[RedactIpv4].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.evalRedact($a);")
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Per-row PII match counts over the RAW text, all three classes in one
  * expression: `struct<n_emails:int, n_phones:int, n_ips:int>`. Counts
  * are INDEPENDENT per class (each pattern scanned against the original
  * text — the audit/reporting contract), unlike the sequential-rewrite
  * semantics of composing the Redact* expressions.
  */
case class PiiCounts(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_emails", IntegerType, nullable = false),
    StructField("n_phones", IntegerType, nullable = false),
    StructField("n_ips", IntegerType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = TextHash.checkString(child.dataType)

  override def nullSafeEval(v: Any): Any = evalCounts(v.asInstanceOf[UTF8String])

  def evalCounts(s: UTF8String): InternalRow = new GenericInternalRow(Array[Any](
    PiiScan.count(s, PiiScan.findEmail),
    PiiScan.count(s, PiiScan.findPhone),
    PiiScan.count(s, PiiScan.findIpv4)))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("piiCounts", this, classOf[PiiCounts].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.evalCounts($a);")
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}
