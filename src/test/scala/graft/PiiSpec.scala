package graft

import graft.expressions.PiiScan
import graft.functions.{TextFunctions => T}
import org.apache.spark.unsafe.types.UTF8String

/** Differential fuzz proof that the PiiScan char-scan kernels are
  * bit-compatible with `java.util.regex` — the correctness contract that
  * lets the gates keep their regexp-based DuckDB oracles while the engine
  * side runs scan kernels (the regex path is a measured 32-thread
  * scalability hazard on this VM class; SCALE.md round 10).
  */
class PiiSpec extends SparkSpec {
  import spark.implicits._

  private val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  private val PhoneRe = "\\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}"
  private val Ipv4Re = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  private def regexRedact(s: String, re: String, repl: String): String =
    java.util.regex.Pattern.compile(re).matcher(s)
      .replaceAll(java.util.regex.Matcher.quoteReplacement(repl))

  private def regexCount(s: String, re: String): Int = {
    val m = java.util.regex.Pattern.compile(re).matcher(s)
    var c = 0
    while (m.find()) c += 1
    c
  }

  private def kernelEmail(s: String) =
    PiiScan.redact(UTF8String.fromString(s), "[EMAIL]".getBytes, PiiScan.findEmail).toString
  private def kernelPhone(s: String) =
    PiiScan.redact(UTF8String.fromString(s), "[PHONE]".getBytes, PiiScan.findPhone).toString
  private def kernelIp(s: String) =
    PiiScan.redact(UTF8String.fromString(s), "[IP]".getBytes, PiiScan.findIpv4).toString

  test("hand-picked adversarial cases match java.util.regex for all three classes") {
    val cases = Seq(
      "", "@", "a@b", "a@b.c", "a@b.co", "a@b.co.uk extra", "x a@b.c2d.ef y",
      "a@@b.co", "a@b@c.com", ".@-.co", "UP@CASE.COM low@case.com",
      "tail dot a@b.co.", "a@b..co", "a@.co", "a@b.c-o", "a@b.cc5dd",
      "日本語 a@b.co 中文", "a+b_c.d%e@f-g.hi", "1234567@89.ab",
      "+1-555-1234", "++1-555-1234", "+12-555-12345", "+123-555-1234",
      "+1234-555-1234", "+1-5555-1234", "+1-55-1234", "+1-555-123",
      "a+1-555-1234b", "+1-555-1234+2-666-7890", "phone +99-123-4567!",
      "1.2.3.4", "11.22.33.44", "111.222.333.444", "1111.2.3.4",
      "1.2.3.4444", "1.2.3", "1.2.3.", ".1.2.3.4", "a1.2.3.4b",
      "1.2.3.4.5", "1.2.3.4.5.6.7.8", "10.0.42.7 and 192.168.0.255",
      "1..2.3.4", "12345.1.2.3.4", "999.999.999.9991",
      "mixed a@b.co +1-555-0042 10.1.2.3 end")
    for (s <- cases) {
      assert(kernelEmail(s) == regexRedact(s, EmailRe, "[EMAIL]"), s"email on <$s>")
      assert(kernelPhone(s) == regexRedact(s, PhoneRe, "[PHONE]"), s"phone on <$s>")
      assert(kernelIp(s) == regexRedact(s, Ipv4Re, "[IP]"), s"ipv4 on <$s>")
    }
  }

  test("randomized differential fuzz: 4000 strings from a PII-dense alphabet") {
    // deterministic seed; alphabet dense in the structural chars so that
    // matches and near-misses are both frequent
    val rnd = new scala.util.Random(42)
    val alphabet = "ab0159@.-+_% zZé"
    for (i <- 0 until 4000) {
      val len = rnd.nextInt(40)
      val s = Seq.fill(len)(alphabet(rnd.nextInt(alphabet.length))).mkString
      assert(kernelEmail(s) == regexRedact(s, EmailRe, "[EMAIL]"), s"email on <$s>")
      assert(kernelPhone(s) == regexRedact(s, PhoneRe, "[PHONE]"), s"phone on <$s>")
      assert(kernelIp(s) == regexRedact(s, Ipv4Re, "[IP]"), s"ipv4 on <$s>")
      val u = UTF8String.fromString(s)
      assert(PiiScan.count(u, PiiScan.findEmail) == regexCount(s, EmailRe), s"email count <$s>")
      assert(PiiScan.count(u, PiiScan.findPhone) == regexCount(s, PhoneRe), s"phone count <$s>")
      assert(PiiScan.count(u, PiiScan.findIpv4) == regexCount(s, Ipv4Re), s"ipv4 count <$s>")
    }
  }

  test("structured fuzz: concatenated near-PII fragments") {
    val rnd = new scala.util.Random(7)
    val frags = Seq(
      "a@b.co", "x@y", "@z.com", "user.name+tag@mail.example.org", "a@b.c",
      "+1-555-", "+12-345-6789", "9999", "+1-", "555-1234", "+123-456-78901",
      "10.0.0.1", "1.2.3", ".4.5.6.7", "256.256.256.256", "1234.5678",
      " ", "", "word", "0", "..", "--", "++", "@@")
    for (i <- 0 until 1500) {
      val s = Seq.fill(rnd.nextInt(6))(frags(rnd.nextInt(frags.length))).mkString
      assert(kernelEmail(s) == regexRedact(s, EmailRe, "[EMAIL]"), s"email on <$s>")
      assert(kernelPhone(s) == regexRedact(s, PhoneRe, "[PHONE]"), s"phone on <$s>")
      assert(kernelIp(s) == regexRedact(s, Ipv4Re, "[IP]"), s"ipv4 on <$s>")
    }
  }

  test("column API: piiRedact chains all three classes; piiCounts is independent per class") {
    val df = Seq(
      "reach me at jo.doe+x@corp.example.org or +1-555-0042 via 10.0.42.7",
      "no pii here",
      "two mails a@b.co c@d.ef and ips 1.2.3.4 5.6.7.8").toDF("t")
    val out = df.select(
      T.piiRedact($"t").as("r"),
      T.piiCounts($"t").as("c")).collect()
    assert(out(0).getString(0) == "reach me at [EMAIL] or [PHONE] via [IP]")
    assert(out(0).getStruct(1).toSeq == Seq(1, 1, 1))
    assert(out(1).getString(0) == "no pii here")
    assert(out(1).getStruct(1).toSeq == Seq(0, 0, 0))
    assert(out(2).getString(0) == "two mails [EMAIL] [EMAIL] and ips [IP] [IP]")
    assert(out(2).getStruct(1).toSeq == Seq(2, 0, 2))
    // null propagates
    val n = Seq[Option[String]](None).toDF("t").select(T.piiRedact($"t"), T.piiCounts($"t")).collect()
    assert(n(0).isNullAt(0) && n(0).isNullAt(1))
  }
}
