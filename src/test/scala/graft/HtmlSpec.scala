package graft

import graft.expressions.HtmlScan
import org.apache.spark.unsafe.types.UTF8String

/** HTML extraction kernels vs the pinned java.util.regex chain they are
  * bit-compatible with (see HtmlScan scaladoc) — hand-built edge cases
  * plus a randomized differential fuzz over markup soup.
  */
class HtmlSpec extends SparkSpec {
  import java.util.regex.Pattern

  private val pScript = Pattern.compile("(?is)<script\\b[^>]*>.*?</script>")
  private val pStyle = Pattern.compile("(?is)<style\\b[^>]*>.*?</style>")
  private val pComment = Pattern.compile("(?s)<!--.*?-->")
  private val pTag = Pattern.compile("<[^>]*>")

  private def regexChain(s: String): String = {
    var t = pScript.matcher(s).replaceAll("")
    t = pStyle.matcher(t).replaceAll("")
    t = pComment.matcher(t).replaceAll("")
    t = pTag.matcher(t).replaceAll(" ")
    t.replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"")
      .replace("&apos;", "'").replace("&#39;", "'").replace("&nbsp;", " ")
      .replace("&amp;", "&")
  }

  private def regexTagCount(s: String): Int = {
    val m = pTag.matcher(s)
    var c = 0
    while (m.find()) c += 1
    c
  }

  private def kernel(s: String): String =
    HtmlScan.toText(UTF8String.fromString(s)).toString

  private def check(s: String): Unit = {
    assert(kernel(s) == regexChain(s), s"toText diverges on: [$s]")
    assert(HtmlScan.tagCount(UTF8String.fromString(s)) == regexTagCount(s),
      s"tagCount diverges on: [$s]")
  }

  test("hand cases: blocks, comments, entities, edge shapes") {
    check("<html><body><p>hello <b>world</b></p></body></html>")
    check("<script>var a = 1 < 2;</script>after")
    check("<SCRIPT TYPE=\"x\">UPPER</SCRIPT>kept")
    check("<script>unclosed rest is text <p>tag</p>")
    check("<style>p { color: red }</style>text")
    check("a<!-- comment with <b>tags</b> -->b")
    check("a<!-- unclosed comment <p>x</p>")
    check("&amp; &lt; &gt; &quot; &apos; &#39; &nbsp;")
    check("double-encoded &amp;lt; stays literal")
    check("<scriptx>not a script block</scriptx>")   // \b: word char after tag name
    check("<script-ish attr>matches per regex</script>") // \b: '-' is a boundary
    check("unterminated tag < with spaces and no close")
    check("<>empty tag<>")
    check("multibyte 日本語 <p>é</p> ok")
    check("<sty<script>inner</script>le>spliced never rescanned")
    check("<script><script>nested open</script>tail</script>")
    check("")
    check("<")
    check("-->")
    check("< p >spaced tag< / p >")
  }

  test("differential fuzz: 20k random markup soups match the regex chain") {
    val pieces = Array(
      "<script>", "</script>", "<SCRIPT a=\"b\">", "<script >", "<scripty>",
      "<style>", "</style>", "<STYLE>", "<!--", "-->", "<!-- x -->",
      "<p>", "</p>", "<td>", "</td>", "<b", ">", "<", "</", "<br/>",
      "&amp;", "&lt;", "&gt;", "&quot;", "&apos;", "&#39;", "&nbsp;",
      "&amp;lt;", "&", ";", "word", "x=1", "1<2", "a>b", " ", "\n", "\t",
      "é", "日本", "\"", "'", "--", "!")
    val rnd = new scala.util.Random(4242)
    var i = 0
    while (i < 20000) {
      val n = rnd.nextInt(20)
      val s = Seq.fill(n)(pieces(rnd.nextInt(pieces.length))).mkString
      check(s)
      i += 1
    }
  }

  test("DataFrame path: fused expression, null-safe") {
    import spark.implicits._
    import graft.functions.TextFunctions
    val df = Seq(
      (1L, "<p>a&amp;b</p>"),
      (2L, null.asInstanceOf[String])
    ).toDF("id", "h")
    val out = df.select($"id", TextFunctions.htmlToText($"h").as("t"),
        TextFunctions.htmlTagCount($"h").as("c"))
      .orderBy($"id").collect()
    assert(out(0).getString(1) == " a&b " && out(0).getInt(2) == 2)
    assert(out(1).isNullAt(1) && out(1).isNullAt(2))
  }
}
