package graft

import graft.text.{AcAutomaton, Blocklist}
import org.apache.spark.sql.functions._

/** AcAutomaton differential proof vs a naive all-occurrences substring
  * counter, plus the Blocklist column/DataFrame API surface.
  */
class BlocklistSpec extends SparkSpec {
  import spark.implicits._

  /** All (possibly self-overlapping) occurrences of `p` in `t`. */
  private def naiveCount(t: Array[Byte], p: Array[Byte]): Int = {
    var c = 0
    var i = 0
    while (i + p.length <= t.length) {
      var j = 0
      while (j < p.length && t(i + j) == p(j)) j += 1
      if (j == p.length) c += 1
      i += 1
    }
    c
  }

  private def check(text: String, terms: Seq[String]): Unit = {
    val ac = new AcAutomaton(terms.map(_.getBytes("UTF-8")))
    val out = new Array[Int](terms.length)
    val bytes = text.getBytes("UTF-8")
    ac.countsInto(bytes, out)
    val expect = terms.map(p => naiveCount(bytes, p.getBytes("UTF-8")))
    assert(out.toSeq == expect, s"counts on <$text> terms=$terms")
    assert(ac.totalCount(bytes) == expect.sum, s"total on <$text> terms=$terms")
  }

  test("adversarial pattern sets: overlaps, nesting, suffix/prefix chains, UTF-8") {
    check("aaaa", Seq("aa"))                       // self-overlap: 3
    check("aaaa", Seq("a", "aa", "aaa", "aaaa"))   // nested prefixes
    check("ababab", Seq("ab", "ba", "abab"))       // cross-overlapping
    check("xabcx", Seq("abc", "bc", "c"))          // suffix chain fires together
    check("", Seq("a"))
    check("abc", Seq("abcd"))                      // longer than text
    check("ééé", Seq("é", "éé"))                   // multi-byte self-overlap
    check("the catcat sat", Seq("cat", "catcat", "at s"))
    check("mississippi", Seq("ss", "issi", "ppi", "i"))
  }

  test("randomized differential fuzz: 3000 cases over a dense alphabet") {
    val rnd = new scala.util.Random(42)
    for (_ <- 0 until 3000) {
      val alpha = "ab c"
      val text = Seq.fill(rnd.nextInt(60))(alpha(rnd.nextInt(alpha.length))).mkString
      val nTerms = 1 + rnd.nextInt(5)
      val terms = Iterator.continually(
        Seq.fill(1 + rnd.nextInt(4))(alpha(rnd.nextInt(alpha.length))).mkString)
        .distinct.take(nTerms).toSeq
      check(text, terms)
    }
  }

  test("duplicate or empty patterns are rejected") {
    intercept[IllegalArgumentException](new AcAutomaton(Seq("a", "a").map(_.getBytes)))
    intercept[IllegalArgumentException](new AcAutomaton(Seq("a", "").map(_.getBytes)))
    intercept[IllegalArgumentException](new AcAutomaton(Nil))
  }

  test("size guard: a pattern set past the node bound fails fast, a realistic one builds") {
    // one chain pattern = one node per byte → a tiny explicit bound trips
    val big = Array.fill(200)('a'.toByte)
    val ex = intercept[IllegalArgumentException](
      new AcAutomaton(Seq(big), maxNodes = 100))
    assert(ex.getMessage.contains("maxNodes"), ex.getMessage)
    // a 10k-phrase blocklist (realistic curation scale) builds and matches
    val terms = (0 until 10000).map(i => s"badphrase$i ")
    val ac = new AcAutomaton(terms.map(_.getBytes("UTF-8")))
    val out = new Array[Int](terms.length)
    ac.countsInto("x badphrase7 y badphrase42 badphrase42 z".getBytes, out)
    assert(out(7) == 1 && out(42) == 2 && out.sum == 3)
  }

  test("redact: bit-compatible with alternation-regex replaceAll (fuzz)") {
    def regexRedact(s: String, terms: Seq[String], repl: String): String =
      java.util.regex.Pattern.compile(terms.map(java.util.regex.Pattern.quote).mkString("|"))
        .matcher(s).replaceAll(java.util.regex.Matcher.quoteReplacement(repl))
    def acRedact(s: String, terms: Seq[String], repl: String): String = {
      val ac = new AcAutomaton(terms.map(_.getBytes("UTF-8")))
      new String(ac.redact(s.getBytes("UTF-8"), repl.getBytes("UTF-8")), "UTF-8")
    }
    // hand-picked: priority vs length, suffix/prefix nesting, overlap
    val cases = Seq(
      ("bad phrase", Seq("bad", "bad phrase")),   // shorter listed first wins
      ("bad phrase", Seq("bad phrase", "bad")),   // longer listed first wins
      ("ab", Seq("b", "ab")),                     // leftmost start beats priority
      ("aaaa", Seq("aa", "aaa")),
      ("xabcx", Seq("abc", "bc", "c")),
      ("the catcat sat", Seq("catcat", "cat")),
      ("", Seq("a")), ("no hits", Seq("zz")))
    for ((s, ts) <- cases)
      assert(acRedact(s, ts, "[X]") == regexRedact(s, ts, "[X]"), s"<$s> $ts")
    val rnd = new scala.util.Random(11)
    val alpha = "ab c"
    for (_ <- 0 until 2500) {
      val text = Seq.fill(rnd.nextInt(50))(alpha(rnd.nextInt(alpha.length))).mkString
      val terms = Iterator.continually(
        Seq.fill(1 + rnd.nextInt(4))(alpha(rnd.nextInt(alpha.length))).mkString)
        .distinct.take(1 + rnd.nextInt(4)).toSeq
      assert(acRedact(text, terms, "[X]") == regexRedact(text, terms, "[X]"),
        s"<$text> $terms")
    }
  }

  test("report + filterClean over a DataFrame") {
    val docs = Seq(
      (0L, "s0", "clean text here"),
      (1L, "s0", "bad phrase appears: bad phrase"),
      (2L, "s1", "one bad phrase only"),
      (3L, "s1", "nothing to see")).toDF("doc_id", "source", "text")
    val terms = Seq("bad phrase", "see")
    val rep = Blocklist.report(docs, "text", terms)
      .orderBy("term").collect()
    assert(rep.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq(("bad phrase", 3L, 2L), ("see", 1L, 1L)))
    val kept = Blocklist.filterClean(docs, "text", terms, maxHits = 0)
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(0L))
    val kept1 = Blocklist.filterClean(docs, "text", terms, maxHits = 1)
      .select("doc_id").as[Long].collect().sorted
    assert(kept1.toSeq == Seq(0L, 2L, 3L))
  }
}
