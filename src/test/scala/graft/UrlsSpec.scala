package graft

import graft.text.Urls
import org.apache.spark.sql.functions._

/** URL canonicalization laws: hand-built shapes for every chain step,
  * idempotence, host extraction.
  */
class UrlsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(us: String*): Seq[String] =
    us.toDF("u").select(Urls.canonicalize($"u").as("c"))
      .collect().map(_.getString(0)).toSeq

  test("chain steps: case, fragment, tracking params, default ports") {
    assert(canon("HTTP://Example.COM/Path/File.html") ==
      Seq("http://example.com/Path/File.html"))
    assert(canon("https://a.example.org/x#frag-with-#-inside") ==
      Seq("https://a.example.org/x"))
    assert(canon("http://h.io/p?utm_source=x&id=7&utm_campaign=y") ==
      Seq("http://h.io/p?id=7"))
    assert(canon("http://h.io/p?utm_source=x&utm_medium=y") == Seq("http://h.io/p"))
    assert(canon("http://h.io/p?id=9&fbclid=abc") == Seq("http://h.io/p?id=9"))
    assert(canon("http://h.io/p?gclid=1&id=2") == Seq("http://h.io/p?id=2"))
    assert(canon("http://Example.com:80/a") == Seq("http://example.com/a"))
    assert(canon("https://Example.com:443?q=1") == Seq("https://example.com?q=1"))
    assert(canon("http://example.com:8080/a") == Seq("http://example.com:8080/a"))
    assert(canon("https://example.com:443") == Seq("https://example.com"))
    assert(canon("  http://ws.example.com/x  ") == Seq("http://ws.example.com/x"))
    // path/query case preserved; only scheme://authority folds
    assert(canon("HTTPS://WWW.Example.COM/QUERY?Key=Value") ==
      Seq("https://www.example.com/QUERY?Key=Value"))
    // non-URL strings: trimmed, otherwise untouched
    assert(canon(" not a url ") == Seq("not a url"))
  }

  test("idempotence: canonicalize twice equals once") {
    val samples = Seq(
      "HTTP://Example.COM:80/Path?utm_source=a&id=1&utm_x=2#f",
      "https://CDN.Example.org:443/img.png?fbclid=z",
      "http://plain.example.net/a/b/c",
      "http://h.io/p?utm_only=1",
      "noscheme/relative?utm_source=x",
      "ftp://Mixed.Case.Host/File")
    val once = canon(samples: _*)
    val twice = canon(once: _*)
    assert(once == twice, s"not idempotent:\n$once\nvs\n$twice")
  }

  test("host extraction on canonical urls") {
    val out = Seq(
      "HTTP://Example.COM:80/a",
      "https://sub.d.example.org/x?q=1",
      "plain text")
      .toDF("u")
      .select(Urls.host(Urls.canonicalize($"u")).as("h"))
      .collect().map(_.getString(0)).toSeq
    assert(out == Seq("example.com", "sub.d.example.org", ""))
  }
}
