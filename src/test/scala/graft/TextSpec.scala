package graft

import graft.functions.{TextFunctions => T}
import org.apache.spark.sql.functions._

class TextSpec extends SparkSpec {
  import spark.implicits._

  test("normalize + tokenize") {
    val df = Seq("  Hello,   WORLD!  123 ", "", "!!!").toDF("t")
    val rows = df.select(T.normalizeText($"t"), T.tokenCount($"t")).collect()
    assert(rows(0).getString(0) == "hello world 123" && rows(0).getInt(1) == 3)
    assert(rows(1).getString(0) == "" && rows(1).getInt(1) == 0)
    assert(rows(2).getString(0) == "" && rows(2).getInt(1) == 0)
  }

  test("shingles: n consecutive tokens, deduped") {
    val df = Seq("a b c d").toDF("t")
    val sh = df.select(T.shingles($"t", 2)).head().getSeq[String](0)
    assert(sh.toSet == Set("a b", "b c", "c d"))
    val few = Seq("a").toDF("t").select(T.shingles($"t", 2)).head().getSeq[String](0)
    assert(few.isEmpty)
  }

  test("charShingles") {
    val sh = Seq("abcd").toDF("t").select(T.charShingles($"t", 3)).head().getSeq[String](0)
    assert(sh.toSet == Set("abc", "bcd"))
  }

  test("langId picks the language with most stopword hits") {
    assert(Seq("the cat and the dog of the house").toDF("t")
      .select(T.langId($"t")).head().getString(0) == "en")
    assert(Seq("el perro y la casa de los gatos").toDF("t")
      .select(T.langId($"t")).head().getString(0) == "es")
    assert(Seq("zzz qqq xxx").toDF("t")
      .select(T.langId($"t")).head().getString(0) == "und")
  }

  test("qualityScore in [0,1], higher for real text than garbage") {
    val rows = Seq(
      "The quick brown fox jumps over the lazy dog and runs far away into the quiet woods of the north to rest for a while.",
      "@@@@ #### !!!! %%%%"
    ).toDF("t").select(T.qualityScore($"t")).collect().map(_.getDouble(0))
    assert(rows.forall(s => s >= 0.0 && s <= 1.0))
    assert(rows(0) > rows(1))
  }

  test("fingerprint: identical after normalization differences") {
    val df = Seq(("A", "Hello, World!"), ("B", "  hello   world  ")).toDF("id", "t")
    val fps = df.select(T.fingerprint($"t")).collect().map(_.getString(0))
    assert(fps(0) == fps(1))
  }

  test("subword count ≥ token count") {
    val r = Seq("internationalization is extraordinarily long").toDF("t")
      .select(T.tokenCount($"t"), T.subwordCountEstimate($"t")).head()
    assert(r.getInt(1) >= r.getInt(0))
  }
}
