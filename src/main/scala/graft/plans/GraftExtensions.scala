package graft.plans

import graft.expressions._
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** Engine extension wiring (SparkSessionExtensions): exposes the native
  * vector expressions to the SQL surface, so `spark.sql` users get the
  * same operators as the Scala API — the extension-registration path the
  * engine would use for any further custom rule/strategy (SURVEY.md §4.3;
  * reference has no SQL surface at all, this is capability extension).
  *
  * Usage: `SparkSession.builder().withExtensions(new GraftExtensions)` —
  * done by default in [[graft.GraftSession]] — or
  * `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(cls: Class[_], name: String, usage: String) =
    new ExpressionInfo(cls.getName, null, name, usage, "", "", "", "", "4.0.0", "", "built-in")

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => SelfSimilarityFold)
    e.injectOptimizerRule(_ => IntersectNonEmptyToOverlap)
    e.injectFunction(
      (FunctionIdentifier("graft_cosine"),
        info(classOf[CosineSim], "graft_cosine", "graft_cosine(a, b) - cosine similarity of two dense vectors"),
        (args: Seq[Expression]) => CosineSim(args(0), args(1))))
    e.injectFunction(
      (FunctionIdentifier("graft_dot"),
        info(classOf[DotProduct], "graft_dot", "graft_dot(a, b) - dot product of two dense vectors"),
        (args: Seq[Expression]) => DotProduct(args(0), args(1))))
    e.injectFunction(
      (FunctionIdentifier("graft_l2norm"),
        info(classOf[L2Norm], "graft_l2norm", "graft_l2norm(a) - Euclidean norm of a dense vector"),
        (args: Seq[Expression]) => L2Norm(args(0))))
    e.injectFunction(
      (FunctionIdentifier("graft_l2dist"),
        info(classOf[L2Distance], "graft_l2dist", "graft_l2dist(a, b) - Euclidean distance between dense vectors"),
        (args: Seq[Expression]) => L2Distance(args(0), args(1))))
    e.injectFunction(
      (FunctionIdentifier("graft_lsh_bits"),
        info(classOf[HyperplaneLsh], "graft_lsh_bits", "graft_lsh_bits(a, nBits) - random-hyperplane LSH fingerprint (nBits literal)"),
        (args: Seq[Expression]) => args(1) match {
          case Literal(n: Int, IntegerType) => HyperplaneLsh(args(0), n)
          case other =>
            throw new IllegalArgumentException(s"graft_lsh_bits: nBits must be an integer literal, got $other")
        }))
    def intLit(e: Expression, fn: String, arg: String): Int = e match {
      case Literal(n: Int, IntegerType) => n
      case other => throw new IllegalArgumentException(s"$fn: $arg must be an integer literal, got $other")
    }
    e.injectFunction(
      (FunctionIdentifier("graft_shingle_hashes"),
        info(classOf[ShingleHashes], "graft_shingle_hashes",
          "graft_shingle_hashes(text, n) - distinct xxhash64 values of the word n-gram shingles (fused pass)"),
        (args: Seq[Expression]) =>
          ShingleHashes(args(0), intLit(args(1), "graft_shingle_hashes", "n"), charLevel = false, distinct = true)))
    e.injectFunction(
      (FunctionIdentifier("graft_char_shingle_hashes"),
        info(classOf[ShingleHashes], "graft_char_shingle_hashes",
          "graft_char_shingle_hashes(text, n) - distinct xxhash64 values of the char n-gram shingles (fused pass)"),
        (args: Seq[Expression]) =>
          ShingleHashes(args(0), intLit(args(1), "graft_char_shingle_hashes", "n"), charLevel = true, distinct = true)))
    e.injectFunction(
      (FunctionIdentifier("graft_minhash"),
        info(classOf[MinHashSig], "graft_minhash", "graft_minhash(shingle_hashes, k) - k-lane MinHash signature, per row"),
        (args: Seq[Expression]) => MinHashSig(args(0), intLit(args(1), "graft_minhash", "k"))))
    e.injectFunction(
      (FunctionIdentifier("graft_simhash64"),
        info(classOf[SimHash], "graft_simhash64", "graft_simhash64(token_hashes) - 64-bit SimHash fingerprint, per row"),
        (args: Seq[Expression]) => SimHash(args(0))))
    e.injectFunction(
      (FunctionIdentifier("graft_ngram_stats"),
        info(classOf[NgramRepetitionStats], "graft_ngram_stats",
          "graft_ngram_stats(text, n) - struct(n_ngrams, n_distinct, max_count, max_count_chars) repetition stats (fused pass)"),
        (args: Seq[Expression]) =>
          NgramRepetitionStats(args(0), intLit(args(1), "graft_ngram_stats", "n"))))
    e.injectFunction(
      (FunctionIdentifier("graft_line_stats"),
        info(classOf[LineRepetitionStats], "graft_line_stats",
          "graft_line_stats(text) - struct(n_lines, n_distinct, dup_chars, total_chars) duplicate-line stats"),
        (args: Seq[Expression]) => LineRepetitionStats(args(0))))
    e.injectFunction(
      (FunctionIdentifier("graft_zorder"),
        info(classOf[ZOrder], "graft_zorder",
          "graft_zorder(c1, c2[, c3[, c4]]) - Morton interleave of 2-4 16-bit cell ids into a Long sort key"),
        (args: Seq[Expression]) => ZOrder(args)))
  }
}
