package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused hashed-TF sparse vector for text KNN (graft.text.TfVectors).
  *
  * One native pass per document: normalize → window over word n-gram byte
  * ranges → md5-bucket each term → accumulate term frequencies → emit
  * `struct(n2, pairs: array<struct<bucket, tf>>)` with `n2 = Σ tf²` and
  * pairs sorted by bucket. Replaces the relational explode → groupBy(id,
  * bucket) → groupBy(id) norm pass: the per-document vector AND its
  * squared norm come out of the scan stage directly, so the corpus text
  * never shuffles and no aggregation runs before the similarity join.
  *
  * `hot` is an optional pre-computed set of df-pruned bucket ids (bounded
  * by `dim`, so driver-collecting it is safe at any corpus size — same
  * rationale as the PQ codebook and range-join interval index). Excluding
  * hot buckets INSIDE the kernel keeps `n2` exact over the pruned vector
  * space with zero anti-joins in the plan.
  *
  * Bucket parity (oracle-checked): md5 of the term's UTF-8 bytes, first 8
  * hex chars as an unsigned 32-bit value, mod `dim` — identical to Spark's
  * `conv(substring(md5(term),1,8),16,10) % dim` and DuckDB's
  * `CAST(('0x'||substr(md5(term),1,8)) AS BIGINT) % dim`. Normalization
  * matches TextFunctions.tokenize for ASCII (see TextHash.normalize).
  */
case class TermBucketTfs(child: Expression, n: Int, dim: Int, hot: Seq[Int])
    extends UnaryExpression {
  require(n >= 1, s"term n-gram size must be >= 1, got $n")
  require(dim >= 1, s"bucket count must be >= 1, got $dim")
  // a hot set computed for a different dim would otherwise surface as an
  // ArrayIndexOutOfBoundsException deep inside executor eval (ADVICE r3)
  require(hot.forall(b => b >= 0 && b < dim),
    s"hot bucket ids out of range [0, $dim): ${hot.filterNot(b => b >= 0 && b < dim).take(5).mkString(", ")}")

  override def dataType: DataType = TermBucketTfs.schema
  override def checkInputDataTypes(): TypeCheckResult = TextHash.checkString(child.dataType)

  @transient private lazy val hotMask: Array[Boolean] = {
    val m = new Array[Boolean](dim)
    hot.foreach(b => m(b) = true)
    m
  }
  // per-thread scratch: md5 instance + tf accumulator + touched-bucket list
  // (executors share one expression instance across codegen'd tasks)
  @transient private lazy val scratch =
    ThreadLocal.withInitial[(MessageDigest, Array[Long], Array[Int])] { () =>
      (MessageDigest.getInstance("MD5"), new Array[Long](dim), new Array[Int](dim))
    }

  override def nullSafeEval(v: Any): Any = evalVec(v.asInstanceOf[UTF8String])

  /** Row kernel — public so generated code calls it via an instance
    * reference (one static-shaped call per row, no boxing).
    */
  def evalVec(str: UTF8String): InternalRow = {
    val (buf, len) = TextHash.normalize(str.toString)
    val (md, tfs, touched) = scratch.get()
    // token start offsets (tokens separated by single spaces)
    val starts = new Array[Int](len / 2 + 2)
    var t = 0
    var i = 0
    while (i < len) {
      if (i == 0 || buf(i - 1) == ' ') { starts(t) = i; t += 1 }
      i += 1
    }
    var nTouched = 0
    try {
      var s = 0
      while (s + n <= t) {
        val from = starts(s)
        val until = if (s + n < t) starts(s + n) - 1 else len // strip trailing space
        md.reset()
        md.update(buf, from, until - from)
        val d = md.digest()
        val u = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        val b = (u % dim).toInt
        if (!hotMask(b)) {
          if (tfs(b) == 0L) { touched(nTouched) = b; nTouched += 1 }
          tfs(b) += 1L
        }
        s += 1
      }
      java.util.Arrays.sort(touched, 0, nTouched)
      var n2 = 0L
      val pairs = new Array[Any](nTouched)
      var j = 0
      while (j < nTouched) {
        val b = touched(j)
        val tf = tfs(b)
        tfs(b) = 0L // reset scratch for the next row
        n2 += tf * tf
        pairs(j) = InternalRow(b, tf)
        j += 1
      }
      InternalRow(n2, new GenericArrayData(pairs))
    } catch {
      // the thread-local tf accumulator outlives this row: if anything
      // throws mid-accumulation, later rows on this executor thread would
      // silently inherit inflated counts — zero every touched bucket
      // before rethrowing (idempotent with the success-path reset). ADVICE r3.
      case e: Throwable =>
        var j = 0
        while (j < nTouched) { tfs(touched(j)) = 0L; j += 1 }
        throw e
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("termBucketTfs", this, classOf[TermBucketTfs].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.evalVec($a);")
  }

  override protected def withNewChildInternal(c: Expression): TermBucketTfs = copy(child = c)
}

object TermBucketTfs {
  val schema: DataType = StructType(Seq(
    StructField("n2", LongType, nullable = false),
    StructField("pairs", ArrayType(StructType(Seq(
      StructField("bucket", IntegerType, nullable = false),
      StructField("tf", LongType, nullable = false))), containsNull = false), nullable = false)))
}
