package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Greedy Maximal-Marginal-Relevance selection over a per-query candidate
  * list (Carbonell & Goldstein 1998, the classic diversified-retrieval
  * re-ranker): pick `k` items maximizing
  * `lam · rel(d) − penWeight · max_{s ∈ selected} sim(d, s)`,
  * first pick by pure relevance (empty-set penalty 0).
  *
  * MMR is inherently sequential WITHIN a query (each pick changes the
  * penalty landscape) but embarrassingly parallel ACROSS queries — so the
  * distributed shape is: candidate generation + pairwise candidate sims
  * as ordinary broadcast joins (the data-sized work, fully parallel),
  * then this expression runs the tiny O(k·N) greedy loop per query row
  * over the COLLECTED candidate/pair arrays (N = candidates per query,
  * bounded small by construction). No driver loop, no per-query jobs.
  *
  * Determinism: candidates are re-sorted internally by (rel desc, id
  * asc) — `collect_list` order is partition-dependent and must not leak
  * into results. Ties on score break toward the smaller id. `lam` and
  * `penWeight` are INDEPENDENT parameters (not `1 − lam`): computing the
  * complement in double arithmetic would produce literals like
  * 0.30000000000000004 that no SQL oracle could spell.
  *
  * children: `cands: array<struct<id:bigint, rel:double>>`,
  * `pairs: array<struct<ia:bigint, ib:bigint, s:double>>` (directed or
  * symmetric; missing pairs read as similarity 0).
  * Returns `array<struct<neighbor_id:bigint, mmr_rank:int, score:double>>`
  * in selection order.
  */
case class MmrSelect(left: Expression, right: Expression, k: Int,
    lam: Double, penWeight: Double) extends BinaryExpression {
  require(k >= 1, s"MmrSelect: k $k < 1")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("neighbor_id", LongType, nullable = false),
    StructField("mmr_rank", IntegerType, nullable = false),
    StructField("score", DoubleType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StructType(Array(a, b)), _), ArrayType(StructType(Array(x, y, z)), _))
      if a.dataType == LongType && b.dataType == DoubleType &&
        x.dataType == LongType && y.dataType == LongType && z.dataType == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"expected (array<struct<long,double>>, array<struct<long,long,double>>), got $other")
  }

  override def nullSafeEval(c: Any, p: Any): Any =
    evalMmr(c.asInstanceOf[ArrayData], p.asInstanceOf[ArrayData])

  def evalMmr(candsIn: ArrayData, pairsIn: ArrayData): ArrayData = {
    val n = candsIn.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val ids = new Array[Long](n)
    val rels = new Array[Double](n)
    var i = 0
    while (i < n) {
      val r = candsIn.getStruct(i, 2)
      ids(i) = r.getLong(0)
      rels(i) = r.getDouble(1)
      i += 1
    }
    // deterministic candidate order: (rel desc, id asc)
    val order = (0 until n).sortBy(j => (-rels(j), ids(j))).toArray
    // Boxed key/value types so the null guards below are REAL: with
    // primitive type params, get() on a missing key unboxes null to 0
    // and the guard is vacuously true (a pair naming a non-candidate id
    // would silently alias order position 0).
    val sims = new java.util.HashMap[java.lang.Long, java.lang.Double]()
    val idIdx = new java.util.HashMap[java.lang.Long, java.lang.Integer]()
    i = 0
    while (i < n) { idIdx.put(ids(order(i)), i); i += 1 }
    i = 0
    while (i < pairsIn.numElements()) {
      val r = pairsIn.getStruct(i, 3)
      val a = idIdx.get(java.lang.Long.valueOf(r.getLong(0)))
      val b = idIdx.get(java.lang.Long.valueOf(r.getLong(1)))
      if (a != null && b != null) {
        val key = a.longValue() * n + b.longValue()
        sims.put(key, r.getDouble(2))
        sims.put(b.longValue() * n + a.longValue(), r.getDouble(2))
      }
      i += 1
    }
    val taken = new Array[Boolean](n)
    val out = new Array[Any](math.min(k, n))
    var pick = 0
    while (pick < out.length) {
      var bestJ = -1
      var bestScore = 0.0
      var j = 0
      while (j < n) {
        if (!taken(j)) {
          val idx = order(j)
          // true max over selected (can be negative — a diverse pick
          // REDUCES the penalty, per the classic formula); empty set → 0
          var pen = 0.0
          var found = false
          var t = 0
          while (t < n) {
            if (taken(t)) {
              val s = sims.get(java.lang.Long.valueOf(j.toLong * n + t.toLong))
              val sv = if (s == null) 0.0 else s.doubleValue()
              if (!found || sv > pen) { pen = sv; found = true }
            }
            t += 1
          }
          val score = lam * rels(idx) - penWeight * pen
          if (bestJ < 0 || score > bestScore ||
            (score == bestScore && ids(idx) < ids(order(bestJ)))) {
            bestJ = j
            bestScore = score
          }
        }
        j += 1
      }
      taken(bestJ) = true
      out(pick) = new GenericInternalRow(
        Array[Any](ids(order(bestJ)), pick + 1, bestScore))
      pick += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("mmrSelect", this, classOf[MmrSelect].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.evalMmr($a, $b);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}
