package graft.functions

import graft.expressions.{CosineSim, DotProduct, HyperplaneLsh, L2Distance, L2Norm}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` / `array<double>` embedding
  * columns, backed by native Catalyst expressions
  * (graft.expressions.VectorExpressions — one JVM call per row with a
  * primitive loop inside, instead of per-element interpreted `zip_with`/
  * `aggregate` dispatch). At 100 TB these run inside the scan stage.
  */
object VectorFunctions {

  // Spark 4 Column↔Expression bridge (columns are node-based in 4.x)
  private def c(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(e)
  private def e(col: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.graftbridge.Bridge.expression(col)

  /** Σ aᵢ·bᵢ (computed in double). */
  def dot(a: Column, b: Column): Column = c(DotProduct(e(a), e(b)))

  /** ‖a‖₂ */
  def l2Norm(a: Column): Column = c(L2Norm(e(a)))

  /** Cosine similarity in [-1,1]; 0 for zero vectors. */
  def cosine(a: Column, b: Column): Column = c(CosineSim(e(a), e(b)))

  /** Euclidean distance. */
  def l2Distance(a: Column, b: Column): Column = c(L2Distance(e(a), e(b)))

  /** Unit-normalize (zero vectors pass through unchanged). Expression-level
    * (cold path — index build / display, not the pairwise hot loop).
    */
  def normalize(a: Column): Column = {
    val n = l2Norm(a)
    when(n === 0.0, a.cast("array<double>"))
      .otherwise(transform(a, v => v.cast("double") / n))
  }

  /** nBits-bit random-hyperplane LSH fingerprint as a Long bit mask —
    * deterministic (splitmix-derived planes), reproducible across runs and
    * executors. Band it like a SimHash fingerprint for candidate
    * generation.
    */
  def lshBits(vec: Column, nBits: Int): Column = c(HyperplaneLsh(e(vec), nBits))

  /** Symmetric absmax int8 quantization → struct(scale, codes) — the 4×
    * embedding compression a 100 TB vector store scans (reconstruction
    * error ≤ scale/2 per element; see QuantizeInt8).
    */
  def quantizeInt8(vec: Column): Column = c(graft.expressions.QuantizeInt8(e(vec)))

  /** Inverse of [[quantizeInt8]]: codes·scale as array<double>. */
  def dequantizeInt8(q: Column): Column = c(graft.expressions.DequantizeInt8(e(q)))
}
