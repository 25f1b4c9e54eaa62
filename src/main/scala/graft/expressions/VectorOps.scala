package graft.expressions

import org.apache.spark.sql.catalyst.util.ArrayData

/** Precompiled primitive loops behind the vector expressions' generated
  * code. Whole-stage codegen emits a single static call per row (Scala
  * object methods surface as Java static forwarders, so Janino links
  * them directly) — the loop itself runs as ordinary JIT-compiled
  * bytecode, and the generated code never boxes.
  */
object VectorOps {

  @inline private def at(a: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  def cosine(a: ArrayData, b: ArrayData, lf: Boolean, rf: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = at(a, i, lf); val y = at(b, i, rf)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }

  def dot(a: ArrayData, b: ArrayData, lf: Boolean, rf: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += at(a, i, lf) * at(b, i, rf); i += 1 }
    s
  }

  def l2dist(a: ArrayData, b: ArrayData, lf: Boolean, rf: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { val d = at(a, i, lf) - at(b, i, rf); s += d * d; i += 1 }
    math.sqrt(s)
  }

  def l2norm(a: ArrayData, f: Boolean): Double = {
    var s = 0.0
    var i = 0
    while (i < a.numElements()) { val x = at(a, i, f); s += x * x; i += 1 }
    math.sqrt(s)
  }

  /** Left fold `acc + (v[t] - mu[t]) * w[t]` in component order — the
    * deterministic centered dot product behind [[DotCentered]]
    * (bit-identical to the aggregate-HOF formulation it replaced:
    * same add/multiply sequence, one static call per row instead of
    * interpreted per-element lambda dispatch).
    */
  def dotCentered(v: ArrayData, mu: ArrayData, w: ArrayData, vf: Boolean): Double = {
    val n = mu.numElements()
    // fail fast on ragged input: UnsafeArrayData has no bounds check, so
    // a vec shorter than the mean would silently read garbage (every
    // other kernel in this file clamps; a centered projection over a
    // short vector has no right answer, so the clamp would be a silent
    // wrong result — throw with the shapes instead)
    if (v.numElements() < n)
      throw new IllegalArgumentException(
        s"dotCentered: vector has ${v.numElements()} elements, mean has $n - " +
          "PCA projection needs every vector at least mean-length")
    var s = 0.0
    var i = 0
    while (i < n) { s += (at(v, i, vf) - mu.getDouble(i)) * w.getDouble(i); i += 1 }
    s
  }
}
