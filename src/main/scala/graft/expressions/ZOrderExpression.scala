package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Morton (Z-order) interleave of k 16-bit cell coordinates into one
  * Long sort key: bit j of child i lands at position j·k + i, so sorting
  * by the result clusters rows that are close in EVERY dimension — the
  * multi-column file-pruning layout (Delta/Iceberg OPTIMIZE ZORDER
  * analog; public knowledge, e.g. the Morton curve literature).
  *
  * Children are the already-quantized cell ids (ints in [0, 65535] —
  * [[graft.sources.Layout.writeZOrdered]] produces them by min/max
  * scaling); values outside the range clamp, nulls map to cell 0 (they
  * cluster together at the curve origin). 2–4 dimensions (k·16 ≤ 64
  * bits).
  */
case class ZOrder(children: Seq[Expression]) extends Expression {
  require(children.size >= 2 && children.size <= 4, s"ZOrder takes 2-4 columns, got ${children.size}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes(): TypeCheckResult =
    children.find(_.dataType != IntegerType) match {
      case Some(c) => TypeCheckResult.TypeCheckFailure(
        s"expected int cell ids, got ${c.dataType.simpleString(10)}")
      case None => TypeCheckResult.TypeCheckSuccess
    }

  override def eval(input: InternalRow): Any = {
    val k = children.size
    var z = 0L
    var i = 0
    while (i < k) {
      val v = children(i).eval(input)
      val cell = if (v == null) 0 else math.min(math.max(v.asInstanceOf[Int], 0), 0xFFFF)
      var j = 0
      while (j < 16) {
        if (((cell >> j) & 1) == 1) z |= 1L << (j * k + i)
        j += 1
      }
      i += 1
    }
    z
  }

  /** Kernel for generated code: interleave one child's bits into z. */
  def interleave(z: Long, cell: Int, i: Int): Long = {
    val k = children.size
    val c = math.min(math.max(cell, 0), 0xFFFF)
    var out = z
    var j = 0
    while (j < 16) {
      if (((c >> j) & 1) == 1) out |= 1L << (j * k + i)
      j += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val ref = ctx.addReferenceObj("zorder", this, classOf[ZOrder].getName)
    val evals = children.map(_.genCode(ctx))
    val z = ctx.freshName("z")
    val childCode = evals.map(_.code.toString).mkString("\n")
    val interleaves = evals.zipWithIndex.map { case (e, i) =>
      s"$z = $ref.interleave($z, ${e.isNull} ? 0 : ${e.value}, $i);"
    }.mkString("\n")
    ev.copy(
      code = code"""
        |$childCode
        |long $z = 0L;
        |$interleaves
        |final long ${ev.value} = $z;""".stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]) =
    copy(children = newChildren)
}
