package graft.expressions

import graft.text.AcAutomaton
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Blocklist expressions — an Aho–Corasick automaton carried inside a
  * codegen'd Catalyst expression (see [[graft.text.Blocklist]] for the
  * scale rationale). The automaton is compiled lazily ONCE per
  * deserialized expression instance (per executor), then shared read-only
  * across all of that executor's threads.
  */

/** Per-term occurrence counts (`array<int>`, aligned with `terms`). */
case class BlocklistHits(child: Expression, terms: Seq[String]) extends UnaryExpression {
  require(terms.nonEmpty && terms.forall(_.nonEmpty), "BlocklistHits: empty term")
  require(terms.distinct.size == terms.size, "BlocklistHits: duplicate terms")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = TextHash.checkString(child.dataType)

  @transient private lazy val ac = new AcAutomaton(terms.map(_.getBytes("UTF-8")))

  override def nullSafeEval(v: Any): Any = evalHits(v.asInstanceOf[UTF8String])

  def evalHits(s: UTF8String): ArrayData = {
    val out = new Array[Int](terms.length)
    ac.countsInto(s.getBytes, out)
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("blocklistHits", this, classOf[BlocklistHits].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.evalHits($a);")
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Non-overlapping redaction of every blocklisted term —
  * `regexp_replace(text, 't1|t2|…', repl)`-compatible (leftmost start,
  * pattern-order priority; see [[graft.text.AcAutomaton.redact]]) in one
  * automaton pass instead of an alternation regex.
  */
case class BlocklistRedact(child: Expression, terms: Seq[String], repl: String)
    extends UnaryExpression {
  require(terms.nonEmpty && terms.forall(_.nonEmpty), "BlocklistRedact: empty term")
  require(terms.distinct.size == terms.size, "BlocklistRedact: duplicate terms")

  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult = TextHash.checkString(child.dataType)

  @transient private lazy val ac = new AcAutomaton(terms.map(_.getBytes("UTF-8")))
  @transient private lazy val replBytes = repl.getBytes("UTF-8")

  override def nullSafeEval(v: Any): Any = evalRedactBl(v.asInstanceOf[UTF8String])

  def evalRedactBl(s: UTF8String): UTF8String =
    UTF8String.fromBytes(ac.redact(s.getBytes, replBytes))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("blocklistRedact", this, classOf[BlocklistRedact].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.evalRedactBl($a);")
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Total occurrence count across all terms (the filter threshold). */
case class BlocklistCount(child: Expression, terms: Seq[String]) extends UnaryExpression {
  require(terms.nonEmpty && terms.forall(_.nonEmpty), "BlocklistCount: empty term")
  require(terms.distinct.size == terms.size, "BlocklistCount: duplicate terms")

  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult = TextHash.checkString(child.dataType)

  @transient private lazy val ac = new AcAutomaton(terms.map(_.getBytes("UTF-8")))

  override def nullSafeEval(v: Any): Any = evalCount(v.asInstanceOf[UTF8String])

  def evalCount(s: UTF8String): Int = ac.totalCount(s.getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("blocklistCount", this, classOf[BlocklistCount].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.evalCount($a);")
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}
