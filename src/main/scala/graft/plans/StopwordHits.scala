package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Frequency-weighted membership count: how many elements of a string
  * array appear in a fixed word set. One hash probe per token against a
  * broadcast-by-reference HashSet, codegen'd.
  *
  * Replaces the `aggregate(toks, 0L, acc + when(isInCollection(...)))`
  * fold in [[graft.functions.Text.stopwordHits]]: the fold's accumulator
  * is a primitive (linear, unlike the BpeMerge/CharRunProfile struct
  * cases) but ArrayAggregate evaluates interpreted, and the profile
  * family runs it six times per document (five language stopword lists +
  * the combined list) — the dominant cost of lang-ID at the sf1 probe
  * (dq_label_agreement 14 s, mostly this). Semantics are bit-identical:
  * null array → null, null elements count 0, frequency-weighted (not
  * distinct). The fold stays in FunctionsSpec as the parity reference.
  */
case class StopwordHits(child: Expression, words: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "stopword_hits"

  @transient private lazy val set: java.util.HashSet[UTF8String] =
    StopwordHits.toSet(words)

  override def nullSafeEval(v: Any): Any =
    StopwordHits.count(v.asInstanceOf[ArrayData], set)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("stopwordSet", set,
      classOf[java.util.HashSet[UTF8String]].getName)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.plans.StopwordHits.count($v, $setRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): StopwordHits =
    copy(child = newChild)
}

object StopwordHits {

  def toSet(words: Seq[String]): java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.size * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  def count(arr: ArrayData, set: java.util.HashSet[UTF8String]): Long = {
    val n = arr.numElements()
    var c = 0L
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) && set.contains(arr.getUTF8String(i))) c += 1L
      i += 1
    }
    c
  }

  def apply(c: Column, words: Seq[String]): Column =
    GraftBridge.column(StopwordHits(GraftBridge.expression(c), words))
}
