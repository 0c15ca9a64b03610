package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.DataType
import org.apache.spark.unsafe.types.UTF8String

/** Native BPE merge step: replace every non-overlapping left-to-right
  * occurrence of the adjacent symbol pair (a, b) with the merged symbol
  * a+b — one LINEAR scan per row.
  *
  * Replaces the `aggregate()` higher-order fold in [[graft.ops.Bpe]]:
  * Catalyst's ArrayAggregate COPIES its accumulator array on every
  * element step (InternalRow.copyValue on the struct state), so the fold
  * form is O(symbols^2) per document PER MERGE — invisible at sf0.1,
  * found grinding 24 cores at the sf1 scale probe. Semantics are
  * bit-identical to the fold (skip-flag non-overlap rule, null element
  * never merges and passes through, null/empty array pass through);
  * OpsSpec keeps the declarative fold as the parity reference.
  */
case class BpeMerge(child: Expression, a: String, b: String)
    extends UnaryExpression {

  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "bpe_merge"

  @transient private lazy val aU = UTF8String.fromString(a)
  @transient private lazy val bU = UTF8String.fromString(b)
  @transient private lazy val abU = UTF8String.fromString(a + b)

  override def nullSafeEval(v: Any): Any =
    BpeMerge.merge(v.asInstanceOf[ArrayData], aU, bU, abU)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = classOf[UTF8String].getName
    val aRef = ctx.addReferenceObj("bpeA", aU, cls)
    val bRef = ctx.addReferenceObj("bpeB", bU, cls)
    val abRef = ctx.addReferenceObj("bpeAB", abU, cls)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.plans.BpeMerge.merge($v, $aRef, $bRef, $abRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeMerge =
    copy(child = newChild)
}

object BpeMerge {

  /** The linear rewrite kernel (shared by interpreted eval and codegen).
    * Element references are taken from the input row's buffer and
    * immediately re-written by the consuming projection, the same
    * lifetime contract Spark's own collection expressions rely on.
    */
  def merge(arr: ArrayData, aU: UTF8String, bU: UTF8String,
      abU: UTF8String): GenericArrayData = {
    val n = arr.numElements()
    val buf = new java.util.ArrayList[Object](n)
    var i = 0
    while (i < n) {
      val curNull = arr.isNullAt(i)
      if (!curNull && aU.equals(arr.getUTF8String(i)) && i + 1 < n &&
          !arr.isNullAt(i + 1) && bU.equals(arr.getUTF8String(i + 1))) {
        buf.add(abU)
        i += 2
      } else {
        buf.add(if (curNull) null else arr.getUTF8String(i))
        i += 1
      }
    }
    new GenericArrayData(buf.toArray)
  }

  def apply(c: Column, a: String, b: String): Column =
    GraftBridge.column(BpeMerge(GraftBridge.expression(c), a, b))
}
