package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native repetition profile over pre-split parts: given a document's
  * line array and token array, one hash-counting pass each yields
  * `struct(n_lines, dup_line_frac, dup_line_char_frac, top_bigram_frac)`
  * — O(L + T) per document.
  *
  * Replaces the declarative in-array form in
  * [[graft.functions.Text.repetitionFromParts]], whose
  * `filter(ls, l => size(filter(ls, m => m === l)) >= 2)` and
  * `transform(array_distinct(bi), b => size(filter(bi, x => x === b)))`
  * are O(L²)/O(T²) in INTERPRETED lambdas — 27.9 s for the
  * text_repetition pass at the sf1 probe (the relational twin stays the
  * huge-single-document path; this fixes the per-doc map form). The
  * declarative form remains in RepetitionRelationalSpec /FunctionsSpec
  * as the parity reference.
  *
  * Null contract (bit-matching the replaced Column expression): the
  * struct itself is never null; a null line array yields
  * (null, 0.0, 0.0, ·) and a null token array yields (·, ·, ·, 0.0) —
  * each `when(size > 0, …).otherwise(0)` route collapses to the
  * otherwise branch on null input. Array elements are never null by
  * contract (both arrays come from `split`).
  */
case class RepetitionProfile(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_lines", LongType, nullable = true),
    StructField("dup_line_frac", DoubleType, nullable = false),
    StructField("dup_line_char_frac", DoubleType, nullable = false),
    StructField("top_bigram_frac", DoubleType, nullable = false)))

  override def nullable: Boolean = false
  override def prettyName: String = "repetition_profile"

  override def eval(input: InternalRow): Any = {
    val l = left.eval(input)
    val r = right.eval(input)
    RepetitionProfile.profile(
      l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    val rowCls = classOf[InternalRow].getName
    ev.copy(code = code"""
      ${l.code}
      ${r.code}
      $rowCls ${ev.value} = graft.plans.RepetitionProfile.profile(
        ${l.isNull} ? null : ${l.value}, ${r.isNull} ? null : ${r.value});
    """, isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RepetitionProfile =
    copy(left = newLeft, right = newRight)
}

object RepetitionProfile {

  /** Shared kernel (interpreted eval + codegen); either array may be
    * null, see the class null contract.
    */
  def profile(ls: ArrayData, toks: ArrayData): InternalRow = {
    var nLines: Any = null
    var dupLineFrac = 0.0
    var dupCharFrac = 0.0
    if (ls != null) {
      val n = ls.numElements()
      nLines = n.toLong
      if (n > 0) {
        val counts = new java.util.HashMap[UTF8String, Int](n * 2)
        var totalChars = 0L
        var i = 0
        while (i < n) {
          val l = ls.getUTF8String(i)
          counts.merge(l, 1, (a, b) => a + b)
          totalChars += l.numChars()
          i += 1
        }
        dupLineFrac = (n - counts.size).toDouble / n.toDouble
        if (totalChars > 0) {
          var dupChars = 0L
          i = 0
          while (i < n) {
            val l = ls.getUTF8String(i)
            if (counts.get(l) >= 2) dupChars += l.numChars()
            i += 1
          }
          dupCharFrac = dupChars.toDouble / totalChars.toDouble
        }
      }
    }
    var topBigramFrac = 0.0
    if (toks != null) {
      val n = toks.numElements()
      if (n >= 2) {
        val counts = new java.util.HashMap[UTF8String, Int](n * 2)
        var maxC = 0
        var i = 0
        while (i < n - 1) {
          val bi = UTF8String.concatWs(UTF8String.fromString(" "),
            toks.getUTF8String(i), toks.getUTF8String(i + 1))
          val c = counts.merge(bi, 1, (a, b) => a + b)
          if (c > maxC) maxC = c
          i += 1
        }
        topBigramFrac = maxC.toDouble / (n - 1).toDouble
      }
    }
    new GenericInternalRow(
      Array[Any](nLines, dupLineFrac, dupCharFrac, topBigramFrac))
  }

  def apply(ls: Column, toks: Column): Column =
    GraftBridge.column(RepetitionProfile(
      GraftBridge.expression(ls), GraftBridge.expression(toks)))
}
