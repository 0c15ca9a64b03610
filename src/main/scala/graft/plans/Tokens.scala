package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native whitespace tokenizer: lowercase, trim, split on `\s+` runs —
  * one byte scan per document, zero regex machinery.
  *
  * Replaces the `when(isnull(c) || trim(c) === "", array())
  * .otherwise(split(trim(lower(c)), "\\s+"))` composition behind
  * [[graft.functions.Text.tokens]]: Spark's `split` goes through
  * `String.split`, whose single-character fast path cannot apply to
  * `\s+`, so every document pays a fresh `Pattern.compile` plus a
  * regex scan — the r13 decomposition probe measured tokenization at
  * roughly HALF of text_profile's fused cost, and tokens() sits under
  * every text/dedup/minhash/passages operator. Here the separator class
  * is Java-regex `\s` = the six ASCII bytes {\t \n \x0B \f \r space},
  * which in UTF-8 can never occur inside a multibyte sequence, so a
  * byte-run scan reproduces the regex split exactly; token slices share
  * the document's byte array (no per-token copies).
  *
  * Semantics are bit-identical to the declarative form, including its
  * quirks (FunctionsSpec keeps that form as the parity reference, fuzzed
  * against this one): NULL or all-space text → EMPTY array (not null);
  * `lower` is `UTF8String.toLowerCase` (Spark's `Lower`); `trim` strips
  * 0x20 only, so text with leading/trailing non-space whitespace yields
  * the leading/trailing "" tokens Pattern.split(limit = -1) produces.
  */
case class Tokens(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = false
  override def prettyName: String = "whitespace_tokens"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    Tokens.tokenize(if (v == null) null else v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val arrCls = classOf[ArrayData].getName
    ev.copy(code = code"""
      ${c.code}
      $arrCls ${ev.value} = graft.plans.Tokens.tokenize(
        ${c.isNull} ? null : ${c.value});
    """, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Tokens =
    copy(child = newChild)
}

object Tokens {

  private val empty: ArrayData = new GenericArrayData(Array.empty[Any])

  private def isWs(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0d)

  /** Shared kernel (interpreted eval + codegen). Pattern.split(limit=-1)
    * semantics over the lowered+trimmed bytes: leading separator run →
    * leading "" token, trailing run → trailing "" token, no-match →
    * one whole-string token.
    */
  def tokenize(s: UTF8String): ArrayData = {
    if (s == null || s.trim().numBytes() == 0) return empty
    val t = s.toLowerCase.trim()
    val bytes = t.getBytes
    val n = bytes.length
    val out = new java.util.ArrayList[Any](n / 6 + 1)
    var index = 0
    var i = 0
    while (i < n) {
      if (isWs(bytes(i))) {
        val matchStart = i
        while (i < n && isWs(bytes(i))) i += 1
        out.add(UTF8String.fromBytes(bytes, index, matchStart - index))
        index = i
      } else i += 1
    }
    out.add(UTF8String.fromBytes(bytes, index, n - index))
    new GenericArrayData(out.toArray)
  }

  def apply(c: Column): Column =
    GraftBridge.column(Tokens(GraftBridge.expression(c)))
}
