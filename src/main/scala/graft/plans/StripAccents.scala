package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native accent stripping: Unicode NFD decomposition with all combining
  * marks (category Mn) removed — 'café' -> 'cafe', 'Żółć' -> 'Zołc',
  * non-Latin scripts pass through minus their diacritics.
  *
  * Spark has no built-in for this classic corpus-normalization step (the
  * usual workaround is a Scala UDF, which breaks whole-stage codegen);
  * this is a codegen'd `UnaryExpression` calling one static JVM helper —
  * the same shape as [[Hash60]]. Matches DuckDB's `strip_accents`
  * character-for-character on the tested repertoire (both follow Unicode
  * NFD + mark removal), so oracle queries replay it exactly.
  */
case class StripAccents(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "strip_accents"

  override protected def nullSafeEval(input: Any): Any =
    StripAccents.strip(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.StripAccents.strip($c)")

  override protected def withNewChildInternal(newChild: Expression): StripAccents =
    copy(child = newChild)
}

object StripAccents {

  /** NFD-decompose, drop NON_SPACING_MARK codepoints. Codepoint-aware
    * (surrogate pairs handled); no regex, no per-call allocations beyond
    * the output builder.
    */
  def strip(s: UTF8String): UTF8String = {
    val str = s.toString
    val norm = java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFD)
    // fast path: nothing to remove (pure ASCII never decomposes)
    var hasMark = false
    var i = 0
    while (i < norm.length && !hasMark) {
      val cp = norm.codePointAt(i)
      if (Character.getType(cp) == Character.NON_SPACING_MARK) hasMark = true
      i += Character.charCount(cp)
    }
    if (!hasMark && (norm eq str)) return s
    if (!hasMark) return UTF8String.fromString(norm)
    val sb = new java.lang.StringBuilder(norm.length)
    i = 0
    while (i < norm.length) {
      val cp = norm.codePointAt(i)
      if (Character.getType(cp) != Character.NON_SPACING_MARK) sb.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    UTF8String.fromString(sb.toString)
  }

  def apply(c: Column): Column =
    GraftBridge.column(StripAccents(GraftBridge.expression(c)))
}
