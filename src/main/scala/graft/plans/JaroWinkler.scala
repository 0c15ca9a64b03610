package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Jaro-Winkler string similarity — the entity-resolution staple
  * Spark lacks (its built-in edit distance is `levenshtein` only; the
  * usual workaround is a Scala UDF, which breaks whole-stage codegen).
  *
  * Semantics match DuckDB's `jaro_winkler_similarity` (empirically
  * verified on ASCII / CJK / transposition / empty-string cases, so
  * oracle queries replay it directly):
  *  - CODEPOINT-level comparison (surrogate pairs are one unit);
  *  - standard two-pass Jaro: match window `max(|a|,|b|)/2 - 1` (>= 0),
  *    greedy left-to-right matching, transpositions = half the
  *    out-of-order matches;
  *  - Winkler prefix boost (scale 0.1, prefix capped at 4) applied only
  *    when jaro > 0.7;
  *  - ANY empty input (including both empty) scores 0.0, and comparison
  *    is case-sensitive — DuckDB's conventions.
  *
  * Codegen'd `BinaryExpression` calling one static JVM helper (the
  * [[Hash60]] / [[StripAccents]] shape).
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "jaro_winkler"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    JaroWinkler.similarity(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.plans.JaroWinkler.similarity($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): JaroWinkler = copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  def similarity(s1: UTF8String, s2: UTF8String): Double = {
    val a = s1.toString.codePoints().toArray
    val b = s2.toString.codePoints().toArray
    if (a.length == 0 || b.length == 0) return 0.0
    val window = math.max(0, math.max(a.length, b.length) / 2 - 1)
    val am = new Array[Boolean](a.length)
    val bm = new Array[Boolean](b.length)
    var m = 0
    var i = 0
    while (i < a.length) {
      val lo = math.max(0, i - window)
      val hi = math.min(b.length - 1, i + window)
      var j = lo
      var matched = false
      while (!matched && j <= hi) {
        if (!bm(j) && b(j) == a(i)) {
          am(i) = true; bm(j) = true; m += 1; matched = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < a.length) {
      if (am(i)) {
        while (!bm(k)) k += 1
        if (a(i) != b(k)) t += 1
        k += 1
      }
      i += 1
    }
    val half = t / 2
    val jaro = (m.toDouble / a.length + m.toDouble / b.length +
      (m - half).toDouble / m) / 3.0
    if (jaro <= 0.7) jaro
    else {
      var p = 0
      val maxP = math.min(4, math.min(a.length, b.length))
      while (p < maxP && a(p) == b(p)) p += 1
      jaro + p * 0.1 * (1.0 - jaro)
    }
  }

  def apply(a: Column, b: Column): Column =
    GraftBridge.column(
      JaroWinkler(GraftBridge.expression(a), GraftBridge.expression(b)))
}
