package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native character-run profile: sort a string's codepoints, fold the
  * sorted runs ONCE, and return `struct(ss, k, mx)` — the sum of squared
  * run lengths, the distinct-codepoint count, and the longest run. NULL
  * for NULL or empty input (matching `CASE WHEN length(text) > 0`).
  *
  * Replaces the `array_sort(transform(...)) |> aggregate(...)` pipeline
  * in the `text_char_diversity` entry: Catalyst's ArrayAggregate copies
  * its struct accumulator on every element step and ArraySort compares
  * through an interpreted lambda, which the sf1 scale probe measured at
  * 170.9 s for one pass over 50k documents (SCALE.md round-7 probe).
  * Here the codepoints sort in a primitive int array
  * (`java.util.Arrays.sort`) and the run fold is three local longs.
  *
  * Semantics are bit-identical to the declarative form (OpsSpec keeps it
  * as the parity reference): Spark's `length`/`substring` count
  * codepoints, single-codepoint UTF8Strings compare in UTF-8 byte order
  * — which equals codepoint order — and equality of single-codepoint
  * strings is codepoint equality, so sorting an int[] of codepoints
  * reproduces the sorted-substring fold exactly, surrogate pairs
  * included.
  */
case class CharRunProfile(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("ss", LongType, nullable = false),
    StructField("k", LongType, nullable = false),
    StructField("mx", LongType, nullable = false)))

  // empty input maps to NULL even when the child is non-null
  override def nullable: Boolean = true
  override def prettyName: String = "char_run_profile"

  override def nullSafeEval(v: Any): Any =
    CharRunProfile.profile(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => s"""
      ${ev.value} = graft.plans.CharRunProfile.profile($v);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): CharRunProfile =
    copy(child = newChild)
}

object CharRunProfile {

  /** Shared kernel (interpreted eval + codegen). One codepoint-decode
    * pass, one primitive sort, one run fold. Returns null on empty text.
    */
  def profile(s: UTF8String): InternalRow = {
    val str = s.toString
    val len = str.length
    if (len == 0) return null
    val cps = new Array[Int](len) // >= codepoint count; tail unused
    var i = 0
    var n = 0
    while (i < len) {
      val cp = str.codePointAt(i)
      cps(n) = cp
      n += 1
      i += Character.charCount(cp)
    }
    java.util.Arrays.sort(cps, 0, n)
    var ss = 0L
    var k = 0L
    var mx = 0L
    var run = 1L
    var idx = 1
    while (idx < n) {
      if (cps(idx) == cps(idx - 1)) run += 1
      else {
        ss += run * run; k += 1L; if (run > mx) mx = run; run = 1L
      }
      idx += 1
    }
    ss += run * run; k += 1L; if (run > mx) mx = run
    new GenericInternalRow(Array[Any](ss, k, mx))
  }

  def apply(c: Column): Column =
    GraftBridge.column(CharRunProfile(GraftBridge.expression(c)))
}
