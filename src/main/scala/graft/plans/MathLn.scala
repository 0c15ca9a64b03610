package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Natural log via `java.lang.Math.log` — NOT Spark's builtin `log`,
  * which calls `StrictMath.log` (mathExpressions.scala). On this platform
  * `Math.log` is the correctly-rounded libm value and bit-matches DuckDB's
  * `ln`, while `StrictMath.log` (fdlibm) differs in the last ulp on some
  * inputs (e.g. ln(999/50000)) — a 1-ulp difference that strict oracle
  * hash-comparison would amplify into a failure. Codegen'd like [[Hash60]];
  * used by every log-probability operator whose output is oracle-compared.
  */
case class MathLn(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "math_ln"

  override protected def nullSafeEval(input: Any): Any =
    java.lang.Math.log(input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"java.lang.Math.log($c)")

  override protected def withNewChildInternal(newChild: Expression): MathLn =
    copy(child = newChild)
}

object MathLn {
  def apply(c: Column): Column =
    GraftBridge.column(MathLn(GraftBridge.expression(c.cast("double"))))
}
