package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: exposes the engine's native
  * expressions to SQL users.
  *
  * Activate with `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`; then
  * `SELECT hash60(col), dot_product(a, b) FROM ...` runs the codegen'd
  * natives directly from SQL.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("hash60"),
      new ExpressionInfo(classOf[Hash60].getName, "hash60"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "hash60(expr) takes one argument")
        Hash60(args.head)
      }))
    e.injectFunction((
      FunctionIdentifier("strip_accents"),
      new ExpressionInfo(classOf[StripAccents].getName, "strip_accents"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "strip_accents(expr) takes one argument")
        StripAccents(args.head)
      }))
    e.injectFunction((
      FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinkler].getName, "jaro_winkler"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "jaro_winkler(a, b) takes two arguments")
        JaroWinkler(args.head, args(1))
      }))
    e.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "dot_product(a, b) takes two arguments")
        DotProduct(args.head, args(1))
      }))
  }
}
