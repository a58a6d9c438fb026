package graft.expr

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Registers graft's native expressions as SQL functions via the public
  * `SparkSessionExtensions` hook:
  *
  * {{{
  *   SparkSession.builder()
  *     .config("spark.sql.extensions", "graft.expr.GraftExtensions")
  *     // or .withExtensions(new GraftExtensions)
  * }}}
  *
  * After registration `SELECT array_dot(a, b)` / `array_sqdist(a, b)` work
  * from SQL and via `functions.call_function`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("array_dot"),
      new ExpressionInfo(classOf[ArrayDot].getName, "array_dot"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2, "array_dot expects 2 arguments")
        ArrayDot(children(0), children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("array_sqdist"),
      new ExpressionInfo(classOf[ArraySqDist].getName, "array_sqdist"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2, "array_sqdist expects 2 arguments")
        ArraySqDist(children(0), children(1))
      }))
  }
}
