package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.DotProduct

/** Engine extension point, activated with
  * `spark.sql.extensions=graft.GraftExtensions` (Bench, Verify, and the
  * test harness all set it at builder time).
  *
  * Registers the engine's native Catalyst expressions in the session
  * function registry so they are first-class functions — resolvable from
  * `call_function` and `spark.sql(...)` alike, participating in
  * whole-stage codegen like any built-in.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(args.length == 2, "graft_dot takes exactly 2 arguments")
        DotProduct(args.head, args(1))
      }))
  }
}
