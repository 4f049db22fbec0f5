package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers graft's native expressions
  * into the SQL function registry so `spark.sql("SELECT graft_dot(a, b)")`
  * works next to the Scala Column API.
  *
  * Enable with:
  * `SparkSession.builder.config("spark.sql.extensions", "graft.plans.GraftExtensions")`
  *
  * This is the full extension surface the engine needs: no custom parser
  * rules, optimizer rules, or strategies are required for parity (SURVEY
  * §4 — Catalyst built-ins cover the reference's optimizations); the only
  * genuine extension point is the vector-expression hot path.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_dot(a, b) takes 2 arguments")
        DotProduct(children.head, children(1))
      }))
  }
}
