package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.CosineSimilarity

/** Engine extension point (`spark.sql.extensions=graft.GraftExtensions`):
  * registers the library's native Catalyst expressions so they are
  * callable from SQL and via `functions.call_function`. The public
  * extension mechanism — no internal APIs — which is how a deployment
  * enables them cluster-wide in spark-defaults. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2, "cosine_sim takes exactly 2 arguments")
        CosineSimilarity(children.head, children(1))
      }))
    ext.injectOptimizerRule(_ => graft.plans.RangeJoinRewrite)
  }
}
