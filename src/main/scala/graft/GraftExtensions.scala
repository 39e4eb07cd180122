package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{CosineSimilarity, LshBucketSig}

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
    // lsh_bucket(emb, table, nBits, dim) — the hyperplane parameters must
    // be foldable integer literals (they fix the weight matrix at plan
    // time; see LshBucketSig)
    ext.injectFunction((
      new FunctionIdentifier("lsh_bucket"),
      new ExpressionInfo(classOf[LshBucketSig].getName, "lsh_bucket"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 4,
          "lsh_bucket takes (embedding, table, nBits, dim)")
        def intLit(e: org.apache.spark.sql.catalyst.expressions.Expression,
            name: String): Int = e match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"lsh_bucket $name must be an integer literal, got $other")
        }
        LshBucketSig(children.head, intLit(children(1), "table"),
          intLit(children(2), "nBits"), intLit(children(3), "dim"))
      }))
    ext.injectOptimizerRule(_ => graft.plans.RangeJoinRewrite)
  }
}
