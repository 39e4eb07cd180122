package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{CosinePairsWithin, CosineSimilarity, HammingPairsWithin, IdPairs, LshBucketSig, Md5Long, NfcNormalize, SigAgreePairs, TopKByScore}

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
    // nfc_normalize(string) — Unicode canonical composition (DuckDB's
    // function of the same name is the oracle twin)
    ext.injectFunction((
      new FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 1, "nfc_normalize takes exactly 1 argument")
        NfcNormalize(children.head)
      }))
    // lsh_bucket(emb, table, nBits, dim) — the hyperplane parameters must
    // be foldable integer expressions (they fix the weight matrix at
    // plan time; see LshBucketSig)
    ext.injectFunction((
      new FunctionIdentifier("lsh_bucket"),
      new ExpressionInfo(classOf[LshBucketSig].getName, "lsh_bucket"),
      GraftExtensions.lshBucketBuilder))
    // top_k_by_score(score, id, k) — bounded two-phase top-k aggregate
    ext.injectFunction((
      new FunctionIdentifier("top_k_by_score"),
      new ExpressionInfo(classOf[TopKByScore].getName, "top_k_by_score"),
      GraftExtensions.topKBuilder))
    // cosine_pairs_within(bucket, threshold) — fused near-dup pair generator
    ext.injectFunction((
      new FunctionIdentifier("cosine_pairs_within"),
      new ExpressionInfo(classOf[CosinePairsWithin].getName, "cosine_pairs_within"),
      GraftExtensions.cosinePairsBuilder))
    // id_pairs(array<bigint>) — lazy within-bucket pair enumeration
    ext.injectFunction((
      new FunctionIdentifier("id_pairs"),
      new ExpressionInfo(classOf[IdPairs].getName, "id_pairs"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 1, "id_pairs takes exactly 1 argument")
        IdPairs(children.head)
      }))
    // hamming_pairs_within(bucket, maxHamming) — fused radius pair generator
    ext.injectFunction((
      new FunctionIdentifier("hamming_pairs_within"),
      new ExpressionInfo(classOf[HammingPairsWithin].getName, "hamming_pairs_within"),
      GraftExtensions.hammingPairsBuilder))
    // sig_agree_pairs(array<struct<doc,sig>>) — pair enumeration fused
    // with the MinHash agreement count
    ext.injectFunction((
      new FunctionIdentifier("sig_agree_pairs"),
      new ExpressionInfo(classOf[SigAgreePairs].getName, "sig_agree_pairs"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 1, "sig_agree_pairs takes exactly 1 argument")
        SigAgreePairs(children.head)
      }))
    // zorder_cell(qx, qy, bits) — Morton interleave for clustered writes
    ext.injectFunction((
      new FunctionIdentifier("zorder_cell"),
      new ExpressionInfo(classOf[GraftExtensions].getName, "zorder_cell"),
      GraftExtensions.zorderBuilder))
    // md5_long56(str) — fused engine-portable 56-bit content hash
    ext.injectFunction((
      new FunctionIdentifier("md5_long56"),
      new ExpressionInfo(classOf[Md5Long].getName, "md5_long56"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 1, "md5_long56 takes exactly 1 argument")
        Md5Long(children.head)
      }))
    ext.injectOptimizerRule(_ => graft.plans.RangeJoinRewrite)
    // off unless spark.graft.guard.cartesian=true — see CartesianGuard
    ext.injectOptimizerRule(_ => graft.plans.CartesianGuard)
  }
}

object GraftExtensions {
  import org.apache.spark.sql.catalyst.expressions.Expression
  import org.apache.spark.sql.types.IntegerType

  /** The SQL builder for lsh_bucket — shared with specs so tests
    * exercise exactly the constructor the extension registers. */
  private[graft] def lshBucketBuilder(children: Seq[Expression]): Expression = {
    require(children.length == 4,
      "lsh_bucket takes (embedding, table, nBits, dim)")
    def intArg(e: Expression, name: String): Int =
      if (e.foldable && e.dataType == IntegerType &&
          e.eval() != null) e.eval().asInstanceOf[Int]
      else throw new IllegalArgumentException(
        s"lsh_bucket $name must be a foldable non-null integer expression, got $e")
    LshBucketSig(children.head, intArg(children(1), "table"),
      intArg(children(2), "nBits"), intArg(children(3), "dim"))
  }

  // SQL literals arrive typed by the parser (`10` = int, `0.5` =
  // decimal(1,1)), so the scalar-parameter builders accept any foldable
  // numeric and convert, rather than demanding one exact type.
  private def foldableNum(e: Expression, fn: String, name: String): Number =
    (if (e.foldable) e.eval() else null) match {
      case n: Number => n
      case d: org.apache.spark.sql.types.Decimal => d.toJavaBigDecimal
      case _ => throw new IllegalArgumentException(
        s"$fn $name must be a foldable non-null numeric expression, got $e")
    }

  private[graft] def topKBuilder(children: Seq[Expression]): Expression = {
    require(children.length == 3, "top_k_by_score takes (score, id, k)")
    TopKByScore(children.head, children(1),
      foldableNum(children(2), "top_k_by_score", "k").intValue())
      .toAggregateExpression()
  }

  private[graft] def cosinePairsBuilder(children: Seq[Expression]): Expression = {
    require(children.length == 2,
      "cosine_pairs_within takes (bucket, threshold)")
    CosinePairsWithin(children.head,
      foldableNum(children(1), "cosine_pairs_within", "threshold").doubleValue())
  }

  private[graft] def hammingPairsBuilder(children: Seq[Expression]): Expression = {
    require(children.length == 2,
      "hamming_pairs_within takes (bucket, maxHamming)")
    HammingPairsWithin(children.head,
      foldableNum(children(1), "hamming_pairs_within", "maxHamming").intValue())
  }

  /** zorder_cell(qx, qy, bits): the same compile-time-unrolled
    * shift/mask tree [[graft.operators.Similarity.zorderCell]] builds
    * through the Column API — all built-in codegen'd expressions, so
    * the SQL registration adds no new evaluation path to maintain. */
  private[graft] def zorderBuilder(children: Seq[Expression]): Expression = {
    import org.apache.spark.sql.catalyst.expressions.{Add, BitwiseAnd, Cast, Literal, ShiftLeft, ShiftRight}
    import org.apache.spark.sql.types.LongType
    require(children.length == 3, "zorder_cell takes (qx, qy, bits)")
    val bits = foldableNum(children(2), "zorder_cell", "bits").intValue()
    require(bits >= 1 && bits <= 31, "zorder_cell bits in [1,31]")
    val x = Cast(children.head, LongType)
    val y = Cast(children(1), LongType)
    def part(e: Expression, i: Int, off: Int): Expression =
      ShiftLeft(BitwiseAnd(ShiftRight(e, Literal(i)), Literal(1L)),
        Literal(2 * i + off))
    (0 until bits).flatMap(i => Seq(part(x, i, 0), part(y, i, 1)))
      .reduce[Expression](Add(_, _))
  }
}
