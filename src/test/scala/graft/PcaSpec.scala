package graft

import org.apache.spark.sql.functions._
import graft.operators.{Pca, TextAnalysis}

class PcaSpec extends SparkSpec {
  import spark.implicits._

  private def approx(a: Double, b: Double, tol: Double = 1e-9): Boolean =
    math.abs(a - b) <= tol

  test("symEigen recovers the analytic eigenpairs of [[2,1],[1,2]]") {
    val (vals, vecs) = Pca.symEigen(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(approx(vals(0), 3.0) && approx(vals(1), 1.0))
    val r = 1.0 / math.sqrt(2.0)
    assert(approx(vecs(0)(0), r) && approx(vecs(0)(1), r))
    // sign convention: largest-|component| entry positive (first index
    // wins the tie here)
    assert(approx(math.abs(vecs(1)(0)), r) && approx(math.abs(vecs(1)(1)), r))
    assert(approx(vecs(1)(0) * vecs(1)(1), -0.5))
  }

  test("symEigen is exact on a diagonal matrix and sorts descending") {
    val (vals, vecs) = Pca.symEigen(Array(
      Array(1.0, 0.0, 0.0), Array(0.0, 5.0, 0.0), Array(0.0, 0.0, 3.0)))
    assert(vals.toSeq == Seq(5.0, 3.0, 1.0))
    assert(vecs(0).toSeq == Seq(0.0, 1.0, 0.0))
    assert(vecs(1).toSeq == Seq(0.0, 0.0, 1.0))
  }

  test("fused moments + covariance match a hand computation (dim 2)") {
    // vectors (1,2), (3,4), (5,0): means (3, 2);
    // cov_00 = E[x²]−μ₀² = (1+9+25)/3 − 9 = 8/3
    // cov_01 = E[xy]−μ₀μ₁ = (2+12+0)/3 − 6 = −4/3
    // cov_11 = (4+16+0)/3 − 4 = 8/3
    val df = Seq(Seq(1.0f, 2.0f), Seq(3.0f, 4.0f), Seq(5.0f, 0.0f))
      .toDF("embedding")
    val cov = Pca.covarianceUT(Pca.moments(df, "embedding", 2))
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(3))).toMap
    assert(approx(cov((0, 0)), 8.0 / 3.0, 1e-6))
    assert(approx(cov((0, 1)), -4.0 / 3.0, 1e-6))
    assert(approx(cov((1, 1)), 8.0 / 3.0, 1e-6))
    // malformed rows (wrong arity) are excluded from the fit
    val withBad = df.union(Seq(Seq(9.0f)).toDF("embedding"))
    val n = Pca.moments(withBad, "embedding", 2).select("n_vecs")
      .distinct().collect()
    assert(n.map(_.getLong(0)).toSeq == Seq(3L))
  }

  test("end-to-end fit on real embeddings: orthonormal model, residual, variance order") {
    val emb = Tables.embeddings(spark, sf001)
    val dim = 64
    val rows = Pca.moments(emb, "embedding", dim).collect().toSeq
    val model = Pca.fit(rows, dim)
    assert(model.eigenvalues.sliding(2).forall(p => p(0) >= p(1) - 1e-12))
    // eigenvectors orthonormal
    for (a <- 0 until 4; b <- 0 until 4) {
      val d = (0 until dim).map(i =>
        model.eigenvectors(a)(i) * model.eigenvectors(b)(i)).sum
      assert(approx(d, if (a == b) 1.0 else 0.0, 1e-8), s"v${a}.v$b = $d")
    }
    // eigen residual ‖Av − λv‖ against the covariance the fit consumed
    val cov = Array.fill(dim, dim)(0.0)
    val sx = new Array[Long](dim)
    var n = 0L
    rows.foreach { r =>
      if (r.getInt(1) == Pca.FirstMomentTag) sx(r.getInt(0)) = r.getLong(3)
      n = r.getLong(2)
    }
    rows.filter(_.getInt(1) != Pca.FirstMomentTag).foreach { r =>
      val (i, j, s) = (r.getInt(0), r.getInt(1), r.getLong(3))
      val c = (s.toDouble / Pca.FpScale) / n -
        ((sx(i).toDouble / Pca.FpScale) / n) * ((sx(j).toDouble / Pca.FpScale) / n)
      cov(i)(j) = c; cov(j)(i) = c
    }
    for (k <- 0 until 4) {
      val v = model.eigenvectors(k)
      val res = (0 until dim).map { i =>
        val av = (0 until dim).map(j => cov(i)(j) * v(j)).sum
        val r = av - model.eigenvalues(k) * v(i)
        r * r
      }.sum
      assert(math.sqrt(res) < 1e-10, s"eigen residual for component $k")
    }
    // projected variance realizes the eigenvalues, in order
    val proj = Pca.project(emb, "embedding", model.mean,
      model.eigenvectors.take(4))
    val vars = proj.select((1 to 4).map(k =>
      (sum(col(s"pc$k") * col(s"pc$k")) / count(lit(1))).as(s"v$k")): _*)
      .collect().head
    val measured = (0 until 4).map(vars.getDouble)
    measured.indices.foreach { k =>
      assert(approx(measured(k), model.eigenvalues(k), 1e-6),
        s"var(pc${k + 1}) = ${measured(k)} vs λ = ${model.eigenvalues(k)}")
    }
    assert(measured(0) > measured(3), "top component should dominate")
  }

  test("mahalanobis outlier top-k equals a full-sort recomputation") {
    val emb = Tables.embeddings(spark, sf001)
    val model = Pca.fit(Pca.moments(emb, "embedding", 64).collect().toSeq, 64)
    val proj = Pca.project(emb, "embedding", model.mean,
      model.eigenvectors.take(8))
    val md = (1 to 8).map(k =>
      (col(s"pc$k") * col(s"pc$k")) / lit(model.eigenvalues(k - 1)))
      .reduce(_ + _)
    val scored = proj.select(col("vec_id"),
      floor(md * lit(1e6) + lit(0.5)).cast("long").as("m"))
    val full = scored.collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (id, m) => (-m, id) }.take(5).toSeq
    val topk = operators.Relational.topKPerGroup(scored, Seq.empty,
      col("m"), col("vec_id"), 5)
      .orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getDouble(1).toLong)).toSeq
    assert(topk == full)
    assert(full.map(_._2).distinct.size > 1, "degenerate distances")
  }

  test("blocklistHit: whole-token words, adjacent-token phrases") {
    val df = Seq(
      (1L, "a dup here"),            // word hit
      (2L, "a duplicate here"),      // substring must NOT hit
      (3L, "the slow merge path"),   // phrase hit
      (4L, "slow and then merge"),   // non-adjacent must NOT hit
      (5L, "merge slow nothing"),    // wrong order must NOT hit
      (6L, "dup"), (7L, "")          // bare token / empty doc
    ).toDF("id", "text")
    val hits = df.select(col("id"),
      TextAnalysis.blocklistHit(col("text"), Seq("dup"), Seq("slow merge"))
        .as("b")).collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(hits == Map(1L -> true, 2L -> false, 3L -> true, 4L -> false,
      5L -> false, 6L -> true, 7L -> false))
  }
}
