package graft

import graft.operators.Embeddings
import org.apache.spark.sql.functions._

/** Embedding-matrix statistics (D3 adjunct): whitening stats, whitened
  * norms, and the power-iteration eigenpair — each pinned against an
  * independent driver-side recomputation over the collected sf0.001
  * vectors. */
class EmbeddingsSpec extends SparkSpec {

  private lazy val vectors: Array[Array[Double]] =
    Tables.embeddings(spark, sf).select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)

  test("per-dimension stats match a driver recomputation") {
    val got = Embeddings.dimStats(spark, sf).collect()
      .map(r => r.getAs[Int]("dim") ->
        (r.getAs[Long]("n"), r.getAs[Double]("mean"), r.getAs[Double]("variance"))).toMap
    assert(got.size === 64)
    val n = vectors.length
    (0 until 64).foreach { dim =>
      val xs = vectors.map(_(dim))
      val mu = xs.sum / n
      val v = xs.map(x => (x - mu) * (x - mu)).sum / n
      assert(got(dim)._1 === n.toLong)
      assert(math.abs(got(dim)._2 - mu) < 1e-5, s"dim $dim mean")
      assert(math.abs(got(dim)._3 - v) < 1e-5, s"dim $dim variance")
    }
  }

  test("whitened norms: mean square ~= n_dims (the defining whitening property)") {
    val norms = Embeddings.whitenedNorms(spark, sf).collect()
      .map(_.getAs[Double]("whitened_norm"))
    assert(norms.length === vectors.length)
    // after exact per-dim standardization, E[Σ w²] = 64 by construction
    val meanSq = norms.map(x => x * x).sum / norms.length
    assert(math.abs(meanSq - 64.0) < 0.5, s"mean squared whitened norm $meanSq")
  }

  test("covariance model matches a driver recomputation") {
    val (n, mean, cov) = Embeddings.covarianceModel(spark, sf)
    assert(n === vectors.length.toLong)
    val nn = vectors.length
    val expectedMean = (0 until 64).map(i => vectors.map(_(i)).sum / nn)
    (0 until 64).foreach(i => assert(math.abs(mean(i) - expectedMean(i)) < 1e-9, s"mean $i"))
    // spot-check covariance entries across the matrix, including off-diagonal
    for (i <- Seq(0, 7, 31, 63); j <- Seq(0, 13, 63)) {
      val e = vectors.map(v => (v(i) - expectedMean(i)) * (v(j) - expectedMean(j))).sum / nn
      assert(math.abs(cov(i * 64 + j) - e) < 1e-9, s"cov($i,$j)")
    }
    // symmetry
    for (i <- 0 until 64; j <- 0 until i)
      assert(math.abs(cov(i * 64 + j) - cov(j * 64 + i)) < 1e-12)
  }

  test("jacobi eigensolver finds a true eigenpair: Cv = lambda*v and lambda dominates") {
    val (_, _, cov) = Embeddings.covarianceModel(spark, sf)
    val (v, lambda) = Embeddings.topPrincipalComponent(cov)
    assert(math.abs(math.sqrt(v.map(e => e * e).sum) - 1.0) < 1e-12, "unit norm")
    // residual ||Cv - lambda v|| must be tiny relative to lambda
    val cv = Array.tabulate(64) { i =>
      (0 until 64).map(j => cov(i * 64 + j) * v(j)).sum
    }
    val residual = math.sqrt(cv.zip(v).map { case (a, b) => (a - lambda * b) * (a - lambda * b) }.sum)
    assert(residual < 1e-6 * math.max(lambda, 1e-12), s"residual $residual vs lambda $lambda")
    // the top eigenvalue of a covariance matrix dominates every diagonal entry
    val maxDiag = (0 until 64).map(i => cov(i * 64 + i)).max
    assert(lambda >= maxDiag - 1e-9)
  }

  test("covariance inverse is a true inverse: C * C^-1 = I") {
    val (_, _, cov) = Embeddings.covarianceModel(spark, sf)
    val inv = Embeddings.invertCovariance(cov)
    for (i <- 0 until 64; j <- Seq(0, 17, 63)) {
      val e = (0 until 64).map(k => cov(i * 64 + k) * inv(k * 64 + j)).sum
      val expected = if (i == j) 1.0 else 0.0
      assert(math.abs(e - expected) < 1e-6, s"(C*Cinv)($i,$j) = $e")
    }
  }

  test("mahalanobis: all scores nonnegative, mean exactly d (population identity)") {
    val scores = Embeddings.mahalanobis(spark, sf).collect()
    assert(scores.length === vectors.length)
    assert(scores.forall(_._2 >= 0.0), "a squared Mahalanobis distance went negative")
    val mean = scores.map(_._2).sum / scores.length
    // trace(C^-1 C) = d exactly; the 1e-9 ridge perturbs at ~1e-6
    assert(math.abs(mean - 64.0) < 1e-4, s"population identity broken: mean m2 = $mean")
    // the score separates: the max must clearly exceed the mean
    assert(scores.map(_._2).max > mean, "no outlier signal at all")
  }

  test("pca bound query emits the pinned invariants") {
    val row = Embeddings.pcaBound(spark, sf).head()
    assert(row.getAs[Long]("n_vectors") === vectors.length.toLong)
    assert(row.getAs[Int]("n_dims") === 64)
    assert(row.getAs[Int]("unit_norm") === 1)
    assert(row.getAs[Int]("lambda_dominates") === 1)
  }
}
