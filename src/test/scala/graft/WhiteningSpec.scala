package graft

import org.apache.spark.sql.functions._
import graft.sim.Whitening

/** The non-SQL-expressible side of whitening (Cholesky, transform) is
  * spec-gated here by CONTRACT rather than values: the whitened
  * corpus has sample mean ≈ 0 and sample covariance ≈ I — exactly the
  * properties y = L⁻¹(x − μ) guarantees when (μ, Σ) are the corpus's
  * own moments (up to the ridge and float error). The distributed
  * moments plumbing is additionally ORACLE-gated in the registry
  * (q113_whitening_moments).
  */
class WhiteningSpec extends SparkSpec {
  import spark.implicits._

  private val D = 8

  // deterministic anisotropic corpus: correlated dims, distinct scales
  private def corpus() = {
    val rows = (1 to 200).map { k =>
      val base = (1 to D).map(d =>
        math.sin(k * d * 0.7) * d + math.cos(k * 0.3) * 2.0)
      (k.toLong, base.toArray)
    }
    rows.toDF("vec_id", "emb")
  }

  test("moments: distributed mean/covariance match a driver-side " +
    "reference computation exactly (same arithmetic, one aggregate)") {
    val df = corpus()
    val data = df.as[(Long, Array[Double])].collect().map(_._2)
    val n = data.length.toDouble
    val mu0 = Array.tabulate(D)(i => data.map(_(i)).sum / n)
    val (mu, cov) = Whitening.moments(df, "emb", D)
    (0 until D).foreach { i =>
      assert(math.abs(mu(i) - mu0(i)) < 1e-9, s"mu($i)")
    }
    // spot-check a covariance entry against the naive formula
    val c03 = data.map(v => v(0) * v(3)).sum / n - mu0(0) * mu0(3)
    assert(math.abs(cov(0)(3) - c03) < 1e-9)
    assert(math.abs(cov(0)(3) - cov(3)(0)) < 1e-12, "symmetry")
  }

  test("whiten: sample covariance of the whitened corpus is the " +
    "identity and its mean is zero") {
    val out = Whitening.whiten(corpus(), "emb", D)
    val (muW, covW) = Whitening.moments(out, "whitened", D)
    (0 until D).foreach { i =>
      assert(math.abs(muW(i)) < 1e-9, s"whitened mean dim $i: ${muW(i)}")
      (0 until D).foreach { j =>
        val want = if (i == j) 1.0 else 0.0
        assert(math.abs(covW(i)(j) - want) < 1e-5,
          s"whitened cov($i,$j) = ${covW(i)(j)}")
      }
    }
  }

  test("cholesky/invertLower: LL^T reproduces the input and W L = I") {
    val (_, cov) = Whitening.moments(corpus(), "emb", D)
    val l = Whitening.cholesky(cov)
    val w = Whitening.invertLower(l)
    (0 until D).foreach { i =>
      (0 until D).foreach { j =>
        val llt = (0 until D).map(k => l(i)(k) * l(j)(k)).sum
        val ridge = if (i == j) 1e-9 else 0.0
        assert(math.abs(llt - cov(i)(j) - ridge) < 1e-9, s"LLt($i,$j)")
        val wl = (0 until D).map(k => w(i)(k) * l(k)(j)).sum
        assert(math.abs(wl - (if (i == j) 1.0 else 0.0)) < 1e-9,
          s"WL($i,$j)")
      }
    }
  }

  test("ragged input: a short embedding array fails moments() loudly " +
    "instead of silently skewing mu/Sigma") {
    val df = corpus().withColumn("emb",
      when(col("vec_id") === 7, slice(col("emb"), 1, D - 2))
        .otherwise(col("emb")))
    val e = intercept[IllegalArgumentException] {
      Whitening.moments(df, "emb", D)
    }
    assert(e.getMessage.contains("ragged"), e.getMessage)
  }

  test("null elements: a null inside an embedding array fails " +
    "moments() loudly") {
    val df = corpus().withColumn("emb",
      when(col("vec_id") === 3,
        transform(col("emb"), (x, idx) =>
          when(idx === 2, lit(null).cast("double")).otherwise(x)))
        .otherwise(col("emb")))
    val e = intercept[IllegalArgumentException] {
      Whitening.moments(df, "emb", D)
    }
    assert(e.getMessage.contains("null elements"), e.getMessage)
  }

  test("degenerate direction: a constant dimension is survived by the " +
    "ridge instead of crashing the factorization") {
    val df = corpus().withColumn("emb",
      concat(col("emb"), array(lit(5.0)))) // dim D+1 is constant
    val out = Whitening.whiten(df, "emb", D + 1)
    assert(out.count() == 200)
  }
}
