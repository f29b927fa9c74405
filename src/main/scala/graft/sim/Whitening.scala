package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding WHITENING (Mahalanobis / ZCA-from-Cholesky): y =
  * L⁻¹(x − μ) with Σ = LLᵀ the corpus covariance — the
  * retrieval-quality normalization that removes anisotropy from an
  * embedding space (dominant directions stop swamping cosine/dot
  * scores; standard post-processing before ANN indexing).
  *
  * Distribution of work, sized for 100 TB:
  *
  *  - MOMENTS are one aggregation at D and D² grain: per-dimension
  *    sums via posexplode → groupBy(i), and second moments via the
  *    in-row flattened outer product → groupBy(i, j). The map-side
  *    partial aggregate collapses every partition to ≤ D² rows, so
  *    the shuffle carries O(D²·partitions) regardless of corpus size
  *    (D=64 → 4096 groups); the per-row D² multiply is the
  *    irreducible cost of covariance.
  *  - FACTORIZATION is driver-side on the D×D matrix (Cholesky +
  *    forward substitution, plain arrays below): D² doubles is
  *    kilobytes; no distributed linear algebra needed or wanted.
  *  - TRANSFORM is map-only: μ and the rows of W = L⁻¹ broadcast as
  *    array literals, each output component one codegen'd
  *    [[graft.functions.DotProductF]] over the centered vector — no
  *    shuffle, no UDF, 2·D² flops per row.
  *
  * Correctness gating is split along the SQL-expressibility line:
  * the distributed MOMENTS plumbing (the only part that touches the
  * corpus) is oracled against DuckDB at (i, j) grain in integer
  * micro-units (registry query q113_whitening_moments); the
  * driver-side Cholesky/inverse and the whitening transform — not
  * expressible in SQL — are spec-gated instead (WhiteningSpec pins
  * the mathematical CONTRACT: whitened sample covariance ≈ I,
  * whitened mean ≈ 0, which is a far stronger check than value
  * matching). The ridge `eps` keeps Σ positive-definite when some
  * direction is degenerate (duplicated dims, corpus smaller than D).
  */
object Whitening {

  /** (μ, Σ) of the `embCol` array<float/double> column of `df`,
    * computed distributed as documented above. `dim` must match the
    * arrays' length.
    */
  def moments(df: DataFrame, embCol: String, dim: Int): (Array[Double], Array[Array[Double]]) = {
    val x = col(embCol)
    val asD = transform(x, v => v.cast("double"))
    // one pass: per-row flattened [x_i · x_j | i≤j] plus the vector
    // itself; upper triangle only (Σ is symmetric) — D(D+1)/2 groups
    val pairs = df.select(asD.as("v"))
      .select(col("v"), posexplode(col("v")).as(Seq("i", "xi")))
      .select(col("xi"), col("i"),
        posexplode(slice(col("v"), col("i") + 1, lit(dim))).as(Seq("dj", "xj")))
      .select(col("i"), (col("i") + col("dj")).as("j"),
        (col("xi") * col("xj")).as("xx"), col("xi"))
    val agg = pairs.groupBy("i", "j")
      .agg(sum("xx").as("sxx"),
        sum(when(col("i") === col("j"), col("xi"))).as("sx"),
        count(col("xx")).as("nxx"),
        count(lit(1)).as("cnt"))
      .collect() // ≤ D(D+1)/2 rows — driver-bounded by construction
    // ragged input must fail LOUDLY, not skew the moments: a short
    // array starves its high-(i, j) groups (fewer rows), a long one
    // mints groups beyond dim, a null element drops its product from
    // sum but not from the row count — each of the three checks below
    // catches exactly one of those silently-wrong shapes
    require(agg.length == dim * (dim + 1) / 2,
      s"expected ${dim * (dim + 1) / 2} moment groups for dim=$dim, " +
        s"got ${agg.length}: embedding arrays are not uniformly length $dim")
    val cnts = agg.map(_.getLong(5)).distinct
    require(cnts.length == 1,
      s"moment groups disagree on row count (${cnts.sorted.mkString(",")}): " +
        s"embedding arrays are ragged, not uniformly length $dim")
    require(agg.forall(r => r.getLong(4) == r.getLong(5)),
      "embedding arrays contain null elements")
    val n = cnts.head.toDouble
    require(n > 1, s"whitening needs >1 vectors, got $n")
    val mu = new Array[Double](dim)
    val exx = Array.ofDim[Double](dim, dim)
    agg.foreach { r =>
      val (i, j) = (r.getInt(0), r.getInt(1))
      exx(i)(j) = r.getDouble(2) / n
      exx(j)(i) = exx(i)(j)
      if (i == j) mu(i) = r.getDouble(3) / n
    }
    val cov = Array.tabulate(dim, dim)((i, j) => exx(i)(j) - mu(i) * mu(j))
    (mu, cov)
  }

  /** Lower-triangular Cholesky factor of SPD `a` (+`eps` ridge). */
  def cholesky(a: Array[Array[Double]], eps: Double = 1e-9): Array[Array[Double]] = {
    val d = a.length
    val l = Array.ofDim[Double](d, d)
    var i = 0
    while (i < d) {
      var j = 0
      while (j <= i) {
        var s = a(i)(j) + (if (i == j) eps else 0.0)
        var k = 0
        while (k < j) { s -= l(i)(k) * l(j)(k); k += 1 }
        if (i == j) {
          require(s > 0, s"covariance not positive definite at $i")
          l(i)(i) = math.sqrt(s)
        } else l(i)(j) = s / l(j)(j)
        j += 1
      }
      i += 1
    }
    l
  }

  /** W = L⁻¹ by forward substitution on the identity (lower tri). */
  def invertLower(l: Array[Array[Double]]): Array[Array[Double]] = {
    val d = l.length
    val w = Array.ofDim[Double](d, d)
    var c = 0
    while (c < d) {
      var i = c
      while (i < d) {
        var s = if (i == c) 1.0 else 0.0
        var k = c
        while (k < i) { s -= l(i)(k) * w(k)(c); k += 1 }
        w(i)(c) = s / l(i)(i)
        i += 1
      }
      c += 1
    }
    w
  }

  /** The whitening transform y = W(x − μ) as a Column over `emb` —
    * map-only, each component a codegen'd dot product against a
    * broadcast literal row of W.
    */
  def whitenCol(emb: Column, mu: Array[Double], w: Array[Array[Double]]): Column = {
    val centered = zip_with(transform(emb, v => v.cast("double")),
      typedLit(mu.toSeq), (x, m) => x - m)
    array(w.map(row =>
      graft.functions.DotProductF(typedLit(row.toSeq), centered)): _*)
  }

  /** df + `outCol` = whitened `embCol`: fits (μ, Σ) on `df` itself
    * and applies the transform. At pipeline scale the fit runs on a
    * SAMPLE and the (μ, W) artifact is stored/broadcast; the math is
    * identical.
    */
  def whiten(df: DataFrame, embCol: String, dim: Int,
      outCol: String = "whitened"): DataFrame = {
    val (mu, cov) = moments(df, embCol, dim)
    val w = invertLower(cholesky(cov))
    df.withColumn(outCol, whitenCol(col(embCol), mu, w))
  }
}
