package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Distributed PCA over an embedding column — the dimensionality
  * reducer vector pipelines run before indexing (OPQ-style rotations,
  * Matryoshka-truncation sanity checks, whitening before cosine
  * dedup). The 100 TB shape is the whole point:
  *
  *  1. FIT is ONE pass: a typed [[Aggregator]] accumulates
  *     (n, Σx, upper-triangular ΣxxT) per partition — the buffer is
  *     d + d(d+1)/2 doubles (~17 KB at d=64), map-side combined, so
  *     the corpus never shuffles and the driver receives one partial
  *     per partition, NOT per row (the q91 "model-sized partials"
  *     doctrine applied to second moments).
  *  2. The eigensolve happens on the DRIVER on the d×d covariance —
  *     cyclic Jacobi, deterministic, O(d³) on a 64×64 matrix; there
  *     is nothing distributed-worthy about a 32 KB matrix (same
  *     division of labor as [[Similarity]]'s k-means: data-sized work
  *     in the cluster, model-sized math local).
  *  3. PROJECT is a narrow per-row map over broadcast-literal
  *     components (native HOF expressions, no UDF): y_j = x·W_j −
  *     (mean·W_j), with the mean-dot folded into a per-component
  *     scalar so centering costs nothing per row.
  *
  * Population (1/n) covariance; components are rows (component j =
  * `components(j)`), descending eigenvalue. Nothing here assumes
  * orthonormality when MEASURING — reconstruction error is computed
  * by explicitly rebuilding x̂ = mean + Wᵀy per row, which is what
  * lets q156 gate the eigensolver against the spectrum's prediction
  * instead of trusting it.
  */
object Pca {

  final case class PcaModel(n: Long, mean: Array[Double],
                            eigenvalues: Array[Double],
                            components: Array[Array[Double]],
                            covTrace: Double) {
    def d: Int = mean.length
    def k: Int = components.length
    /** trace of the covariance = total variance. */
    def trace: Double = eigenvalues.sum
    /** Jacobi invariant: rotations preserve the trace, so the spectrum
      * must sum to the covariance diagonal's own sum — [[covTrace]] is
      * recorded BEFORE the solve precisely so this is a real check,
      * not an identity. */
    def traceConsistent: Boolean =
      math.abs(eigenvalues.sum - covTrace) <= 1e-9 * math.max(covTrace, 1e-300)
    /** spectrum-predicted mean-squared reconstruction error per
      * coordinate when keeping this model's k components. */
    def predictedMse: Double =
      (eigenvalues.sum - eigenvalues.take(k).sum) / d
  }

  /** (n, Σx, upper ΣxxT) one-pass moment accumulator. `s`/`ss` are
    * null until the first vector arrives — the dimension comes from
    * the DATA, so the fit needs no separate dim-probe job (r14 verdict
    * hygiene: the old `probe.head()` was an extra tiny job per fit).
    * Public only because `Encoders.kryo` refuses non-public classes;
    * not API.
    */
  final class Moments(var n: Long, var s: Array[Double],
                      var ss: Array[Double]) extends Serializable

  private def momentsAgg(): Aggregator[Seq[Float], Moments, Moments] =
    new Aggregator[Seq[Float], Moments, Moments] {
      override def zero: Moments = new Moments(0L, null, null)
      override def reduce(b: Moments, x: Seq[Float]): Moments = {
        if (b.s == null) {
          b.s = new Array[Double](x.length)
          b.ss = new Array[Double](x.length * (x.length + 1) / 2)
        }
        val d = b.s.length
        require(x.length == d, s"vector dim ${x.length} != fitted d=$d")
        val v = new Array[Double](d)
        var i = 0
        while (i < d) { v(i) = x(i).toDouble; b.s(i) += v(i); i += 1 }
        var t = 0
        i = 0
        while (i < d) {
          var j = i
          while (j < d) { b.ss(t) += v(i) * v(j); j += 1; t += 1 }
          i += 1
        }
        b.n += 1; b
      }
      override def merge(a: Moments, b: Moments): Moments = {
        if (a.s == null) return b
        if (b.s == null) return a
        require(a.s.length == b.s.length,
          s"moment partials disagree on dim: ${a.s.length} vs ${b.s.length}")
        var i = 0
        while (i < a.s.length) { a.s(i) += b.s(i); i += 1 }
        i = 0
        while (i < a.ss.length) { a.ss(i) += b.ss(i); i += 1 }
        a.n += b.n; a
      }
      override def finish(r: Moments): Moments = r
      override def bufferEncoder: Encoder[Moments] = Encoders.kryo[Moments]
      override def outputEncoder: Encoder[Moments] = Encoders.kryo[Moments]
    }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: returns
    * (eigenvalues desc, eigenvectors as ROWS, same order).
    * Deterministic — fixed sweep order, convergence on the
    * off-diagonal Frobenius mass relative to the total, hard sweep cap
    * with a fail-loud (a non-converging 64×64 symmetric Jacobi means
    * NaN/Inf input, not a numerics corner: Jacobi converges
    * unconditionally on finite symmetric input).
    */
  private[ops] def jacobiEigen(m: Array[Array[Double]])
      : (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = m.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    def offMass(): Double = {
      var s = 0.0
      var i = 0
      while (i < d) { var j = i + 1; while (j < d) { s += a(i)(j) * a(i)(j); j += 1 }; i += 1 }
      s
    }
    def totalMass(): Double = {
      var s = 0.0
      var i = 0
      while (i < d) { var j = 0; while (j < d) { s += a(i)(j) * a(i)(j); j += 1 }; i += 1 }
      s
    }
    val tol = 1e-24 * math.max(totalMass(), Double.MinPositiveValue)
    var sweep = 0
    while (offMass() > tol && sweep < 100) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > 0.0) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t = math.signum(theta) match {
              case 0.0 => 1.0 / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
              case sg  => sg / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var i = 0
            while (i < d) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < d) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    require(offMass() <= tol,
      "jacobiEigen: no convergence in 100 sweeps — non-finite input?")
    val order = (0 until d).sortBy(i => -a(i)(i))
    (order.map(i => a(i)(i)).toArray,
      order.map(j => Array.tabulate(d)(i => v(i)(j))).toArray)
  }

  /** One corpus pass → moments → driver eigensolve → top-k model. */
  def fit(df: DataFrame, vecCol: String, k: Int): PcaModel =
    fit(df, vecCol, k, centered = true)

  /** `centered = false` eigendecomposes the raw SECOND MOMENT E[xxᵀ]
    * instead of the covariance — truncated SVD (LSA). This is the
    * fit retrieval wants: with a nonzero corpus mean, full-space
    * cosine is dominated by the shared mean direction, which
    * covariance-PCA by definition discards — a centered-fit reduced
    * space can lose the neighborhood structure entirely (measured in
    * PcaSpec: rank-2+mean data drops to ~0.44 recall under the
    * centered fit, ≈1.0 under the uncentered one). The model's mean
    * is zeros, so [[project]]/[[reconstructionSqErr]] compose
    * unchanged, and `predictedMse`/`trace` read as second-moment
    * mass rather than variance.
    */
  def fit(df: DataFrame, vecCol: String, k: Int, centered: Boolean): PcaModel = {
    val spark = df.sparkSession
    import spark.implicits._
    val probe = df.select(col(vecCol)).as[Seq[Float]](ExpressionEncoder())
    // ONE pass total: the aggregator discovers the dimension from the
    // first vector it sees (no separate dim-probe job — r14 hygiene)
    val mom = probe.select(momentsAgg().toColumn).head()
    require(mom.n > 1, s"fitPca: need >1 vectors, got ${mom.n}")
    val d = mom.s.length
    require(k > 0 && k <= d, s"k=$k out of range for d=$d")
    val n = mom.n.toDouble
    val mean =
      if (centered) mom.s.map(_ / n) else new Array[Double](d)
    val cov = Array.ofDim[Double](d, d)
    var t = 0
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val c = mom.ss(t) / n - mean(i) * mean(j)
        cov(i)(j) = c; cov(j)(i) = c
        j += 1; t += 1
      }
      i += 1
    }
    val diagTrace = (0 until d).map(i => cov(i)(i)).sum
    val (evals, evecs) = jacobiEigen(cov)
    PcaModel(mom.n, mean, evals, evecs.take(k), diagTrace)
  }

  /** y = W(x − mean) as an array<double> column: per component j a
    * single fold over the vector plus the precomputed mean·W_j scalar
    * — k·d multiply-adds per row, components ride the plan as
    * literals (driver-broadcast), no shuffle.
    */
  def project(vec: Column, model: PcaModel): Column =
    project(vec, model, center = true)

  /** `center = false` gives y = x·W without the mean shift — the
    * LSA/truncated-SVD convention for COSINE retrieval, where
    * centering moves the origin and distorts angles; use centered
    * scores for variance analysis/whitening, uncentered for
    * similarity search in the reduced space.
    */
  def project(vec: Column, model: PcaModel, center: Boolean): Column = {
    val comps = typedLit(model.components.map(_.toSeq).toSeq)
    val offs = typedLit(model.components.map(w =>
      if (center) w.zip(model.mean).map { case (a, b) => a * b }.sum
      else 0.0).toSeq)
    transform(sequence(lit(0), lit(model.k - 1)), j =>
      aggregate(
        zip_with(vec, element_at(comps, j + 1),
          (x, w) => x.cast("double") * w),
        lit(0.0), (acc, e) => acc + e) - element_at(offs, j + 1))
  }

  /** Per-row squared reconstruction error Σᵢ(xᵢ − x̂ᵢ)², x̂ = mean +
    * Wᵀy rebuilt EXPLICITLY (no orthonormality assumption — this is
    * the measurement that catches a broken eigensolver). `compT` is
    * the transposed component matrix so the inner fold per coordinate
    * touches one literal row.
    *
    * CALLER CONTRACT: `proj` must be a MATERIALIZED column (a
    * persisted stage boundary or at least a read-back attribute) — the
    * rebuild references it once per output coordinate, and Catalyst
    * inlines (never CSEs) interpreted higher-order subtrees, so
    * passing `project(...)` inline re-evaluates the k·d projection d
    * times: O(d²·k) per row, measured 24 s vs ~2 s at sf0.1 (r14
    * verdict #2).
    */
  def reconstructionSqErr(vec: Column, proj: Column, model: PcaModel): Column = {
    val d = model.d
    val meanC = typedLit(model.mean.toSeq)
    val compT = typedLit(
      (0 until d).map(i => model.components.map(_(i)).toSeq).toSeq)
    val xhat = transform(sequence(lit(0), lit(d - 1)), i =>
      element_at(meanC, i + 1) +
        aggregate(zip_with(proj, element_at(compT, i + 1),
          (y, w) => y * w), lit(0.0), (acc, e) => acc + e))
    aggregate(
      zip_with(vec, xhat, (x, h) => (x.cast("double") - h) * (x.cast("double") - h)),
      lit(0.0), (acc, e) => acc + e)
  }
}
