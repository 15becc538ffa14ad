package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** [[Pca]] against constructions with known answers: a rank-2 corpus
  * must be captured exactly by k=2; the spectrum must sum to the
  * covariance trace; measured reconstruction error must equal the
  * spectrum's prediction (the q156 gate property, here at spec
  * strength); projection must center (zero mean scores).
  */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  // deterministic rank-2 data in d=6: x = a*u + b*v + mean, with
  // integer-hash coefficients (no RNG — the repo-wide determinism rule)
  private val d = 6
  private val u = Array(1.0, 0.0, 1.0, 0.0, 1.0, 0.0)
  private val vv = Array(0.0, 1.0, 0.0, -1.0, 0.0, 1.0)
  private val base = Array(5.0, -3.0, 2.0, 0.0, 1.0, 4.0)
  private def row(i: Int): Seq[Float] = {
    val a = ((i * 37) % 11 - 5).toDouble
    val b = ((i * 53) % 7 - 3).toDouble
    (0 until d).map(j => (base(j) + a * u(j) + b * vv(j)).toFloat)
  }
  private lazy val df = (0 until 60).map(i => (i.toLong, row(i)))
    .toDF("vec_id", "embedding")

  test("rank-2 corpus: k=2 reconstructs exactly, spectrum sums to trace") {
    val m = Pca.fit(df, "embedding", 2)
    assert(m.n === 60L)
    assert(m.eigenvalues.length === d)
    // rank 2: eigenvalues 3..d are ~0
    assert(m.eigenvalues.drop(2).forall(e => math.abs(e) < 1e-9))
    assert(m.traceConsistent)
    assert(m.predictedMse < 1e-12)
    val mse = df.select(
      Pca.reconstructionSqErr(col("embedding"),
        Pca.project(col("embedding"), m), m).as("e"))
      .agg(avg(col("e"))).as[Double].head() / d
    assert(mse < 1e-9)
  }

  test("k=1 on rank-2 data: measured error equals the spectrum prediction") {
    val m = Pca.fit(df, "embedding", 1)
    val mse = df.select(
      Pca.reconstructionSqErr(col("embedding"),
        Pca.project(col("embedding"), m), m).as("e"))
      .agg(avg(col("e"))).as[Double].head() / d
    assert(math.abs(mse - m.predictedMse) < 1e-9 * math.max(1.0, m.trace))
    // and it is genuinely lossy: the second component carries variance
    assert(m.predictedMse > 0.1)
  }

  test("projection scores are centered and components orthonormal") {
    val m = Pca.fit(df, "embedding", 2)
    val means = df.select(Pca.project(col("embedding"), m).as("y"))
      .select(element_at(col("y"), 1).as("y1"), element_at(col("y"), 2).as("y2"))
      .agg(avg(col("y1")), avg(col("y2"))).as[(Double, Double)].head()
    assert(math.abs(means._1) < 1e-9 && math.abs(means._2) < 1e-9)
    for (a <- m.components; b <- m.components) {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val want = if (a eq b) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-9)
    }
  }

  test("dimension mismatch fails loud; k out of range rejected") {
    val bad = Seq((1L, Seq(1f, 2f, 3f)), (2L, Seq(1f, 2f))).toDF("vec_id", "embedding")
    val e = intercept[Exception](Pca.fit(bad, "embedding", 1))
    assert(e.getMessage != null)
    intercept[IllegalArgumentException](Pca.fit(df, "embedding", 7))
  }
}
