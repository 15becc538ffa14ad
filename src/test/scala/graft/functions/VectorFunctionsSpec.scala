package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VectorFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq(
    (1L, Seq(1.0f, 0.0f)),
    (2L, Seq(0.0f, 2.0f)),
    (3L, Seq(3.0f, 0.0f)),
    (4L, Seq(0.0f, 0.0f))
  ).toDF("id", "v")

  test("dot and norm") {
    val d = Seq((Seq(1.0f, 2.0f), Seq(3.0f, 4.0f))).toDF("a", "b")
      .select(VectorFunctions.dot($"a", $"b")).as[Double].head()
    assert(d == 11.0)
    val n = vecs.filter($"id" === 3L).select(VectorFunctions.norm($"v")).as[Double].head()
    assert(n == 3.0)
  }

  test("cosine: parallel → 1, orthogonal → 0, zero vector → 0") {
    val pairs = vecs.as("a").crossJoin(vecs.as("b"))
      .select($"a.id".as("ia"), $"b.id".as("ib"),
        VectorFunctions.cosine($"a.v", $"b.v").as("c"))
      .as[(Long, Long, Double)].collect()
      .map { case (i, j, c) => (i, j) -> c }.toMap
    assert(math.abs(pairs((1L, 3L)) - 1.0) < 1e-12)
    assert(pairs((1L, 2L)) == 0.0)
    assert(pairs((1L, 4L)) == 0.0)
  }

  test("normalize produces unit vectors; zero vector stays zero") {
    val out = vecs.select($"id", VectorFunctions.normalize($"v").as("n"))
      .as[(Long, Seq[Double])].collect().toMap
    assert(out(3L) == Seq(1.0, 0.0))
    assert(out(4L) == Seq(0.0, 0.0))
  }

  test("lsh bucket is deterministic and groups identical directions") {
    val b = vecs.select($"id", VectorFunctions.hyperplaneLshBucket($"v", 8).as("b"))
      .as[(Long, Long)].collect().toMap
    val b2 = vecs.select($"id", VectorFunctions.hyperplaneLshBucket($"v", 8).as("b"))
      .as[(Long, Long)].collect().toMap
    assert(b == b2, "same plan, same buckets")
    assert(b(1L) == b(3L), "same direction, same bucket")
    assert(b.values.forall(v => v >= 0 && v < 256))
  }

  test("dot_product is callable from spark.sql after registerSql") {
    org.apache.spark.sql.graft.VectorExpressions.registerSql(spark)
    vecs.createOrReplaceTempView("vfs_vecs")
    val d = spark.sql(
      """SELECT dot_product(a.v, b.v) AS d
         FROM vfs_vecs a JOIN vfs_vecs b ON a.id = 1 AND b.id = 3""")
      .as[Double].head()
    assert(d == 3.0)
  }

  test("ivf cell is stable and within range") {
    val c = vecs.select($"id", VectorFunctions.ivfCell($"v", 16).as("c"))
      .as[(Long, Long)].collect().toMap
    assert(c.values.forall(v => v >= 0 && v < 16))
  }
}
