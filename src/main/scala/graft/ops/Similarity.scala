package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact cosine top-k. The query set is
  *    broadcast; the candidate table streams through once (one scan, no
  *    candidate-side shuffle before the rank). Baseline + verifier.
  *  - [[lshTopK]]: random-hyperplane LSH bucketing; only bucket-colliding
  *    pairs are scored. The scale path when the query set itself is
  *    large: both sides shuffle on the small bucket key instead of
  *    cross-joining.
  *
  * Vector math is codegen'd higher-order functions
  * ([[graft.functions.VectorFunctions]]) — no UDF, no Python.
  */
object Similarity {

  /** Exact top-k by cosine: for each query vector, the k nearest
    * candidates (self-match excluded), deterministic tiebreak on
    * candidate id.
    */
  def bruteForceTopK(queries: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    val q = broadcast(queries.select(col("vec_id").as("query_id"),
      col("embedding").as("q_emb")))
    val c = candidates.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("c_emb"))
    val scored = c.join(q, col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", VectorFunctions.cosine(col("q_emb"), col("c_emb")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"))
  }

  /** LSH-bucketed ANN: hyperplane signature → bucket join → exact
    * re-rank within buckets. Recall grows with fewer planes (bigger
    * buckets) or multiple tables; this single-table variant is the
    * skeleton, tuned via `nPlanes`.
    */
  def lshTopK(queries: DataFrame, candidates: DataFrame, k: Int,
              nPlanes: Int = 8): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
      .withColumn("bucket", VectorFunctions.hyperplaneLshBucket(col("q_emb"), nPlanes))
    val c = candidates.select(col("vec_id").as("neighbor_id"), col("embedding").as("c_emb"))
      .withColumn("bucket", VectorFunctions.hyperplaneLshBucket(col("c_emb"), nPlanes))
    val scored = q.join(c, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", VectorFunctions.cosine(col("q_emb"), col("c_emb")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"))
  }

  /** All-pairs above a similarity floor (embedding near-dup detection):
    * LSH bucket join + exact verify, pairs id_a < id_b. The
    * embedding-cosine member of the dedup family.
    */
  def cosineNearDupPairs(df: DataFrame, minSimE4: Long, nPlanes: Int = 10): DataFrame = {
    val base = df.select(col("vec_id"), col("embedding"))
      .withColumn("bucket", VectorFunctions.hyperplaneLshBucket(col("embedding"), nPlanes))
    val a = base.alias("a")
    val b = base.alias("b")
    a.join(b, col("a.bucket") === col("b.bucket") &&
        col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        floor(VectorFunctions.cosine(col("a.embedding"), col("b.embedding")) * 10000)
          .cast("long").as("sim_e4"))
      .filter(col("sim_e4") >= minSimE4)
  }
}
