package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget sequence packing for LLM training pipelines.
  *
  * Training consumes fixed-length sequences; short documents must be
  * packed together or most of the batch is padding. True bin packing is
  * NP-hard and inherently sequential, so at 100 TB the standard move is
  * GREEDY CONTIGUOUS FILL within bounded shards: order the documents of
  * a shard deterministically, run a cumulative token count, and cut a
  * new sequence every `budget` tokens. One window per shard, fully
  * distributed, and the assignment is a pure function of the corpus —
  * re-running on a retried partition yields identical packing.
  *
  * The shard key must bound the per-partition sort (a window over an
  * unsharded 100 TB corpus is one giant sort): compose the natural
  * grouping (lang) with a deterministic id-derived shard, e.g.
  * [[Sampling.portableBucket]], sized so a shard's rows fit an executor.
  */
object Pack {

  /** Assign each row a `seq_id` within its (`partCols`) group: rows are
    * ordered by `idCol`, `tokens_before` is the running token count of
    * earlier rows, and `seq_id = tokens_before div budget`. A document
    * longer than `budget` overflows its slot rather than splitting —
    * callers that truncate instead should cap `tokenCol` first.
    */
  def packGreedy(df: DataFrame, partCols: Seq[String], idCol: String,
                 tokenCol: String, budget: Long): DataFrame = {
    require(budget > 0)
    val w = Window.partitionBy(partCols.map(col): _*).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("tokens_before",
        coalesce(sum(col(tokenCol)).over(w), lit(0L)))
      .withColumn("seq_id", expr(s"tokens_before div ${budget}L"))
  }
}
