package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph analytics — the web-crawl quality signal family:
  * PageRank over the domain/page link graph is the classic
  * crawl-frontier prioritizer and a standard corpus quality feature
  * (harmonic/PageRank centrality in Common Crawl's ranked host lists).
  *
  * Fixed-point INTEGER arithmetic throughout (scores are e12 longs,
  * per-edge contributions `(score·d_e2) div (100·outdeg)`, teleport
  * `((100−d_e2)·10¹²) div (100·n)`): floating-point PageRank sums are
  * order-dependent under distributed aggregation, so byte-identical
  * results across engines/partitionings would be unattainable — the
  * integer form makes every iteration EXACTLY replayable (the repo's
  * e6-floor doctrine, here load-bearing for the oracle). Mass lost to
  * floor rounding (≤ outdeg ulps per node per round) and to dangling
  * nodes (no out-edges: their damped mass is dropped, the
  * PageRank-lite convention) biases scores uniformly down — ranking,
  * the signal's use, is unaffected.
  *
  * Scale shape (the CC-loop doctrine, [[Dedup.connectedComponents]]):
  *  - edges are localCheckpoint'd ONCE, pre-partitioned by `src`, so
  *    every iteration's rate⋈edges join reuses the static partitioning
  *    and only the node-sized rate frame moves;
  *  - per-iteration state is localCheckpoint'd — persist alone leaves
  *    a logical plan growing per round (measured super-exponential
  *    planning in the CC loop, same failure mode);
  *  - the per-round shuffles are: rate (|V|), contributions grouped by
  *    dst (|E|→|V|, map-side combined since the sum is integer).
  *    Nothing vector- or text-sized ever enters an exchange.
  */
object Graph {

  /** `iters` rounds of damped PageRank; returns (id, score_e12).
    * Caller releases the tracked checkpoint blocks via
    * [[CacheScope.release]] (the dedup-family contract).
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int, dampingE2: Long = 85L): DataFrame = {
    require(iters >= 1 && iters <= 50, s"iters=$iters out of [1,50]")
    require(dampingE2 >= 0L && dampingE2 <= 100L,
      s"dampingE2=$dampingE2 out of [0,100]")
    val spark = edges.sparkSession
    val (e, eRdds) = CacheScope.localCheckpointTracked(
      edges.select(col(srcCol).cast("long").as("src"),
          col(dstCol).cast("long").as("dst"))
        .repartition(col("src")))
    val nodes = e.select(col("src").as("id"))
      .unionByName(e.select(col("dst").as("id"))).distinct()
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val totals = nodes.agg(count(lit(1)).as("n"))
    // n rides the state as a constant column so no per-iteration
    // re-count; init mass 10¹² div n per node
    var (state, stateRdds) = CacheScope.localCheckpointTracked(
      nodes.crossJoin(broadcast(totals))
        .select(col("id"), col("n"),
          expr("1000000000000L div n").as("score_e12")))
    var tracked = stateRdds
    for (_ <- 1 to iters) {
      // per-out-edge rate first (node-sized join), THEN the edge join:
      // per-edge work is one lookup, and the damped division happens
      // once per node, not once per edge
      val rate = state.join(outdeg, state("id") === outdeg("src"))
        .select(outdeg("src"),
          expr(s"(score_e12 * ${dampingE2}L) div (100L * outdeg)").as("rate"))
      val inflow = e.join(rate, "src")
        .groupBy(col("dst")).agg(sum(col("rate")).as("inflow"))
      val next = state.select(col("id"), col("n"))
        .join(inflow, state("id") === inflow("dst"), "left")
        .select(col("id"), col("n"),
          (expr(s"(${100L - dampingE2}L * 1000000000000L) div (100L * n)") +
            coalesce(col("inflow"), lit(0L))).as("score_e12"))
      val (ck, r) = CacheScope.localCheckpointTracked(next)
      state = ck
      tracked = tracked ++ r
    }
    CacheScope.registerRdds(spark, eRdds ++ tracked)
    state.select(col("id"), col("score_e12"))
  }
}
