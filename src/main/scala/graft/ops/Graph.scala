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

  /** A finished fixpoint PageRank run: the score frame, rounds
    * executed, and whether the iteration reached the EXACT integer
    * fixed point before `maxIters` ran out (false → scores are the
    * last iterate, not the fixed point — the caller's alert).
    */
  final case class PrRun(scores: DataFrame, rounds: Int, converged: Boolean)

  /** PageRank iterated to the EXACT integer LEAST fixed point — the
    * convention that makes an INCREMENTAL warm start provably exact
    * ([[pageRankIncremental]]). Three deliberate departures from
    * [[pageRank]]:
    *
    *  - UNNORMALIZED teleport: every node gets a CONSTANT
    *    `(100−d)·scaleUnit div 100`, independent of the node count
    *    (total mass grows with n; rankings are unaffected — scores are
    *    a per-node factor of the normalized ones). This is what makes
    *    a source-additive delta MONOTONE: new nodes never dilute
    *    anyone's teleport share, so the old fixed point stays a
    *    certified lower bound of the new one.
    *  - FROM-BELOW iteration: init = teleport-only (trivially ≤ the
    *    fixed point). The update map T is monotone (floor of a
    *    nondecreasing function), so iterates increase pointwise and —
    *    being integers bounded by n·tele/(1−d) — reach the least
    *    fixed point EXACTLY in finitely many rounds. No tolerance, no
    *    oscillation: floating-point PageRank can never terminate on
    *    bit equality, this does by construction.
    *  - Σ-based convergence (the CC loop's monotone-sum doctrine):
    *    pointwise-nondecreasing scores mean Σ strictly increases until
    *    the fixpoint, so convergence is one DECIMAL(38,0) aggregate
    *    per round, not a self-join.
    *
    * `scaleUnit` trades precision for rounds: the from-below gap
    * closes by factor d per round, so rounds ≈ log(scaleUnit)/log(1/d)
    * (~190 at e12/0.85, ~14 at e4/0.50). Each round is one edge-scan
    * join — on a 10¹¹-edge graph that IS the cost, and the knob is the
    * operator's honest price list for bit-exactness.
    *
    * Same mechanics as [[pageRank]]: edges checkpointed once and
    * pre-partitioned by src; per-round state localCheckpoint'd with
    * the previous round's blocks dropped eagerly (a fixpoint loop can
    * run tens of rounds — accreting blocks is the CC lesson).
    */
  def pageRankFixpoint(edges: DataFrame, srcCol: String, dstCol: String,
                       maxIters: Int = 300, dampingE2: Long = 85L,
                       scaleUnit: Long = 1000000000000L): PrRun =
    fixpointFromBelow(edges, srcCol, dstCol, maxIters, dampingE2, scaleUnit,
      warmScores = None)

  /** INCREMENTAL PageRank (r17) — the graph family's q174: absorb a
    * SOURCE-ADDITIVE delta (every delta edge's src is a node with no
    * out-edges in the standing graph — the crawl-frontier shape: a
    * page's outlinks enter the graph once, when it is fetched; its
    * targets may be anything) by warm-starting the from-below
    * iteration at the standing scores instead of the teleport floor.
    *
    * Exactness is PROVABLE, not just gated: under source-additivity
    * and the constant-teleport convention, T_new ≥ T_old pointwise
    * (the delta only adds inflow; no existing out-degree changes, no
    * teleport dilution), so the standing least fixed point is ≤ the
    * new one — a certified lower-bound init. Monotone iteration from
    * any lower bound of the lfp converges to exactly the lfp, the
    * same point the cold rebuild reaches from the teleport floor
    * (squeeze: T^k(tele) ≤ T^k(old) ≤ lfp). q177 gates the equality
    * anyway; GraphSpec carries the hand proofs.
    *
    * What the warm start buys is ROUNDS: the remaining gap is the
    * delta's perturbation, not the full score mass, so re-convergence
    * costs ≈ log(perturbation)/log(1/d) instead of
    * log(scaleUnit)/log(1/d) — a daily 10⁶-pair delta on a 10¹¹-edge
    * graph at e12/0.85 re-converges in roughly a third of the cold
    * rounds (each round = one full edge scan either way; rounds ARE
    * the wall-clock). The precondition is CHECKED (one semi-join),
    * failing loud — an overlapping delta means outdegrees changed and
    * the caller must rebuild cold.
    */
  def pageRankIncremental(oldScores: DataFrame, standingEdges: DataFrame,
                          deltaEdges: DataFrame,
                          srcCol: String, dstCol: String,
                          maxIters: Int = 300, dampingE2: Long = 85L,
                          scaleUnit: Long = 1000000000000L): PrRun = {
    val overlapping = deltaEdges.select(col(srcCol)).distinct()
      .join(standingEdges.select(col(srcCol)).distinct(), Seq(srcCol),
        "left_semi")
    require(overlapping.isEmpty,
      "pageRankIncremental requires a source-additive delta: some delta " +
        "sources already have out-edges in the standing graph — their " +
        "out-degrees would change, the standing scores are no longer a " +
        "certified lower bound, rebuild cold with pageRankFixpoint")
    fixpointFromBelow(standingEdges.unionByName(deltaEdges), srcCol, dstCol,
      maxIters, dampingE2, scaleUnit, warmScores = Some(oldScores))
  }

  /** PERSONALIZED PageRank (r17) to the exact integer least fixed
    * point: teleport mass goes ONLY to `seeds` (one id column named by
    * `seedCol`) — the seed-proximity score behind quality propagation
    * from a trusted host list (the curated-seeds recipe: score every
    * crawled page by its link proximity to known-good sites) and
    * topic-focused frontier prioritization. With seeds = all nodes
    * this IS [[pageRankFixpoint]] (q186 gates the equality).
    *
    * Same from-below monotone iteration, same exactness argument —
    * per-node teleport tele(v) = tele·[v ∈ seeds] changes nothing in
    * the proof (T stays monotone, init = tele(·) is still ≤ the lfp).
    * Nodes unreachable from the seed set sit at EXACTLY 0 forever —
    * the integer form's clean "not connected to quality" verdict
    * (floating-point PPR leaves them at denormal dust). Seed ids
    * absent from the graph contribute nothing (inner-join semantics
    * on the node set); an empty effective seed set converges to
    * all-zeros in one round.
    */
  def personalizedPageRankFixpoint(edges: DataFrame, srcCol: String,
                                   dstCol: String, seeds: DataFrame,
                                   seedCol: String, maxIters: Int = 300,
                                   dampingE2: Long = 85L,
                                   scaleUnit: Long = 1000000000000L): PrRun =
    fixpointFromBelow(edges, srcCol, dstCol, maxIters, dampingE2, scaleUnit,
      warmScores = None,
      seedIds = Some(seeds.select(col(seedCol).cast("long").as("id"))))

  private def fixpointFromBelow(edges: DataFrame, srcCol: String,
                                dstCol: String, maxIters: Int,
                                dampingE2: Long, scaleUnit: Long,
                                warmScores: Option[DataFrame],
                                seedIds: Option[DataFrame] = None): PrRun = {
    require(maxIters >= 1 && maxIters <= 1000,
      s"maxIters=$maxIters out of [1,1000]")
    require(dampingE2 >= 0L && dampingE2 <= 99L,
      s"dampingE2=$dampingE2 out of [0,99]") // d=1 has no fixed point here
    require(scaleUnit >= 100L, s"scaleUnit=$scaleUnit too coarse")
    val spark = edges.sparkSession
    val tele = (100L - dampingE2) * scaleUnit / 100L
    val (e, eRdds) = CacheScope.localCheckpointTracked(
      edges.select(col(srcCol).cast("long").as("src"),
          col(dstCol).cast("long").as("dst"))
        .repartition(col("src")))
    val nodes = e.select(col("src").as("id"))
      .unionByName(e.select(col("dst").as("id"))).distinct()
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    // per-node teleport: the constant tele (uniform PageRank) or
    // tele·[id ∈ seeds] (personalized). Checkpointed once — `base`
    // rides every round's join, node-sized
    val teleNodes = seedIds match {
      case Some(sd) => nodes
        .join(sd.distinct().withColumn("__seed", lit(1L)), Seq("id"), "left")
        .select(col("id"),
          when(col("__seed").isNotNull, lit(tele)).otherwise(lit(0L))
            .as("tele"))
      case None => nodes.select(col("id"), lit(tele).as("tele"))
    }
    val (base, baseRdds) = CacheScope.localCheckpointTracked(teleNodes)
    // warm rows are clamped to ≥ tele(id) (a certified lower bound
    // must stay one even if a caller hands scores from a different
    // scaleUnit — the teleport floor is always sound); new nodes start
    // at their teleport
    val init0 = warmScores match {
      case Some(s0) => base
        .join(s0.select(col("id"), col("score").as("__warm")), Seq("id"), "left")
        .select(col("id"),
          greatest(coalesce(col("__warm"), col("tele")), col("tele"))
            .as("score"))
      case None => base.select(col("id"), col("tele").as("score"))
    }
    // LAZY checkpoint (r20): scoreSum below is the materializing action
    // — one pass per round instead of an eager count pass plus the sum
    var (state, stateRdds) = CacheScope.localCheckpointLazyTracked(init0)
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    def scoreSum(df: DataFrame): java.math.BigDecimal =
      df.agg(coalesce(sum(col("score").cast(dec38)), lit(0).cast(dec38)))
        .head().getDecimal(0)
    var prevSum = scoreSum(state)
    var converged = state.isEmpty // an empty graph is already fixed
    var i = 0
    while (!converged && i < maxIters) {
      val rate = state.join(outdeg, state("id") === outdeg("src"))
        .select(outdeg("src"),
          expr(s"(score * ${dampingE2}L) div (100L * outdeg)").as("rate"))
      val inflow = e.join(rate, "src")
        .groupBy(col("dst")).agg(sum(col("rate")).as("inflow"))
      val next = base
        .join(inflow, base("id") === inflow("dst"), "left")
        .select(col("id"),
          (col("tele") + coalesce(col("inflow"), lit(0L))).as("score"))
      val (ck, r) = CacheScope.localCheckpointLazyTracked(next)
      // materializes ck's blocks AND computes the convergence sum in
      // one job; only then is the previous round's state dead
      val nextSum = scoreSum(ck)
      CacheScope.unpersistRdds(stateRdds)
      state = ck
      stateRdds = r
      converged = nextSum.compareTo(prevSum) == 0
      prevSum = nextSum
      i += 1
    }
    CacheScope.unpersistRdds(eRdds)
    CacheScope.unpersistRdds(baseRdds)
    if (!converged)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"pageRankFixpoint did not converge in $maxIters rounds; " +
          "scores are the last iterate, not the fixed point — raise " +
          "maxIters or coarsen scaleUnit")
    CacheScope.registerRdds(spark, stateRdds)
    PrRun(state.select(col("id"), col("score")), i, converged)
  }
}
