package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  // 2-D vectors at known angles: 10 ≈ 11 (1°), both far from 12 (90°),
  // 13 opposite, 14 between (45°).
  private def emb = Seq(
    (10L, Seq(1.0f, 0.0f)),
    (11L, Seq(0.9998f, 0.0175f)),
    (12L, Seq(0.0f, 1.0f)),
    (13L, Seq(-1.0f, 0.0f)),
    (14L, Seq(0.7071f, 0.7071f))
  ).toDF("vec_id", "embedding")

  test("brute-force top-k ranks by exact cosine with id tiebreak") {
    val out = Similarity.bruteForceTopK(emb.filter($"vec_id" === 10L), emb, 3)
      .orderBy("rank").as[(Long, Int, Long)].collect().toSeq
    assert(out == Seq((10L, 1, 11L), (10L, 2, 14L), (10L, 3, 12L)))
  }

  test("self-match is excluded and k bounds the output") {
    val out = Similarity.bruteForceTopK(emb, emb, 2)
    assert(out.filter($"query_id" === $"neighbor_id").count() == 0)
    assert(out.groupBy("query_id").count().filter($"count" > 2).count() == 0)
  }

  test("lsh top-k finds the near-identical neighbor (same bucket)") {
    val out = Similarity.lshTopK(emb.filter($"vec_id" === 10L), emb, 3, nPlanes = 2)
      .as[(Long, Int, Long)].collect().toSeq
    assert(out.exists(r => r._3 == 11L),
      s"1-degree-apart vectors must share every hyperplane side; got $out")
  }

  test("multi-table LSH recall covers at least the single-table candidate set") {
    val single = Similarity.lshTopK(emb.filter($"vec_id" === 10L), emb, 4, nPlanes = 2)
      .select("neighbor_id").as[Long].collect().toSet
    val multi = Similarity.lshTopKMulti(emb.filter($"vec_id" === 10L), emb, 4,
        nPlanes = 2, nTables = 4)
      .select("neighbor_id").as[Long].collect().toSet
    assert(single.subsetOf(multi) || multi.size >= single.size,
      s"multi-table candidates must not lose recall: single=$single multi=$multi")
    assert(multi.contains(11L), "the 1-degree neighbor must be found")
  }

  test("trained IVF: probe-all equals brute force; single-probe finds the near neighbor") {
    val cents = Similarity.trainCentroids(emb, nCells = 2, iters = 2)
    val nCells = cents.count().toInt
    assert(nCells >= 1 && nCells <= 2)
    // probing every cell scores every candidate → identical to the exact path
    val probeAll = Similarity.ivfTopKTrained(emb, emb, 2, cents, nProbe = nCells)
      .as[(Long, Int, Long)].collect().toSet
    val brute = Similarity.bruteForceTopK(emb, emb, 2)
      .as[(Long, Int, Long)].collect().toSet
    assert(probeAll == brute, s"probe-all must equal brute force: $probeAll vs $brute")
    // the 1-degree-apart pair lands in the same trained cell
    val one = Similarity.ivfTopKTrained(emb.filter($"vec_id" === 10L), emb, 2, cents,
        nProbe = 1)
      .select("neighbor_id").as[Long].collect().toSet
    assert(one.contains(11L), s"nearest neighbor must share 10's cell; got $one")
  }

  test("IVF-PQ: probe-all + refine-all equals brute force; codes are index-sized") {
    val cents = Similarity.trainCentroids(emb, nCells = 2, iters = 2)
    val nCells = cents.count().toInt
    val cb = Similarity.trainProductQuantizer(emb, nSub = 2, k = 4, iters = 2)
    val idx = Similarity.pqIndex(emb, cents, cb, nSub = 2)
    // every cell probed + a refine pool covering every candidate → the
    // exact re-rank sees the full candidate set → identical to brute
    // force regardless of how lossy the ADC shortlist ordering is
    val all = Similarity.ivfPqTopK(emb, idx, emb, 2, cents, cb,
        nProbe = nCells, refine = emb.count().toInt)
      .as[(Long, Int, Long)].collect().toSet
    val brute = Similarity.bruteForceTopK(emb, emb, 2)
      .as[(Long, Int, Long)].collect().toSet
    assert(all == brute, s"probe-all+refine-all must equal brute force: $all vs $brute")
    // the standing index is (vec_id, cell, nSub codes) — one row per
    // vector, codes within the codebook range
    val rows = idx.select($"vec_id", $"cell", $"codes")
      .as[(Long, Int, Seq[Int])].collect()
    assert(rows.length == 5 && rows.forall(_._3.length == 2))
    assert(rows.forall(_._3.forall(c => c >= 0 && c < 4)))
    // reconstruction concatenates per-subspace codewords back to full dim
    val xhat = Similarity.pqReconstruct(
      Similarity.pqEncode(emb, cb, nSub = 2), cb)
    assert(xhat.select(size($"xhat")).as[Int].collect().forall(_ == 2))
  }

  test("IVF-PQ query consumes the standing index: LUT scoring, no reconstruction") {
    val cents = Similarity.trainCentroids(emb, nCells = 2, iters = 2)
    val cb = Similarity.trainProductQuantizer(emb, nSub = 2, k = 4, iters = 2)
    // materialize the index the way production does (a parquet-backed
    // artifact): the query plan below must reference THESE rows, not
    // the encode lineage
    val idxRows = Similarity.pqIndex(emb, cents, cb, nSub = 2).collect().toSeq
    val idx = spark.createDataFrame(
      spark.sparkContext.parallelize(idxRows),
      Similarity.pqIndex(emb, cents, cb, nSub = 2).schema)
    val out = Similarity.ivfPqTopK(emb, idx, emb, 2, cents, cb,
      nProbe = 1, refine = 2)
    out.count() // finalize AQE
    val p = out.queryExecution.executedPlan.toString
    // the ADC pair join scores codes via per-query LUTs — the
    // reconstructed-vector column must not exist anywhere in the plan
    assert(!p.contains("xhat"),
      s"pair join must carry codes, not reconstructed vectors:\n${p.take(800)}")
    // no exchange carries an embedding-derived vector column alongside
    // the code array (the q80 no-payload-in-exchange pattern): the
    // corpus side of the cell join is (id, cell, codes) verbatim
    val bad = p.linesIterator.filter(_.contains("Exchange"))
      .filter(l => l.contains("codes#") &&
        (l.contains("embedding#") || l.contains("c_u#") || l.contains("u#")))
    assert(bad.isEmpty, bad.mkString("\n"))
  }

  test("pqSelfErrorE6: exact-cover quantizer reconstructs perfectly; shift degrades") {
    val cents = Similarity.trainCentroids(emb, nCells = 2, iters = 1)
    // k >= corpus with 0 Lloyd's iterations: init makes every vector's
    // subvectors codewords -> reconstruction is exact, error must be 0
    val cbExact = Similarity.trainProductQuantizer(emb, nSub = 2, k = 8, iters = 0)
    val idxExact = Similarity.pqIndex(emb, cents, cbExact, nSub = 2)
    val exact = Similarity.pqSelfErrorE6(emb, idxExact, cbExact)
      .as[(Long, Long)].head()
    assert(exact == ((5L, 0L)), s"exact-cover error must be zero: $exact")
    // a lossy quantizer has positive error, and a shifted corpus
    // (codewords never trained on it) degrades further — the q149
    // drift-signal property
    val cbLossy = Similarity.trainProductQuantizer(emb, nSub = 2, k = 2, iters = 2)
    val idxLossy = Similarity.pqIndex(emb, cents, cbLossy, nSub = 2)
    val lossy = Similarity.pqSelfErrorE6(emb, idxLossy, cbLossy)
      .as[(Long, Long)].head()._2
    assert(lossy > 0L, "a 2-codeword quantizer over 5 distinct vectors cannot be exact")
    // the shift-degrades-error property is NOT asserted on this 2-D
    // fixture: spiking one of two dimensions concentrates the vector
    // mass and quantizes BETTER (measured 0.012 vs 0.120) — in-
    // distribution vs drift discrimination only exists with real
    // dimensionality, where q149's oracle gate measures it every round
    // (calibration in graft.tools.DriftProbe)
  }

  test("pqEncode fails loud on a vector whose length disagrees with the model") {
    val cents = Similarity.trainCentroids(emb, nCells = 2, iters = 1)
    val cb = Similarity.trainProductQuantizer(emb, nSub = 2, k = 4, iters = 1)
    // dimension comes from the CODEBOOKS (no corpus probe — the
    // streaming sink encodes per trigger); a 3-dim vector against the
    // 2-dim model must fail in-plan, not silently mis-slice
    val bad = Seq((99L, Seq(1.0f, 2.0f, 3.0f))).toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      Similarity.pqIndex(bad, cents, cb, nSub = 2).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("embedding length != trained dim")),
      s"mismatch must carry the guard message: ${msgs(e)}")
  }

  test("incremental index append equals the full rebuild exactly (q148 property)") {
    val cents = Similarity.trainCentroids(emb, nCells = 2, iters = 2)
    val cb = Similarity.trainProductQuantizer(emb, nSub = 2, k = 4, iters = 2)
    val base = emb.filter($"vec_id" <= 12L)
    val delta = emb.filter($"vec_id" > 12L)
    val inc = Similarity.pqIndexAppend(
        Similarity.pqIndex(base, cents, cb, nSub = 2), delta, cents, cb, nSub = 2)
      .as[(Long, Int, Seq[Int])].collect().toSet
    val reb = Similarity.pqIndex(emb, cents, cb, nSub = 2)
      .as[(Long, Int, Seq[Int])].collect().toSet
    assert(inc == reb, s"incremental must equal rebuild: $inc vs $reb")
  }

  test("recall@5 floor vs brute force on the sf0.01 corpus (q33/q54 defaults)") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.functions.col
    val embC = graft.core.Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
    val q = embC.filter(col("vec_id") < 8)
    val truth = Similarity.bruteForceTopK(q, embC, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    def recall(df: DataFrame): Double =
      truth.intersect(df.select("query_id", "neighbor_id")
        .as[(Long, Long)].collect().toSet).size.toDouble / truth.size
    // q54's production multi-table path: a silent recall collapse on a
    // params change must fail the BUILD, not surface in a bench later.
    // (Deterministic hyperplanes → the measured 0.975 is reproducible.)
    val multi = recall(Similarity.lshTopKMulti(q, embC, 5, nPlanes = 4, nTables = 16))
    assert(multi >= 0.9, f"q54-default multi-table recall@5 $multi%.3f < 0.9")
    // q33's single-table baseline is candidate GENERATION, not the
    // production recall path — near-uniform synthetic embeddings are
    // LSH's worst case; floor documents the measured 0.125
    val single = recall(Similarity.lshTopK(q, embC, 5, nPlanes = 4))
    assert(single >= 0.1, f"q33-default single-table recall@5 $single%.3f < 0.1")
  }

  test("cosine near-dup pairs reports sim_e4 above the floor, a<b") {
    val pairs = Similarity.cosineNearDupPairs(emb, minSimE4 = 9000L, nPlanes = 2)
      .as[(Long, Long, Long)].collect().toSeq
    assert(pairs.exists(p => p._1 == 10L && p._2 == 11L && p._3 >= 9900L))
    assert(pairs.forall(p => p._1 < p._2))
  }

  test("cosinePairsLabelAuto: exact below the block bound, label-blocked LSH subset above") {
    val embL = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val exact = Similarity.cosinePairsLabelAuto(embL, "label", 3000L)
      .as[(Long, Long, Long)].collect().toSet
    // default bound (65536) keeps every test-scale block on the exact
    // quadratic path — the oracle-replayable baseline
    assert(exact.nonEmpty)
    try {
      spark.conf.set("graft.sim.maxBlock", "2")
      val approx = Similarity.cosinePairsLabelAuto(embL, "label", 3000L)
        .as[(Long, Long, Long)].collect().toSet
      // over the bound: exact-verified candidates only — precision 1
      // (a SUBSET of the exact answer), and usable recall on this corpus
      assert(approx.map(p => (p._1, p._2))
        .subsetOf(exact.map(p => (p._1, p._2))),
        "dispatched path must never emit a pair the exact path rejects")
      // deterministic hyperplanes: measured 0.951 on this corpus (0.991
      // at sf0.01) — the 1-(1-p^k)^L >= 0.9 plane derivation holding
      val rec = approx.size.toDouble / exact.size
      assert(rec >= 0.9, f"label-blocked LSH recall $rec%.3f collapsed")
      // and the plan is the bucketed join, not the within-label cross
      val plan = Similarity.cosinePairsLabelAuto(embL, "label", 3000L)
        .queryExecution.executedPlan.toString
      assert(plan.contains("bkt"), "expected the bucket-keyed candidate join")
    } finally spark.conf.unset("graft.sim.maxBlock")
  }

  test("q91's combinable min(struct) argmin equals a window-rank argmin on real data") {
    // the scale claim: the map-side-combinable aggregate and the
    // window rank induce the same (dist, label) total order — pinned
    // here so a tiebreak drift in either form fails the build
    val sf = "/root/testdata/sf0.001"
    val got = graft.SparkEntry.queries("q91_nearest_centroid")(spark, sf)
      .as[(Long, Int, Long)].collect().toSet
    // independent reference: same distances, argmin via window rank
    val e = graft.core.Tables.load(spark, sf, "embeddings")
    val cent = e
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim_idx", "v")))
      .select(col("label"), col("dim_idx"),
        floor(col("v").cast("double") * 1000000.0).cast("long").as("v_e6"))
      .groupBy(col("label"), col("dim_idx"))
      .agg(count(lit(1)).as("n"), sum(col("v_e6")).as("sum_e6"))
      .select(col("label").as("c_label"), col("dim_idx"),
        floor(col("sum_e6").cast("double") / col("n").cast("double"))
          .cast("long").as("c_e6"))
      .groupBy(col("c_label"))
      .agg(transform(array_sort(collect_list(struct(col("dim_idx"), col("c_e6")))),
        x => x.getField("c_e6")).as("cvec"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("dist"), col("c_label"))
    val want = e.select(col("vec_id"), col("embedding")).crossJoin(cent)
      .select(col("vec_id"), col("c_label"),
        aggregate(
          zip_with(col("embedding"), col("cvec"), (x, c) => {
            val d = x.cast("double") - c.cast("double") / 1000000.0
            d * d
          }),
          lit(0.0), (a, v) => a + v).as("dist"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("vec_id"), col("c_label").as("nearest_label"),
        floor(col("dist") * 1000000.0).cast("long").as("dist_e6"))
      .as[(Long, Int, Long)].collect().toSet
    assert(got == want && got.nonEmpty)
  }

  test("semanticDedup drops exactly the lower-id-dominated vectors, chains collapse") {
    // cell "x": 20 ≈ 21 ≈ 22 form a chain (20-21 and 21-22 above τ,
    // 20-22 below τ at τ=0.9997e4... use angles: 20=0°, 21=1°, 22=2°:
    // cos(1°)=.99985 ≥ .9998τ, cos(2°)=.99939 < τ → 21 dropped by 20,
    // 22 dropped by 21 (one-pass rule: earlier id, regardless of 21's
    // own fate) — the documented conservative chain collapse.
    // 23 at 90° survives; cell "y"'s 24/25 at 1° apart: 25 dropped.
    def v(deg: Double) = Seq(math.cos(math.toRadians(deg)).toFloat,
      math.sin(math.toRadians(deg)).toFloat)
    val df = Seq(
      (20L, "x", v(0)), (21L, "x", v(1)), (22L, "x", v(2)),
      (23L, "x", v(90)), (24L, "y", v(10)), (25L, "y", v(11)),
      (26L, "z", v(50))
    ).toDF("vec_id", "cell", "embedding")
    val kept = Similarity.semanticDedup(df, "cell", 9998L)
      .select("vec_id").as[Long].collect().toSet
    assert(kept == Set(20L, 23L, 24L, 26L), kept.toString)
  }

  test("semanticDedup keeps everything when no pair crosses the threshold") {
    val df = Seq((1L, "a", Seq(1.0f, 0.0f)), (2L, "a", Seq(0.0f, 1.0f)))
      .toDF("vec_id", "cell", "embedding")
    assert(Similarity.semanticDedup(df, "cell", 9000L).count() == 2L)
  }

  test("derived plane count caps at 16 — near-1 thresholds stay codegen-safe (r10 review)") {
    // tau = 0.9995: uncapped k ≈ 42 (and s→1 diverges) — bits ≥ 64
    // would alias and k·L agg columns blow up codegen; capped k only
    // fattens buckets, so the near-identical pair MUST still surface
    def v(deg: Double) = Seq(math.cos(math.toRadians(deg)).toFloat,
      math.sin(math.toRadians(deg)).toFloat)
    val df = Seq((1L, "x", v(0)), (2L, "x", v(0.5)), (3L, "x", v(80)),
      (4L, "x", v(160)), (5L, "x", v(240))).toDF("vec_id", "label", "embedding")
    spark.conf.set("graft.sim.maxBlock", "2")
    try {
      val got = Similarity.cosinePairsLabelAuto(df, "label", 9995L)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(got == Set((1L, 2L)), got.toString)
    } finally spark.conf.unset("graft.sim.maxBlock")
  }

  test("prototypicality ranks by distance to the own-cell centroid, ties on id") {
    // cell 0: three vectors on a line — centroid x ≈ (1+2+9)/3 = 4, so 2
    // is most central, then 1, then 9. cell 1: a single vector is its own
    // centroid at distance 0.
    val df = Seq(
      (1L, 0, Seq(1.0f, 0.0f)),
      (2L, 0, Seq(2.0f, 0.0f)),
      (3L, 0, Seq(9.0f, 0.0f)),
      (4L, 1, Seq(5.0f, 5.0f))
    ).toDF("vec_id", "label", "embedding")
    val out = Similarity.prototypicality(df, "vec_id", "label", "embedding", keepPerCell = 2)
      .orderBy("label", "rank")
      .select("vec_id", "label", "rank", "kept")
      .as[(Long, Int, Int, Boolean)].collect().toSeq
    assert(out == Seq(
      (2L, 0, 1, true), (1L, 0, 2, true), (3L, 0, 3, false),
      (4L, 1, 1, true)), out.toString)
    // distance is exact fixed-point: cell-1 self-distance must be 0
    val d4 = Similarity.prototypicality(df, "vec_id", "label", "embedding", 1)
      .filter($"vec_id" === 4L).select("dist_e6").as[Long].head()
    assert(d4 == 0L)
  }
}
