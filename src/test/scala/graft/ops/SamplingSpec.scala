package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def ids = (0L until 10000L).toDF("id")

  test("assignSplit: exhaustive, deterministic, near the requested proportions") {
    val weights = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val a = Sampling.assignSplit(ids, "id", weights)
    val counts = a.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts.values.sum == 10000L, "every row gets exactly one split")
    assert(math.abs(counts("train") - 8000L) < 200, s"train ~80%: $counts")
    assert(math.abs(counts("val") - 1000L) < 150, s"val ~10%: $counts")
    // determinism: a repartitioned re-evaluation assigns identically
    val b = Sampling.assignSplit(ids.repartition(7), "id", weights)
    assert(a.join(b.withColumnRenamed("split", "split2"), "id")
      .filter($"split" =!= $"split2").count() == 0)
  }

  test("portable and hash bucketing both fill all buckets roughly evenly") {
    for (portable <- Seq(true, false)) {
      val col10 = if (portable) Sampling.portableBucket($"id", 10)
        else Sampling.hashBucket($"id", 10)
      val counts = ids.select(col10.as("b")).groupBy("b").count()
        .as[(Long, Long)].collect().toMap
      assert(counts.keySet == (0L until 10L).toSet, s"portable=$portable: $counts")
      assert(counts.values.forall(c => c > 700 && c < 1300),
        s"portable=$portable skew: $counts")
    }
  }

  test("stratifiedSampleExact: exactly ceil(fraction * stratum size) per stratum") {
    val df = (1L to 900L).map(i => (i, if (i <= 600) "en" else "de"))
      .toDF("id", "lang")
    val s = Sampling.stratifiedSampleExact(df, Seq("lang"), "id", 0.25)
    val counts = s.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(counts == Map("en" -> 150L, "de" -> 75L), s"got $counts")
    // sample is a subset and deterministic
    assert(s.join(df, Seq("id", "lang"), "left_anti").count() == 0)
    val again = Sampling.stratifiedSampleExact(df.repartition(5), Seq("lang"), "id", 0.25)
      .select("id").as[Long].collect().toSet
    assert(again == s.select("id").as[Long].collect().toSet)
  }

  test("sampleByExact: per-stratum fractions, unlisted strata dropped") {
    val df = (1L to 1000L).map { i =>
      (i, if (i <= 400) "web" else if (i <= 800) "wiki" else "other")
    }.toDF("id", "src")
    val s = Sampling.sampleByExact(df, "src", "id",
      Map("web" -> 0.25, "wiki" -> 1.0))
    val counts = s.groupBy("src").count().as[(String, Long)].collect().toMap
    assert(counts == Map("web" -> 100L, "wiki" -> 400L), s"got $counts")
  }

  test("capPerStratum: exact cap per stratum, deterministic under repartition") {
    val df = (1L to 300L).map(i => (i, if (i <= 200) "big" else "small"))
      .toDF("id", "src")
    val capped = Sampling.capPerStratum(df, Seq("src"), "id", 50L)
    val counts = capped.groupBy("src").count().as[(String, Long)].collect().toMap
    assert(counts == Map("big" -> 50L, "small" -> 50L), counts.toString)
    // deterministic: identical survivor set under repartition
    val again = Sampling.capPerStratum(df.repartition(7), Seq("src"), "id", 50L)
      .select("id").as[Long].collect().toSet
    assert(again == capped.select("id").as[Long].collect().toSet)
  }

  test("temperatureMix: targets ∝ n^alpha, deterministic, capped at stratum size") {
    // strata: 100 'lo' rows, 400 'hi' rows → sqrt weights 10:20 →
    // s = 10000 : 20000, S = 30000; totalN 30 → targets 10 and 20
    val df = (0L until 500L)
      .map(i => (i, if (i < 100) "lo" else "hi")).toDF("id", "stratum")
    val out = Sampling.temperatureMix(df, "stratum", "id", totalN = 30)
    val byStratum = out.groupBy("stratum").count()
      .as[(String, Long)].collect().toMap
    assert(byStratum == Map("lo" -> 10L, "hi" -> 20L), s"got $byStratum")
    // alpha=0.5 up-weights the small stratum vs proportional (6:24)
    val prop = Sampling.temperatureMix(df, "stratum", "id", totalN = 30, alpha = 1.0)
      .groupBy("stratum").count().as[(String, Long)].collect().toMap
    assert(prop("lo") < byStratum("lo"), s"proportional got $prop")
    // deterministic: same rows across runs and under repartition
    val again = Sampling.temperatureMix(df.repartition(7), "stratum", "id", totalN = 30)
      .select("id").as[Long].collect().toSet
    assert(again == out.select("id").as[Long].collect().toSet)
    // targets cap at the stratum size (tiny stratum, huge totalN)
    val tiny = (0L until 12L).map(i => (i, if (i < 2) "a" else "b")).toDF("id", "stratum")
    val capped = Sampling.temperatureMix(tiny, "stratum", "id", totalN = 100)
      .groupBy("stratum").count().as[(String, Long)].collect().toMap
    assert(capped("a") <= 2L && capped("b") <= 10L)
    // NULL stratum (missing language id) is a first-class stratum —
    // 100 null + 400 'hi' is the same 10:20 split as the lo/hi case
    val withNull = (0L until 500L)
      .map(i => (i, if (i < 100) null else "hi")).toDF("id", "stratum")
    val nullMix = Sampling.temperatureMix(withNull, "stratum", "id", totalN = 30)
      .groupBy("stratum").count()
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(nullMix == Map(None -> 10L, Some("hi") -> 20L), s"got $nullMix")
  }

  test("temperatureMix: no 64-bit wrap for alpha=1 with a huge totalN") {
    // alpha=1 makes s_i = n_i·1000 unbounded: with totalN ~ 10^14,
    // totalN * s_i ≈ 10^19 wraps a Long negative — the pre-BigInt code
    // computed min(n_i, negative) and silently emptied every stratum
    val df = (0L until 500L)
      .map(i => (i, if (i < 100) "lo" else "hi")).toDF("id", "stratum")
    val out = Sampling.temperatureMix(df, "stratum", "id",
      totalN = 200_000_000_000_000L, alpha = 1.0)
    // targets cap at the stratum sizes, so every row survives
    assert(out.count() == 500L, "huge-totalN proportional mix must keep all rows")
  }

  test("epochShuffleKey: per-epoch orders differ, each deterministic") {
    val keyed = (e: Int) => ids.select($"id",
      Sampling.epochShuffleKey($"id", e).as("k"))
      .orderBy("k", "id").select("id").as[Long].collect().toSeq
    val e1a = keyed(1); val e1b = keyed(1); val e2 = keyed(2)
    assert(e1a == e1b, "same epoch must give the same order")
    assert(e1a != e2, "different epochs must permute differently")
    assert(e1a.toSet == e2.toSet, "a shuffle never drops rows")
  }

  test("mixers and splits stay in range for arbitrary longs (negatives, extremes)") {
    val rnd = new scala.util.Random(42)
    val hostile = Seq(Long.MinValue, Long.MinValue + 1, -1L, 0L, 1L,
      Long.MaxValue, Long.MaxValue - 1) ++ Seq.fill(5000)(rnd.nextLong())
    val df = hostile.toDF("id")
    val w = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val out = df.select(
      Sampling.portableBucket($"id", 1000).as("pb"),
      Sampling.hashBucket($"id", 1000).as("hb"),
      Sampling.epochShuffleKey($"id", 7).as("ek"),
      Sampling.splitExpr($"id", w, portable = true).as("sp"),
      Sampling.splitExpr($"id", w, portable = false).as("sh"))
      .as[(Long, Long, Long, String, String)].collect()
    out.foreach { case (pb, hb, ek, sp, sh) =>
      assert(pb >= 0 && pb < 1000 && hb >= 0 && hb < 1000)
      assert(ek >= 0 && ek < 1000000007L)
      assert(Set("train", "val", "test")(sp) && Set("train", "val", "test")(sh))
    }
  }

  test("splitExpr computed inline equals assignSplit's column") {
    val w = Seq("train" -> 0.9, "test" -> 0.1)
    val viaDf = Sampling.assignSplit(ids, "id", w, portable = true)
    val inline = ids.select($"id",
      Sampling.splitExpr($"id", w, portable = true).as("s2"))
    assert(viaDf.join(inline, "id").filter($"split" =!= $"s2").count() == 0)
  }

  test("tokenBudgetSample equals the naive single-window cumsum selection") {
    import org.apache.spark.sql.expressions.Window
    val docs = (0L until 3000L)
      .map(i => (i, s"s${i % 3}", 1L + (i * 2654435761L) % 97L))
      .toDF("id", "src", "w")
    val budget = 20000L
    val got = Sampling.tokenBudgetSample(docs, Seq("src"), "id", "w", budget,
      nBuckets = 16).select("id").as[Long].collect().toSet
    // reference: one window over (coarse bucket, fine mix, id)
    val ord = Window.partitionBy($"src")
      .orderBy(Sampling.portableBucket($"id", 16),
        Sampling.portableBucket($"id", 1000000007), $"id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = docs.withColumn("cum", sum($"w").over(ord))
      .filter($"cum" <= budget).select("id").as[Long].collect().toSet
    assert(got == want && got.nonEmpty && got.size < 3000,
      s"got=${got.size} want=${want.size}")
    // determinism under repartition
    val again = Sampling.tokenBudgetSample(docs.repartition(11), Seq("src"),
      "id", "w", budget, nBuckets = 16).select("id").as[Long].collect().toSet
    assert(again == got)
  }

  test("epochUpsample: copy counts, epoch tags, and the exact fractional cut") {
    val docs = (0L until 300L).map(i => (i, s"s${i % 3}")).toDF("id", "src")
    // s0: 0.4 epochs of 100 rows -> 40; s1: 2.5 -> 250; s2 unlisted -> 0
    val up = Sampling.epochUpsample(docs, "src", "id",
      Map("s0" -> 0.4, "s1" -> 2.5))
    val bySrc = up.groupBy($"src").count().as[(String, Long)].collect().toMap
    assert(bySrc == Map("s0" -> 40L, "s1" -> 250L), bySrc.toString)
    // every kept doc carries epochs 0..nc-1 exactly once
    val tags = up.groupBy($"src", $"id")
      .agg(sort_array(collect_list($"epoch")).as("es"))
      .select($"src", $"es").distinct().as[(String, Seq[Long])].collect()
    assert(tags.forall { case (_, es) => es == (0L until es.size.toLong) })
    assert(tags.filter(_._1 == "s1").forall(t => t._2.size == 2 || t._2.size == 3))
    // fractional subset is the sampleByExact prefix: growing e never
    // evicts a kept copy
    val small = Sampling.epochUpsample(docs, "src", "id", Map("s0" -> 0.2))
      .select("id").as[Long].collect().toSet
    val big = Sampling.epochUpsample(docs, "src", "id", Map("s0" -> 0.7))
      .select("id").as[Long].collect().toSet
    assert(small.subsetOf(big) && small.size == 20 && big.size == 70)
    val viaSampleBy = Sampling.sampleByExact(docs, "src", "id",
      Map("s0" -> 0.7)).select("id").as[Long].collect().toSet
    assert(big == viaSampleBy)
    // determinism under repartition
    val again = Sampling.epochUpsample(docs.repartition(7), "src", "id",
      Map("s0" -> 0.4, "s1" -> 2.5)).groupBy($"src").count()
      .as[(String, Long)].collect().toMap
    assert(again == bySrc)
  }

  test("tokenBudgetSample edges: zero budget, oversized budget, negative weight") {
    val docs = Seq((1L, "a", 5L), (2L, "a", 0L), (3L, "a", 7L)).toDF("id", "src", "w")
    // budget 0: only zero-weight rows ordered before the first positive
    // weight can fit; with these mixes just assert the invariant
    val z = Sampling.tokenBudgetSample(docs, Seq("src"), "id", "w", 0L)
      .select("w").as[Long].collect()
    assert(z.forall(_ == 0L))
    // budget >= total: everything kept
    val all = Sampling.tokenBudgetSample(docs, Seq("src"), "id", "w", 12L)
      .count()
    assert(all == 3L)
    val neg = Seq((1L, "a", -1L)).toDF("id", "src", "w")
    val ex = intercept[Exception] {
      Sampling.tokenBudgetSample(neg, Seq("src"), "id", "w", 10L).count()
    }
    assert(ex.getMessage != null)
  }

  test("weightedSample: higher weight wins at equal mix; determinism; zero-weight exclusion") {
    import org.apache.spark.sql.functions._
    // ids chosen so portableMix collides? No — just verify the A-ES
    // ordering properties instead of exact keys: replaying the key
    // formula in Scala must reproduce the selection.
    val df = spark.range(1, 2001).select(col("id").as("doc_id"),
      (col("id") % 97 + 1).as("w"))
    val got = Sampling.weightedSample(df, "doc_id", "w", 50)
      .select("doc_id").as[Long].collect().toSeq
    // Scala replay of the identical arithmetic
    def key(id: Long, w: Long): Long = {
      val m1 = ((id % 2147483647L) * 2654435761L) % 2147483629L
      val m2 = ((id % 2147483629L) * 2246822519L) % 2147483647L
      val mix = m1 * 2147483648L + m2
      math.floor(1000000000.0 * (math.log((mix.toDouble + 1.0) / 4.611686018427387904e18) / w.toDouble)).toLong
    }
    val expect = (1L until 2001L).map(id => (id, id % 97 + 1))
      .sortBy { case (id, w) => (-key(id, w), id) }.take(50).map(_._1)
    assert(got == expect, s"got=${got.take(5)} expect=${expect.take(5)}")
    // zero/negative/null weights never selected
    val withZero = df.withColumn("w",
      when(col("doc_id") <= 1000, lit(0L)).otherwise(col("w")))
    val sel = Sampling.weightedSample(withZero, "doc_id", "w", 2000)
      .select("doc_id").as[Long].collect()
    assert(sel.forall(_ > 1000) && sel.length == 1000)
  }
}
