package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LmScoreSpec extends SparkSpec {
  import spark.implicits._

  test("bigramScore hand-checked: hit, zero-surprise hit, and backoff arithmetic") {
    val ref = Seq((100L, "the cat sat on the mat")).toDF("doc_id", "text")
    // uni: the:2 cat:1 sat:1 on:1 mat:1 -> N=6 V=5, nv=11
    // bi: (the,cat) (cat,sat) (sat,on) (on,the) (the,mat), all cb=1
    val docs = Seq(
      (1L, "the cat sat"),   // (the,cat): ln(1/2); (cat,sat): ln(1/1)=0
      (2L, "dog the"),       // miss: ln(0.4 * (2+1)/11)
      (3L, "word")           // single token -> no positions, absent
    ).toDF("doc_id", "text")
    val got = LmScore.bigramScore(docs, ref, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect()
      .map { case (k, a, b, c) => k -> ((a, b, c)) }.toMap
    val lnHalf = math.floor(1e6 * math.log(1.0 / 2.0)).toLong
    val lnBo = math.floor(1e6 * math.log(0.4 * (3.0 / 11.0))).toLong
    assert(got == Map(1L -> ((lnHalf + 0L, 2L, 0L)), 2L -> ((lnBo, 1L, 1L))), got.toString)
  }

  test("trainBigramModel: empty reference diagnoses cleanly; model tables are cached") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val ex = intercept[IllegalArgumentException] {
      LmScore.trainBigramModel(empty, "doc_id", "text")
    }
    assert(ex.getMessage.contains("empty reference corpus"))
    // the standing-model contract: BOTH tables persist, or every
    // recurring score re-trains (the r10 review's streaming finding)
    val m = LmScore.trainBigramModel(
      Seq((1L, "the cat sat")).toDF("doc_id", "text"), "doc_id", "text")
    assert(m.uni.storageLevel.useMemory && m.bi.storageLevel.useMemory)
  }

  test("model tables round-trip through parquet; standing-model scoring equals one-shot") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    val ref = d.filter($"doc_id" % 10 === 0)
    val docs = d.filter($"doc_id" % 10 =!= 0).limit(40)
    val m = LmScore.trainBigramModel(ref, "doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("lmmodel").toString
    m.uni.write.parquet(s"$dir/uni")
    m.bi.write.parquet(s"$dir/bi")
    val standing = LmScore.BigramModel(
      spark.read.parquet(s"$dir/uni"), spark.read.parquet(s"$dir/bi"),
      m.nTokens, m.vocab)
    val got = LmScore.scoreWithModel(docs, standing, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect().toSet
    val want = LmScore.bigramScore(docs, ref, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == want && got.nonEmpty)
  }

  test("bigramScore equals a full Scala replay on sf0.001, with safe floor margins") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    val docs = d.filter($"doc_id" % 10 =!= 0)
    val ref = d.filter($"doc_id" % 10 === 0)
    val got = LmScore.bigramScore(docs, ref, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

    // reference implementation over plain collections
    def toks(t: String) = t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    val refToks = ref.select($"text").as[String].collect().map(toks)
    val uni = refToks.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nv = (uni.values.sum + uni.size).toDouble
    val bi = refToks.flatMap(ts => ts.zip(ts.drop(1)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    var minMargin = Double.MaxValue
    val want = docs.select($"doc_id", $"text").as[(Long, String)].collect()
      .flatMap { case (id, t) =>
        val ts = toks(t)
        val ps = ts.zip(ts.drop(1))
        if (ps.isEmpty) None else {
          var ll = 0L; var bo = 0L
          ps.foreach { p =>
            val lnp = bi.get(p) match {
              case Some(cb) => math.log(cb.toDouble / uni(p._1).toDouble)
              case None =>
                bo += 1
                math.log(0.4 * ((uni.getOrElse(p._2, 0L) + 1L).toDouble / nv))
            }
            val x = 1e6 * lnp
            minMargin = math.min(minMargin, math.abs(x - math.rint(x)))
            ll += math.floor(x).toLong
          }
          Some(id -> ((ll, ps.size.toLong, bo)))
        }
      }.toMap
    assert(got == want, s"sizes: got=${got.size} want=${want.size}")
    assert(got.nonEmpty && got.values.exists(_._3 > 0))
    // a libm last-ulp disagreement moves 1e6*ln(p) by ~1e-9; every
    // floored value on this corpus sits far further from an integer
    assert(minMargin > 1e-4, s"floor margin too tight: $minMargin")
  }

  test("perplexityBuckets: hand-checked head/middle/tail per group") {
    // group a: 6 rows, scores 60..10. Cuts (1/3, 2/3): head ranks
    // <= ceil(.333333*6)=2, middle <= ceil(.666667*6)=5, tail = 6.
    // group b: 1 row: head (ceil(.333333*1)=1). Null score sinks last.
    val df = Seq(
      (1L, "a", Some(60L)), (2L, "a", Some(50L)), (3L, "a", Some(40L)),
      (4L, "a", Some(30L)), (5L, "a", Some(20L)), (6L, "a", None),
      (7L, "b", Some(5L))
    ).toDF("id", "grp", "score")
    val got = LmScore.perplexityBuckets(df, Seq("grp"), "id", "score")
      .select("id", "rank_in_group", "bucket")
      .as[(Long, Long, String)].collect().map(r => r._1 -> ((r._2, r._3)))
      .toMap
    assert(got == Map(
      1L -> ((1L, "head")), 2L -> ((2L, "head")), 3L -> ((3L, "middle")),
      4L -> ((4L, "middle")), 5L -> ((5L, "middle")),
      6L -> ((6L, "tail")), 7L -> ((1L, "head"))), got.toString)
  }

  test("perplexityBuckets: score-tie order is id-deterministic") {
    val df = Seq((10L, "x", 7L), (2L, "x", 7L), (5L, "x", 7L))
      .toDF("id", "grp", "score")
    val got = LmScore.perplexityBuckets(df, Seq("grp"), "id", "score",
      cutsE6 = Seq(500000L), labels = Seq("keep", "drop"))
      .select("id", "rank_in_group").as[(Long, Long)].collect().toMap
    assert(got == Map(2L -> 1L, 5L -> 2L, 10L -> 3L), got.toString)
  }

  test("perplexityBuckets composes with bigramScore end-to-end") {
    val ref = Seq((1L, "the cat sat on the mat"),
      (2L, "the dog sat on the rug")).toDF("id", "text")
    val docs = Seq((10L, "the cat sat on the mat"),
      (11L, "zq zq zq zq"), (12L, "the dog sat")).toDF("id", "text")
    val scored = LmScore.bigramScore(docs, ref, "id", "text")
      .withColumn("grp", lit("en"))
    val got = LmScore.perplexityBuckets(scored, Seq("grp"), "doc_id",
      "ll_e6", cutsE6 = Seq(333333L, 666667L))
      .select("doc_id", "bucket").as[(Long, String)].collect().toMap
    // summed ll: the short in-domain doc is least negative (head), the
    // longer in-domain doc lands mid; with n=3 the 2/3 cut ceils to
    // rank 3, so the OOV-heavy doc is the LAST middle, not tail —
    // the integer-ceil contract, not a bug
    assert(got(12L) == "head" && got(10L) == "middle" &&
      got(11L) == "middle", got.toString)
  }

  test("importanceScore hand-checked: per-token log-ratio, floored per ln") {
    // target: cat cat dog (Nt=3); raw: cat dog dog dog (Nr=4);
    // V = |{cat,dog}| = 2 → dt=5, dr=6
    val target = Seq((100L, "cat cat dog")).toDF("doc_id", "text")
    val raw = Seq((200L, "cat dog dog dog")).toDF("doc_id", "text")
    def lam(ct: Long, cr: Long): Long =
      math.floor(1e6 * math.log((ct + 1.0) / 5.0)).toLong -
        math.floor(1e6 * math.log((cr + 1.0) / 6.0)).toLong
    val docs = Seq(
      (1L, "cat cat"),      // 2·lam(cat): target-favored, positive
      (2L, "dog"),          // lam(dog): raw-favored, negative
      (3L, "zebra")         // unseen on both sides
    ).toDF("doc_id", "text")
    val model = LmScore.trainImportanceModel(target, raw, "doc_id", "text")
    val got = LmScore.importanceWithModel(docs, model, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect()
      .map { case (k, s, n, u) => k -> ((s, n, u)) }.toMap
    val lamCat = lam(2L, 1L)
    val lamDog = lam(1L, 3L)
    assert(lamCat > 0L && lamDog < 0L, s"cat=$lamCat dog=$lamDog")
    assert(got == Map(
      1L -> ((2L * lamCat, 2L, 0L)),
      2L -> ((lamDog, 1L, 0L)),
      3L -> ((model.lamUnseenE6, 1L, 1L))), got.toString)
    assert(model.lamUnseenE6 == lam(0L, 0L))
  }

  test("importance model round-trips through parquet; one-shot equals standing-model path") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val target = d.filter(col("doc_id") % 10 === 0)
    val rawPool = d.filter(col("doc_id") % 10 =!= 0)
    val oneShot = LmScore.importanceScore(rawPool, target, rawPool, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    val m = LmScore.trainImportanceModel(target, rawPool, "doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("lam").toString
    m.lam.write.mode("overwrite").parquet(dir)
    val m2 = LmScore.ImportanceModel(spark.read.parquet(dir), m.lamUnseenE6)
    val viaArtifact = LmScore.importanceWithModel(rawPool, m2, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    assert(oneShot == viaArtifact)
    assert(oneShot.nonEmpty)
    // no raw-pool token shuffles carry text: the scoring exchanges are
    // (doc_id, 8-byte hash) / model-sized rows only
    val p = LmScore.importanceWithModel(rawPool, m2, "doc_id", "text")
      .queryExecution.executedPlan.toString
    val bad = p.linesIterator.filter(_.contains("Exchange hashpartitioning"))
      .filter(l => l.contains("text#") || l.contains("w#"))
    assert(bad.isEmpty, bad.mkString("\n"))
    CacheScope.release(spark)
  }

  test("modelFromCounts over slices equals one-shot training (additive sufficient stats)") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val ref = d.filter(col("doc_id") % 10 === 0)
    val docs = d.filter(col("doc_id") % 10 =!= 0).limit(50)
    def scores(m: LmScore.BigramModel) =
      LmScore.scoreWithModel(docs, m, "doc_id", "text")
        .orderBy("doc_id").collect().toSeq
    val oneShot = scores(LmScore.trainBigramModel(ref, "doc_id", "text"))
    val slices = (0L until 4L).map(i => ref.filter(pmod(col("doc_id"), lit(4L)) === i))
    val merged = LmScore.modelFromCounts(
      slices.map(LmScore.unigramCounts(_, "doc_id", "text")).reduce(_ unionByName _),
      slices.map(LmScore.bigramCounts(_, "doc_id", "text")).reduce(_ unionByName _))
    assert(scores(merged) == oneShot)
    assert(oneShot.nonEmpty)
    CacheScope.release(spark)
  }
}
