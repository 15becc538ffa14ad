package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "cat dog"),
    (2L, "cat cat cat"),
    (3L, "bird"),
    (4L, "dog dog bird fish fox")
  ).toDF("doc_id", "text")

  /** Plain-Scala replay of the operator's double arithmetic, in the
    * identical association order — the spec-side oracle.
    */
  private def expectedScores(docs: Seq[(Long, String)], terms: Seq[String],
                             k1: Double, b: Double): Map[Long, (Long, Long)] = {
    val toks = docs.map { case (id, t) => id -> t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq }
    val n = toks.size
    val avgdl = toks.map(_._2.size.toLong).sum.toDouble / n.toDouble
    val tf = for {
      (id, ts) <- toks; (term, g) <- ts.groupBy(identity) if terms.contains(term)
    } yield (id, term, g.size.toLong, ts.size.toLong)
    val df = tf.groupBy(_._2).map { case (t, rows) => t -> rows.size.toLong }
    val idfE6 = df.map { case (t, d) =>
      t -> math.floor(1000000.0 * math.log(
        (n.toDouble - d + 0.5) / (d + 0.5) + 1.0)).toLong
    }
    tf.map { case (id, term, f, dl) =>
      id -> math.floor(idfE6(term).toDouble *
        ((f * (k1 + 1.0)) / (f + k1 * (1.0 - b) + k1 * b * dl / avgdl)) * 1000.0).toLong
    }.groupBy(_._1).map { case (id, parts) => id -> (parts.map(_._2).sum, parts.size.toLong) }
  }

  test("bm25TopK equals the plain-Scala replay of the formula") {
    val docs = Seq((1L, "cat dog"), (2L, "cat cat cat"), (3L, "bird"),
      (4L, "dog dog bird fish fox"))
    val got = Retrieval.bm25TopK(corpus, "doc_id", "text", Seq("cat", "fish"), topK = 10)
      .select("doc_id", "score_e9", "n_terms").as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got == expectedScores(docs, Seq("cat", "fish"), 1.2, 0.75))
  }

  test("higher tf of a rare term outranks lower tf at comparable length") {
    val got = Retrieval.bm25TopK(corpus, "doc_id", "text", Seq("cat"), topK = 10)
      .select("doc_id").as[Long].collect()
    // d2 (tf=3) above d1 (tf=1); d3/d4 (no "cat") absent entirely
    assert(got.toSeq == Seq(2L, 1L))
  }

  test("topK truncates on (score desc, doc_id) and is partition-invariant") {
    val wide = corpus.repartition(7)
    val got = Retrieval.bm25TopK(wide, "doc_id", "text",
      Seq("cat", "dog", "bird", "fish"), topK = 2)
      .select("doc_id").as[Long].collect()
    val full = Retrieval.bm25TopK(corpus, "doc_id", "text",
      Seq("cat", "dog", "bird", "fish"), topK = 10)
      .orderBy(col("score_e9").desc, col("doc_id"))
      .select("doc_id").as[Long].collect()
    assert(got.length == 2 && got.toSeq == full.take(2).toSeq)
  }

  test("empty query rejected; corpus without matches yields empty result") {
    intercept[IllegalArgumentException] {
      Retrieval.bm25TopK(corpus, "doc_id", "text", Seq.empty)
    }
    val none = Retrieval.bm25TopK(corpus, "doc_id", "text", Seq("zebra"), topK = 5)
    assert(none.count() == 0)
  }

  test("tfidf cosine: identical docs score exactly 10000, disjoint docs are absent") {
    import spark.implicits._
    // 'common' appears in all 4 docs -> df 4 > 0.5*4 -> capped out of the
    // space; singleton terms are out by minDf = 2
    val docs = Seq(
      (1L, "alpha beta common"),
      (2L, "alpha beta common"),
      (3L, "gamma delta common"),
      (4L, "gamma gamma delta common")
    ).toDF("doc_id", "text")
    try {
      val got = Retrieval.tfidfCosinePairs(docs, "doc_id", "text", minSimE4 = 1L)
        .as[(Long, Long, Long)].collect()
        .map { case (a, b, s) => (a, b) -> s }.toMap
      // identical vectors: cosine exactly 1
      assert(got((1L, 2L)) == 10000L)
      // equal idf weights w: doc3 = (w, w), doc4 = (2w, w) ->
      // cos = 3w²/(w√2 · w√5) = 3/√10 = 0.9486832... -> floor e4 = 9486
      assert(got((3L, 4L)) == 9486L)
      // no term shared between {1,2} and {3,4} after the cap
      assert(!got.contains((1L, 3L)) && !got.contains((2L, 4L)), got.toString)
    } finally graft.ops.CacheScope.release(spark)
  }

  test("topKeywords: hand-computed weights, df screen, and tie order") {
    import spark.implicits._
    // N = 4. df: alpha 2, beta 2, gamma 2, common 4 (capped out by
    // maxDfFrac 0.5), zeta 1 (out by minDf). idf_e3 for df=2:
    // floor(1000·ln 2) = 693.
    val docs = Seq(
      (1L, "alpha alpha beta zeta common"),
      (2L, "alpha beta common"),
      (3L, "gamma common"),
      (4L, "gamma common")
    ).toDF("doc_id", "text")
    val got = Retrieval.topKeywords(docs, "doc_id", "text", k = 2)
      .as[(Long, String, Long, Long, Long)].collect()
      .map(r => (r._1, r._5) -> ((r._2, r._3, r._4))).toMap
    // doc 1: alpha tf2 w1386 > beta tf1 w693
    assert(got((1L, 1L)) == (("alpha", 2L, 1386L)), got.toString)
    assert(got((1L, 2L)) == (("beta", 1L, 693L)))
    // doc 2: equal weights -> lexicographic tie-break alpha < beta
    assert(got((2L, 1L)) == (("alpha", 1L, 693L)))
    assert(got((2L, 2L)) == (("beta", 1L, 693L)))
    // docs 3/4: only gamma survives the screens -> a single keyword
    assert(got((3L, 1L)) == (("gamma", 1L, 693L)))
    assert(!got.contains((3L, 2L)), got.toString)
  }

  test("vocabularyDivergence: Scala replay of the smoothed JS contributions") {
    val a = Seq("the cat", "the dog").toDF("text")
    val b = Seq("the cat", "the bird bird").toDF("text")
    val got = Retrieval.vocabularyDivergence(a, b, "text", topK = 10)
      .as[(String, Long, Long, Long)].collect()
    // exact replay: na=4 nb=5 v=4; p = (c+1)/(N+V)
    def js(cA: Long, cB: Long): Long = {
      val pa = (cA + 1).toDouble / 8.0
      val pb = (cB + 1).toDouble / 9.0
      val m = (pa + pb) / 2.0
      math.floor(5e8 * (pa * math.log(pa / m))).toLong +
        math.floor(5e8 * (pb * math.log(pb / m))).toLong
    }
    val expect = Map("the" -> ((2L, 2L)), "cat" -> ((1L, 1L)),
      "dog" -> ((1L, 0L)), "bird" -> ((0L, 2L)))
    assert(got.map(r => r._1 -> ((r._2, r._3))).toMap == expect, got.toSeq.toString)
    got.foreach { case (t, cA, cB, j) =>
      assert(j == js(cA, cB), s"$t: $j != ${js(cA, cB)}")
      assert(j >= -1L, s"$t contribution below the floor bound: $j")
    }
    // the shifted tokens outrank the shared ones; desc order holds
    val order = got.map(_._1).toSeq
    assert(order.take(2).toSet == Set("bird", "dog"), order.toString)
    assert(got.map(_._4).toSeq == got.map(_._4).sortBy(-_).toSeq, order.toString)
  }

  // ————— incremental BM25 index (r17) —————

  test("index path equals the direct operator; slice appends equal one build") {
    val docs = Seq((1L, "cat dog"), (2L, "cat cat cat"), (3L, "bird"),
      (4L, "dog dog bird fish fox"), (5L, ""), // zero-token doc: stats-only
      (6L, "fox fish cat"))
    val all = docs.toDF("doc_id", "text")
    val terms = Seq("cat", "bird", "fox")
    val direct = Retrieval.bm25TopK(all, "doc_id", "text", terms, topK = 10)
      .as[(Long, Long, Long)].collect().toSeq
    // one build
    val p1 = Retrieval.bm25Postings(all, "doc_id", "text")
    val s1 = Retrieval.bm25Stats(all, "doc_id", "text")
    val viaIndex = Retrieval.bm25TopKFromIndex(p1, s1, terms, topK = 10)
      .as[(Long, Long, Long)].collect().toSeq
    assert(viaIndex === direct, "index path must be byte-equal to bm25TopK")
    // three slice appends (union of postings, summed stats)
    val slices = docs.grouped(2).map(_.toDF("doc_id", "text")).toSeq
    val pU = slices.map(Retrieval.bm25Postings(_, "doc_id", "text"))
      .reduce(_ unionByName _)
    val sU = slices.map(Retrieval.bm25Stats(_, "doc_id", "text"))
      .reduce(_ unionByName _)
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("n_toks")).as("n_toks"))
    val viaSlices = Retrieval.bm25TopKFromIndex(pU, sU, terms, topK = 10)
      .as[(Long, Long, Long)].collect().toSeq
    assert(viaSlices === direct, "sliced appends must equal one build")
    // the zero-token doc counted toward n_docs (it changes avgdl/idf)
    assert(s1.select("n_docs").as[Long].head() === 6L)
    CacheScope.release(spark)
  }

  test("phraseMatch: adjacency, overlap, repeated words, boundaries") {
    val docs = Seq(
      (1L, "the quick fox and the quick fox again"), // 2 hits of "quick fox"
      (2L, "quick and fox"),                         // words present, not adjacent
      (3L, "a a a a"),                               // overlapping "a a": 3 anchors
      (4L, "quick fox"),                             // exact-boundary hit
      (5L, "fox quick"),                             // reversed: no hit
      (6L, "")).toDF("doc_id", "text")
    val qf = Retrieval.phraseMatch(docs, "doc_id", "text", Seq("quick", "fox"))
      .as[(Long, Long)].collect().toMap
    assert(qf === Map(1L -> 2L, 4L -> 1L), qf.toString)
    val aa = Retrieval.phraseMatch(docs, "doc_id", "text", Seq("a", "a"))
      .as[(Long, Long)].collect().toMap
    assert(aa === Map(3L -> 3L), "overlapping repeated-word anchors: " + aa)
    val tri = Retrieval.phraseMatch(docs, "doc_id", "text",
        Seq("the", "quick", "fox"))
      .as[(Long, Long)].collect().toMap
    assert(tri === Map(1L -> 2L), tri.toString)
    intercept[IllegalArgumentException](
      Retrieval.phraseMatch(docs, "doc_id", "text", Seq("solo")))
    CacheScope.release(spark)
  }
}
