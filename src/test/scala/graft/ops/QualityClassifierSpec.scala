package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** QualityClassifier vs a naive in-memory mirror of the SAME integer
  * fixed-point arithmetic: the Spark training loop must reproduce the
  * mirror's weight table, bias, and scores EXACTLY (integer training —
  * no tolerance), and the planted-marker fixture must actually be
  * learned (sign structure + held-out accuracy).
  */
class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  private def fdiv(a: Long, b: Long): Long = Math.floorDiv(a, b)

  /** The naive mirror: same tokenization (whitespace split of
    * lowercase), same hard-sigmoid/floor-div arithmetic.
    */
  private def naiveTrain(docs: Seq[(Long, String, Long)], rounds: Int,
                         gMul: Long): (Map[String, Long], Long) = {
    val cnts = docs.map { case (id, text, y) =>
      (id, y, text.toLowerCase.split("\\s+").filter(_.nonEmpty)
        .groupBy(identity).map { case (w, o) => (w, o.length.toLong) })
    }.filter(_._3.nonEmpty)
    val n = cnts.size.toLong
    val g = gMul * n
    var w = cnts.flatMap(_._3.keys).distinct.map(_ -> 0L).toMap
    var b = 0L
    for (_ <- 1 to rounds) {
      val errs = cnts.map { case (id, y, c) =>
        val z = b + c.map { case (t, k) => k * w(t) }.sum
        val p = math.max(0L, math.min(1000000L, fdiv(z, 4L) + 500000L))
        (id, c, p - 1000000L * y)
      }
      val grad = errs.flatMap { case (_, c, e) =>
        c.map { case (t, k) => (t, e * k) }
      }.groupBy(_._1).map { case (t, xs) => (t, xs.map(_._2).sum) }
      w = w.map { case (t, v) => (t, v - fdiv(grad.getOrElse(t, 0L), g)) }
      b = b - fdiv(errs.map(_._3).sum, g)
    }
    (w, b)
  }

  private def naiveScore(docs: Seq[(Long, String)], w: Map[String, Long],
                         b: Long): Map[Long, (Long, Long, Boolean)] =
    docs.flatMap { case (id, text) =>
      val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
      if (toks.isEmpty) None
      else {
        val z = b + toks.groupBy(identity)
          .map { case (t, o) => o.length.toLong * w.getOrElse(t, 0L) }.sum
        val p = math.max(0L, math.min(1000000L, fdiv(z, 4L) + 500000L))
        Some(id -> ((z, p, p >= 500000L)))
      }
    }.toMap

  // deterministic noisy corpus: 8 noise words drawn arithmetically +
  // a class marker on 80% of docs
  private def fixture(n: Int): Seq[(Long, String, Long)] = {
    val noise = Array("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta")
    (0 until n).map { i =>
      val y = if (i % 4 <= 1) 1L else 0L
      val words = (0 until 12).map(j => noise(((i * 7 + j * 13) % 8 + 8) % 8))
      val marked =
        if (i % 5 == 4) words
        else words ++ Seq.fill(2)(if (y == 1L) "qmk" else "jmk")
      (i.toLong, marked.mkString(" "), y)
    }
  }

  test("training reproduces the naive integer mirror exactly") {
    val all = fixture(120)
    val train = all.filter(_._1 % 2 == 0)
    val test = all.filter(_._1 % 2 == 1).map(d => (d._1, d._2))
    val (nw, nb) = naiveTrain(train, rounds = 2, gMul = 16L)

    val trainDf = train.toDF("doc_id", "text", "y")
    val m = QualityClassifier.trainLogistic(trainDf, "doc_id", "text", "y",
      rounds = 2, gMul = 16L)
    assert(m.biasE6 === nb)
    // weight table matches hash-for-hash: re-key the naive weights by
    // xxhash64 through Spark itself (the one hash both sides share)
    val naiveDf = nw.toSeq.toDF("w", "w_e6")
      .select(xxhash64(col("w")).as("h"), col("w_e6"))
    val mismatch = m.w.join(naiveDf, Seq("h"), "full_outer")
      .filter(!(m.w("w_e6") <=> naiveDf("w_e6"))).count()
    assert(mismatch === 0L)

    val got = QualityClassifier.scoreLogistic(test.toDF("doc_id", "text"),
        m, "doc_id", "text")
      .collect().map { case Row(id: Long, z: Long, p: Long, pr: Boolean) =>
        id -> ((z, p, pr)) }.toMap
    assert(got === naiveScore(test, nw, nb))
  }

  test("planted markers are learned: sign structure and held-out accuracy") {
    val all = fixture(200)
    val train = all.filter(_._1 % 2 == 0)
    val m = QualityClassifier.trainLogistic(
      train.toDF("doc_id", "text", "y"), "doc_id", "text", "y",
      rounds = 2, gMul = 16L)
    val wByTok = m.w.join(
        Seq("qmk", "jmk").toDF("w").select(xxhash64(col("w")).as("h"),
          col("w").as("tok")), Seq("h"))
      .collect().map(r => r.getAs[String]("tok") -> r.getAs[Long]("w_e6"))
      .toMap
    assert(wByTok("qmk") > 0L, s"positive marker weight: $wByTok")
    assert(wByTok("jmk") < 0L, s"negative marker weight: $wByTok")

    val test = all.filter(_._1 % 2 == 1)
    val scored = QualityClassifier.scoreLogistic(
      test.map(d => (d._1, d._2)).toDF("doc_id", "text"), m,
      "doc_id", "text")
    val correct = scored
      .join(test.map(d => (d._1, d._3)).toDF("doc_id", "y"), Seq("doc_id"))
      .filter(col("pred") === (col("y") === 1L)).count()
    // 80% of docs carry the marker; the floor leaves 2x headroom over
    // chance on the 20% unmarked remainder
    assert(correct * 10L >= test.size * 7L,
      s"held-out accuracy $correct/${test.size} under 0.70 floor")
  }

  test("hashing trick: collision-free bucketing reproduces the unbucketed scores; the model is bounded") {
    val all = fixture(120)
    val train = all.map(d => (d._1, d._2, d._3)).filter(_._1 % 2 == 0)
    val test = all.filter(_._1 % 2 == 1).map(d => (d._1, d._2)).toDF("doc_id", "text")
    val trainDf = train.toDF("doc_id", "text", "y")
    def scores(nb: Long) = {
      val m = QualityClassifier.trainLogistic(trainDf, "doc_id", "text",
        "y", rounds = 2, gMul = 16L, nBuckets = nb)
      (m, QualityClassifier.scoreLogistic(test, m, "doc_id", "text",
        nBuckets = nb).collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap)
    }
    // 2^30 buckets over the fixture's 10-token vocabulary: no
    // collisions (deterministic for this fixed fixture), so bucketing
    // must change NOTHING — the dial's arithmetic-transparency claim
    val (_, unb) = scores(0L)
    val (_, big) = scores(1L << 30)
    assert(big === unb, "collision-free bucketing must reproduce the scores")
    // a tiny bucket space degrades but stays bounded: the model table
    // can never exceed nBuckets rows, whatever the vocabulary
    val (m4, _) = scores(4L)
    assert(m4.w.count() <= 4L)
    val hs = m4.w.select("h").as[Long].collect()
    assert(hs.forall(h => h >= 0L && h < 4L), hs.mkString(","))
  }

  test("zero-token docs are absent; empty training set fails loud") {
    val m = QualityClassifier.trainLogistic(
      Seq((1L, "a b", 1L), (2L, "   ", 0L), (3L, "b c", 0L))
        .toDF("doc_id", "text", "y"), "doc_id", "text", "y", rounds = 1)
    val scored = QualityClassifier.scoreLogistic(
      Seq((10L, "a"), (11L, " ")).toDF("doc_id", "text"), m,
      "doc_id", "text")
    assert(scored.select("doc_id").as[Long].collect().toSet === Set(10L))
    intercept[IllegalArgumentException] {
      QualityClassifier.trainLogistic(
        Seq.empty[(Long, String, Long)].toDF("doc_id", "text", "y"),
        "doc_id", "text", "y")
    }
  }
}
