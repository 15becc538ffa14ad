package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.{Multimodal, QualityClassifier}

/** ONE SparkSession, FOUR live sinks (r19 verdict next #5): every
  * streaming sink is spec'd in isolation elsewhere; this drives the
  * text-dedup chain (StreamingDedup → StreamingCc), the media curation
  * chain (StreamingMedia → StreamingCc merge), the classifier count
  * maintenance (LrIngest.lrCountSink), and the drift monitor
  * (LrIngest.driftMonitorSink) CONCURRENTLY — four real
  * MemoryStream→foreachBatch queries on one session, batches
  * interleaving on their own threads — and asserts every standing
  * table equals its isolated-run twin byte-for-byte.
  *
  * The untested surface this covers is cross-sink interference:
  * shared TableSync visibility barriers, the (context, thread)-scoped
  * CacheScope registry (under the old session-keyed single deque one
  * sink's per-batch drain could pop a sibling's in-flight frames), the
  * plan-leaf checkpoint capture (the old getPersistentRDDs-diff swept
  * blocks a concurrent sink created inside the window), catalog cache
  * invalidation, and the merge sink's conf-isolated clone — the r19
  * merge-sink conf bug was exactly this class.
  */
class ComposedSinksSpec extends SparkSpec {
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
  import spark.implicits._

  private val db = "graft_composed_spec"

  override def afterAll(): Unit = {
    spark.sql(s"DROP DATABASE IF EXISTS `$db` CASCADE")
    super.afterAll()
  }

  // ---- fixtures ------------------------------------------------------

  /** Text corpus with planted near-dup groups (a shared sentence per
    * group of 3, one token edited for 2 of 3 members). */
  private val textDocs: Seq[(Long, String)] = (0L until 24L).map { i =>
    val g = i / 3
    val tail = i % 3 match {
      case 0 => "alpha"
      case 1 => "alpha" // exact dup of member 0's tail
      case _ => "omega" // near-dup: one shingle band still collides
    }
    (i, s"group $g shares this exact long sentence body token stream $tail")
  }

  /** PNG media with planted near-dup triples (the StreamingMediaSpec
    * pixel formula in miniature). */
  private def mediaDocs: Seq[(Long, Array[Byte])] = {
    val docs = (0L until 18L).map(i => (i, "")).toDF("doc_id", "text")
    val did = col("doc_id")
    val base = did - pmod(did, lit(3L))
    val ipos = pmod(did * lit(13L), lit(72L))
    val pixels = flatten(transform(sequence(lit(0), lit(7)), y =>
      transform(sequence(lit(0), lit(8)), x => {
        val xl = x.cast("long"); val yl = y.cast("long")
        val i = yl * lit(9L) + xl
        val h = (base + lit(1L)) * lit(2654435761L) +
          xl * lit(97L) + yl * lit(1031L)
        val g = h.bitwiseXOR(shiftright(h, 7))
        val p = pmod(g * lit(31L) + shiftright(g, 11), lit(241L))
        when(pmod(did, lit(3L)) =!= lit(0L) && i === ipos,
          pmod(p + lit(128L), lit(241L))).otherwise(p).cast("int")
      })))
    Multimodal.asGrayPngMediaTable(docs, "doc_id", 9, 8, pixels)
      .select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])].collect().toSeq
  }

  /** Labeled classifier docs (the LrIngestSpec planted fixture). */
  private val labeledDocs: Seq[(Long, String, Long)] = Seq(
    (0L, "alpha beta pos pos", 1L), (1L, "beta gamma pos", 1L),
    (2L, "alpha gamma neg neg", 0L), (3L, "beta neg", 0L),
    (4L, "gamma alpha pos", 1L), (5L, "alpha neg neg neg", 0L),
    (6L, "beta beta pos pos", 1L), (7L, "gamma neg", 0L))

  // ---- sink wiring ---------------------------------------------------

  private def textChain(corpusT: String, indexT: String, labelT: String)
      : (DataFrame, Long) => Unit = {
    val cc = StreamingCc.incrementalCcSink(spark, db, labelT)()
    StreamingDedup.incrementalDedupSink(spark, db, corpusT, indexT,
      "doc_id", "text", shingleN = 5, k = 32, bands = 16,
      threshold = 0.5) { (pairs, bid) =>
      cc(pairs.select(col("id_a"), col("id_b")), bid)
    }
  }

  private def mediaChain(fpT: String, labelT: String)
      : (DataFrame, Long) => Unit = {
    val cc = StreamingCc.incrementalCcMergeSink(spark, db, labelT,
      nBuckets = 8)()
    StreamingMedia.incrementalMediaDedupSink(spark, db, fpT) {
      (pairs, bid) => cc(pairs.select(col("id_a"), col("id_b")), bid)
    }
  }

  private def startStream[A <: Product : org.apache.spark.sql.Encoder](
      cols: Seq[String], sink: (DataFrame, Long) => Unit)
      : (MemoryStream[A], org.apache.spark.sql.streaming.StreamingQuery) = {
    val input = MemoryStream[A]
    val q = input.toDF().toDF(cols: _*).writeStream
      .foreachBatch(sink)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("cxck").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
      .start()
    (input, q)
  }

  private def tableSet(name: String): Set[Seq[Any]] =
    spark.table(s"`$db`.`$name`").collect().map(_.toSeq.map {
      case b: Array[Byte] => b.toSeq
      case x => x
    }.toSeq).toSet

  test("five concurrent sinks on one session equal their isolated twins") {
    val model = QualityClassifier.trainLogistic(
      labeledDocs.toDF("doc_id", "text", "y"), "doc_id", "text", "y")
    // vector-ingest standing models (the VectorIngestSpec pattern:
    // materialized off their training lineage — a standing sink must
    // not read released checkpoint blocks)
    val emb = graft.core.Tables.load(spark, "/root/testdata/sf0.01",
      "embeddings").select(col("vec_id"), col("embedding"))
    val vbase = emb.filter(col("vec_id") < 200)
    def materialize(df: DataFrame) = spark.createDataFrame(
      spark.sparkContext.parallelize(df.collect().toSeq), df.schema)
    val cents = materialize(
      graft.ops.Similarity.trainCentroids(vbase, nCells = 4, iters = 2))
    val books = materialize(
      graft.ops.Similarity.trainProductQuantizer(vbase, nSub = 8, k = 16,
        iters = 2))
    val baseErr = graft.ops.Similarity.pqSelfErrorE6(
        vbase, graft.ops.Similarity.pqIndex(vbase, cents, books, nSub = 8),
        books)
      .select(col("mean_sq_err_e6")).head().getLong(0)
    graft.ops.CacheScope.release(spark)
    val vecWaves = Seq(
      emb.filter(col("vec_id") >= 200 && col("vec_id") < 230),
      emb.filter(col("vec_id") >= 230 && col("vec_id") < 260))
      .map(_.as[(Long, Seq[Float])].collect().toSeq)
    def vecSink(table: String) = VectorIngest.pqIngestSink(spark, db,
      table, cents, books, nSub = 8, baseErrE6 = baseErr) {
      (_, _, _, _) => () }
    val inRegime = labeledDocs.map { case (id, tx, _) => (id + 100L, tx) }
    val offRegime = labeledDocs.map { case (id, _, y) =>
      (id + 200L, if (y == 1L) "xmk xmk noise" else "zmk zmk noise") }
    val base = QualityClassifier.scoreConfidenceE6(
      QualityClassifier.scoreLogistic(inRegime.toDF("doc_id", "text"),
        model, "doc_id", "text")).head().getLong(1)
    val media = mediaDocs

    // wave slicing shared by the composed run and every isolated twin
    val textWaves = textDocs.grouped(9).toSeq
    val mediaWaves = media.grouped(7).toSeq
    val countWaves = labeledDocs.grouped(3).toSeq
    val monitorWaves = Seq(inRegime, offRegime)

    def runComposed(): Unit = {
      val (ti, tq) = startStream[(Long, String)](Seq("doc_id", "text"),
        textChain("cx_corpus", "cx_index", "cx_tlabels"))
      val (mi, mq) = startStream[(Long, Array[Byte])](
        Seq("media_id", "payload"), mediaChain("cx_fp", "cx_mlabels"))
      val (ci, cq) = startStream[(Long, String, Long)](
        Seq("doc_id", "text", "y"),
        LrIngest.lrCountSink(spark, db, "cx_counts",
          "doc_id", "text", "y")())
      val (di, dq) = startStream[(Long, String)](Seq("doc_id", "text"),
        LrIngest.driftMonitorSink(spark, db, "cx_monitor", model, base,
          "doc_id", "text")())
      val (vi, vq) = startStream[(Long, Seq[Float])](
        Seq("vec_id", "embedding"), vecSink("cx_vindex"))
      try {
        val waves = Seq(textWaves.size, mediaWaves.size, countWaves.size,
          monitorWaves.size, vecWaves.size).max
        for (w <- 0 until waves) {
          // enqueue this wave on EVERY stream first, so all five
          // micro-batches are in flight together on their own threads
          textWaves.lift(w).foreach(s => ti.addData(s: _*))
          mediaWaves.lift(w).foreach(s => mi.addData(s: _*))
          countWaves.lift(w).foreach(s => ci.addData(s: _*))
          monitorWaves.lift(w).foreach(s => di.addData(s: _*))
          vecWaves.lift(w).foreach(s => vi.addData(s: _*))
          Seq(tq, mq, cq, dq, vq).foreach(_.processAllAvailable())
        }
      } finally Seq(tq, mq, cq, dq, vq).foreach(_.stop())
    }
    runComposed()
    graft.ops.CacheScope.release(spark)

    // isolated twins: the same sinks, same waves, run one at a time
    val tSink = textChain("iso_corpus", "iso_index", "iso_tlabels")
    textWaves.zipWithIndex.foreach { case (s, i) =>
      tSink(s.toDF("doc_id", "text"), i.toLong) }
    val mSink = mediaChain("iso_fp", "iso_mlabels")
    mediaWaves.zipWithIndex.foreach { case (s, i) =>
      mSink(s.toDF("media_id", "payload"), i.toLong) }
    val cSink = LrIngest.lrCountSink(spark, db, "iso_counts",
      "doc_id", "text", "y")()
    countWaves.zipWithIndex.foreach { case (s, i) =>
      cSink(s.toDF("doc_id", "text", "y"), i.toLong) }
    val dSink = LrIngest.driftMonitorSink(spark, db, "iso_monitor",
      model, base, "doc_id", "text")()
    monitorWaves.zipWithIndex.foreach { case (s, i) =>
      dSink(s.toDF("doc_id", "text"), i.toLong) }
    val vSink = vecSink("iso_vindex")
    vecWaves.zipWithIndex.foreach { case (s, i) =>
      vSink(s.toDF("vec_id", "embedding"), i.toLong) }
    graft.ops.CacheScope.release(spark)

    for ((cx, iso) <- Seq(
        "cx_corpus" -> "iso_corpus", "cx_index" -> "iso_index",
        "cx_tlabels" -> "iso_tlabels", "cx_fp" -> "iso_fp",
        "cx_mlabels" -> "iso_mlabels", "cx_counts" -> "iso_counts",
        "cx_monitor" -> "iso_monitor", "cx_vindex" -> "iso_vindex")) {
      assert(tableSet(cx) === tableSet(iso),
        s"composed-run table $cx must equal its isolated twin $iso")
      assert(tableSet(cx).nonEmpty, s"$cx must not be empty")
    }
    // the monitor saw the regime shift exactly as the isolated run did
    val monitor = spark.table(s"`$db`.`cx_monitor`")
      .orderBy("__batch_id").select("__batch_id", "drift")
      .as[(Long, Boolean)].collect().toSeq
    assert(monitor === Seq((0L, false), (1L, true)))
  }
}
