package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: stage-by-stage timing for the bench-tail queries. */
object Profile {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"STAGE $name t=${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val which = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    which match {
      case "q31" =>
        val d = graft.core.Tables.load(spark, sfDir, "documents")
        val shingleN = 5; val k = 32
        val norm = lower(regexp_replace(col("text"), "\\s+", " "))
        val shRows = d.select(col("doc_id").as("id"), norm.as("norm"))
          .select(col("id"), col("norm"),
            explode(sequence(lit(1),
              greatest(length(col("norm")) - (shingleN - 1), lit(1)))).as("pos"))
          .select(col("id"),
            xxhash64(col("norm").substr(col("pos"), lit(shingleN))).as("h"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        t("shRows.count")(println(shRows.count()))
        val minAggs = (0 until k).map(i => min(xxhash64(col("h"), lit(i))).as(s"m$i"))
        val sigs = shRows.groupBy(col("id")).agg(minAggs.head, minAggs.tail: _*)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        t("sigs.count")(println(sigs.count()))
        val bands = 8; val r = k / bands
        val banded = sigs.select(col("id"),
          explode(array((0 until bands).map { b =>
            val comps = (b * r until (b + 1) * r).map(i => col(s"m$i"))
            struct(lit(b).as("band"), xxhash64(comps :+ lit(b): _*).as("bucket"))
          }: _*)).as("bb"))
          .select(col("id"), col("bb.band"), col("bb.bucket"))
        val candidates = banded.alias("a").join(banded.alias("b"),
            col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
              col("a.id") < col("b.id"))
          .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
          .distinct()
        t("candidates.count")(println(candidates.count()))
        val full = t("full.plan")(graft.SparkEntry.queries("q31_dedup_minhash")(spark, sfDir))
        t("full.count")(println(full.count()))
      case "q52" =>
        val d = graft.core.Tables.load(spark, sfDir, "documents")
        val pairs = graft.ops.Dedup.ngramJaccardPairs(d, "doc_id", "text",
          Seq(col("lang"), floor(col("n_chars") / 100).cast("long")), 9500L)
        val edges = t("pairs.checkpoint")(pairs.localCheckpoint(true))
        t("edges.count")(println(edges.count()))
        val cc = t("cc")(graft.ops.Dedup.connectedComponents(edges).count())
        println(cc)
      case "q45" =>
        val q = graft.SparkEntry.queries("q45_log_pipeline")(spark, sfDir)
        t("run1")(println(q.count()))
        t("run2")(println(q.count()))
        val raw = graft.core.Tables.load(spark, sfDir, "events").select(to_json(struct(
          struct(col("user_id").cast("string").as("mid"), lit("v1").as("vc"),
            lit("web").as("ch"), lit("310000").as("ar"), lit("0").as("is_new"))
            .as("common"),
          struct(col("event_type").as("page_id"),
            lit(null).cast("string").as("last_page_id"),
            get_json_object(col("props"), "$.k").as("item"),
            col("value").cast("long").as("during_time")).as("page"),
          unix_millis(col("ts")).as("ts"))).as("value"))
        t("to_json.only")(println(raw.count()))
        val parsed = graft.apps.Pipelines.parseLog(raw)
        t("parse.only")(println(parsed.count()))
    }
    spark.stop()
  }
}
