package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Scratch: measure the counting-join vs prefix-filter Jaccard crossover
  * on a dense (synthetic, near-dup-heavy) vs sparse (cluster-reps-only)
  * corpus.
  */
object JaccardCrossover {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.core.Tables.load(spark, sfDir, "documents")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"dense corpus: ${docs.count()} docs")
    val blocks = Seq(col("lang"), floor(col("n_chars") / 100).cast("long"))
    // sparse corpus: keep one representative per 0.8-Jaccard cluster;
    // materialized to parquet so releaseAll can't break its lineage
    // (dedupByPairs runs through localCheckpoint'd label propagation)
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", blocks, 8000L)
    val sparsePath = "/tmp/jaccard_crossover_sparse"
    Dedup.dedupByPairs(docs, "doc_id", pairs)
      .write.mode("overwrite").parquet(sparsePath)
    val sparse = spark.read.parquet(sparsePath)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"sparse corpus: ${sparse.count()} docs")
    def time(name: String, df: => DataFrame): Unit = {
      graft.Bench.releaseAll(spark)
      docs.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK).count()
      sparse.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK).count()
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"$name rows=$n t=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // the decision statistic: counting-join joined rows = Σ_(block,tok) f²
    def stat(df: DataFrame, bl: Seq[org.apache.spark.sql.Column]): Unit = {
      val keys = bl.indices.map(i => s"blk_$i")
      val toks = df.select(
        (col("doc_id").as("id") +:
          array_distinct(graft.functions.TextFunctions.tokenize(lower(col("text")))).as("toks") +:
          bl.zipWithIndex.map { case (c, i) => c.as(s"blk_$i") }): _*)
        .select((col("id") +: keys.map(col)) :+ explode(col("toks")).as("tok"): _*)
      val n = toks.count()
      val f2 = toks.groupBy((keys.map(col) :+ col("tok")): _*).count()
        .agg(sum(col("count") * col("count"))).head().getLong(0)
      println(f"  tokenRows=$n sumF2=$f2 ratio=${f2.toDouble / n}%.1f")
    }
    println("dense blocked:"); stat(docs, blocks)
    println("sparse blocked:"); stat(sparse, blocks)
    val global = Seq(lit(1))
    println("sparse unblocked:"); stat(sparse, global)
    for (rep <- 1 to 2) {
      time(s"dense  blocked   counting rep$rep",
        Dedup.ngramJaccardPairs(docs, "doc_id", "text", blocks, 8000L))
      time(s"dense  blocked   prefix   rep$rep",
        Dedup.ngramJaccardPairsPrefix(docs, "doc_id", "text", blocks, 8000L))
      time(s"sparse blocked   counting rep$rep",
        Dedup.ngramJaccardPairs(sparse, "doc_id", "text", blocks, 8000L))
      time(s"sparse blocked   prefix   rep$rep",
        Dedup.ngramJaccardPairsPrefix(sparse, "doc_id", "text", blocks, 8000L))
      time(s"sparse unblocked counting rep$rep",
        Dedup.ngramJaccardPairs(sparse, "doc_id", "text", global, 8000L))
      time(s"sparse unblocked prefix   rep$rep",
        Dedup.ngramJaccardPairsPrefix(sparse, "doc_id", "text", global, 8000L))
    }
    spark.stop()
  }
}
