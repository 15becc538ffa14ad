package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Scratch: stage-by-stage timing of minhashLshPairs internals (q31). */
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
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
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"STAGE $label t=${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val shingleN = 5; val k = 32; val bands = 8; val threshold = 0.5
    val r = k / bands
    val df = spark.read.parquet(s"$sfDir/documents.parquet")
    val norm = lower(regexp_replace(col("text"), "\\s+", " "))
    val shRows = df.select(col("doc_id").as("id"), norm.as("norm"))
      .select(col("id"), col("norm"),
        explode(sequence(lit(1),
          greatest(length(col("norm")) - (shingleN - 1), lit(1)))).as("pos"))
      .select(col("id"),
        xxhash64(col("norm").substr(col("pos"), lit(shingleN))).as("h"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    time("shRows materialize")(println("  shRows=" + shRows.count()))

    val minAggs = (0 until k).map(i => min(xxhash64(col("h"), lit(i))).as(s"m$i"))
    val sigs = shRows.groupBy(col("id")).agg(minAggs.head, minAggs.tail: _*)
      .persist(StorageLevel.MEMORY_AND_DISK)
    time("sigs materialize")(println("  sigs=" + sigs.count()))

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
      .persist(StorageLevel.MEMORY_AND_DISK)
    time("candidates")(println("  candidates=" + candidates.count()))

    val sigA = sigs.select(
      col("id").as("id_a") +: (0 until k).map(i => col(s"m$i").as(s"a$i")): _*)
    val sigB = sigs.select(
      col("id").as("id_b") +: (0 until k).map(i => col(s"m$i").as(s"b$i")): _*)
    val est = (0 until k)
      .map(i => when(col(s"a$i") === col(s"b$i"), 1.0).otherwise(0.0))
      .reduce(_ + _) / k
    val margin = 3.0 * math.sqrt(threshold * (1.0 - threshold) / k)
    val survivors = candidates.join(sigA, "id_a").join(sigB, "id_b")
      .filter(est >= threshold - margin)
      .select(col("id_a"), col("id_b"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    time("survivors")(println("  survivors=" + survivors.count()))

    val neededIds = survivors
      .select(explode(array(col("id_a"), col("id_b"))).as("id"))
      .distinct()
    val sets = shRows.join(neededIds, "id")
      .groupBy(col("id")).agg(collect_set(col("h")).as("sh"))
    val out = survivors
      .join(sets.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sets.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("jac",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .filter(col("jac") >= threshold)
    time("verify+final")(println("  out=" + out.count()))
    spark.stop()
  }
}
