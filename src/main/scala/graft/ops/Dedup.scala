package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Document deduplication at 100 TB scale: exact (hash-groupBy),
  * MinHash+LSH, SimHash, and n-gram Jaccard.
  *
  * Scale design notes (the part that matters at 1000 executors):
  *  - Exact dedup shuffles an 8-byte xxhash64 fingerprint, never the
  *    document text; the text column is dropped before the exchange.
  *  - MinHash/LSH shuffles (band, bucket) keys — O(docs × bands) rows of
  *    a few bytes each. Candidate verification joins only candidate
  *    pairs (tiny vs the N² naive space).
  *  - All hash functions are Catalyst built-ins (murmur3 `hash`,
  *    `xxhash64`) — codegen'd, no UDFs, deterministic across runs.
  */
object Dedup {

  /** Exact dedup: one representative (min id) per distinct text. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(col(textCol))
      .agg(min(col(idCol)).as("rep_id"), count(lit(1)).as("dup_ct"))
      .select(col("rep_id"), col("dup_ct"))

  /** Exact dedup by content fingerprint — the scale path: group by an
    * 8-byte hash of the normalized text so the shuffle carries hashes,
    * not documents. Collision probability at 10^10 docs ~ 2^-24 per
    * pair-bucket; acceptable for training-data dedup (and verifiable by
    * a second pass on colliding buckets if not).
    */
  def exactByFingerprint(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), TextFunctions.contentFingerprint(col(textCol)).as("fp"))
      .groupBy(col("fp"))
      .agg(min(col(idCol)).as("rep_id"), count(lit(1)).as("dup_ct"))
      .select(col("rep_id"), col("dup_ct"))

  /** MinHash signature of a shingle-set column: k independent hash
    * functions h_i(s) = murmur3(s, i); signature[i] = min over shingles.
    */
  def minhashSignature(shingleSet: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)),
      i => array_min(transform(shingleSet, s => hash(s, i).cast("long"))))

  /** MinHash + LSH near-duplicate pairs.
    *
    * shingle(n) → signature(k) → band into `bands` buckets → self-join
    * on (band, bucket) → verify candidates with exact Jaccard on the
    * shingle sets → pairs with jaccard ≥ threshold, id_a < id_b.
    */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
                      shingleN: Int = 5, k: Int = 32, bands: Int = 8,
                      threshold: Double = 0.8): DataFrame = {
    require(k % bands == 0, "k must divide into bands")
    val r = k / bands
    val base = df.select(
        col(idCol).as("id"),
        TextFunctions.shingles(col(textCol), shingleN).as("sh"))
      .withColumn("sig", minhashSignature(col("sh"), k))
    // one row per (doc, band): bucket = hash of the band's slice of the
    // signature. Keys are tiny; the doc text never enters this shuffle.
    val banded = base.select(
      col("id"), col("sh"),
      explode(array((0 until bands).map(b => struct(lit(b).as("band"),
        xxhash64(slice(col("sig"), b * r + 1, r), lit(b)).as("bucket"))): _*)).as("bb"))
      .select(col("id"), col("sh"), col("bb.band"), col("bb.bucket"))
    val a = banded.alias("a")
    val b = banded.alias("b")
    val candidates = a.join(b,
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sh").as("sh_a"), col("b.sh").as("sh_b"))
      .dropDuplicates("id_a", "id_b")
    candidates
      .withColumn("jac",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .filter(col("jac") >= threshold)
      .select(col("id_a"), col("id_b"),
        floor(col("jac") * 10000).cast("long").as("jaccard_e4"))
  }

  /** 64-bit SimHash signatures, one row per document: explode tokens,
    * xxhash64 each, then a single hash-aggregate with 64 ±1 bit-counters
    * folded into one long. Partial (map-side) aggregation applies, so at
    * scale the shuffle carries 64 longs per doc, never the tokens.
    */
  def simhashSignatures(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df
      .select(col(idCol).as("id"),
        explode(TextFunctions.tokenize(lower(col(textCol)))).as("tok"))
      .select(col("id"), xxhash64(col("tok")).as("h"))
    val counters = (0 until 64).map(j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L))
        .as(s"c$j"))
    toks.groupBy(col("id"))
      .agg(counters.head, counters.tail: _*)
      .select(col("id"),
        (0 until 64).map(j =>
          when(col(s"c$j") > 0L, lit(1L << j)).otherwise(lit(0L)))
          .reduce((a, b) => a.bitwiseOR(b)).as("sh"))
  }

  /** SimHash near-dup pairs: block on 16-bit chunks of the simhash (two
    * docs within hamming distance ≤ 3 of a 64-bit hash share at least
    * one of 4 exact 16-bit chunks — pigeonhole), verify with bit_count.
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    val base = simhashSignatures(df, idCol, textCol)
    val chunked = base.select(col("id"), col("sh"),
      explode(array((0 until 4).map(c => struct(lit(c).as("chunk"),
        shiftright(col("sh"), c * 16).bitwiseAND(lit(0xFFFFL)).as("ckey"))): _*)).as("cc"))
      .select(col("id"), col("sh"), col("cc.chunk"), col("cc.ckey"))
    val a = chunked.alias("a")
    val b = chunked.alias("b")
    a.join(b,
        col("a.chunk") === col("b.chunk") && col("a.ckey") === col("b.ckey") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        bit_count(col("a.sh").bitwiseXOR(col("b.sh"))).as("hamming"))
      .dropDuplicates("id_a", "id_b")
      .filter(col("hamming") <= maxHamming)
  }

  /** Exact blocked n-gram Jaccard: pairwise token-set Jaccard within
    * blocking keys (e.g. language + length band) — the verification
    * baseline for the probabilistic dedupers. Block sizes bound the
    * quadratic term; blocks shuffle independently.
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        blockCols: Seq[Column], thresholdE4: Long): DataFrame = {
    val base = df.select(
      (col(idCol).as("id") +:
        array_distinct(TextFunctions.tokenize(lower(col(textCol)))).as("toks") +:
        blockCols.zipWithIndex.map { case (c, i) => c.as(s"blk_$i") }): _*)
    val keys = blockCols.indices.map(i => s"blk_$i")
    val a = base.alias("a")
    val b = base.alias("b")
    val cond = keys.map(k => col(s"a.$k") === col(s"b.$k"))
      .reduce(_ && _) && col("a.id") < col("b.id")
    a.join(b, cond)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        floor(size(array_intersect(col("a.toks"), col("b.toks"))).cast("double") /
          size(array_union(col("a.toks"), col("b.toks"))).cast("double") * 10000)
          .cast("long").as("jaccard_e4"))
      .filter(col("jaccard_e4") >= thresholdE4)
  }
}
