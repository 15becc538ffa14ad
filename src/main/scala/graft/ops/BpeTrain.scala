package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed BPE tokenizer TRAINING (Sennrich et al., ACL'16) — the
  * classic greedy merge loop, run corpus-scale: each round counts
  * adjacent symbol pairs weighted by word frequency and merges the
  * globally most frequent pair everywhere.
  *
  * Scale shape:
  *  - All work runs on the **word-frequency dictionary**, never the
  *    corpus: one corpus scan builds (word, freq); every merge round is
  *    a dictionary-sized aggregate (Zipf: the dictionary is orders of
  *    magnitude smaller than the corpus, and bounded by vocabulary, not
  *    data volume — it GROWS sub-linearly at 100 TB).
  *  - Symbol sequences are strings with every symbol wrapped in its own
  *    `\u0001` sentinel pair (`\u0001ab\u0001\u0001c\u0001` = [ab, c]),
  *    and a merge is the codegen'd literal
  *    `replace(sym, "\u0001a\u0001\u0001b\u0001", "\u0001ab\u0001")`.
  *    Leftmost non-overlapping replacement on THIS encoding is exactly
  *    the BPE merge rule: the per-symbol delimiters stop a pattern from
  *    matching INSIDE a longer symbol (a bare space-joined encoding
  *    merges `(a,b)` into the middle of symbol `xa` — the r11 review
  *    counterexample), and adjacent pair occurrences share no boundary
  *    characters, so `[a,b,a,b]` merges both pairs in one pass. No UDF,
  *    no per-row Scala.
  *  - The per-round argmax is a 1-row `limit(1).collect()` — the merge
  *    decision is model-sized by definition (it IS the model update);
  *    this is the one deliberate driver touch, same contract as the
  *    strata table in [[Sampling]].
  *  - Each round `localCheckpoint`s the rewritten dictionary (the CC
  *    loop's lineage-truncation discipline — the plan would otherwise
  *    grow by one `replace` per round).
  *
  * Tokenization is a plain `\s+` whitespace split (lowercased), chosen
  * to be engine-portable: the DuckDB oracle replays it with
  * `string_split_regex`. (Residual: Java's `\s` includes the vertical
  * tab, RE2's does not — irrelevant for any text without one.)
  * Words containing the `\u0001` sentinel are excluded from training on
  * both engines (the encoding reserves it).
  *
  * Determinism: integer pair counts, ties broken (count desc, lhs asc,
  * rhs asc) — byte-identical merge lists across runs and engines, which
  * is what lets the DuckDB oracle replay the whole loop exactly.
  *
  * Output: (rank, lhs, rhs, merged, pair_ct) — one row per learned
  * merge, rank 1 = first merge. Stops early when no pair reaches
  * `minCount`.
  */
object BpeTrain {

  private val S = "\u0001"

  private val outSchema = StructType(Seq(
    StructField("rank", IntegerType, nullable = false),
    StructField("lhs", StringType, nullable = false),
    StructField("rhs", StringType, nullable = false),
    StructField("merged", StringType, nullable = false),
    StructField("pair_ct", LongType, nullable = false)))

  /** `mergeBatch > 1` (r16) amortizes the per-merge driver round-trip:
    * each round counts pairs ONCE, collects the top `mergeBatch + 1`
    * candidates, and accepts the longest prefix that PROVABLY yields
    * the same merge sequence as the one-at-a-time loop:
    *
    *  - pairwise symbol independence: for accepted i < k, the trios
    *    {a_i, b_i, a_i·b_i} and {a_k, b_k, a_k·b_k} are disjoint —
    *    applying one accepted merge then cannot change another's
    *    count (shared operands) or CREATE occurrences of another's
    *    operand / be created by another's product (name collisions);
    *  - strict separation: the last accepted candidate's count must
    *    STRICTLY exceed the first non-accepted candidate's. Every
    *    pair a merge can create inherits at most its parent pair's
    *    count, every parent shares a symbol with an accepted merge
    *    and is therefore non-accepted, and all non-accepted pairs are
    *    bounded by that first non-accepted count — so no created or
    *    surviving pair can reach the accepted band, and ties INSIDE
    *    the accepted prefix keep their lexical order because their
    *    counts are untouched. (Equality is excluded deliberately: an
    *    inherited-count tie can lexically outrank the next accepted
    *    candidate, which is exactly where a naive batch diverges.)
    *
    * The accepted merges apply as chained `replace`s in rank order —
    * the same rewrite sequence the sequential loop performs, so the
    * dictionary state after the round is byte-identical, and each
    * recorded pair_ct equals the count the sequential argmax would
    * have seen (unchanged by the independence condition). With
    * `mergeBatch = 1` the prefix is always the bare argmax and the
    * loop IS the original algorithm.
    */
  def learnMerges(docs: DataFrame, textCol: String, nMerges: Int,
                  minCount: Long = 2L, mergeBatch: Int = 1): DataFrame = {
    require(mergeBatch >= 1, s"mergeBatch must be >= 1, got $mergeBatch")
    val spark = docs.sparkSession
    val words = docs
      .select(explode(split(lower(col(textCol)), "\\s+")).as("word"))
      .filter(length(col("word")) > 0 && !col("word").contains(S))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
    // LAZY checkpoints (r21 — the CC/PageRank r20 treatment, the
    // documented leftover): each round's argmax aggregate (a global
    // sorted-limit — every partition of `dict` is computed) is the
    // materializing action, so a round costs ONE pass over the
    // dictionary instead of an eager count pass plus the argmax pass.
    var (dict, dictRdds) = CacheScope.localCheckpointLazyTracked(
      words.select(
        array_join(transform(split(col("word"), ""),
          c => concat(lit(S), c, lit(S))), "").as("sym"),
        col("freq")))
    // the PREVIOUS round's blocks stay alive until the next round's
    // argmax has materialized the current dict (the lazy-checkpoint
    // contract: a full action before unpersisting the inputs the
    // truncated plan reads)
    var prevRdds: Seq[org.apache.spark.rdd.RDD[_]] = Nil

    val merges = scala.collection.mutable.ArrayBuffer.empty[Row]
    var done = false
    while (!done && merges.size < nMerges) {
      // decode: strip the outer sentinel of the first/last symbol, then
      // split on the double sentinel between symbols
      val toks = split(trim(col("sym"), S), S + S)
      val want = math.min(mergeBatch, nMerges - merges.size)
      val top = dict
        .select(col("freq"), explode(zip_with(
          slice(toks, lit(1), size(toks) - 1),
          slice(toks, lit(2), size(toks) - 1),
          (x, y) => struct(x.as("x"), y.as("y")))).as("z"))
        .groupBy(col("z.x").as("x"), col("z.y").as("y"))
        .agg(sum(col("freq")).as("ct"))
        .filter(col("ct") >= minCount)
        .orderBy(col("ct").desc, col("x").asc, col("y").asc)
        .limit(want + 1).collect()
      // the argmax just materialized dict's blocks over every
      // partition — the previous round's state is now dead
      CacheScope.unpersistRdds(prevRdds)
      prevRdds = Nil
      if (top.isEmpty) done = true
      else {
        val cand = top.map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        // longest independent prefix (the argmax always accepts) ...
        val accepted = scala.collection.mutable.ArrayBuffer(cand.head)
        def trio(c: (String, String, Long)) = Set(c._1, c._2, c._1 + c._2)
        var i = 1
        var stop = false
        while (!stop && i < math.min(want, cand.length)) {
          val c = cand(i)
          if (accepted.forall(a => trio(a).intersect(trio(c)).isEmpty)) {
            accepted += c; i += 1
          } else stop = true
        }
        // ... then enforce the strict boundary: ties INSIDE the prefix
        // are fine (their counts are untouched, lexical order holds),
        // but the last accepted must strictly beat the first candidate
        // left out, else created pairs inheriting that count could
        // lexically outrank it in the sequential order — trim until it
        // does (the bare argmax needs no boundary: nothing it creates
        // is processed before the next full recount)
        while (accepted.size > 1 && accepted.size < cand.length &&
            accepted.last._3 <= cand(accepted.size)._3)
          accepted.remove(accepted.size - 1)
        accepted.foreach { case (a, b, ct) =>
          merges += Row(merges.size + 1, a, b, a + b, ct)
        }
        val rewritten = accepted.foldLeft(col("sym")) { case (sym, (a, b, _)) =>
          replace(sym, lit(S + a + S + S + b + S), lit(S + a + b + S))
        }
        val (next, nextRdds) = CacheScope.localCheckpointLazyTracked(
          dict.withColumn("sym", rewritten))
        // `next` is LAZY and its plan reads dict's blocks — dict's
        // drop waits for the next round's argmax (prevRdds above)
        prevRdds = dictRdds
        dict = next
        dictRdds = nextRdds
      }
    }
    CacheScope.unpersistRdds(prevRdds)
    CacheScope.unpersistRdds(dictRdds)
    spark.createDataFrame(
      spark.sparkContext.parallelize(merges.toSeq, 1), outSchema)
  }

  /** BPE ENCODING with a fixed learned merge list — the apply side of
    * [[learnMerges]], and deliberately the SAME machinery: each merge
    * is one codegen'd sentinel-`replace` over the DISTINCT-WORD
    * dictionary, so the whole encode is a single projection of
    * |merges| chained `replace`s — no per-row Scala, no UDF, no loop
    * at runtime, and the DuckDB oracle replays it as the identical
    * nested `replace` chain.
    *
    * Applying merges exhaustively IN RANK ORDER is equivalent to the
    * classic lowest-rank-first priority encode: merge j's operands are
    * built exclusively from merges with rank < j, so applying a later
    * merge can never create an occurrence of an earlier merge's pair —
    * once merge j's pass is done, pair j never reappears. Within one
    * pass, leftmost non-overlapping replacement on the sentinel
    * encoding is the trainer's own merge rule (BpeTrain.scala:20-28),
    * so train and encode agree on e.g. `aaaa` under `(a,a)`.
    *
    * Scale shape: the replace chain runs over the word DICTIONARY
    * (vocabulary-sized, Zipf-bounded — the same argument as training);
    * the corpus-side cost is one (id, word) count aggregate joined to
    * the encoded dictionary (AQE broadcasts it when small). Corpus
    * text beyond single words never shuffles.
    *
    * Output of [[encodeWords]]: (word, tokens ARRAY<STRING>, n_tokens)
    * — one row per distinct word of `docs`. Words are lowercased and
    * `\s+`-split exactly as in training; sentinel-bearing words are
    * excluded on both engines.
    */
  def encodeWords(docs: DataFrame, textCol: String,
                  merges: Seq[(String, String)]): DataFrame = {
    val sym0 = array_join(transform(split(col("word"), ""),
      c => concat(lit(S), c, lit(S))), "")
    val symN = merges.foldLeft(sym0) { case (sym, (a, b)) =>
      replace(sym, lit(S + a + S + S + b + S), lit(S + a + b + S))
    }
    docs
      .select(explode(split(lower(col(textCol)), "\\s+")).as("word"))
      .filter(length(col("word")) > 0 && !col("word").contains(S))
      .distinct()
      .select(col("word"), split(trim(symN, S), S + S).as("tokens"))
      .withColumn("n_tokens", size(col("tokens")).cast("long"))
  }

  /** Per-document token counts under a fixed merge list: the budget
    * column every packing / token-budget / mixture op keys on
    * ([[Pack]], [[Sampling.tokenBudget]]), computed with the REAL
    * tokenizer instead of the whitespace proxy. One corpus pass
    * (id, word) → count, joined to the [[encodeWords]] dictionary.
    * Documents with no countable word are kept at 0 via the left join
    * on the id spine.
    */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String,
                  merges: Seq[(String, String)]): DataFrame = {
    val dict = encodeWords(docs, textCol, merges)
      .select(col("word"), col("n_tokens"))
    val wordCts = docs
      .select(col(idCol),
        explode(split(lower(col(textCol)), "\\s+")).as("word"))
      .filter(length(col("word")) > 0 && !col("word").contains(S))
      .groupBy(col(idCol), col("word"))
      .agg(count(lit(1)).as("wct"))
    val perDoc = wordCts.join(dict, "word")
      .groupBy(col(idCol))
      .agg(sum(col("wct") * col("n_tokens")).as("bpe_tokens"),
        sum(col("wct")).as("n_words"))
    docs.select(col(idCol)).distinct()
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("bpe_tokens"), lit(0L)).as("bpe_tokens"),
        coalesce(col("n_words"), lit(0L)).as("n_words"))
  }
}
