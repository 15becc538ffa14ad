package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PackSpec extends SparkSpec {
  import spark.implicits._

  test("packGreedy: cuts a new sequence every budget tokens, in id order") {
    // one group; token counts 600 each, budget 1000 → docs 1-2 land in
    // seq 0 (before=0,600), doc 3 in seq 1 (1200), doc 4 in seq 1 (1800),
    // doc 5 in seq 2 (2400)
    val df = (1L to 5L).map(i => ("g", i, 600L)).toDF("grp", "id", "tc")
    val p = Pack.packGreedy(df, Seq("grp"), "id", "tc", 1000L)
      .select($"id", $"seq_id".cast("long")).as[(Long, Long)].collect().toMap
    assert(p == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L, 5L -> 2L), s"got $p")
  }

  test("packGreedy: an over-budget document overflows its own slot") {
    val df = Seq(("g", 1L, 5000L), ("g", 2L, 100L)).toDF("grp", "id", "tc")
    val p = Pack.packGreedy(df, Seq("grp"), "id", "tc", 1000L)
      .select($"id", $"tokens_before", $"seq_id".cast("long"))
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    // the big doc starts seq 0; the next doc starts after 5000 tokens → seq 5
    assert(p.toSeq == Seq((1L, 0L, 0L), (2L, 5000L, 5L)), s"got ${p.toSeq}")
  }

  test("packGreedy: deterministic under repartition, groups independent") {
    val df = (1L to 200L).map(i => (s"g${i % 3}", i, (i % 7) * 100L))
      .toDF("grp", "id", "tc")
    val a = Pack.packGreedy(df, Seq("grp"), "id", "tc", 512L)
      .select("grp", "id", "seq_id")
    val b = Pack.packGreedy(df.repartition(7), Seq("grp"), "id", "tc", 512L)
      .select($"grp", $"id", $"seq_id".as("seq_id2"))
    assert(a.join(b, Seq("grp", "id")).filter($"seq_id" =!= $"seq_id2").count() == 0)
    // within every group, seq ids start at 0 and are contiguous
    val firsts = a.groupBy("grp").agg(min("seq_id").as("m"))
      .select("m").as[Long].collect()
    assert(firsts.forall(_ == 0L))
  }
}
