package graft.ops

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq((7L, "hello world"), (8L, "")).toDF("doc_id", "text")

  test("asMediaTable produces the opaque-binary media schema") {
    val m = Multimodal.asMediaTable(docs, "doc_id", "text")
    assert(m.schema.fieldNames.toSeq == Multimodal.mediaSchema.fieldNames.toSeq)
    assert(m.schema("payload").dataType.typeName == "binary")
    assert(m.count() == 2)
  }

  test("decodeFeatures emits deterministic metadata and drops the payload") {
    val m = Multimodal.asMediaTable(docs, "doc_id", "text")
    val d = Multimodal.decodeFeatures(m)
    assert(d.schema.fieldNames.toSeq ==
      Seq("media_id", "width", "height", "channels", "n_bytes", "features"))
    val byId = d.collect().map(r => r.getLong(0) -> r).toMap
    assert(byId(7L).getLong(4) == "hello world".getBytes.length.toLong)
    assert(byId(8L).getLong(4) == 0L)
    val first = byId.view.mapValues(_.getSeq[Float](5)).toMap
    val again = Multimodal.decodeFeatures(m).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](5)).toMap
    assert(again == first)
  }
}
