package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QualitySpec extends SparkSpec {
  import spark.implicits._

  test("gateReason: null text is rejected, not kept (r10 review regression)") {
    // a when-chain SKIPS null conditions — without the explicit null
    // branch a null document fell through every predicate to "keep"
    val docs = Seq[(Long, String)]((1L, null), (2L, "tiny"))
      .toDF("doc_id", "text")
    val got = docs.select($"doc_id", Quality.gateReason($"text").as("r"))
      .as[(Long, String)].collect().toMap
    assert(got(1L) == "null_text", got.toString)
    assert(got(2L) == "too_short")
  }
}
