package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.Encoders

/** SQL-callable registration of the engine's function library — the
  * reference's `spark.sqlContext.udf.register` surface
  * (rt-flink ads/demo/JarSubmit.scala:24-28) generalized: after
  * `registerAll`, `spark.sql` users can call the graft functions by
  * name. Column-expression functions need no registration (import
  * graft.functions._); these are the closures that benefit from a SQL
  * name.
  */
object SqlFunctions {

  def registerAll(spark: SparkSession): Unit = {
    // native expression — registered through the function registry so
    // SQL callers keep codegen (not a UDF wrapper)
    org.apache.spark.sql.graft.StringSimilarity.registerSql(spark)
    spark.udf.register("graft_exact_distinct", udaf(Aggregators.exactDistinctAgg))
    spark.udf.register("graft_lang_id",
      (text: String) => langIdScala(Option(text).getOrElse("")))
    spark.udf.register("graft_token_count",
      (text: String) =>
        Option(text).map(_.trim.split("\\s+").count(_.nonEmpty)).getOrElse(0))
  }

  /** Driver-side mirror of [[TextFunctions.langId]]'s marker scoring for
    * the SQL-name registration (same marker sets, same argmax order).
    */
  private[functions] def langIdScala(text: String): String = {
    val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
    val n = math.max(toks.length, 1).toDouble
    def ratio(markers: Set[String]) = toks.count(markers.contains) / n
    val en = ratio(Set("the", "a", "and", "of", "to", "is"))
    val fr = ratio(Set("le", "la", "les", "et", "de", "un"))
    val de = ratio(Set("der", "die", "das", "und", "ein", "zu"))
    val es = ratio(Set("el", "los", "las", "y", "una", "en"))
    if (en >= fr && en >= de && en >= es && en > 0) "en"
    else if (fr >= de && fr >= es && fr > 0) "fr"
    else if (de >= es && de > 0) "de"
    else if (es > 0) "es"
    else "und"
  }
}
