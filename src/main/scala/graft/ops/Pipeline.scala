package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Stage boundaries for composed pipelines — the q145 composition
  * lesson promoted from inline code to a constructor, so user
  * compositions get the behavior by construction instead of by
  * folklore.
  *
  * The lesson (measured on the seven-operator corpus-build pipeline,
  * 28 s/rep → 11 s at sf0.1): pipeline operators reference their input
  * SEVERAL times inside their own plans — a span scrub reads its input
  * three times (window df, offsets, surgery), a keep-best dedup reads
  * it for bands, pairs, and the final semi join. Chain N such
  * operators without materialization barriers and the upstream work
  * re-executes once per reference, compounding combinatorially — the
  * gate's explode-aggregate runs 3× inside the scrub, 9× inside the
  * dedup, and so on. Spark cannot see this from the plan: each
  * reference is a legitimate subtree, and whole-plan common-subtree
  * reuse is not something Catalyst does across operator boundaries.
  *
  * `stage(name, df)` is the fix: persist + register with the session's
  * [[CacheScope]] (so a caller's single `CacheScope.release` after the
  * terminal action drops every boundary at once), with the stage name
  * recorded for observability — `CacheScope.stagedNames(spark)` lets a
  * spec (or an ops dashboard) assert the persist points exist.
  *
  * WHERE to put stages: after every operator whose OUTPUT the next
  * stage consumes more than once — which in practice means after every
  * operator in the chain except pure single-reference projections.
  * At 100 TB the same rule holds with storage levels sized to the
  * cluster (MEMORY_AND_DISK spills; a checkpoint to a fast FS is the
  * escalation for chains whose lineage grows past re-analysis cost —
  * the connectedComponents lesson).
  */
object Pipeline {

  /** Mark a stage boundary: persist `df`, register it for the
    * session's next [[CacheScope.release]], record `name`. Returns the
    * SAME lazy frame — call sites read as plain composition.
    */
  def stage(name: String, df: DataFrame,
            level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame =
    CacheScope.persistStage(name, df, level)
}
