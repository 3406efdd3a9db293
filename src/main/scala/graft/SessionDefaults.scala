package graft

import org.apache.spark.sql.SparkSession

/** Engine-default runtime confs shared by the driver surfaces
  * (graft.Bench, graft.Verify) and the builder's measurement tools — one
  * definition so the benched engine and the verified engine can't drift.
  *
  * Everything here is SIZE-CONDITIONED, not tuned to local[32] (the
  * optimization-round rule: a conf win that only makes sense at the
  * local core count doesn't count):
  *
  *  - `preferSortMergeJoin=false` lets the planner pick a shuffled-hash
  *    join when its own size conditions hold (the build side's estimate
  *    fits one local hash map); oversized sides still plan sort-merge.
  *    Guide §3.1: SHJ skips both sort passes; measured 1.8x on the q3
  *    x10 shape (min-of-5 interleaved, r19).
  *  - `maxShuffledHashJoinLocalMapThreshold=64MB` lets AQE rewrite a
  *    planned sort-merge into shuffled-hash at runtime when every
  *    post-shuffle partition measured under the threshold — the
  *    scale-adaptive form of the same decision (64MB per-partition build
  *    is executor-memory-safe at any corpus size; partition counts grow
  *    with the data).
  *
  * Env overrides (driver contract keeps working unchanged):
  * SPARK_GRAFT_PREFER_SMJ=true restores the stock planner preference,
  * SPARK_GRAFT_SHJ_THRESHOLD sets the AQE rewrite threshold (0 = off).
  */
object SessionDefaults {
  def apply(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.join.preferSortMergeJoin",
      sys.env.getOrElse("SPARK_GRAFT_PREFER_SMJ", "false"))
    .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
      sys.env.getOrElse("SPARK_GRAFT_SHJ_THRESHOLD", "64MB"))
}
