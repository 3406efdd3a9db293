package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change-data-capture: snapshot diff + replay.
  *
  * The Spark mapping of the reference's logical-decoding output plugin
  * (`/root/reference/contrib/test_decoding/test_decoding.c`; decode
  * harness `/root/reference/src/backend/replication/logical/decode.c`):
  * [[diff]] derives the change stream a decoded BEGIN..COMMIT payload
  * carries — op I/U/D with before/after images — from two keyed
  * snapshots, and [[replay]] is the consumer side: applying a change set
  * onto the old snapshot reproduces the new one exactly. CdcSpec proves
  * the round-trip law `replay(old, diff(old, new)) == new`, including
  * under re-partitioning, plus the change-only contract (diff of
  * identical snapshots is empty).
  *
  * Scale shape: diff is ONE full-outer join on the key — each side
  * shuffles once (zero exchanges when both snapshots are bucketed on the
  * key), and unchanged rows are dropped executor-side so the emitted
  * stream is proportional to the change volume, never the table. replay
  * is a left-anti plus union — again one key shuffle per side. No
  * driver state, no collects.
  */
object Cdc {

  /** The diff wire format claims the `op`, `old_*`/`new_*`, and
    * `_old_present`/`_new_present` names; a snapshot whose own columns
    * land in that namespace would collide with the generated ones and
    * silently corrupt the diff/replay, so reject it up front. */
  private def requireNoReservedNames(cols: Seq[String]): Unit = {
    val clash = cols.filter(c => c == "op" || c.startsWith("old_") ||
      c.startsWith("new_") || c == "_old_present" || c == "_new_present")
    require(clash.isEmpty,
      s"snapshot columns ${clash.mkString(", ")} collide with the CDC " +
        "reserved namespace (op, old_*, new_*, _old_present, _new_present)")
  }

  /** Op-tagged diff of two snapshots sharing a schema. Output columns:
    * `keys ++ op ('I'|'U'|'D') ++ (old_c, new_c)` per value column c.
    * Rows equal under null-safe comparison on every value column are
    * omitted (test_decoding emits only changed tuples). */
  def diff(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String]): DataFrame = {
    require(oldDf.columns.sorted.sameElements(newDf.columns.sorted),
      "snapshots must share a schema")
    requireNoReservedNames(oldDf.columns.toSeq)
    val vals = oldDf.columns.filterNot(keys.contains).toSeq
    val o = oldDf.select(
      keys.map(col) ++ (lit(1).as("_old_present") +:
        vals.map(c => col(c).as(s"old_$c"))): _*)
    val n = newDf.select(
      keys.map(col) ++ (lit(1).as("_new_present") +:
        vals.map(c => col(c).as(s"new_$c"))): _*)
    val changed = vals.map(c => !(col(s"old_$c") <=> col(s"new_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    o.join(n, keys, "full_outer")
      .withColumn("op",
        when(col("_old_present").isNull, lit("I"))
          .when(col("_new_present").isNull, lit("D"))
          .when(changed, lit("U")))
      .filter(col("op").isNotNull)
      .select(keys.map(col) ++ (col("op") +:
        vals.flatMap(c => Seq(col(s"old_$c"), col(s"new_$c")))): _*)
  }

  /** Apply a [[diff]]-shaped change set onto `base`: D keys vanish, U
    * keys take their new image, I keys append. Exact inverse of diff by
    * construction — every touched key leaves base via the anti join and
    * I/U re-enter with new values. */
  def replay(base: DataFrame, changes: DataFrame, keys: Seq[String]): DataFrame = {
    requireNoReservedNames(base.columns.toSeq)
    val vals = base.columns.filterNot(keys.contains).toSeq
    val upserts = changes.filter(col("op").isin("I", "U"))
      .select(keys.map(col) ++ vals.map(c => col(s"new_$c").as(c)): _*)
    base.join(changes.select(keys.map(col): _*), keys, "left_anti")
      .unionByName(upserts)
  }
}
