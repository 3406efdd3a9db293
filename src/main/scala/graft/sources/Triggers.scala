package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Triggers + transition tables, re-expressed for a columnar engine.
  *
  * Reference semantics (`/root/reference/src/backend/commands/trigger.c`,
  * executor scan of captured transitions
  * `/root/reference/src/backend/executor/nodeNamedtuplestorescan.c:23-60`):
  *
  *  - BEFORE ROW triggers may rewrite the incoming tuple or suppress it
  *    (function returns NULL → row skipped), gated by a WHEN clause;
  *    multiple triggers fire in NAME order (trigger.c orders by tgname).
  *  - AFTER STATEMENT triggers with `REFERENCING OLD/NEW TABLE AS ...`
  *    see the statement's full change set as named tuplestores — the
  *    NamedTuplestoreScan node streams those captured tuples back into
  *    any SQL the trigger body runs (trigger.c:434-449: OLD TABLE /
  *    NEW TABLE naming; transition capture is statement-scoped).
  *
  * The Spark-first translation changes the HOW, deliberately:
  *
  *  - A BEFORE ROW trigger body is a `Column` rewrite per column plus an
  *    optional suppression predicate — not a per-row callback. PG pays a
  *    function-manager call per row per trigger; here every enabled
  *    trigger fuses into the DML statement's plan and runs inside
  *    whole-stage codegen, so a 100 TB ingest with three row triggers
  *    is still one codegen'd scan→project→write.
  *  - Transition tables are plain `DataFrame`s pinned with
  *    `localCheckpoint` at fire time (the tuplestore materialization:
  *    capture once, scan many; sized by the statement's CHANGE VOLUME,
  *    never the table, and spilled by the block manager rather than a
  *    driver-side list). AFTER STATEMENT trigger bodies are ordinary
  *    Spark jobs over those frames — the NamedTuplestoreScan analogue is
  *    just "the captured DataFrame is scannable".
  *  - AFTER ROW triggers are intentionally absent: PG itself queues them
  *    per-row (trigger.c's deferred event queue) which is exactly the
  *    shape that cannot scale out; the transition-table form is the
  *    set-based equivalent PG added for this reason. BEFORE ROW covers
  *    rewrite/suppress; AFTER STATEMENT covers audit/propagation.
  */
object Triggers {

  /** BEFORE ROW trigger: fires on `events` ("INSERT"/"UPDATE"), in name
    * order. `when` gates per row (rows failing WHEN pass unmodified —
    * trigger.c WHEN-clause semantics); `suppress` rows are dropped from
    * the statement (the "return NULL" path); `set` rewrites NEW columns.
    */
  final case class BeforeRow(
      name: String,
      events: Set[String],
      set: Map[String, Column] = Map.empty,
      when: Option[Column] = None,
      suppress: Option[Column] = None)

  /** AFTER STATEMENT trigger with transition tables: `fire(event, old,
    * new)` — OLD TABLE is defined for UPDATE/DELETE, NEW TABLE for
    * INSERT/UPDATE, matching trigger.c's transition capture matrix. */
  final case class AfterStatement(
      name: String,
      events: Set[String],
      fire: (String, Option[DataFrame], Option[DataFrame]) => Unit)

  /** A parquet table with an attached trigger set. DML goes through
    * [[insert]]/[[update]]/[[delete]]; each statement applies BEFORE ROW
    * rewrites in-plan, captures transition tables, rewrites storage via
    * the crash-safe [[Ingest]] staging paths, then fires AFTER STATEMENT
    * triggers in name order. */
  final class TriggeredTable(
      spark: SparkSession,
      val path: String,
      beforeRow: Seq[BeforeRow] = Nil,
      afterStatement: Seq[AfterStatement] = Nil) {

    private def table: DataFrame = spark.read.parquet(path)

    /** Fuse every enabled BEFORE ROW trigger into one projection+filter.
      * Name order = PG's tgname fire order. */
    private def applyBeforeRow(event: String, rows: DataFrame): DataFrame =
      beforeRow.filter(_.events(event)).sortBy(_.name).foldLeft(rows) {
        (df, trg) =>
          val gated = trg.suppress match {
            case Some(cond) =>
              val c = trg.when.map(_ && cond).getOrElse(cond)
              df.filter(!coalesce(c, lit(false)))
            case None => df
          }
          trg.set.foldLeft(gated) { case (d, (colName, value)) =>
            val v = trg.when match {
              case Some(w) => when(w, value).otherwise(col(colName))
              case None    => value
            }
            d.withColumn(colName, v)
          }
      }

    private def fireAfter(event: String, oldTab: Option[DataFrame],
                          newTab: Option[DataFrame]): Unit =
      afterStatement.filter(_.events(event)).sortBy(_.name)
        .foreach(_.fire(event, oldTab, newTab))

    /** INSERT: BEFORE ROW rewrites fuse into the write's plan; the NEW
      * transition table is the post-trigger insert set, pinned once. */
    def insert(rows: DataFrame): Unit = {
      val newTab = applyBeforeRow("INSERT", rows).localCheckpoint()
      newTab.write.mode("append").parquet(path)
      fireAfter("INSERT", None, Some(newTab))
    }

    /** UPDATE ... SET ... WHERE: OLD TABLE = matched rows pre-image, NEW
      * TABLE = post-SET post-trigger image. Storage rewrite reuses
      * [[Ingest.updateWhere]]'s staged swap, fed the already-rewritten
      * rows so BEFORE ROW effects land in the table too. */
    def update(set: Map[String, Column], where: Column): Unit = {
      val cur = table
      val oldTab = cur.filter(where).localCheckpoint()
      val afterSet = set.foldLeft(oldTab) { case (d, (c, v)) =>
        d.withColumn(c, v)
      }
      val newTab = applyBeforeRow("UPDATE", afterSet).localCheckpoint()
      // rewrite = untouched rows + the captured new image: one staged swap
      Ingest.replaceTable(spark,
        cur.filter(!coalesce(where, lit(false))).unionByName(newTab), path)
      fireAfter("UPDATE", Some(oldTab), Some(newTab))
    }

    /** DELETE ... WHERE: OLD TABLE = the rows removed. */
    def delete(where: Column): Unit = {
      val cur = table
      val oldTab = cur.filter(where).localCheckpoint()
      Ingest.deleteWhere(spark, cur, path, where)
      fireAfter("DELETE", Some(oldTab), None)
    }
  }
}
