package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** LISTEN / NOTIFY — asynchronous notification queue.
  *
  * Reference semantics (`/root/reference/src/backend/commands/async.c`):
  * `Async_Notify` (:553) accumulates per-transaction pending
  * notifications, skipping exact (channel, payload) duplicates within
  * one transaction (`AsyncExistsPendingNotify`, :402); payloads are
  * length-capped (`NOTIFY_PAYLOAD_MAX_LENGTH`, :153); on COMMIT the
  * batch appends to a global SLRU-backed queue at `QUEUE_HEAD` (:262)
  * in commit order, and each listening backend drains from its own
  * queue position — so notifications are transactional (aborted
  * transactions deliver nothing), delivered once per listener, in
  * commit order, only to channels the backend LISTENs to.
  *
  * Spark-first translation: the queue is a directory of per-transaction
  * parquet segments named by a dense commit sequence (`tx_%012d`).
  * COMMIT is one atomic directory rename into the next sequence slot —
  * contention resolves by rename atomicity (the loser re-reads the tail
  * and retries), so commit ORDER is total without any coordinator,
  * matching the SLRU append's serialization. A Listener is a cursor:
  * `poll()` reads only segments past its position (file-listing-pruned,
  * never a queue rescan), filtered to its channels, ordered by
  * (commit seq, within-tx index). Delivery state lives in the listener
  * (at-least-once across listener crashes if the caller persists the
  * cursor; PG's is at-most-once per connection — both are documented
  * postures of the same queue). [[truncate]] is the
  * `asyncQueueAdvanceTail` analogue: drop segments all listeners have
  * passed. Notifications are control-plane-sized (8000-byte payload cap
  * enforced, like the reference); the DATA plane stays in tables — a
  * notification carries a pointer (table/partition/batch id), never
  * rows, which is what keeps this shape valid at 100 TB.
  */
object Notify {

  /** async.c:153 — BLCKSZ(8192) - NAMEDATALEN(64) - 128. */
  val PayloadMaxLength: Int = 8000

  final case class Notification(seq: Long, idx: Int, channel: String,
                                payload: String)

  final class NotifyQueue(spark: SparkSession, root: String) {
    private val hconf = spark.sparkContext.hadoopConfiguration
    private def fs = new Path(root).getFileSystem(hconf)

    private val SegRe = "tx_(\\d{12})".r

    private def segs(): Seq[(Long, Path)] = {
      val p = new Path(root)
      if (!fs.exists(p)) Nil
      else fs.listStatus(p).toSeq.flatMap { st =>
        st.getPath.getName match {
          case SegRe(n) => Some((n.toLong, st.getPath))
          case _        => None
        }
      }.sortBy(_._1)
    }

    private def tailSeq(): Long = segs().lastOption.map(_._1).getOrElse(0L)

    /** Begin a notifying transaction. */
    def begin(): Tx = new Tx

    final class Tx private[NotifyQueue] () {
      // pendingNotifies: insertion-ordered, exact-duplicate-skipping
      private val pending =
        scala.collection.mutable.LinkedHashSet.empty[(String, String)]
      private var done = false

      /** `NOTIFY channel, payload` (async.c:553): queued until commit;
        * an exact duplicate within this transaction is skipped. */
      def notify(channel: String, payload: String = ""): Unit = {
        require(!done, "transaction already committed or aborted")
        require(channel.nonEmpty, "channel name must be non-empty")
        require(payload.getBytes("UTF-8").length <= PayloadMaxLength,
          s"payload too long (max $PayloadMaxLength bytes)")
        pending += ((channel, payload))
      }

      /** Publish in commit order: stage the segment, then claim the next
        * sequence slot by atomic rename, retrying on contention. */
      def commit(): Long = {
        require(!done, "transaction already committed or aborted")
        done = true
        if (pending.isEmpty) return tailSeq()
        val sp = spark; import sp.implicits._
        val rows = pending.toSeq.zipWithIndex.map { case ((c, p), i) =>
          (i, c, p)
        }
        val staging = new Path(root, s".staging_tx_${java.util.UUID.randomUUID}")
        rows.toDF("idx", "channel", "payload").coalesce(1)
          .write.mode(SaveMode.Overwrite).parquet(staging.toString)
        var attempts = 0
        while (true) {
          val next = tailSeq() + 1
          val dst = new Path(root, f"tx_$next%012d")
          if (fs.rename(staging, dst)) return next
          attempts += 1
          require(attempts < 1000, s"could not claim a queue slot under $root")
        }
        -1L // unreachable
      }

      /** Abort: pending notifications are discarded (transactional
        * visibility — nothing was published). */
      def abort(): Unit = done = true
    }

    /** LISTEN: a cursor starting at the CURRENT tail — only
      * notifications committed after the listen begins are seen
      * (async.c backend queue-position semantics). */
    def listen(channels: Set[String]): Listener =
      new Listener(channels, tailSeq())

    final class Listener private[NotifyQueue] (channels: Set[String],
                                               private var pos: Long) {
      /** Current queue position (persist it to make delivery resumable). */
      def position: Long = pos

      /** Drain notifications committed since the last poll, in commit
        * order; advances the cursor. Reads only the new segments. */
      def poll(): Seq[Notification] = {
        val fresh = segs().filter(_._1 > pos)
        if (fresh.isEmpty) return Nil
        val paths = fresh.map(_._2.toString)
        val out = spark.read.parquet(paths: _*)
          .withColumn("seq",
            regexp_extract(input_file_name(), "tx_(\\d{12})", 1).cast("long"))
          .filter(col("channel").isin(channels.toSeq: _*))
          .orderBy(col("seq"), col("idx"))
          .collect()
          .map(r => Notification(r.getAs[Long]("seq"), r.getAs[Int]("idx"),
            r.getAs[String]("channel"), r.getAs[String]("payload")))
          .toSeq
        pos = fresh.map(_._1).max
        out
      }
    }

    /** Whole queue (or from a position) as a DataFrame — the relational
      * view of the notification log. */
    def asDataFrame(fromSeq: Long = 0L): DataFrame = {
      val live = segs().filter(_._1 > fromSeq).map(_._2.toString)
      if (live.isEmpty)
        spark.range(0).selectExpr("CAST(id AS LONG) AS seq",
          "CAST(id AS INT) AS idx", "CAST(null AS STRING) AS channel",
          "CAST(null AS STRING) AS payload")
      else spark.read.parquet(live: _*)
        .withColumn("seq",
          regexp_extract(input_file_name(), "tx_(\\d{12})", 1).cast("long"))
        .select(col("seq"), col("idx"), col("channel"), col("payload"))
    }

    /** asyncQueueAdvanceTail analogue: drop segments every listener has
      * passed (callers supply the min listener position). */
    def truncate(minListenerPos: Long): Int = {
      val dead = segs().filter(_._1 <= minListenerPos)
      dead.foreach { case (_, p) => fs.delete(p, true) }
      dead.size
    }
  }
}
