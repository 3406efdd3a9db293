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
    private val ClaimRe = "tx_(\\d{12})\\.claim".r

    /** Committed segments (directories). */
    private def segs(): Seq[(Long, Path)] = list { (name, p) =>
      name match { case SegRe(n) => Some((n.toLong, p)); case _ => None }
    }

    /** Claimed sequence slots (claim marker files — may not have a
      * committed directory YET; see [[commit]]). */
    private def claims(): Seq[Long] = list { (name, _) =>
      name match { case ClaimRe(n) => Some((n.toLong, ())); case _ => None }
    }.map(_._1)

    private def list[A](f: (String, Path) => Option[(Long, A)]): Seq[(Long, A)] = {
      val p = new Path(root)
      if (!fs.exists(p)) Nil
      else fs.listStatus(p).toSeq
        .flatMap(st => f(st.getPath.getName, st.getPath)).sortBy(_._1)
    }

    private def tailSeq(): Long =
      (segs().map(_._1) ++ claims()).foldLeft(0L)(math.max)

    /** Highest sequence safe to DELIVER: every slot up to it is claimed
      * AND committed. A claim whose directory hasn't landed yet (a
      * committer between its two steps) holds the horizon back, so a
      * slow committer can never be skipped past and then lost — the
      * ordering guarantee PG gets from inserting under the queue lock. */
    private def horizon(): Long = {
      val committed = segs().map(_._1).toSet
      val pendingClaim = claims().filterNot(committed).sorted.headOption
      pendingClaim.map(_ - 1).getOrElse(tailSeq())
    }

    /** O_EXCL claim-file creation. Hadoop's local create(overwrite=false)
      * is check-then-create (racy) and local rename onto an existing
      * directory moves the source INTO it (POSIX mv semantics) — both
      * were observed to let two racing commits share a slot. On local
      * paths java.io.File.createNewFile is a true atomic O_CREAT|O_EXCL;
      * on HDFS-like stores create(overwrite=false) is atomic already. */
    private def atomicClaim(p: Path): Boolean = fs match {
      case _: org.apache.hadoop.fs.LocalFileSystem |
           _: org.apache.hadoop.fs.RawLocalFileSystem =>
        val f = new java.io.File(p.toUri.getPath)
        try f.createNewFile()
        catch { case _: java.io.IOException => false }
      case other =>
        try { other.create(p, false).close(); true }
        catch { case _: java.io.IOException => false }
    }

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
        // two-step publish: (1) claim the next slot with an O_EXCL
        // marker — losers see the claim in tailSeq() and move up; (2)
        // rename the staged segment into the claimed slot. Readers only
        // deliver up to the claimed-AND-committed horizon, so the window
        // between the steps delays delivery, never reorders or drops it.
        var attempts = 0
        while (true) {
          val next = tailSeq() + 1
          if (atomicClaim(new Path(root, f"tx_$next%012d.claim"))) {
            val dst = new Path(root, f"tx_$next%012d")
            require(fs.rename(staging, dst), s"rename failed: $staging -> $dst")
            return next
          }
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
        * order; advances the cursor. Reads only the new segments, and
        * only up to the claimed-AND-committed horizon (a racing
        * committer mid-publish is waited out, not skipped). */
      def poll(): Seq[Notification] = {
        val h = horizon()
        val fresh = segs().filter(s => s._1 > pos && s._1 <= h)
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
      * passed (callers supply the min listener position). Claim markers
      * for dropped slots go too; markers for NEVER-committed slots stay,
      * pinning the horizon until an operator inspects the crash. */
    def truncate(minListenerPos: Long): Int = {
      val committed = segs().map(_._1).toSet
      val dead = segs().filter(_._1 <= minListenerPos)
      dead.foreach { case (_, p) => fs.delete(p, true) }
      claims().filter(n => n <= minListenerPos && committed(n))
        .foreach(n => fs.delete(new Path(root, f"tx_$n%012d.claim"), false))
      dead.size
    }
  }
}
