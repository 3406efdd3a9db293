package graft

import org.scalatest.funsuite.AnyFunSuite

/** Stream/batch parity: the streaming tumbling aggregation must produce
  * exactly the rows of the batch query q_events_tumbling. */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  test("streaming tumbling agg equals batch result") {
    val stream = graft.streaming.Streaming
      .tumblingAgg(spark, sf, "stream_tumbling_spec")
      .collect().map(_.toSeq).toSet
    val batch = SparkEntry.queries("q_events_tumbling")(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(stream.nonEmpty)
    assert(stream == batch)
  }

  test("streaming dedup keeps exactly one row per (user, event_type)") {
    val stream = graft.streaming.Streaming
      .streamingDedup(spark, sf, "stream_dedup_spec")
    val batchKeys = Tables.t(spark, sf, "events")
      .select("user_id", "event_type").distinct().count()
    assert(stream.count() == batchKeys)
    // dedup keys are unique in the streamed output
    assert(stream.groupBy("user_id", "event_type").count()
      .filter(org.apache.spark.sql.functions.col("count") > 1).count() == 0)
  }

  test("watermark-bounded streaming dedup keeps one row per key") {
    val stream = graft.streaming.Streaming
      .streamingDedupBounded(spark, sf, "stream_dedup_wm_spec")
    // invariant scoped to keys whose duplicates arrive WITHIN the 1h
    // watermark horizon (matching the caveat on streamingDedupBounded):
    // dropDuplicatesWithinWatermark re-emits a key that reappears after
    // its state is evicted past the horizon. This finite feed drains
    // within the horizon in few micro-batches, so here no key is emitted
    // twice and every key present in the data is emitted at least once
    assert(stream.groupBy("user_id", "event_type").count()
      .filter(org.apache.spark.sql.functions.col("count") > 1).count() == 0,
      "a key must never be emitted twice")
    assert(stream.select("user_id", "event_type").distinct().count() ==
      Tables.t(spark, sf, "events")
        .select("user_id", "event_type").distinct().count(),
      "every distinct key must be emitted exactly once")
  }

  test("streaming near-dedup suppresses exactly one doc per simhash class") {
    val stream = graft.streaming.Streaming
      .streamingNearDedup(spark, sf, "stream_neardedup_spec")
    graft.functions.SigFns.register(spark)
    val batchClasses = Tables.t(spark, sf, "documents")
      .select(org.apache.spark.sql.functions
        .call_function("simhash48", org.apache.spark.sql.functions.col("text"))
        .as("sig"))
      .distinct().count()
    // one survivor per near-dup class, same class definition as batch
    assert(stream.count() == batchClasses,
      "streamed survivors must equal the batch near-dup class count")
    assert(stream.select("sig").distinct().count() == stream.count(),
      "no signature may survive twice")
  }

  test("streaming session windows equal the batch session_window result") {
    import org.apache.spark.sql.functions._
    val stream = graft.streaming.Streaming
      .sessionWindowAgg(spark, sf, "stream_session_spec")
      .collect().map(_.toSeq).toSet
    val batch = Tables.t(spark, sf, "events")
      .groupBy(session_window(col("ts"), "30 minutes").as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("sw.start"), col("sw.end"), col("user_id"), col("n"))
      .collect().map(_.toSeq).toSet
    assert(stream.nonEmpty)
    assert(stream == batch)
  }

  test("stream-static join equals batch join") {
    val stream = graft.streaming.Streaming
      .streamStaticJoin(spark, sf, "stream_static_spec")
      .collect().map(_.toSeq).toSet
    val events = Tables.t(spark, sf, "events")
    val dim = events.groupBy("user_id")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n_total"))
    val batch = events
      .filter(org.apache.spark.sql.functions.col("event_type") === "purchase")
      .join(dim, "user_id")
      .groupBy("user_id", "n_total")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n_purchases"))
      .collect().map(_.toSeq).toSet
    assert(stream.nonEmpty)
    assert(stream == batch)
  }

  test("stream-stream interval join equals the batch interval join") {
    import org.apache.spark.sql.functions._
    val stream = graft.streaming.Streaming
      .streamStreamJoin(spark, sf, "stream_stream_spec")
      .collect().map(_.toSeq).toSet
    val ev = Tables.t(spark, sf, "events")
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"), col("ts").as("p_ts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("c_id"),
              col("ts").as("c_ts"))
    val batch = p.join(c,
        col("user_id") === col("c_user") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
          col("c_ts") <= col("p_ts"))
      .select(col("user_id"), col("p_id"), col("c_id"), col("p_ts"), col("c_ts"))
      .collect().map(_.toSeq).toSet
    assert(stream.nonEmpty, "expected purchase-click matches in the window")
    assert(stream == batch)
  }

  test("stream-stream LEFT OUTER join: matches equal inner, nulls are real and evicted-complete") {
    import org.apache.spark.sql.functions._
    val out = graft.streaming.Streaming
      .streamStreamLeftOuter(spark, sf, "stream_stream_lo_spec")
    val ev = Tables.t(spark, sf, "events")
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"), col("ts").as("p_ts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("c_id"),
              col("ts").as("c_ts"))
    val batchInner = p.join(c,
        col("user_id") === col("c_user") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
          col("c_ts") <= col("p_ts"))
      .select(col("user_id"), col("p_id"), col("c_id"), col("p_ts"), col("c_ts"))

    // 1. the matched subset is exactly the inner join
    val matched = out.filter(col("c_id").isNotNull)
      .collect().map(_.toSeq).toSet
    assert(matched == batchInner.collect().map(_.toSeq).toSet)

    // 2. every null-extended row is genuinely match-less in the batch data
    val matchedPids = batchInner.select("p_id").distinct()
      .collect().map(_.getLong(0)).toSet
    val nullRows = out.filter(col("c_id").isNull)
    val nullPids = nullRows.select("p_id").collect().map(_.getLong(0))
    assert(nullPids.nonEmpty, "expected some match-less purchases")
    assert(nullPids.toSet.intersect(matchedPids).isEmpty,
      "a purchase with a real click must never null-extend")
    assert(nullPids.length == nullPids.toSet.size,
      "outer rows must emit exactly once")

    // 3. eviction completeness: every match-less purchase old enough that
    // the final click watermark (max ts - 1h) provably passed its whole
    // candidate interval MUST have emitted its null row. Purchases newer
    // than that horizon may legitimately still sit in state when the
    // finite feed ends — that is watermark semantics, not data loss.
    val maxTs = ev.agg(max(col("ts"))).head().getTimestamp(0).getTime
    val horizon = new java.sql.Timestamp(maxTs - 3L * 3600 * 1000)
    val expectedNullPids = p
      .join(batchInner.select(col("p_id").as("m_pid")).distinct(),
        col("p_id") === col("m_pid"), "left_anti")
      .filter(col("p_ts") < lit(horizon))
      .select("p_id").collect().map(_.getLong(0)).toSet
    assert(expectedNullPids.subsetOf(nullPids.toSet),
      s"missing evicted null rows: ${expectedNullPids -- nullPids.toSet}")
  }

  test("stream-stream FULL OUTER join: matches equal inner, BOTH sides null-extend exactly once") {
    import org.apache.spark.sql.functions._
    val out = graft.streaming.Streaming
      .streamStreamFullOuter(spark, sf, "stream_stream_fo_spec")
    val ev = Tables.t(spark, sf, "events")
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"), col("ts").as("p_ts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("c_id"),
              col("ts").as("c_ts"))
    val batchInner = p.join(c,
        col("user_id") === col("c_user") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
          col("c_ts") <= col("p_ts"))
      .select(col("user_id"), col("c_user"), col("p_id"), col("c_id"),
              col("p_ts"), col("c_ts"))

    // matched subset == inner join
    val matched = out.filter(col("c_id").isNotNull && col("p_id").isNotNull)
      .collect().map(_.toSeq).toSet
    assert(matched == batchInner.collect().map(_.toSeq).toSet)

    val matchedPids = batchInner.select("p_id").distinct()
      .collect().map(_.getLong(0)).toSet
    val matchedCids = batchInner.select("c_id").distinct()
      .collect().map(_.getLong(0)).toSet

    // left-side nulls: match-less purchases, exactly once
    val pNull = out.filter(col("c_id").isNull)
      .select("p_id").collect().map(_.getLong(0))
    assert(pNull.nonEmpty && pNull.toSet.intersect(matchedPids).isEmpty)
    assert(pNull.length == pNull.toSet.size)

    // right-side nulls — the half the left-outer variant cannot emit:
    // match-less clicks, exactly once
    val cNull = out.filter(col("p_id").isNull)
      .select("c_id").collect().map(_.getLong(0))
    assert(cNull.nonEmpty, "expected some match-less clicks")
    assert(cNull.toSet.intersect(matchedCids).isEmpty,
      "a click with a real purchase must never null-extend")
    assert(cNull.length == cNull.toSet.size,
      "right-outer rows must emit exactly once")

    // eviction completeness, BOTH sides (the left-outer test's part 3):
    // every match-less row old enough that the final watermark provably
    // passed its whole candidate interval MUST have null-extended. With
    // two watermarked inputs Spark's GLOBAL watermark is the MIN of the
    // per-stream watermarks (multipleWatermarkPolicy=min) — the last
    // click itself stays in state because its own stream's watermark
    // cannot pass it — so the provable horizon for either side is
    // min(max p_ts, max c_ts) minus delay + interval + one batch of
    // slack.
    val maxPTs = p.agg(max(col("p_ts"))).head().getTimestamp(0).getTime
    val maxCTs = c.agg(max(col("c_ts"))).head().getTimestamp(0).getTime
    val horizonMs = math.min(maxPTs, maxCTs) - 3L * 3600 * 1000
    val horizonP = new java.sql.Timestamp(horizonMs)
    val horizonC = new java.sql.Timestamp(horizonMs)
    val expectedPNull = p
      .join(batchInner.select(col("p_id").as("m_pid")).distinct(),
        col("p_id") === col("m_pid"), "left_anti")
      .filter(col("p_ts") < lit(horizonP))
      .select("p_id").collect().map(_.getLong(0)).toSet
    assert(expectedPNull.subsetOf(pNull.toSet),
      s"missing evicted left null rows: ${expectedPNull -- pNull.toSet}")
    val expectedCNull = c
      .join(batchInner.select(col("c_id").as("m_cid")).distinct(),
        col("c_id") === col("m_cid"), "left_anti")
      .filter(col("c_ts") < lit(horizonC))
      .select("c_id").collect().map(_.getLong(0)).toSet
    assert(expectedCNull.subsetOf(cNull.toSet),
      s"missing evicted right null rows: ${expectedCNull -- cNull.toSet}")
  }

  test("watermark drops late data and never resurrects an emitted window") {
    import java.sql.Timestamp
    val srcDir = java.nio.file.Files
      .createTempDirectory("graft_late").toString
    def feed(rows: (Long, String)*): Unit = {
      val sp = spark; import sp.implicits._
      rows.toSeq.map { case (id, t) => (id, Timestamp.valueOf(t)) }
        .toDF("id", "ts")
        .coalesce(1).write.mode("append").parquet(srcDir)
    }
    // batch 1: two rows in the 10:00 window; 14:00 pushes the watermark
    // to 13:00, finalizing (emitting + evicting) the 10:00 window
    feed((1L, "2024-01-01 10:10:00"), (2L, "2024-01-01 10:20:00"),
         (3L, "2024-01-01 14:00:00"))
    val q = graft.streaming.Streaming
      .tumblingAppendQuery(spark, srcDir, "stream_late_spec")
    try {
      q.processAllAvailable()
      // batch 2: 10:30 is 1h+ behind the 13:00 watermark -> must be
      // DROPPED; 16:30 advances the watermark to 15:30, emitting 14:00
      feed((4L, "2024-01-01 10:30:00"), (5L, "2024-01-01 16:30:00"))
      q.processAllAvailable()
      val dropped = q.recentProgress
        .flatMap(p => Option(p.stateOperators).toSeq.flatten)
        .map(_.numRowsDroppedByWatermark).sum
      assert(dropped == 1, s"exactly the late row must be dropped, got $dropped")
    } finally q.stop()
    val out = spark.table("stream_late_spec").collect()
      .map(r => (r.getTimestamp(0).toString, r.getLong(1))).toMap
    // the 10:00 window was emitted ONCE with the on-time rows only — the
    // late row neither bumped the count nor appended a second 10:00 row
    assert(out.get("2024-01-01 10:00:00.0").contains(2L), s"got $out")
    assert(out.get("2024-01-01 14:00:00.0").contains(1L), s"got $out")
    assert(spark.table("stream_late_spec")
      .groupBy("hour_start").count()
      .filter(org.apache.spark.sql.functions.col("count") > 1).count() == 0,
      "no window may be emitted twice in append mode")
  }

  test("foreachBatch table sink is exactly-once across restart AND replay") {
    val tableDir = java.nio.file.Files
      .createTempDirectory("graft_stream_tbl").toString
    val ckpt1 = java.nio.file.Files
      .createTempDirectory("graft_stream_ck1").toString
    val expected = Tables.t(spark, sf, "events").count()
    graft.streaming.Streaming.streamToTable(spark, sf, tableDir, ckpt1)
    def tableRows(): Long = spark.read.parquet(tableDir).count()
    assert(tableRows() == expected)
    // restart with the SAME checkpoint: no new data, no new batches
    graft.streaming.Streaming.streamToTable(spark, sf, tableDir, ckpt1)
    assert(tableRows() == expected, "restart must not duplicate rows")
    // checkpoint LOSS: batch ids replay from 0 — the idempotent sink
    // must recognize the committed batch dir and skip it
    val ckpt2 = java.nio.file.Files
      .createTempDirectory("graft_stream_ck2").toString
    graft.streaming.Streaming.streamToTable(spark, sf, tableDir, ckpt2)
    assert(tableRows() == expected, "replayed batch ids must not duplicate rows")
  }

  test("content-keyed sink survives checkpoint loss: zero dupes, zero drops") {
    val srcDir = java.nio.file.Files
      .createTempDirectory("graft_content_src").toString
    val tableDir = java.nio.file.Files
      .createTempDirectory("graft_content_tbl").toString + "/t"
    def feed(ids: Range): Unit = {
      val sp = spark; import sp.implicits._
      // one in-file duplicate pair per feed: ids.head appears twice
      (ids.head +: ids).map(i => (i.toLong, s"payload_$i"))
        .toDF("id", "payload").coalesce(1).write.mode("append").parquet(srcDir)
    }
    def tableIds(): Seq[Long] = spark.read.parquet(tableDir)
      .select("id").collect().map(_.getLong(0)).toSeq
    val ckpt1 = java.nio.file.Files
      .createTempDirectory("graft_content_ck1").toString
    feed(1 to 100)
    graft.streaming.Streaming.streamToTableContent(
      spark, srcDir, "id LONG, payload STRING", tableDir, ckpt1)
    assert(tableIds().sorted == (1L to 100L), "in-batch duplicate collapsed")
    // same checkpoint, no new data: offsets already consumed, no change
    graft.streaming.Streaming.streamToTableContent(
      spark, srcDir, "id LONG, payload STRING", tableDir, ckpt1)
    assert(tableIds().sorted == (1L to 100L))
    // CHECKPOINT LOSS + new data: the fresh checkpoint replans batch 0
    // over ALL files (old 1-100 + new 101-150) — exactly the case where
    // the id-keyed sink would skip the new rows. Content keying must
    // append precisely the 50 new rows and re-commit none of the old.
    feed(101 to 150)
    val ckpt2 = java.nio.file.Files
      .createTempDirectory("graft_content_ck2").toString
    graft.streaming.Streaming.streamToTableContent(
      spark, srcDir, "id LONG, payload STRING", tableDir, ckpt2)
    assert(tableIds().sorted == (1L to 150L),
      "replay must add new rows exactly once and duplicate nothing")
  }

  test("content-keyed sink: rescaled restarts (shuffle-partition changes) stay exactly-once") {
    // the r7 verdict's recovery-depth case: the same checkpoint is
    // resumed under a DIFFERENT spark.sql.shuffle.partitions (cluster
    // rescale), then lost entirely under a third parallelism — the
    // content-keyed sink must neither duplicate nor drop across either
    // transition (its dedup keys on row content, not on any
    // partition-count-dependent artifact)
    val srcDir = java.nio.file.Files
      .createTempDirectory("graft_rescale_src").toString
    val tableDir = java.nio.file.Files
      .createTempDirectory("graft_rescale_tbl").toString + "/t"
    def feed(ids: Range): Unit = {
      val sp = spark; import sp.implicits._
      (ids.head +: ids).map(i => (i.toLong, s"payload_$i"))
        .toDF("id", "payload").coalesce(1).write.mode("append").parquet(srcDir)
    }
    def sess(parts: Int): org.apache.spark.sql.SparkSession = {
      val s = spark.newSession()
      s.conf.set("spark.sql.shuffle.partitions", parts.toString)
      s
    }
    def tableIds(): Seq[Long] = spark.read.parquet(tableDir)
      .select("id").collect().map(_.getLong(0)).toSeq
    val ckpt1 = java.nio.file.Files
      .createTempDirectory("graft_rescale_ck1").toString
    feed(1 to 80)
    graft.streaming.Streaming.streamToTableContent(
      sess(4), srcDir, "id LONG, payload STRING", tableDir, ckpt1)
    assert(tableIds().sorted == (1L to 80L))
    // rescale UP, same checkpoint, new data: only the new rows commit
    feed(81 to 120)
    graft.streaming.Streaming.streamToTableContent(
      sess(13), srcDir, "id LONG, payload STRING", tableDir, ckpt1)
    assert(tableIds().sorted == (1L to 120L),
      "rescaled restart must append the new rows exactly once")
    // rescale DOWN + checkpoint loss: batch 0 replans over ALL files
    // under a third parallelism — still zero dupes, zero drops
    feed(121 to 140)
    val ckpt2 = java.nio.file.Files
      .createTempDirectory("graft_rescale_ck2").toString
    graft.streaming.Streaming.streamToTableContent(
      sess(3), srcDir, "id LONG, payload STRING", tableDir, ckpt2)
    assert(tableIds().sorted == (1L to 140L),
      "checkpoint loss under a new parallelism must replay idempotently")
  }

  test("streaming incremental matview: delta refresh equals full refresh, restart-idempotent") {
    import org.apache.spark.sql.functions._
    val sp = spark; import sp.implicits._
    val srcDir = java.nio.file.Files
      .createTempDirectory("graft_mv_src").toString
    val mvDir = java.nio.file.Files
      .createTempDirectory("graft_mv").toString + "/mv"
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_mv_ck").toString
    def feed(ids: Range): Unit =
      ids.map(i => (i.toLong, s"t${i % 3}", i * 1.25))
        .toDF("event_id", "event_type", "value")
        .coalesce(1).write.mode("append").parquet(srcDir)
    def mvRows(): Map[String, (Long, Long)] =
      graft.sources.Matviews.read(spark, mvDir)
        .collect().map(r => r.getString(r.fieldIndex("event_type")) ->
          (r.getLong(r.fieldIndex("n")), r.getLong(r.fieldIndex("sum_u")))).toMap
    def batchTruth(): Map[String, (Long, Long)] =
      spark.read.parquet(srcDir)
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"),
          sum(round($"value" * 1000000.0, 0).cast("long")).as("sum_u"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

    feed(1 to 60)
    graft.streaming.Streaming.streamingMatviewCounts(spark, srcDir, mvDir, ckpt)
    assert(mvRows() == batchTruth())
    // second feed folds ONLY the delta into the snapshot
    feed(61 to 150)
    graft.streaming.Streaming.streamingMatviewCounts(spark, srcDir, mvDir, ckpt)
    assert(mvRows() == batchTruth())
    // restart with the same checkpoint and no new data: unchanged
    graft.streaming.Streaming.streamingMatviewCounts(spark, srcDir, mvDir, ckpt)
    assert(mvRows() == batchTruth())
    // bounded MVCC: at most 2 snapshot versions on disk
    val vdirs = new java.io.File(mvDir).listFiles()
      .count(f => f.isDirectory && f.getName.matches("v\\d+"))
    assert(vdirs <= 2, s"expected <=2 snapshot versions, found $vdirs")
    // checkpoint loss: recovery is the full re-execution into a fresh dir
    val mvDir2 = java.nio.file.Files
      .createTempDirectory("graft_mv2").toString + "/mv"
    graft.streaming.Streaming.rebuildMatviewCounts(spark, srcDir, mvDir2)
    val rebuilt = graft.sources.Matviews.read(spark, mvDir2)
      .collect().map(r => r.getString(r.fieldIndex("event_type")) ->
        (r.getLong(r.fieldIndex("n")), r.getLong(r.fieldIndex("sum_u")))).toMap
    assert(rebuilt == batchTruth())
    // and STREAMING CONTINUES from the rebuilt snapshot with a fresh
    // checkpoint: batch 0 (the files the rebuild covered) is skipped via
    // the _applied_batch=0 stamp — no double count — while data arriving
    // after the stream start applies as a normal delta
    val ckpt2 = java.nio.file.Files
      .createTempDirectory("graft_mv_ck2").toString
    graft.streaming.Streaming.streamingMatviewCounts(spark, srcDir, mvDir2, ckpt2)
    feed(151 to 180)
    graft.streaming.Streaming.streamingMatviewCounts(spark, srcDir, mvDir2, ckpt2)
    val resumed = graft.sources.Matviews.read(spark, mvDir2)
      .collect().map(r => r.getString(r.fieldIndex("event_type")) ->
        (r.getLong(r.fieldIndex("n")), r.getLong(r.fieldIndex("sum_u")))).toMap
    assert(resumed == batchTruth(),
      "post-rebuild streaming must neither double-count batch 0 nor drop new data")
  }

  test("stateful mapGroupsWithState counts equal batch groupBy") {
    val stream = graft.streaming.Streaming
      .statefulUserCounts(spark, sf, "stream_state_spec")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val batch = Tables.t(spark, sf, "events")
      .groupBy("user_id").count().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(stream == batch)
  }
}
