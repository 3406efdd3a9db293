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
