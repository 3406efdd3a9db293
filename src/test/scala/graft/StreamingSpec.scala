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
