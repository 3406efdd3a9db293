package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Fixture-drift canary: the driver regenerates /root/testdata between
  * rounds and has already flipped `events.ts` between TIMESTAMP(NANOS) and
  * TIMESTAMP(MICROS) parquet. A mis-detected unit divides every timestamp
  * by 1000 and collapses the corpus into ~1970, which then fails 17
  * correctness rows with opaque hash mismatches. This spec fails FIRST,
  * with a readable message naming the file and the read path taken, so a
  * silent fixture change reports itself.
  */
class FixtureCanarySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("events.ts lands in a plausible year range on every SF") {
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      if (new java.io.File(s"$dir/events.parquet").exists) {
        val path = s"$dir/events.parquet"
        val lane =
          if (Tables.eventsNeedsNanosFallback(spark, path)) "raw-int64-nanos/div-1000"
          else "native-micros"
        val r = Tables.t(spark, dir, "events")
          .agg(year(min(col("ts"))).as("lo"), year(max(col("ts"))).as("hi"))
          .head()
        val (lo, hi) = (r.getInt(0), r.getInt(1))
        assert(lo > 1990 && hi < 2100,
          s"$path read via lane '$lane' yields year range [$lo, $hi] — " +
            "the fixture's timestamp unit changed and the reader detected it wrong")
      }
    }
  }

  test("batch and streaming readers agree on the events timestamp axis") {
    val dir = SparkTestSession.sf
    val batchMin = Tables.t(spark, dir, "events").agg(min(col("ts"))).head().getTimestamp(0)
    val streamed = graft.streaming.Streaming.tumblingAgg(spark, dir, "canary_tumbling")
    val streamMin = streamed.agg(min(col("hour_start"))).head().getTimestamp(0)
    // tumbling window start truncates to the hour; same axis within 1h
    assert(math.abs(streamMin.getTime - batchMin.getTime) <= 3600L * 1000,
      s"batch min ts $batchMin vs streaming min window $streamMin — readers disagree on unit")
  }
}
