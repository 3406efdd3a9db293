package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Cdc

/** Change-data-capture laws (contrib/test_decoding analogue): the diff
  * stream must replay the old snapshot into the new one exactly, emit
  * only changed tuples, and be partitioning-invariant. */
class CdcSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  private def snap(lo: String, hi: String): DataFrame =
    Tables.t(spark, sf, "orders")
      .filter(col("o_orderdate") >= lit(lo).cast("timestamp") &&
              col("o_orderdate") < lit(hi).cast("timestamp"))
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
           Tables.dsum(col("o_totalprice")).as("total"))

  private def rowSet(df: DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("replay(old, diff(old, new)) reproduces new exactly") {
    val (v1, v2) = (snap("1995-01-01", "1998-01-01"),
                    snap("1996-01-01", "1999-01-01"))
    val changes = Cdc.diff(v1, v2, Seq("o_custkey"))
    val replayed = Cdc.replay(v1, changes, Seq("o_custkey"))
    assert(rowSet(replayed) == rowSet(v2))
    assert(replayed.count() == v2.count(), "replay must not duplicate keys")
  }

  test("diff emits only changes, with all three ops present") {
    val changes = Cdc.diff(snap("1995-01-01", "1998-01-01"),
                           snap("1996-01-01", "1999-01-01"),
                           Seq("o_custkey")).cache()
    val ops = changes.groupBy(col("op")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(Set("I", "U", "D").subsetOf(ops.keySet), s"ops seen: $ops")
    // change-only: strictly fewer rows than the union of key spaces
    val keys = snap("1995-01-01", "1998-01-01").select("o_custkey")
      .union(snap("1996-01-01", "1999-01-01").select("o_custkey"))
      .distinct().count()
    assert(changes.count() < keys, "unchanged keys must be omitted")
    changes.unpersist()
  }

  test("diff of identical snapshots is empty") {
    val v = snap("1996-01-01", "1998-01-01")
    assert(Cdc.diff(v, v, Seq("o_custkey")).isEmpty)
  }

  test("snapshots with columns in the reserved CDC namespace are rejected") {
    val v = snap("1996-01-01", "1998-01-01")
    for (bad <- Seq("op", "old_total", "new_total", "_old_present")) {
      val renamed = v.withColumnRenamed("total", bad)
      val e = intercept[IllegalArgumentException] {
        Cdc.diff(renamed, renamed, Seq("o_custkey"))
      }
      assert(e.getMessage.contains(bad))
      intercept[IllegalArgumentException] {
        Cdc.replay(renamed, v, Seq("o_custkey"))
      }
    }
  }

  test("streaming CDC apply converges each batch to its source snapshot") {
    import java.nio.file.Files
    val src = Files.createTempDirectory("cdc_src").toString
    val tbl = Files.createTempDirectory("cdc_tbl").toString + "/t"
    val ckp = Files.createTempDirectory("cdc_ckp").toString
    val ddl = "o_custkey BIGINT, op STRING, old_n_orders BIGINT, " +
      "new_n_orders BIGINT, old_total DOUBLE, new_total DOUBLE"
    val v0 = snap("1995-01-01", "1997-01-01")
    val v1 = snap("1996-01-01", "1998-01-01")
    val v2 = snap("1997-01-01", "1999-01-01")
    def applyAll(): Unit =
      graft.streaming.Streaming.streamingCdcApply(
        spark, src, ddl, Seq("o_custkey"), tbl, ckp)
    def table(): DataFrame =
      graft.sources.Matviews.read(spark, tbl).drop("_applied_batch")
    // batch 0 bootstraps from the empty relation (v0 arrives as inserts)
    Cdc.diff(v0.filter(lit(false)), v0, Seq("o_custkey"))
      .write.mode("append").parquet(src)
    applyAll()
    assert(rowSet(table()) == rowSet(v0))
    // each subsequent change set lands as its own batch on a RESTARTED
    // query over the same checkpoint (the apply-worker restart path)
    Cdc.diff(v0, v1, Seq("o_custkey")).write.mode("append").parquet(src)
    applyAll()
    assert(rowSet(table()) == rowSet(v1))
    Cdc.diff(v1, v2, Seq("o_custkey")).write.mode("append").parquet(src)
    applyAll()
    assert(rowSet(table()) == rowSet(v2))
    // idle restart: nothing redelivered, nothing re-applied
    applyAll()
    assert(rowSet(table()) == rowSet(v2))
    assert(table().count() == v2.count(), "apply must not duplicate keys")
  }

  test("round-trip law holds under re-partitioning") {
    val (v1, v2) = (snap("1995-01-01", "1998-01-01"),
                    snap("1996-01-01", "1999-01-01"))
    val changes = Cdc.diff(v1.repartition(7), v2.repartition(3),
                           Seq("o_custkey"))
    val replayed = Cdc.replay(v1.repartition(5), changes.repartition(2),
                              Seq("o_custkey"))
    assert(rowSet(replayed) == rowSet(v2))
  }
}
