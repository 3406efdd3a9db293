package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Triggers._

/** Trigger semantics pinned against commands/trigger.c behavior: WHEN
  * gating, name-order firing, suppression, the transition capture
  * matrix (INSERT → NEW only, UPDATE → both, DELETE → OLD only), firing
  * on zero-row statements, and capture-once pinning of transition
  * frames across later table rewrites. */
class TriggersSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def freshPath(): String =
    java.nio.file.Files.createTempDirectory("trgspec").toString + "/t.parquet"

  private def seed(n: Int) = {
    val sp = spark; import sp.implicits._
    (1 to n).map(i => (i.toLong, i.toLong * 10)).toDF("id", "x")
  }

  test("BEFORE ROW triggers fire in name order and WHEN gates per row") {
    val path = freshPath()
    // name order must evaluate t1 then t2: x -> (x+1)*2 — any other
    // composition gives different values
    val tab = new TriggeredTable(spark, path, beforeRow = Seq(
      BeforeRow("t2_double", Set("INSERT"),
        set = Map("x" -> (col("x") * 2))),
      BeforeRow("t1_inc", Set("INSERT"), set = Map("x" -> (col("x") + 1)),
        when = Some(col("id") % 2 === 0))))
    tab.insert(seed(4))
    val got = spark.read.parquet(path).orderBy("id")
      .select("x").collect().map(_.getLong(0)).toSeq
    // odd ids skip t1 (WHEN fails, row passes unmodified): x*2
    // even ids: (x+1)*2
    assert(got == Seq(20, 42, 60, 82), got.toString)
  }

  test("suppression drops exactly the matching rows from the statement") {
    val path = freshPath()
    var captured = -1L
    val tab = new TriggeredTable(spark, path,
      beforeRow = Seq(BeforeRow("t0", Set("INSERT"),
        suppress = Some(col("x") > 30))),
      afterStatement = Seq(AfterStatement("a0", Set("INSERT"),
        (_, _, nt) => captured = nt.get.count())))
    tab.insert(seed(5))
    assert(spark.read.parquet(path).count() == 3)
    // the NEW transition table sees the POST-suppression change set
    assert(captured == 3)
  }

  test("UPDATE captures OLD and NEW; BEFORE UPDATE rewrite lands in storage") {
    val path = freshPath()
    var oldSum = -1L; var newSum = -1L
    val tab = new TriggeredTable(spark, path,
      beforeRow = Seq(BeforeRow("b0", Set("UPDATE"),
        set = Map("x" -> (col("x") + 1000)))),
      afterStatement = Seq(AfterStatement("a0", Set("UPDATE"), (_, ot, nt) => {
        oldSum = ot.get.agg(sum("x")).collect().head.getLong(0)
        newSum = nt.get.agg(sum("x")).collect().head.getLong(0)
      })))
    tab.insert(seed(4))
    tab.update(Map("x" -> (col("x") * 10)), col("id") <= 2)
    assert(oldSum == 30)            // pre-image of rows 1,2
    assert(newSum == 100 + 200 + 2000)  // SET then BEFORE UPDATE rewrite
    val fin = spark.read.parquet(path).orderBy("id")
      .select("x").collect().map(_.getLong(0)).toSeq
    assert(fin == Seq(1100, 1200, 30, 40), fin.toString)
  }

  test("DELETE captures OLD only; zero-row statements still fire") {
    val path = freshPath()
    val fired = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)]
    val tab = new TriggeredTable(spark, path,
      afterStatement = Seq(AfterStatement("a0", Set("UPDATE", "DELETE"),
        (ev, ot, nt) => fired += ((ev,
          ot.map(_.count()).getOrElse(-1L),
          nt.map(_.count()).getOrElse(-1L))))))
    tab.insert(seed(3))
    tab.delete(col("id") === 2)
    tab.update(Map("x" -> lit(0L)), col("id") > 100)  // matches nothing
    assert(fired.toSeq == Seq(("DELETE", 1L, -1L), ("UPDATE", 0L, 0L)),
      fired.toString)
    assert(spark.read.parquet(path).count() == 2)
  }

  test("transition frames are pinned: later statements don't change them") {
    val path = freshPath()
    var firstNew: Option[org.apache.spark.sql.DataFrame] = None
    val tab = new TriggeredTable(spark, path,
      afterStatement = Seq(AfterStatement("a0", Set("INSERT"),
        (_, _, nt) => if (firstNew.isEmpty) firstNew = nt)))
    tab.insert(seed(3))
    tab.delete(col("id") <= 2)          // rewrites the table underneath
    tab.insert(seed(1))
    // capture-once (tuplestore) semantics: the statement-1 frame still
    // reads its own 3 rows, not the mutated table
    assert(firstNew.get.count() == 3)
  }
}
