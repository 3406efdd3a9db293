package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Notify._

/** LISTEN/NOTIFY semantics pinned against commands/async.c: transactional
  * visibility, within-tx exact-duplicate skip, commit ordering under
  * contention, listener cursor scoping, payload cap, truncation. */
class NotifySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def freshQueue() = new NotifyQueue(spark,
    java.nio.file.Files.createTempDirectory("notify").toString + "/q")

  test("commit publishes in order; abort publishes nothing") {
    val q = freshQueue()
    val l = q.listen(Set("jobs"))
    val t1 = q.begin(); t1.notify("jobs", "a"); t1.notify("jobs", "b")
    val tAbort = q.begin(); tAbort.notify("jobs", "ghost"); tAbort.abort()
    val t2 = q.begin(); t2.notify("jobs", "c")
    t1.commit(); t2.commit()
    assert(l.poll().map(_.payload) == Seq("a", "b", "c"))
    assert(l.poll().isEmpty) // drained; cursor advanced
  }

  test("exact duplicates within one transaction are skipped, order kept") {
    val q = freshQueue()
    val l = q.listen(Set("ch"))
    val t = q.begin()
    t.notify("ch", "x"); t.notify("ch", "y"); t.notify("ch", "x")
    t.notify("ch2", "x") // different channel: NOT a duplicate
    t.commit()
    assert(l.poll().map(n => (n.channel, n.payload)) ==
      Seq(("ch", "x"), ("ch", "y")))
  }

  test("listeners see only their channels and only post-LISTEN commits") {
    val q = freshQueue()
    val t0 = q.begin(); t0.notify("early", "before-listen"); t0.commit()
    val l = q.listen(Set("early", "other"))
    val t1 = q.begin(); t1.notify("early", "after"); t1.notify("skip", "no")
    t1.commit()
    assert(l.poll().map(_.payload) == Seq("after"))
  }

  test("concurrent commits all land with distinct total-ordered seqs") {
    val q = freshQueue()
    val l = q.listen(Set("race"))
    import scala.concurrent._
    import scala.concurrent.duration._
    import ExecutionContext.Implicits.global
    val seqs = Await.result(Future.sequence((1 to 6).map { i =>
      Future { val t = q.begin(); t.notify("race", s"p$i"); t.commit() }
    }), 120.seconds)
    assert(seqs.toSet.size == 6, s"collided seqs: $seqs")
    val got = l.poll()
    assert(got.size == 6)
    // delivery follows commit order, whatever order the race produced
    assert(got.map(_.seq) == got.map(_.seq).sorted)
  }

  test("a claimed-but-uncommitted slot holds the delivery horizon") {
    val root = java.nio.file.Files.createTempDirectory("notify").toString + "/q"
    val q = new NotifyQueue(spark, root)
    val l = q.listen(Set("ch"))
    val t0 = q.begin(); t0.notify("ch", "first"); t0.commit() // seq 1
    // a committer stalled between claim and publish at seq 2
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(root))
    val claim = new java.io.File(root, "tx_000000000002.claim")
    assert(claim.createNewFile())
    val t1 = q.begin(); t1.notify("ch", "third"); t1.commit() // gets seq 3
    // seq 3 is committed but seq 2 is in flight: deliver only up to 1
    assert(l.poll().map(_.payload) == Seq("first"))
    assert(l.poll().isEmpty)
    assert(claim.delete()) // the in-flight committer died; operator reaps
    assert(l.poll().map(_.payload) == Seq("third")) // horizon recovers
  }

  test("payload cap and truncation") {
    val q = freshQueue()
    val t = q.begin()
    intercept[IllegalArgumentException](t.notify("ch", "x" * 8001))
    t.notify("ch", "ok"); t.commit()
    val l = q.listen(Set("ch"))
    val t2 = q.begin(); t2.notify("ch", "second"); t2.commit()
    assert(l.poll().map(_.payload) == Seq("second"))
    assert(q.truncate(l.position) == 2) // both segments passed
    assert(q.asDataFrame().count() == 0)
  }
}
