package graft

import java.util.concurrent.{CountDownLatch, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import scala.collection.mutable

import org.scalatest.funsuite.AnyFunSuite

import graft.tools.{ResourceQueue, WorkloadManager}

/** Resource-queue admission semantics (the reference's
  * resource_queue.sql / resource_group.sql regress + the isolation
  * suite's concurrent-session checks): concurrency threshold, cost
  * threshold with overcommit and min-cost waves, FIFO wake order,
  * queue isolation, alter-wakes-waiters, the statement_mem rule, the
  * scheduler-pool tagging, and the status view. */
class WorkloadSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  private def await(l: CountDownLatch): Unit =
    assert(l.await(30, TimeUnit.SECONDS), "latch timed out")

  private def inThread(body: => Unit): Thread = {
    val t = new Thread(() => body)
    t.setDaemon(true)
    t.start()
    t
  }

  test("ACTIVE THRESHOLD caps concurrency at exactly the limit") {
    val wm = new WorkloadManager
    wm.createQueue(ResourceQueue("etl", activeStatements = 2))
    val running = new AtomicInteger(0)
    val maxSeen = new AtomicInteger(0)
    val done = new CountDownLatch(8)
    (1 to 8).foreach { _ =>
      inThread {
        wm.run(spark, "etl", cost = 1.0) {
          val n = running.incrementAndGet()
          maxSeen.getAndUpdate(m => math.max(m, n))
          Thread.sleep(50)
          running.decrementAndGet()
        }
        done.countDown()
      }
    }
    await(done)
    assert(maxSeen.get() == 2,
      s"expected the 2-slot queue to reach and never exceed 2 concurrent, saw ${maxSeen.get}")
  }

  test("waiters are admitted in arrival order (FIFO, head-of-line)") {
    val wm = new WorkloadManager
    wm.createQueue(ResourceQueue("serial", activeStatements = 1))
    val order = mutable.ArrayBuffer.empty[Int]
    val blockFirst = new CountDownLatch(1)
    val firstIn = new CountDownLatch(1)
    val done = new CountDownLatch(6)
    inThread {
      wm.run(spark, "serial", 1.0) { firstIn.countDown(); await(blockFirst) }
      done.countDown()
    }
    await(firstIn)
    // enqueue 2..6 one at a time, confirming each is REGISTERED as a
    // waiter before the next arrives — that pins the arrival order
    (2 to 6).foreach { i =>
      val waitersBefore = waiterCount(wm)
      inThread {
        wm.run(spark, "serial", 1.0) { order.synchronized { order += i } }
        done.countDown()
      }
      eventually(waiterCount(wm) == waitersBefore + 1)
    }
    blockFirst.countDown()
    await(done)
    assert(order.toSeq == Seq(2, 3, 4, 5, 6))
  }

  private def waiterCount(wm: WorkloadManager): Int =
    wm.status(spark).selectExpr("sum(rsqwaiters)").collect()(0).getLong(0).toInt

  private def eventually(cond: => Boolean): Unit = {
    val deadline = System.nanoTime() + 10e9.toLong
    while (!cond) {
      assert(System.nanoTime() < deadline, "condition never became true")
      Thread.sleep(5)
    }
  }

  test("a cancelled waiter releases its ticket — later waiters still advance") {
    val wm = new WorkloadManager
    wm.createQueue(ResourceQueue("cancelq", activeStatements = 1))
    val blockFirst = new CountDownLatch(1)
    val firstIn = new CountDownLatch(1)
    val interrupted = new CountDownLatch(1)
    val thirdRan = new CountDownLatch(1)
    val first = inThread {
      wm.run(spark, "cancelq", 1.0) { firstIn.countDown(); await(blockFirst) }
    }
    await(firstIn)
    // the statement to cancel: head of the waiting FIFO
    val victim = inThread {
      try wm.run(spark, "cancelq", 1.0) { fail("victim must not run") }
      catch { case _: InterruptedException => interrupted.countDown() }
    }
    eventually(waiterCount(wm) == 1)
    // a later statement queued BEHIND the victim
    inThread {
      wm.run(spark, "cancelq", 1.0) { thirdRan.countDown() }
    }
    eventually(waiterCount(wm) == 2)
    victim.interrupt()
    await(interrupted)
    // the cancelled head must not wedge the queue: its ticket is gone
    eventually(waiterCount(wm) == 1)
    blockFirst.countDown()
    await(thirdRan)
    first.join(30000)
    // and with no phantom waiters, DROP RESOURCE QUEUE succeeds
    eventually(waiterCount(wm) == 0)
    wm.dropQueue("cancelq")
  }

  test("COST THRESHOLD admits by summed cost and frees on release") {
    val wm = new WorkloadManager
    wm.createQueue(ResourceQueue("costq", maxCost = 100))
    val firstIn = new CountDownLatch(1)
    val release = new CountDownLatch(1)
    val secondRan = new CountDownLatch(1)
    val overlapped = new AtomicInteger(0)
    inThread {
      wm.run(spark, "costq", 60) { firstIn.countDown(); await(release) }
    }
    await(firstIn)
    inThread {
      wm.run(spark, "costq", 60) {   // 60+60 > 100: must wait
        overlapped.set(
          wm.status(spark).filter("rsqname = 'costq'")
            .selectExpr("rsqcountvalue").collect()(0).getInt(0))
        secondRan.countDown()
      }
    }
    // the waiting 60 must not run while the first holds 60 of the 100
    Thread.sleep(100)
    assert(secondRan.getCount == 1, "second 60-cost statement jumped the cost limit")
    // and a later statement queues BEHIND it (head-of-line order, as
    // the reference runs each queue's statements in arrival order)
    val fit = new CountDownLatch(1)
    inThread { wm.run(spark, "costq", 50) { fit.countDown() } }
    Thread.sleep(100)
    assert(fit.getCount == 1, "50-cost statement overtook the queue head")
    release.countDown()
    await(secondRan)
    assert(overlapped.get() == 1, "waiter should have run alone after release")
  }

  test("a statement alone over MAX_COST is rejected without overcommit") {
    val wm = new WorkloadManager
    wm.createQueue(ResourceQueue("strict", maxCost = 100))
    val e = intercept[IllegalStateException] {
      wm.run(spark, "strict", 150) { fail("must not run") }
    }
    assert(e.getMessage.contains("COST THRESHOLD"))
  }

  test("COST OVERCOMMIT defers an over-limit statement to an idle queue") {
    val wm = new WorkloadManager
    wm.createQueue(ResourceQueue("oc", maxCost = 100, costOvercommit = true))
    val firstIn = new CountDownLatch(1)
    val release = new CountDownLatch(1)
    val bigRan = new CountDownLatch(1)
    inThread { wm.run(spark, "oc", 60) { firstIn.countDown(); await(release) } }
    await(firstIn)
    inThread {
      wm.run(spark, "oc", 150) {   // over the whole limit: waits for idle
        bigRan.countDown()
      }
    }
    Thread.sleep(100)
    assert(bigRan.getCount == 1, "overcommitted statement ran while queue busy")
    release.countDown()
    await(bigRan)
  }

  test("statements under MIN_COST bypass a saturated queue") {
    val wm = new WorkloadManager
    wm.createQueue(ResourceQueue("waved", activeStatements = 1, minCost = 10))
    val holderIn = new CountDownLatch(1)
    val release = new CountDownLatch(1)
    inThread { wm.run(spark, "waved", 50) { holderIn.countDown(); await(release) } }
    await(holderIn)
    val cheap = new CountDownLatch(1)
    inThread { wm.run(spark, "waved", 5) { cheap.countDown() } }
    await(cheap)   // ran concurrently despite the 1-slot queue being held
    val bypassed = wm.status(spark).filter("rsqname = 'waved'")
      .selectExpr("rsqholders_bypassed").collect()(0).getLong(0)
    assert(bypassed == 1)
    release.countDown()
  }

  test("ALTER raising the threshold wakes waiters") {
    val wm = new WorkloadManager
    wm.createQueue(ResourceQueue("grow", activeStatements = 1))
    val holderIn = new CountDownLatch(1)
    val release = new CountDownLatch(1)
    val waiterRan = new CountDownLatch(1)
    inThread { wm.run(spark, "grow", 1.0) { holderIn.countDown(); await(release) } }
    await(holderIn)
    inThread { wm.run(spark, "grow", 1.0) { waiterRan.countDown() } }
    eventually(waiterCount(wm) == 1)
    wm.alterQueue(ResourceQueue("grow", activeStatements = 2))
    await(waiterRan)   // admitted while the first holder still runs
    release.countDown()
  }

  test("queues are isolated: saturating one never delays another") {
    val wm = new WorkloadManager
    wm.createQueue(ResourceQueue("busy", activeStatements = 1))
    wm.createQueue(ResourceQueue("idle", activeStatements = 1))
    val holderIn = new CountDownLatch(1)
    val release = new CountDownLatch(1)
    inThread { wm.run(spark, "busy", 1.0) { holderIn.countDown(); await(release) } }
    await(holderIn)
    val other = new CountDownLatch(1)
    inThread { wm.run(spark, "idle", 1.0) { other.countDown() } }
    await(other)
    release.countDown()
  }

  test("statement_mem = MEMORY_LIMIT / ACTIVE_STATEMENTS, set as a local property") {
    val wm = new WorkloadManager
    wm.createQueue(ResourceQueue("mem", activeStatements = 4,
      memoryLimitMb = 2000))
    var seenMem: String = null
    var seenPool: String = null
    wm.run(spark, "mem", 1.0) {
      seenMem = spark.sparkContext.getLocalProperty(
        WorkloadManager.StatementMemProp)
      seenPool = spark.sparkContext.getLocalProperty(
        WorkloadManager.SchedulerPoolProp)
    }
    assert(seenMem == "500")
    assert(seenPool == "graft_mem")
    assert(spark.sparkContext.getLocalProperty(
      WorkloadManager.SchedulerPoolProp) == null,
      "pool property must be restored after the statement")
  }

  test("planCost derives from the optimizer's size statistics") {
    val wm = new WorkloadManager
    val small = Tables.t(spark, sf, "nation")
    val large = Tables.t(spark, sf, "lineitem")
    assert(wm.planCost(small) > 0)
    assert(wm.planCost(large) > wm.planCost(small))
    // pruning is visible to admission: fewer columns -> cheaper statement
    assert(wm.planCost(large.select("l_orderkey")) < wm.planCost(large))
  }

  test("status view exposes limits, holders, waiters, and DDL guards fire") {
    val wm = new WorkloadManager
    wm.createQueue(ResourceQueue("view", activeStatements = 3, maxCost = 50,
      priority = "HIGH", memoryLimitMb = 900))
    val in = new CountDownLatch(1)
    val release = new CountDownLatch(1)
    inThread { wm.run(spark, "view", 20) { in.countDown(); await(release) } }
    await(in)
    val r = wm.status(spark).filter("rsqname = 'view'").collect()(0)
    assert(r.getAs[Int]("rsqcountlimit") == 3)
    assert(r.getAs[Int]("rsqcountvalue") == 1)
    assert(r.getAs[Double]("rsqcostvalue") == 20.0)
    assert(r.getAs[Long]("statement_mem_mb") == 300)
    assert(r.getAs[String]("priority") == "HIGH")
    intercept[IllegalStateException] { wm.dropQueue("view") }   // busy
    release.countDown()
    eventually(wm.status(spark).filter("rsqname = 'view'")
      .selectExpr("rsqcountvalue").collect()(0).getInt(0) == 0)
    wm.dropQueue("view")
    intercept[NoSuchElementException] { wm.run(spark, "view", 1.0) {} }
    intercept[IllegalStateException] {
      wm.createQueue(ResourceQueue("dup")); wm.createQueue(ResourceQueue("dup"))
    }
    intercept[IllegalArgumentException] {
      ResourceQueue("bad", priority = "funky")   // WITH(PRIORITY=funky)
    }
    intercept[IllegalArgumentException] {
      ResourceQueue("bad", activeStatements = -10)   // negative regress case
    }
  }

  test("FAIR pool confinement: a MIN-priority hog cannot starve a MAX-priority statement") {
    // Enforcement beyond admission (resgroup's cgroup CPU shares,
    // /root/reference/src/backend/utils/resgroup/): once admitted, a
    // runaway statement is confined to its pool's CPU share. Spark's
    // mechanism is the FAIR scheduler + the allocation file
    // WorkloadManager emits (weights = the reference's priority
    // weights): no preemption — exactly cgroup cpu.shares semantics —
    // but every slot that frees is handed out by weighted fair share,
    // so a waiting high-priority statement drains at its weight instead
    // of queueing behind the whole hog (FIFO's behavior). The test
    // session runs under spark.scheduler.mode=FAIR with pools
    // graft_batch (MIN=100) / graft_rt (MAX=1500) from allocationFileXml.
    val sc = spark.sparkContext
    assert(sc.getSchedulingMode.toString == "FAIR",
      "battery must run under the FAIR scheduler for enforcement")
    assert(sc.getPoolForName("graft_rt").exists(_.weight == 1500) &&
           sc.getPoolForName("graft_batch").exists(_.weight == 100),
      "allocation file pools must carry the reference's priority weights")
    val wm = new WorkloadManager
    wm.createQueue(ResourceQueue("batch", priority = "MIN"))
    wm.createQueue(ResourceQueue("rt", priority = "MAX"))
    val hogStarted = new CountDownLatch(1)
    var hogSec = 0.0
    val hogT = inThread {
      val t0 = System.nanoTime()
      wm.run(spark, "batch", 1.0) {
        // 240 x 100 ms tasks over 8 slots: ~3 s of full saturation.
        // The latch fires on the DRIVER thread (a latch inside the task
        // closure is not serializable), so the sleep below covers job
        // launch + slot occupation.
        hogStarted.countDown()
        spark.sparkContext.parallelize(1 to 240, 240)
          .map { i => Thread.sleep(100); i }.count()
      }
      hogSec = (System.nanoTime() - t0) / 1e9
    }
    await(hogStarted)
    Thread.sleep(500) // let the hog's tasks occupy every slot
    val t0 = System.nanoTime()
    wm.run(spark, "rt", 1.0) {
      spark.sparkContext.parallelize(1 to 8, 8)
        .map { i => Thread.sleep(50); i }.count()
    }
    val rtSec = (System.nanoTime() - t0) / 1e9
    hogT.join(60000)
    // FIFO would queue the rt statement behind the hog's remaining ~2.8 s
    // of tasks; FAIR hands it freed slots at 15x the hog's weight
    assert(rtSec < hogSec / 2,
      s"rt statement ($rtSec s) must not drain behind the hog ($hogSec s)")
    assert(rtSec < 1.5, s"rt statement took $rtSec s under a saturating hog")
    assert(hogSec < 30, "and the hog itself must still complete")
  }

  test("allocation XML carries the reference's priority weights") {
    val wm = new WorkloadManager
    wm.createQueue(ResourceQueue("fast", priority = "MAX"))
    wm.createQueue(ResourceQueue("slow", priority = "MIN"))
    val xml = wm.allocationFileXml
    assert(xml.contains("<pool name=\"graft_fast\">"))
    assert(xml.contains("<weight>1500</weight>"))
    assert(xml.contains("<weight>100</weight>"))
    assert(xml.contains("<schedulingMode>FAIR</schedulingMode>"))
  }
}
