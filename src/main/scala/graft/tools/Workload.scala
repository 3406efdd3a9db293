package graft.tools

import java.util.concurrent.atomic.AtomicLong

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Admission-controlled workload management — the RESOURCE QUEUE /
  * resource-group role (`/root/reference/src/backend/commands/
  * resgroupcmds.c`; regress `/root/reference/src/test/regress/sql/
  * resource_queue.sql`, `resource_group.sql`; semantics per
  * `/root/reference/gpdb-doc/markdown/admin_guide/workload_mgmt.html.md`):
  * a queue admits at most ACTIVE_STATEMENTS concurrent statements
  * (rsqcountlimit), caps the summed planner cost of running statements
  * at MAX_COST (rsqcostlimit), REJECTS a single statement costlier than
  * the whole limit unless COST OVERCOMMIT lets it run when the queue is
  * otherwise idle (rsqovercommit), waves statements cheaper than
  * MIN_COST straight through (rsqignorecostlimit), derives the
  * per-statement memory quota as MEMORY_LIMIT / ACTIVE_STATEMENTS (the
  * statement_mem rule), and runs waiters strictly in arrival order.
  *
  * Spark-first mapping, by concern:
  *   - **Planner cost** comes from the engine itself:
  *     [[WorkloadManager.planCost]] reads the optimized logical plan's
  *     size statistics — the same role the reference's planner cost
  *     plays for MAX_COST admission.
  *   - **Admission/queueing** is driver-side (a statement that hasn't
  *     been admitted must not launch jobs, so this cannot live in
  *     executors): a per-queue monitor with arrival-ordered tickets.
  *     Head-of-line blocking is deliberate — the reference runs each
  *     queue's statements in submission order.
  *   - **PRIORITY** maps to Spark fair-scheduler pools: while a
  *     statement runs, `spark.scheduler.pool` is set to the queue's
  *     pool so every job it launches lands there, and
  *     [[WorkloadManager.allocationFileXml]] emits the FAIR allocation
  *     file (weights mirror the reference's priority weights) that a
  *     cluster deployment points `spark.scheduler.allocation.file` at.
  *   - **MEMORY_LIMIT** surfaces as the `graft.statement.mem.mb` local
  *     property — the statement_mem value sized exactly as the
  *     reference sizes it; operators and sinks read it as their budget
  *     hint (the spill discipline SpillPressureSpec locks in is what
  *     makes living inside the budget safe).
  *   - **Status** ([[WorkloadManager.status]]) is the
  *     gp_toolkit.gp_resqueue_status analogue: per-queue limits,
  *     current holders/cost, waiter count, as a queryable DataFrame.
  */
final case class ResourceQueue(
    name: String,
    /** ACTIVE THRESHOLD / ACTIVE_STATEMENTS (rsqcountlimit); -1 = none */
    activeStatements: Int = -1,
    /** COST THRESHOLD / MAX_COST (rsqcostlimit); -1 = none */
    maxCost: Double = -1,
    /** COST OVERCOMMIT (rsqovercommit): a statement whose lone cost
      * exceeds maxCost runs when the queue is idle instead of erroring */
    costOvercommit: Boolean = false,
    /** MIN_COST / IGNORE THRESHOLD (rsqignorecostlimit): statements
      * cheaper than this bypass admission entirely; -1 = none */
    minCost: Double = -1,
    /** MIN | LOW | MEDIUM | HIGH | MAX — the CPU-share knob */
    priority: String = "MEDIUM",
    /** MEMORY_LIMIT in MB; -1 = none */
    memoryLimitMb: Long = -1) {
  require(activeStatements == -1 || activeStatements > 0,
    "ACTIVE THRESHOLD must be positive")   // resource_queue.sql negative cases
  require(maxCost == -1 || maxCost > 0, "COST THRESHOLD must be positive")
  require(WorkloadManager.PriorityWeights.contains(priority.toUpperCase),
    s"unknown priority '$priority'")       // WITH(PRIORITY=funky) negative case

  def poolName: String = s"graft_$name"
  def poolWeight: Int = WorkloadManager.PriorityWeights(priority.toUpperCase)

  /** statement_mem rule: MEMORY_LIMIT / ACTIVE_STATEMENTS. */
  def statementMemMb: Long =
    if (memoryLimitMb < 0) -1
    else if (activeStatements > 0) memoryLimitMb / activeStatements
    else memoryLimitMb
}

object WorkloadManager {
  /** The reference's priority->CPU-weight table (gp_resqueue_priority). */
  val PriorityWeights: Map[String, Int] = Map(
    "MIN" -> 100, "LOW" -> 200, "MEDIUM" -> 500, "HIGH" -> 1000,
    "MAX" -> 1500)

  val StatementMemProp = "graft.statement.mem.mb"
  val SchedulerPoolProp = "spark.scheduler.pool"
}

final class WorkloadManager {
  import WorkloadManager._

  private final class QState(@volatile var q: ResourceQueue) {
    var holders = 0
    var costInUse = 0.0
    var bypassed = 0L                      // cumulative MIN_COST waves
    val waiting = mutable.ArrayBuffer.empty[Long]
  }

  private val queues = new java.util.concurrent.ConcurrentHashMap[String, QState]()
  private val tickets = new AtomicLong(0L)

  def createQueue(q: ResourceQueue): Unit =
    if (queues.putIfAbsent(q.name, new QState(q)) != null)
      throw new IllegalStateException(s"resource queue ${q.name} already exists")

  /** ALTER: replaces the attributes and wakes waiters so a raised
    * threshold admits them immediately. */
  def alterQueue(q: ResourceQueue): Unit = {
    val st = stateOf(q.name)
    st.synchronized { st.q = q; st.notifyAll() }
  }

  /** DROP errors while statements hold or wait on the queue (the
    * reference refuses to drop a queue with roles/activity on it). */
  def dropQueue(name: String): Unit = {
    val st = stateOf(name)
    st.synchronized {
      if (st.holders > 0 || st.waiting.nonEmpty)
        throw new IllegalStateException(
          s"resource queue $name is busy (${st.holders} active, " +
            s"${st.waiting.size} waiting)")
      queues.remove(name)
    }
  }

  private def stateOf(name: String): QState = {
    val st = queues.get(name)
    if (st == null)
      throw new NoSuchElementException(s"resource queue $name does not exist")
    st
  }

  /** The planner-cost analogue for MAX_COST admission: the optimized
    * logical plan's estimated output bytes, in MB. CBO statistics
    * (ANALYZE / parquet footers) feed this exactly as table stats feed
    * the reference's cost model. */
  def planCost(df: DataFrame): Double =
    df.queryExecution.optimizedPlan.stats.sizeInBytes.toDouble / 1e6

  /** Run `body` as one statement of `queueName` with explicit cost:
    * blocks in arrival order until admitted, tags every job the body
    * launches with the queue's scheduler pool and statement_mem, and
    * releases on the way out. */
  def run[T](spark: SparkSession, queueName: String, cost: Double)
            (body: => T): T = {
    val st = stateOf(queueName)
    val bypass = st.synchronized {
      val b = st.q.minCost >= 0 && cost < st.q.minCost
      if (b) st.bypassed += 1
      b
    }
    if (!bypass) admit(st, cost)
    val sc = spark.sparkContext
    val prevPool = sc.getLocalProperty(SchedulerPoolProp)
    val prevMem = sc.getLocalProperty(StatementMemProp)
    sc.setLocalProperty(SchedulerPoolProp, st.q.poolName)
    val mem = st.q.statementMemMb
    if (mem >= 0) sc.setLocalProperty(StatementMemProp, mem.toString)
    try body
    finally {
      sc.setLocalProperty(SchedulerPoolProp, prevPool)
      sc.setLocalProperty(StatementMemProp, prevMem)
      if (!bypass) st.synchronized {
        st.holders -= 1
        st.costInUse -= cost
        st.notifyAll()
      }
    }
  }

  /** Run a DataFrame action as a statement whose cost the engine
    * estimates ([[planCost]]). */
  def runStatement[T](spark: SparkSession, queueName: String,
                      df: DataFrame)(action: DataFrame => T): T =
    run(spark, queueName, planCost(df))(action(df))

  private def admit(st: QState, cost: Double): Unit = st.synchronized {
    // immediate rejection, before queueing: a statement alone over the
    // cost limit can never run (unless overcommit defers it to idle)
    val q0 = st.q
    if (q0.maxCost >= 0 && cost > q0.maxCost && !q0.costOvercommit)
      throw new IllegalStateException(
        s"statement cost $cost exceeds resource queue ${q0.name} " +
          s"COST THRESHOLD ${q0.maxCost} (no overcommit)")
    val ticket = tickets.incrementAndGet()
    st.waiting += ticket
    def canEnter: Boolean = {
      val q = st.q
      st.waiting.head == ticket &&
        (q.activeStatements < 0 || st.holders < q.activeStatements) &&
        (q.maxCost < 0 ||
          (if (cost > q.maxCost) st.holders == 0    // overcommit: idle only
           else st.costInUse + cost <= q.maxCost))
    }
    try while (!canEnter) st.wait()
    catch {
      case t: Throwable =>
        // a cancelled statement must not leave its ticket at the head of
        // the FIFO: later waiters would block behind it forever and
        // dropQueue would refuse (waiters nonzero)
        st.waiting -= ticket
        st.notifyAll()
        throw t
    }
    st.waiting -= ticket
    st.holders += 1
    st.costInUse += cost
    st.notifyAll()    // a raised-threshold alter may admit the next too
  }

  /** gp_toolkit.gp_resqueue_status analogue. */
  def status(spark: SparkSession): DataFrame = {
    import scala.jdk.CollectionConverters._
    val rows = queues.values().asScala.toSeq.map { st =>
      st.synchronized {
        (st.q.name, st.q.activeStatements, st.holders, st.q.maxCost,
          st.costInUse, st.q.minCost, st.q.costOvercommit,
          st.q.memoryLimitMb, st.q.statementMemMb, st.q.priority,
          st.waiting.size, st.bypassed)
      }
    }.sortBy(_._1)
    spark.createDataFrame(rows).toDF("rsqname", "rsqcountlimit",
      "rsqcountvalue", "rsqcostlimit", "rsqcostvalue", "rsqignorecostlimit",
      "rsqovercommit", "rsqmemorylimit_mb", "statement_mem_mb", "priority",
      "rsqwaiters", "rsqholders_bypassed")
  }

  /** FAIR-scheduler allocation XML for every queue — what a cluster
    * deployment writes to disk and points
    * `spark.scheduler.allocation.file` at so queue priority becomes
    * actual CPU share across concurrently-running statements. */
  def allocationFileXml: String = {
    import scala.jdk.CollectionConverters._
    val pools = queues.values().asScala.toSeq.map(_.q).sortBy(_.name).map { q =>
      s"""  <pool name="${q.poolName}">
         |    <schedulingMode>FAIR</schedulingMode>
         |    <weight>${q.poolWeight}</weight>
         |    <minShare>0</minShare>
         |  </pool>""".stripMargin
    }
    s"<?xml version=\"1.0\"?>\n<allocations>\n${pools.mkString("\n")}\n</allocations>\n"
  }
}
