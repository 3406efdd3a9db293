package graft.tools

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Cumulative per-statement execution statistics — the
  * pg_stat_statements role (`/root/reference/contrib/pg_stat_statements/
  * pg_stat_statements.c`: pgss_store keyed on a literal-normalized query
  * jumble, accumulating calls / total / min / max time).
  *
  * Spark-first mapping: a [[QueryExecutionListener]] fingerprints each
  * completed query by its CANONICALIZED analyzed plan with literals
  * erased — the same normalization pg_stat_statements' jumble performs,
  * so `filter(x > 5)` and `filter(x > 17)` accumulate under one
  * statement id while structurally different queries stay separate.
  * State is a bounded in-JVM map (the reference's fixed shared-memory
  * hash table); snapshots come back as a DataFrame so the stats are
  * queryable like the reference's view.
  */
object StatStatements {

  final case class Stat(queryId: String, calls: Long, totalMs: Double,
                        minMs: Double, maxMs: Double, lastOp: String)

  private val stats = new ConcurrentHashMap[String, Stat]()
  @volatile private var installed: Option[QueryExecutionListener] = None

  /** Literal-normalized fingerprint of the analyzed plan (the queryid /
    * jumble analogue). Canonicalization erases expression ids and
    * cosmetic differences; the transform erases constant VALUES. */
  def fingerprint(qe: QueryExecution): String = {
    val normalized = qe.analyzed.canonicalized.transformAllExpressions {
      case l: Literal => Literal.default(l.dataType)
    }
    f"${normalized.semanticHash()}%08x"
  }

  def install(spark: SparkSession): Unit = synchronized {
    if (installed.isEmpty) {
      val l = new QueryExecutionListener {
        override def onSuccess(funcName: String, qe: QueryExecution,
                               durationNs: Long): Unit = {
          val ms = durationNs / 1e6
          val id = try fingerprint(qe) catch { case _: Throwable => "unfingerprintable" }
          stats.merge(id, Stat(id, 1, ms, ms, ms, funcName),
            (a, b) => Stat(id, a.calls + 1, a.totalMs + ms,
              math.min(a.minMs, ms), math.max(a.maxMs, ms), funcName))
        }
        override def onFailure(funcName: String, qe: QueryExecution,
                               exception: Exception): Unit = ()
      }
      spark.listenerManager.register(l)
      installed = Some(l)
    }
  }

  def uninstall(spark: SparkSession): Unit = synchronized {
    installed.foreach(spark.listenerManager.unregister)
    installed = None
  }

  def reset(): Unit = stats.clear()

  /** The pg_stat_statements view: one row per normalized statement. */
  def snapshot(spark: SparkSession): DataFrame = {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    stats.values.asScala.toSeq.toDF()
  }

  /** Direct map access for specs (no extra query execution, which would
    * itself land in the stats). */
  def get(queryId: String): Option[Stat] = Option(stats.get(queryId))
  def all(): Seq[Stat] = {
    import scala.jdk.CollectionConverters._
    stats.values.asScala.toSeq
  }

  // ---- auto_explain ----------------------------------------------------

  final case class SlowQuery(queryId: String, ms: Double, plan: String)

  private val slowLog = new java.util.concurrent.ConcurrentLinkedQueue[SlowQuery]()
  @volatile private var autoExplain: Option[QueryExecutionListener] = None

  /** auto_explain analogue (`/root/reference/contrib/auto_explain/
    * auto_explain.c`: ExecutorEnd hook logging the plan of any statement
    * over `log_min_duration`): queries slower than `thresholdMs` get
    * their EXECUTED plan captured into a bounded in-memory log (most
    * recent `keep` entries — the reference bounds by log rotation). The
    * captured text is the physical plan actually run, AQE-final, which
    * is what a 100 TB slow-query post-mortem needs. */
  def installAutoExplain(spark: SparkSession, thresholdMs: Double,
                         keep: Int = 100): Unit = synchronized {
    if (autoExplain.isEmpty) {
      val l = new QueryExecutionListener {
        override def onSuccess(funcName: String, qe: QueryExecution,
                               durationNs: Long): Unit = {
          val ms = durationNs / 1e6
          if (ms >= thresholdMs) {
            val id = try fingerprint(qe) catch { case _: Throwable => "unfingerprintable" }
            slowLog.add(SlowQuery(id, ms,
              try qe.executedPlan.toString catch { case _: Throwable => "<unavailable>" }))
            while (slowLog.size > keep) slowLog.poll()
          }
        }
        override def onFailure(funcName: String, qe: QueryExecution,
                               exception: Exception): Unit = ()
      }
      spark.listenerManager.register(l)
      autoExplain = Some(l)
    }
  }

  def uninstallAutoExplain(spark: SparkSession): Unit = synchronized {
    autoExplain.foreach(spark.listenerManager.unregister)
    autoExplain = None
    slowLog.clear()
  }

  def slowQueries(): Seq[SlowQuery] = {
    import scala.jdk.CollectionConverters._
    slowLog.asScala.toSeq
  }
}
