package graft

import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

/** Whole-stage-codegen fallback CANARY (r16 brief #5): a lane that trips
  * janino ships silently interpreted — a 5-10x scale tax invisible to
  * every correctness gate (Spark logs the fallback at WARN and keeps the
  * results identical). This spec runs the ENTIRE `SparkEntry.queries`
  * surface with a log4j2 appender watching for Spark's
  * "Whole-stage codegen disabled for plan" fallback warning and fails if
  * any lane outside the documented whitelist drops off codegen.
  *
  * Whitelist: `q_money_ops` — its `cash_words` CASE tree trips janino by
  * construction (documented at `queries/MoneyOps.scala`; bounded to a
  * 240-row lane, adjudicated acceptable in r16). That lane doubles as
  * the PLANT: the first test proves the detector actually fires on it,
  * so a future Spark upgrade that silently fixes (or a refactor that
  * silently widens) the fallback set fails loudly here either way. */
class CodegenCanarySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  /** The documented interpreted-fallback lanes. */
  private val whitelist = Set("q_money_ops")

  /** Run `body` with a capturing appender on the log4j2 root logger;
    * returns the fallback warnings it emitted. The shared test session
    * logs at WARN, so the WholeStageCodegenExec fallback message (WARN)
    * reaches the root appenders. */
  private def captureFallbacks(body: => Unit): Seq[String] = {
    import org.apache.logging.log4j.LogManager
    import org.apache.logging.log4j.core.LoggerContext
    val msgs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val appender = new org.apache.logging.log4j.core.appender.AbstractAppender(
      "graft-codegen-canary", null, null, true,
      org.apache.logging.log4j.core.config.Property.EMPTY_ARRAY) {
      override def append(e: org.apache.logging.log4j.core.LogEvent): Unit = {
        val m = e.getMessage.getFormattedMessage
        if (m.contains("codegen disabled for plan")) msgs.add(m)
      }
    }
    appender.start()
    val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
    val root = ctx.getConfiguration.getRootLogger
    root.addAppender(appender, org.apache.logging.log4j.Level.WARN, null)
    ctx.updateLoggers()
    try body finally {
      root.removeAppender("graft-codegen-canary")
      ctx.updateLoggers()
      appender.stop()
    }
    msgs.asScala.toList
  }

  test("the detector fires on the documented janino-tripping lane") {
    val tripped = captureFallbacks {
      SparkEntry.queries("q_money_ops")(spark, sf).collect()
    }
    assert(tripped.nonEmpty,
      "q_money_ops is the documented fallback plant: if it stopped " +
        "tripping janino (e.g. a Spark upgrade), shrink the whitelist")
  }

  test("no lane outside the whitelist falls back to interpretation") {
    val offenders = scala.collection.mutable.Map[String, Int]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, q) =>
      if (!whitelist(name)) {
        val tripped = captureFallbacks {
          // collect(), not count(): count() over a global aggregate lets
          // Catalyst prune the whole subtree (the ScaleProbe lesson) and
          // the canary would watch nothing run
          q(spark, sf).collect()
        }
        if (tripped.nonEmpty) offenders(name) = tripped.size
      }
    }
    assert(offenders.isEmpty,
      s"lanes silently dropped off whole-stage codegen: $offenders — " +
        "fix the expression or document + whitelist it deliberately")
  }
}
