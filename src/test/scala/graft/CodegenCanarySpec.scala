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

  // ---- expression-level blind spot (r17 "What's missing #1") ----------
  // The appender above watches Spark's WHOLE-STAGE fallback warning, but
  // an expression mixing in CodegenFallback runs interpreted per row
  // INSIDE a codegen'd stage with no warning at all (its doGenCode emits
  // a call back into eval()). A graft kernel added without doGenCode
  // would ship the same 5-10x scale tax the stage canary was built to
  // catch — invisibly. The walk below visits every executed plan of the
  // battery (through AQE nodes, query stages, and subquery plans) and
  // fails on any CodegenFallback expression class outside the pinned
  // whitelist. AggregateFunction nodes are exempt as a family:
  // TypedImperativeAggregate mixes in CodegenFallback as a marker, but
  // its per-row path is the aggregation operator's update loop, not
  // interpreted expression-tree eval.
  //
  // Whitelisted expression classes — EXACT names, each a deliberate
  // adjudicated cost. Class-level pinning is the chosen granularity: a
  // new fallback CLASS (a graft kernel missing doGenCode, a new Spark
  // builtin, a new HOF type) fails loudly; a new USE of an adjudicated
  // class does not — that residual is covered by the bench/paired-A/B
  // loop, the same division of labor as the lane-level stage canary.
  private val exprWhitelist: Set[String] = Set(
    // graft PGP public-key family (PgpFns.scala:1014): deliberate — the
    // per-row work is one RSA/ElGamal modPow, milliseconds that dwarf
    // interpreted dispatch; bounded lanes
    "graft.functions.PgpPubEncrypt",
    "graft.functions.PgpPubDecrypt",
    // Spark higher-order functions: CodegenFallback by upstream design
    // (no codegen path exists). Every HOT-path HOF here was replaced by
    // a codegen'd kernel (rolling_fp, SignSig, vec_dot — SCALING.md r4/
    // r16 notes); the residue runs on grouped/bounded rows where the
    // boxing cost is adjudicated acceptable. Curated from the full
    // battery walk (r18): these 8 HOFs + their lambda plumbing.
    "org.apache.spark.sql.catalyst.expressions.ArrayTransform",
    "org.apache.spark.sql.catalyst.expressions.ArrayFilter",
    "org.apache.spark.sql.catalyst.expressions.ArrayExists",
    "org.apache.spark.sql.catalyst.expressions.ArrayForAll",
    "org.apache.spark.sql.catalyst.expressions.ArrayAggregate",
    "org.apache.spark.sql.catalyst.expressions.ArraySort",
    "org.apache.spark.sql.catalyst.expressions.ZipWith",
    "org.apache.spark.sql.catalyst.expressions.MapFilter",
    "org.apache.spark.sql.catalyst.expressions.LambdaFunction",
    "org.apache.spark.sql.catalyst.expressions.NamedLambdaVariable",
    // JSON parsing is inherently interpretive upstream (Jackson walk —
    // no codegen form of from_json exists); 9 JSON lanes
    "org.apache.spark.sql.catalyst.expressions.JsonToStructs",
    // Spark's own INTERSECT ALL / EXCEPT ALL rewrite plants this
    // generator (one eval per output GROUP, not per input row)
    "org.apache.spark.sql.catalyst.expressions.ReplicateRows",
    // one eval per merged sketch row — O(groups), not O(rows)
    "org.apache.spark.sql.catalyst.expressions.HllSketchEstimate")

  private def isWhitelistedExpr(cls: String): Boolean = exprWhitelist(cls)

  /** Collect non-whitelisted CodegenFallback expression classes reachable
    * from `plan`, descending into AQE final plans, materialized query
    * stages, and subquery plans. */
  private def fallbackExprs(
      plan: org.apache.spark.sql.execution.SparkPlan,
      acc: scala.collection.mutable.Map[String,
        scala.collection.mutable.Set[String]],
      lane: String): Unit = {
    import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateFunction
    import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    plan.foreach { node =>
      node match {
        case a: AdaptiveSparkPlanExec => fallbackExprs(a.executedPlan, acc, lane)
        case s: QueryStageExec => fallbackExprs(s.plan, acc, lane)
        case _ =>
      }
      node.expressions.foreach(_.foreach {
        case e: CodegenFallback if !e.isInstanceOf[AggregateFunction] =>
          val cls = e.getClass.getName
          if (!isWhitelistedExpr(cls))
            acc.getOrElseUpdate(cls, scala.collection.mutable.Set()) += lane
        case _ =>
      })
      node.subqueries.foreach(fallbackExprs(_, acc, lane))
    }
  }

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
    val exprOffenders = scala.collection.mutable.Map[String,
      scala.collection.mutable.Set[String]]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, q) =>
      if (!whitelist(name)) {
        val df = q(spark, sf)
        val tripped = captureFallbacks {
          // collect(), not count(): count() over a global aggregate lets
          // Catalyst prune the whole subtree (the ScaleProbe lesson) and
          // the canary would watch nothing run
          df.collect()
        }
        if (tripped.nonEmpty) offenders(name) = tripped.size
        // the expression-level walk rides the same executed plan — AQE
        // stages are final after collect(), so this sees what actually ran
        fallbackExprs(df.queryExecution.executedPlan, exprOffenders, name)
      }
    }
    assert(offenders.isEmpty,
      s"lanes silently dropped off whole-stage codegen: $offenders — " +
        "fix the expression or document + whitelist it deliberately")
    if (exprOffenders.nonEmpty) {
      val report = exprOffenders.toSeq.sortBy(_._1).map { case (cls, lanes) =>
        s"$cls in ${lanes.toSeq.sorted.take(5).mkString(",")}" +
          (if (lanes.size > 5) s" (+${lanes.size - 5} more)" else "")
      }
      fail("CodegenFallback EXPRESSIONS run interpreted per row inside " +
        s"codegen'd stages:\n  ${report.mkString("\n  ")}\n" +
        "add doGenCode to the kernel, or document + whitelist it " +
        "deliberately (exprWhitelist)")
    }
  }

  test("the expression-level detector fires on a planted CodegenFallback") {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "graft_canary_plant",
      exprs => CodegenCanarySpec.PlantedFallback(exprs.head), "built-in")
    try {
      val df = spark.range(8)
        .selectExpr("graft_canary_plant(id + 1) AS v")
        .filter(org.apache.spark.sql.functions.col("v") > 0)
      df.collect()
      val acc = scala.collection.mutable.Map[String,
        scala.collection.mutable.Set[String]]()
      fallbackExprs(df.queryExecution.executedPlan, acc, "plant")
      assert(acc.keySet.exists(_.contains("PlantedFallback")),
        s"expression walk missed the planted fallback: ${acc.keySet}")
    } finally reg.dropFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_canary_plant"))
  }
}

object CodegenCanarySpec {
  /** The plant: a do-nothing pass-through kernel "added without
    * doGenCode" — top-level so serializing the task never drags the
    * suite instance along. */
  case class PlantedFallback(
      child: org.apache.spark.sql.catalyst.expressions.Expression)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
      with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
    override def dataType: org.apache.spark.sql.types.DataType = child.dataType
    override def nullable: Boolean = child.nullable
    override def eval(
        input: org.apache.spark.sql.catalyst.InternalRow): Any =
      child.eval(input)
    override protected def withNewChildInternal(
        c: org.apache.spark.sql.catalyst.expressions.Expression)
        : org.apache.spark.sql.catalyst.expressions.Expression = copy(c)
  }
}
