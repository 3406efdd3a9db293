package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Calibration harness for the EagerAgg cost threshold
  * (`spark.graft.eagerAgg.minReduction`, r16): measures the pushed vs
  * un-pushed plan over a family of join-key NDVs on the same fact
  * table, so the default threshold is an empirical break-even rather
  * than a guess. ORCA answers this question with its cost model at plan
  * time; with Spark's heuristic optimizer the honest substitute is a
  * measured table.
  *
  * Shape per NDV d: facts(k = key % d, v) ⋈ dim(k, grp) GROUP BY grp —
  * lower-side reduction is rows/d by construction. The rule is forced
  * ON vs OFF via its kill switch (no CBO involved: this isolates the
  * transform's own cost/benefit; the threshold then decides where on
  * this curve the stats-based decision should flip).
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.EagerAggCalib [runs]
  * Prints one JSON line {"probe":"eageragg_calib","rows":N,
  *   "points":[{"ndv":d,"reduction":r,"off":s,"on":s,"ratio":x},...]}.
  */
object EagerAggCalib {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runs = args.headOption.map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val li = graft.Tables.t(spark, dir, "lineitem")
      .select(col("l_orderkey").as("key"),
        col("l_quantity").cast("long").as("v"))
      .cache()
    val rows = li.count()

    def shape(s: SparkSession, d: Long): DataFrame = {
      val f = li.select(pmod(col("key"), lit(d)).as("k"), col("v"))
      val dim = s.range(d).select(col("id").as("k"),
        pmod(col("id"), lit(7)).as("grp"))
      // no broadcast: the pushed aggregate's win is shuffle volume, and
      // a broadcast join would mask it at local scale
      f.join(dim.hint("merge"), "k").groupBy("grp")
        .agg(sum(col("v")).as("sv"), min(col("v")).as("mv"),
          count(lit(1)).as("n"))
    }

    def time(d: Long, on: Boolean): Double = {
      spark.conf.set(graft.plans.EagerAggRule.ConfKey, on.toString)
      try {
        (0 until runs).map { _ =>
          val t0 = System.nanoTime()
          shape(spark, d).collect()
          (System.nanoTime() - t0) / 1e9
        }.min
      } finally spark.conf.unset(graft.plans.EagerAggRule.ConfKey)
    }

    // SPARK_GRAFT_CALIB_NDVS=comma,list overrides (focused break-even runs)
    val ndvs = sys.env.get("SPARK_GRAFT_CALIB_NDVS")
      .map(_.split(",").map(_.trim.toLong).toSeq)
      .getOrElse(Seq(10L, 1000L, 10000L, 100000L, rows / 2, rows * 2))
    val points = ndvs.map { d =>
      // verify the rule actually fires at this shape when ON
      spark.conf.set(graft.plans.EagerAggRule.ConfKey, "true")
      val fired = shape(spark, d).queryExecution.optimizedPlan.collect {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
      }.size > 1
      spark.conf.unset(graft.plans.EagerAggRule.ConfKey)
      val off = time(d, on = false)
      val on = time(d, on = true)
      val red = rows.toDouble / math.min(d, rows)
      System.err.println(
        f"[calib] ndv=$d%-8d reduction=$red%10.1f off=$off%.3f on=$on%.3f " +
          f"ratio=${on / off}%.2f fired=$fired")
      f"""{"ndv":$d,"reduction":$red%.1f,"off":$off%.3f,"on":$on%.3f,""" +
        f""""ratio":${on / off}%.2f,"fired":$fired}"""
    }
    println(s"""{"probe":"eageragg_calib","rows":$rows,""" +
      s""""points":[${points.mkString(",")}]}""")
    spark.stop()
  }
}
