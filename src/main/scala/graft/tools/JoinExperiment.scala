package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway: q3/q5 join-strategy A/B — SMJ (default) vs shuffled hash
  * (preferSortMergeJoin=false) vs AQE SMJ->SHJ threshold conversion.
  * Interleaved min-of-N like AggExperiment. Not part of the library. */
object JoinExperiment {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val lane = if (args.length > 1) args(1) else "q3_shipping_priority"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.SessionDefaults(SparkSession.builder())
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries(lane)

    val variants: Seq[(String, () => Unit)] = Seq(
      "A_smj" -> (() => {
        spark.conf.set("spark.sql.join.preferSortMergeJoin", "true")
        spark.conf.set("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "0")
      }),
      "B_shj" -> (() => {
        spark.conf.set("spark.sql.join.preferSortMergeJoin", "false")
        spark.conf.set("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "0")
      }),
      "C_aqe_shj" -> (() => {
        spark.conf.set("spark.sql.join.preferSortMergeJoin", "true")
        spark.conf.set("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "64MB")
      }))

    val mins = collection.mutable.Map[String, Double]().withDefaultValue(Double.MaxValue)
    for (r <- 1 to 5; (label, setup) <- variants) {
      setup()
      val t0 = System.nanoTime()
      val n = fn(spark, dir).collect().length
      val s = (System.nanoTime() - t0) / 1e9
      if (r > 1 && s < mins(label)) mins(label) = s
      System.err.println(f"  [$label] round $r: $s%.3f s rows=$n")
    }
    variants.foreach { case (l, _) =>
      System.err.println(f"[$l] min ${mins(l)}%.3f s") }
    spark.stop()
  }
}
