package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway measurement harness for the ObjectHashAggregate sort-based
  * fallback hypothesis (guide §1: measure first; not part of the library).
  *
  * d_boilerplate_strip's partial collect_list stage profiles at ~4 s
  * executor-CPU / ~7 s run for ~600k chunk rows at the x10 probe — far
  * above the kernel stages around it. Suspect: ObjectHashAggregate falls
  * back to SORT-based aggregation once a task's hash map passes
  * `spark.sql.objectHashAggregate.sortBased.fallbackThreshold` (default
  * 128 groups), and every task here holds ~1500 doc_id groups — so the
  * whole corpus-chunk stream pays an extra sort. The conf is a runtime
  * SQLConf: this harness interleaves the lane at the default vs raised
  * thresholds in ONE session, min-of-N per arm.
  *
  * Usage: runMain graft.tools.ObjHashExperiment <sfDir> [lane] [rounds]
  */
object ObjHashExperiment {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val lane = if (args.length > 1) args(1) else "d_boilerplate_strip"
    val rounds = if (args.length > 2) args(2).toInt else 5
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
    val arms = Seq("128" -> "default_128", "16384" -> "raised_16384")
    val mins = Array.fill(arms.length)(Double.MaxValue)
    for (r <- 1 to rounds; i <- arms.indices) {
      spark.conf.set(
        "spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        arms(i)._1)
      val t0 = System.nanoTime()
      val n = fn(spark, dir).collect().length
      val s = (System.nanoTime() - t0) / 1e9
      if (r > 1 && s < mins(i)) mins(i) = s // round 1 = warmup
      System.err.println(f"  [${arms(i)._2}] round $r: $s%.3f s rows=$n")
    }
    arms.indices.foreach(i =>
      System.err.println(f"[${arms(i)._2}] min ${mins(i)}%.3f s"))
    spark.stop()
  }
}
