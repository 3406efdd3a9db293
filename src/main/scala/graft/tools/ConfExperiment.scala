package graft.tools

import org.apache.spark.sql.SparkSession

/** Generic interleaved runtime-conf A/B for one declared lane (guide §1:
  * measure first; the ObjHashExperiment pattern, parameterized). Both
  * arms run in ONE session, alternating A,B per round, min-of-N per arm
  * after a warmup round — ambient drift hits both arms equally.
  *
  * Usage: runMain graft.tools.ConfExperiment <sfDir> <lane> <rounds>
  *        <confKey> <valueA> <valueB>
  */
object ConfExperiment {
  def main(args: Array[String]): Unit = {
    val Array(dir, lane, roundsS, key, va, vb) = args.take(6)
    val rounds = roundsS.toInt
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
    val arms = Seq(va, vb)
    val mins = Array.fill(arms.length)(Double.MaxValue)
    for (r <- 1 to rounds; i <- arms.indices) {
      spark.conf.set(key, arms(i))
      val t0 = System.nanoTime()
      val n = fn(spark, dir).collect().length
      val s = (System.nanoTime() - t0) / 1e9
      if (r > 1 && s < mins(i)) mins(i) = s // round 1 = warmup
      System.err.println(f"  [$key=${arms(i)}] round $r: $s%.3f s rows=$n")
    }
    arms.indices.foreach(i =>
      System.err.println(f"[$key=${arms(i)}] min ${mins(i)}%.3f s"))
    spark.stop()
  }
}
