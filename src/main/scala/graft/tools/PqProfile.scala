package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch profiler for the s_ann_pq_adc lane: times the fit, encode, and
  * scoring stages separately so a bench regression can be attributed to a
  * stage instead of guessed at. Not part of the driver contract.
  */
object PqProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.VectorFns.register(spark)

    // warm-up
    spark.range(1 << 20).selectExpr("sum(id) as s").collect()
    graft.Tables.t(spark, sfDir, "embeddings").limit(1).collect()

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[pqprofile] $label%-20s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    for (round <- 1 to 2) {
      println(s"[pqprofile] ---- round $round ----")
      val stages = graft.queries.Similarity.pqAdcStaged(spark, sfDir)
      time("fit")(stages.fit())
      time("encode+score")(stages.score().collect().length)
    }
    spark.stop()
  }
}
