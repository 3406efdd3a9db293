package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage decomposition of the embedding sign-LSH kernel at a replica
  * scale — where do the x1000 seconds actually go? Runs each prefix of
  * the pipeline once (fresh session state, min-of-`runs`):
  *   A sig+band fan-out only (no shuffle) — the 60-dot map-side kernel
  *   B A + repartition/sort + pass-through drain — adds the payload
  *     exchange
  *   C the full lane (verify kernel + distinct + orderBy)
  * so B−A is the shuffle+sort bill and C−B the verify/distinct bill.
  *
  * Usage: runMain graft.tools.LshProfile [dir] [runs]
  */
object LshProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption
      .getOrElse("/root/repo/.scale/probe_sf0.01_x1000")
    val runs = args.lift(1).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorFns.register(spark)

    def e = graft.Tables.t(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

    def time(name: String)(body: => Long): Unit = {
      val ts = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        val n = body
        val s = (System.nanoTime() - t0) / 1e9
        System.err.println(f"[lshprof] $name: $s%.2f s ($n rows)")
        s
      }
      println(f"""{"stage":"$name","sec":${ts.min}%.2f}""")
    }

    time("A_sig_fanout") {
      graft.queries.Dedup.embeddingBanded(e)
        .select(col("band"), col("key"))
        .queryExecution.toRdd.count()
    }
    time("B_shuffle_sort_drain") {
      graft.queries.Dedup.embeddingBanded(e)
        .select(col("band").cast("int"), col("key").cast("long"),
                col("doc_id"), col("v"), col("nrm"))
        .repartition(col("band"), col("key"))
        .sortWithinPartitions(col("band"), col("key"), col("doc_id"))
        .queryExecution.toRdd.count()
    }
    time("C_full_lane") {
      graft.queries.Dedup.embeddingLshPairs(e, graft.queries.Dedup.MaxBucket, 0.45)
        .queryExecution.toRdd.count()
    }
    spark.stop()
  }
}
