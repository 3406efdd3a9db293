package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Throwaway measurement harness for the q_agg_multi_distinct shape —
  * compares the one-pass Expand plan against split-aggregation variants
  * on the same data (guide §1: measure first). Not part of the library.
  */
object AggExperiment {
  def time(label: String, runs: Int)(f: => DataFrame): Unit = {
    val ts = (1 to runs).map { _ =>
      val t0 = System.nanoTime()
      val n = f.collect().length
      val s = (System.nanoTime() - t0) / 1e9
      System.err.println(f"  [$label] $s%.3f s rows=$n")
      s
    }
    System.err.println(f"[$label] min ${ts.min}%.3f s")
  }

  /** Interleaved min-of-N comparison: A,B,A,B,... so ambient drift hits
    * both arms equally (the bench_ab discipline, in-process). */
  def paired(labels: Seq[String], rounds: Int)(fs: Seq[() => DataFrame]): Unit = {
    val mins = Array.fill(fs.length)(Double.MaxValue)
    for (r <- 1 to rounds; i <- fs.indices) {
      val t0 = System.nanoTime()
      val n = fs(i)().collect().length
      val s = (System.nanoTime() - t0) / 1e9
      if (r > 1 && s < mins(i)) mins(i) = s  // round 1 = warmup
      System.err.println(f"  [${labels(i)}] round $r: $s%.3f s rows=$n")
    }
    labels.indices.foreach(i =>
      System.err.println(f"[${labels(i)}] min ${mins(i)}%.3f s"))
  }

  def main(args: Array[String]): Unit = {
    val dir = args(0)
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
    def li = t(spark, dir, "lineitem")

    // A: current declared shape (Expand, one pass, limb sum)
    def vA() =
      li.groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("nd_part"),
          countDistinct(col("l_suppkey")).as("nd_supp"),
          countDistinct(col("l_orderkey"), col("l_linenumber")).as("nd_line"),
          count(lit(1)).as("n"),
          dsum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("l_returnflag"))

    // C: expand but with a plain long sum (no limbs) — isolates limb cost
    def vC() =
      li.groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("nd_part"),
          countDistinct(col("l_suppkey")).as("nd_supp"),
          countDistinct(col("l_orderkey"), col("l_linenumber")).as("nd_line"),
          count(lit(1)).as("n"),
          sum(round(col("l_quantity") * 1000000.0, 0).cast("long")).as("sum_q"))
        .orderBy(col("l_returnflag"))

    // B: split — each distinct count its own two-stage agg, join at the end
    def vB() = {
      val p = li.groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("nd_part"))
      val s = li.groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_suppkey")).as("nd_supp"))
      val l = li.groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_orderkey"), col("l_linenumber")).as("nd_line"))
      val b = li.groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
      p.join(s, "l_returnflag").join(l, "l_returnflag").join(b, "l_returnflag")
        .orderBy(col("l_returnflag"))
    }

    paired(Seq("A_expand", "C_plainsum", "B_split"), 5)(
      Seq(() => vA(), () => vC(), () => vB()))

    spark.stop()
  }
}
