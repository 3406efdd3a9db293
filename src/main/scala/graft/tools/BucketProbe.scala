package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** LSH bucket-distribution diagnostic for a corpus dir: bucket count,
  * hottest bucket, p99, total in-bucket pair work, and how many band
  * rows sit in star-degraded (> MaxBucket) buckets. This is the tool
  * that attributes a scale-probe regression to banding geometry vs
  * plan shape (it caught the r14 x1000 collapse: 120 buckets total,
  * 100% of rows in star — see SCALING.md). Usage:
  *   runMain graft.tools.BucketProbe [corpusDir]
  */
object BucketProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/.scale/probe_sf0.01_x1000")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val banded = graft.queries.Dedup.embeddingBanded(e)
    val stats = banded.groupBy("band", "key").count()
    stats.agg(count(lit(1)).as("buckets"), max("count").as("maxb"),
      expr("percentile(count, 0.99)").as("p99"),
      sum(expr("count*(count-1) div 2")).as("inbucket_pairs"),
      sum(expr("case when count > 4096 then count else 0 end")).as("rows_in_star"))
      .show(false)
    stats.orderBy(desc("count")).show(10, false)
    spark.stop()
  }
}
