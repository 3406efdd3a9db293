package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Sampling

/** TABLESAMPLE SYSTEM (system.c): block-granular, seed-reproducible. */
class SamplingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  // a multi-file table: block sampling is about file granularity
  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft_sys_sample").toString
    Tables.t(spark, sf, "orders").repartition(32)
      .write.mode("overwrite").parquet(d)
    d
  }

  test("same seed reproduces the identical sample; different seed diverges") {
    val t = spark.read.parquet(dir)
    val s1 = Sampling.tablesampleSystem(t, 30, seed = 7)
      .select("o_orderkey").collect().map(_.getLong(0)).sorted.toSeq
    val s2 = Sampling.tablesampleSystem(spark.read.parquet(dir), 30, seed = 7)
      .select("o_orderkey").collect().map(_.getLong(0)).sorted.toSeq
    assert(s1 == s2, "REPEATABLE(seed): same seed must give the same rows")
    assert(s1.nonEmpty && s1.size < t.count(),
      "a 30pct sample of 32 files should be a proper subset")
    val s3 = Sampling.tablesampleSystem(spark.read.parquet(dir), 30, seed = 8)
      .select("o_orderkey").collect().map(_.getLong(0)).sorted.toSeq
    assert(s1 != s3, "different seeds should select different blocks")
  }

  test("sampling is all-or-nothing per file (block semantics)") {
    val t = spark.read.parquet(dir)
    val perFileFull = t.groupBy(input_file_name().as("f"))
      .agg(count(lit(1)).as("n_full"))
    val perFileSample = Sampling.tablesampleSystem(t, 40, seed = 11)
      .groupBy(input_file_name().as("f"))
      .agg(count(lit(1)).as("n_sampled"))
    val joined = perFileSample.join(perFileFull, "f")
    assert(joined.count() > 0)
    assert(joined.filter(col("n_sampled") =!= col("n_full")).count() == 0,
      "every sampled file must contribute ALL its rows")
  }

  test("pct bounds: 0 is empty, 100 is everything") {
    val t = spark.read.parquet(dir)
    assert(Sampling.tablesampleSystem(t, 0, seed = 1).count() == 0)
    assert(Sampling.tablesampleSystem(t, 100, seed = 1).count() == t.count())
    assertThrows[IllegalArgumentException](
      Sampling.tablesampleSystem(t, 101, seed = 1))
  }

  test("SYSTEM_TIME analogue: budget bounds files read, seed-reproducible, all-or-nothing") {
    val t = spark.read.parquet(dir)
    // budget affords exactly 5 whole files at 10ms per file
    val s1 = Sampling.tablesampleSystemTime(t, budgetMs = 50, perFileMs = 10, seed = 7)
    val files1 = s1.select(input_file_name()).distinct().count()
    assert(files1 == 5, s"expected 5 files, read $files1")
    // repeatable: same seed -> identical sample; different seed diverges
    val s1b = Sampling.tablesampleSystemTime(t, 50, 10, seed = 7)
    assert(s1.orderBy("o_orderkey").collect().toSeq ==
           s1b.orderBy("o_orderkey").collect().toSeq)
    val s2 = Sampling.tablesampleSystemTime(t, 50, 10, seed = 8)
    assert(s2.select(input_file_name()).distinct().collect().toSet !=
           s1.select(input_file_name()).distinct().collect().toSet)
    // all-or-nothing per file (block semantics preserved)
    val perFull = t.groupBy(input_file_name().as("f")).agg(count(lit(1)).as("nf"))
    val perSample = s1.groupBy(input_file_name().as("f")).agg(count(lit(1)).as("ns"))
    assert(perSample.join(perFull, "f")
      .filter(col("ns") =!= col("nf")).count() == 0)
    // a zero budget reads nothing; a huge budget reads everything
    assert(Sampling.tablesampleSystemTime(t, 0, 10, seed = 1).count() == 0)
    assert(Sampling.tablesampleSystemTime(t, 1L << 40, 10, seed = 1).count() == t.count())
  }
}
