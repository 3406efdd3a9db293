package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.queries.Dedup
import graft.Tables

/** Ad-hoc perf probe (test scope — not part of the library). Times the
  * stages of the minhash pipeline separately so plan-shape regressions can
  * be localized without running the whole bench. */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Long): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        System.err.println(f"[probe] $name%-28s run$i ${(System.nanoTime()-t0)/1e9}%8.3f s rows=$n")
      }
    }

    val docs = Tables.t(spark, sfDir, "documents")
    val memRep = Dedup.digestGroups(docs, md5(col("text").cast("binary")))
    val repDocs = Dedup.repsOnly(docs, memRep)
    time("digestGroups")(memRep.count())
    time("candidates")(Dedup.minhashCandidates(repDocs, Dedup.MaxBucket).count())
    time("full_minhash")(graft.SparkEntry.queries("d_dedup_minhash_lsh")(spark, sfDir).collect().length)
    if (args.contains("explain"))
      Dedup.minhashCandidates(repDocs, Dedup.MaxBucket).explain("formatted")
    spark.stop()
  }
}
