package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] is one operator/feature from SURVEY.md §2,
  * expressed Spark-first; [[oracleSql]] carries the DuckDB-equivalent SQL the
  * driver hash-compares against at sf0.01. Queries without an oracle entry
  * (nondeterministic sampling, sketches, hash-seeded LSH internals) get the
  * driver's weaker rows-only check.
  */
object SparkEntry {

  private val modules: Seq[QueryModule] = Seq(
    CoreAgg, Joins, Windows, SetOpsMisc, ScalarFns, ScalarParity, TypeOps,
    GeoOps, Events, Dedup, Corpus, Similarity, TextOps, Multimodal, Advanced,
    SqlParity, Xforms, SparseOps, XmlOps, TpchSuite, TpchSynth, Stats,
    Sketches, HstoreOps, MoneyOps, TimeTzOps, Hints, PlFuncs
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(_.queries).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.map(_.oracle).reduce(_ ++ _)
}
