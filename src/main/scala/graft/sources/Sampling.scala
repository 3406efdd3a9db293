package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** TABLESAMPLE methods (`nodeSamplescan.c`).
  *
  * BERNOULLI (`/root/reference/src/backend/access/tablesample/bernoulli.c`)
  * is per-row — Spark's `df.sample` covers it (see `q_sample_bernoulli`).
  *
  * SYSTEM (`/root/reference/src/backend/access/tablesample/system.c`) is
  * per-BLOCK: a page is either fully in or fully out, so sampling cost is
  * proportional to the pages read, not to the table's row count. The
  * Spark-first analogue of a page is an input FILE: keep a file iff
  * `hash(file_path, seed) mod 100 < pct`. Properties preserved from the
  * reference:
  *
  *  - all-or-nothing granules (every kept file contributes ALL its rows);
  *  - I/O proportional to the sample, not the table — the predicate is on
  *    file identity, so at 100 TB unselected files' row groups are
  *    skipped after the footer read (and never shuffled);
  *  - seeded reproducibility: same seed => bit-identical sample, any
  *    cluster size, any executor placement (REPEATABLE(seed) semantics —
  *    the reference documents SYSTEM's block choice as seed-stable).
  */
object Sampling {

  /** Predicate form, usable inside any plan. */
  def systemSampleCond(pct: Int, seed: Long): Column = {
    require(pct >= 0 && pct <= 100, s"pct out of range: $pct")
    pmod(xxhash64(input_file_name(), lit(seed)), lit(100)) < pct
  }

  /** `TABLESAMPLE SYSTEM (pct) REPEATABLE (seed)`. */
  def tablesampleSystem(df: DataFrame, pct: Int, seed: Long): DataFrame =
    df.filter(systemSampleCond(pct, seed))

  /** `TABLESAMPLE SYSTEM_TIME (ms)` analogue
    * (`/root/reference/contrib/tsm_system_time/tsm_system_time.c`: read
    * whole blocks until the time budget runs out — the only sampling
    * method whose output depends on I/O speed). A wall-clock cut is
    * inherently nondeterministic, so the deterministic Spark mapping
    * fixes the unit the clock was proxying: a per-granule (file) cost.
    * `budgetMs / perFileMs` = the number of WHOLE files the budget
    * affords; files are taken in seeded-hash order (the reference's
    * random block walk, made reproducible), so the sample is
    * REPEATABLE(seed)-stable across engines and cluster sizes while
    * keeping SYSTEM_TIME's defining property: the amount of data read is
    * bounded by the budget, not by the table size. */
  def tablesampleSystemTime(df: DataFrame, budgetMs: Long, perFileMs: Long,
                            seed: Long): DataFrame = {
    require(perFileMs > 0, "perFileMs must be positive")
    require(budgetMs >= 0, s"budgetMs must be non-negative: $budgetMs")
    val nFiles = math.min(budgetMs / perFileMs, Int.MaxValue).toInt
    if (nFiles == 0) return df.filter(lit(false))
    // the chosen-granule list is driver state bounded by the BUDGET
    // (nFiles names), the same shape as the reference's block choice —
    // and a literal IN list the reader turns into a file-level predicate
    val kept = df.select(input_file_name().as("f")).distinct()
      .select(col("f"), xxhash64(col("f"), lit(seed)).as("h"))
      .orderBy(col("h"), col("f")).limit(nFiles)
      .collect().map(_.getString(0)).toSeq
    df.filter(input_file_name().isin(kept: _*))
  }
}
