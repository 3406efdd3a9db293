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
}
