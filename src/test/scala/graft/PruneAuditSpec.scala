package graft

import org.scalatest.funsuite.AnyFunSuite

/** Column pruning must reach the parquet scan for the round-2 operators:
  * a scan that reads more than the needed columns is wrong at 100 TB
  * regardless of how fast the rest of the plan is. */
class PruneAuditSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  // events.ts reads as bigint under the TIMESTAMP(NANOS) fallback lane or
  // as a native timestamp when the fixture is TIMESTAMP(MICROS) — accept
  // either; what this spec pins is the COLUMN SET, not the fixture's unit
  private val expected = Map(
    "q_date_bin" -> Set(Set("ts:bigint", "value:double"),
                        Set("ts:timestamp_ntz", "value:double"),
                        Set("ts:timestamp", "value:double")),
    "t_fts_rank" -> Set(Set("doc_id:bigint", "text:string")),
    "m_phash_dedup" -> Set(Set("doc_id:bigint", "text:string")),
    "q_age_justify" -> Set(Set("ts:bigint", "user_id:bigint"),
                           Set("ts:timestamp_ntz", "user_id:bigint"),
                           Set("ts:timestamp", "user_id:bigint")),
    "d_dedup_entity" -> Set(Set("doc_id:bigint", "text:string")))

  test("round-2 operators read only the columns they need") {
    // disable narrow-intermediate checkpoint truncation so the audited
    // plan keeps full lineage down to the parquet scans
    sys.props("graft.test.noCheckpoint") = "true"
    try {
      for ((q, colSets) <- expected) {
        val p = SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString
        val read = "ReadSchema: struct<([^>]*)>".r.findAllMatchIn(p)
          .flatMap(_.group(1).split(",")).toSet
        assert(colSets.contains(read), s"$q reads $read, expected one of $colSets")
      }
    } finally sys.props.remove("graft.test.noCheckpoint")
  }
}
