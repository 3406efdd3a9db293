package graft

import org.scalatest.funsuite.AnyFunSuite

/** Column pruning must reach the parquet scan for the round-2 operators:
  * a scan that reads more than the needed columns is wrong at 100 TB
  * regardless of how fast the rest of the plan is. */
class PruneAuditSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  private val expected = Map(
    "q_date_bin" -> Set("ts:bigint", "value:double"),
    "t_fts_rank" -> Set("doc_id:bigint", "text:string"),
    "m_phash_dedup" -> Set("doc_id:bigint", "text:string"),
    "q_age_justify" -> Set("ts:bigint", "user_id:bigint"),
    "d_dedup_entity" -> Set("doc_id:bigint", "text:string"))

  test("round-2 operators read only the columns they need") {
    // disable narrow-intermediate checkpoint truncation so the audited
    // plan keeps full lineage down to the parquet scans
    sys.props("graft.test.noCheckpoint") = "true"
    try {
      for ((q, cols) <- expected) {
        val p = SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString
        val read = "ReadSchema: struct<([^>]*)>".r.findAllMatchIn(p)
          .flatMap(_.group(1).split(",")).toSet
        assert(read == cols, s"$q reads $read, expected $cols")
      }
    } finally sys.props.remove("graft.test.noCheckpoint")
  }
}
