package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.plans.PlanSnapshot

/** Golden EXPLAIN snapshots for the headline + TPC-H + xform queries —
  * the ORCA-minidump-replay analogue (see [[graft.plans.PlanSnapshot]]).
  * Any unapproved plan-shape drift (join strategy flip, lost broadcast,
  * extra exchange, un-pushed filter) fails the suite with a line diff.
  *
  * Regenerate after an INTENDED plan change with:
  *   GRAFT_REGEN_PLANS=1 sbt "testOnly graft.PlanSnapshotSpec"
  * then review the git diff of src/test/resources/plan-snapshots/ —
  * that diff IS the plan-change review artifact.
  */
class PlanSnapshotSpec extends AnyFunSuite {
  // snapshots need a session whose conf no other suite has touched:
  // sibling specs legitimately set session-level knobs on the shared
  // session (PQ store dir, checkpoint dir, ...) that change these very
  // plans — a fresh child session sees only the builder defaults
  private lazy val spark = {
    val s = SparkTestSession.spark.newSession()
    // SimpleMode clips metadata (DataFilters/PushedFilters) at 100 chars
    // and the clip point shifts with raw exprId digit width — whole
    // tokens appear/vanish run-to-run. Raise the limit so scan metadata
    // is captured UNCLIPPED and the pushdown lists are pinned exactly.
    s.conf.set("spark.sql.maxMetadataStringLength", "2000")
    s
  }
  private val sf = SparkTestSession.sf
  private val dir = Paths.get("src/test/resources/plan-snapshots")
  private val regen = sys.env.get("GRAFT_REGEN_PLANS").contains("1")

  /** The snapshot set: every bench headline query, the full TPC-H lane
    * (incl. the r13 synthesized-schema eight), and each graft optimizer
    * rule's demonstration query. Queries whose construction executes
    * jobs (fit loops) still snapshot fine — the golden is the FINAL
    * plan the query returns.
    */
  private val snapshotQueries: Seq[String] = Seq(
    // bench headline set (Bench.scala)
    "q1_pricing_summary", "q3_shipping_priority", "q5_region_revenue",
    "q_agg_multi_distinct", "q_window_running", "q_events_sessionize",
    "d_dedup_minhash_lsh", "d_dedup_simhash", "d_dedup_embedding_lsh",
    "s_ann_bruteforce_topk", "s_ann_ivf_topk",
    "m_decode_features", "q_to_char_patterns", "t_fingerprint",
    "t_vocab_topk", "v_svec_dot_topk",
    "t_bm25_rank", "d_countmin_heavy", "q_asof_native",
    "q_triangle_count", "d_bpe_encode", "d_feature_mi",
    "d_boilerplate_strip", "d_semdedup", "d_chunk_cdc",
    "d_semdedup_probes", "d_semdedup_lsh", "d_dedup_substring",
    "s_ann_ivfpq_topk", "s_ann_mmr_topk", "q_hybrid_rrf",
    "s_ann_ivfpq_score",
    // TPC-H suite — ALL 22 planner shapes pinned (q1/q3/q5 are in the
    // bench set above; the synthesized-partsupp/date lane is r13)
    "q2_min_cost_supp", "q4_order_priority", "q6_forecast_revenue",
    "q7_volume_shipping", "q8_market_share", "q9_product_profit",
    "q10_returned_items", "q11_important_stock", "q12_shipmode_priority",
    "q13_cust_distribution", "q14_promo_revenue", "q15_top_supplier",
    "q16_supplier_cnt", "q17_small_qty_revenue", "q18_large_volume_cust",
    "q19_bracketed_revenue", "q20_promotion_supp", "q21_suppliers_waiting",
    "q22_global_sales_opp",
    // graft optimizer-rule rewrites (Xforms + native operators)
    "q_eager_agg", "q_or_join", "q_join_below_union", "q_range_bin_join",
    "q_asof_join", "q_topk_global",
    // pg_hint_plan-analogue hinted shapes (r14): the pinned plan IS the
    // adherence proof — SortMergeJoin + ShuffledHashJoin where cost
    // would broadcast, and the REPARTITION/BROADCAST pair
    "q_hint_join_strategy", "q_hint_broadcast_parallel",
    // Leading(...) join-order pinning (r15): the dim-first scan order
    // in the snapshot is the adherence proof
    "q_hint_leading",
    // Rows(...) cardinality correction (r16): the lane runs AQE-off and
    // the pinned strategy flip (customer off the build side) is the
    // adherence proof
    "q_hint_rows",
    // prefix-filtered trigram similarity join (r14): pins the
    // posting/prefix/verify join topology
    "q_trgm_join",
    // compiled PL/pgSQL (r18): the pinned plan IS the compilation
    // proof — the whole function body appears as one CASE tree fused
    // into the partial-aggregate grouping expression, no UDF node
    "q_plpgsql_scalar", "q_plpgsql_caseloop",
    // r19 PL frontier: the WHILE/dyn-FOR guarded unroll stays one fused
    // expression; SETOF lowers to Generate (explode), never a UDF; the
    // EXCEPTION block's handler routing is plain CASE in the same
    // grouping expression
    "q_plpgsql_while", "q_plpgsql_setof", "q_plpgsql_exception")

  snapshotQueries.foreach { name =>
    test(s"plan snapshot: $name") {
      assert(SparkEntry.queries.contains(name), s"unknown query $name")
      val got = PlanSnapshot.physicalPlan(
        SparkEntry.queries(name)(spark, sf))
      val path = dir.resolve(s"$name.txt")
      if (regen) {
        Files.createDirectories(dir)
        Files.write(path, (got + "\n").getBytes(StandardCharsets.UTF_8))
      } else {
        assert(Files.exists(path),
          s"no golden snapshot for $name — run with GRAFT_REGEN_PLANS=1")
        val want = new String(Files.readAllBytes(path),
          StandardCharsets.UTF_8).trim
        if (got != want) {
          val diff = want.linesIterator.zipAll(
            got.linesIterator, "<eof>", "<eof>")
            .zipWithIndex
            .collect { case ((w, g), i) if w != g =>
              s"  line ${i + 1}:\n    want: $w\n    got:  $g" }
            .take(12)
            .mkString("\n")
          fail(s"plan shape drift for $name (regen + review if intended):\n$diff")
        }
      }
    }
  }
}
