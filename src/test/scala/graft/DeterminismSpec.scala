package graft

import org.scalatest.funsuite.AnyFunSuite

/** Partition-count invariance: the engine's numeric conventions (integer-
  * micros sums, integer-rational thresholds, fixed-order float ops, the
  * micros-stabilized Lloyd update) exist so that results are BIT-IDENTICAL
  * under any parallelism — on a 1000-executor cluster or local[1]. This
  * spec reruns load-bearing queries with shuffle parallelism forced down
  * from the suite's 8 to 3 and demands exactly equal output, which fails
  * for any plan that leaks accumulation order into the result (the classic
  * parallel-engine nondeterminism bug this repo's conventions prevent). */
class DeterminismSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  private val names = Seq(
    "q1_pricing_summary",     // micros-long money sums
    "q_agg_multi_distinct",   // 3-stage DQA plan
    "d_dedup_minhash_lsh",    // banded candidates + integer-rational jaccard
    "q_hll_deterministic",    // exact-decimal register sum + fixed-order est
    "s_ann_ivf_topk",         // micros-stabilized Lloyd iterations
    "d_dedup_embedding_lsh",  // in-bucket kernel + fixed-order dot products
    "d_dedup_cluster_assign_near", // min-label CC: iteration-order-free fixpoint
    "d_pack_greedy",          // per-source ordered state machine, O(1) state
    // r7 additions, each leaning on the same conventions:
    "q_linreg_fit",           // 9 exact moment sums + mirrored Cramer solve
    "s_ann_pq_adc",           // micros-Lloyd codebooks + micros-summed ADC
    "q_quantile_sketch",      // histogram counts + mirrored interpolation
    "v_svec_sum_by_label",    // nnz-triple shuffle + micros sums
    // r8 additions:
    "q_multirange_agg",       // gaps-and-islands windows + collect_list sort
    "d_bigram_likelihood",    // broadcast LM + half-up integer-micros means
    "s_ann_pq_score",         // sampled-fit codebooks + scoring join
    "t_fts_rank_cd",          // left-to-right double fold over covers
    "q_trgm_fuzzy",           // trigram set ops + micros rational
    // r9 additions:
    "q_mannwhitney_u",        // doubled midranks over the distinct-value spine
    "q_anova_f",              // 128-bit squared deviations + half-up staging
    "q_logreg_gd",            // integer-rational sigmoid recurrence, driver loop
    "d_naive_bayes",          // token-level integer micros kill sum-order leaks
    "q_mad_outliers",         // positional medians immune to tie order
    "q_holt_linear",          // ordered array fold, O(1) integer state
    "t_bm25_rank",            // per-row fp ops off broadcast stats, rank tie-broken
    "s_hard_negatives",       // round(6)-then-rank cosine, nid tie-break
    "q_asof_native",          // custom exec: merge result is sort-determined
    // r11 additions:
    "q_ks_test",              // two-level bucketed cumsum spine + exact argmax
    "q_connectby",            // BFS fixpoint carrying branch paths
    "d_boilerplate_strip",    // broadcast hot set + idx-sorted reassembly
    // r11 session-3 additions:
    "d_semdedup",             // Lloyd cells + lower-id witness + sorted digest
    "d_chunk_cdc",            // codegen boundary kernel + digest-keyed dup count
    "q_dbscan",               // grid pairs + min-label CC + min border labels
    "q_cdc_diff",             // full-outer snapshot diff, op by null-safe compare
    "q_events_attribution",   // integer micros splits, remainder to pinned rank
    "q_events_paths",         // sorted per-user sequences, bounded top-k
    "q_shortest_cost",        // Bellman-Ford min relaxation, integer costs
    "q_ltree_lca")            // per-row monotone prefix fold
    // (q_eager_agg deliberately NOT here: it builds a child session, so
    // the parent-session parallelism override would never reach it and
    // the invariance claim would be vacuous; XformRulesSpec proves its
    // rule-on/rule-off equality instead)

  private def run(name: String): Seq[Seq[Any]] =
    SparkEntry.queries(name)(spark, sf).collect().map(_.toSeq).toSeq

  names.foreach { name =>
    test(s"$name is invariant to shuffle partition count") {
      val base = run(name)
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", 3)
      val low = try run(name)
        finally spark.conf.set("spark.sql.shuffle.partitions", prev)
      assert(base == low,
        s"$name changed under different parallelism — an accumulation-order leak")
    }
  }
}
