package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SimpleMode

/** Golden-plan snapshot support — the engine's analogue of the
  * reference's ORCA minidump replays
  * (`/root/reference/src/backend/gporca/data` holds 1,248 captured
  * .mdp plans the optimizer must keep reproducing; runner
  * `gporca/server/`). A snapshot is the SimpleMode physical-plan
  * string, normalized the way the reference's regress suite normalizes
  * EXPLAIN output with gpdiff (ids, stats, and paths masked) so the
  * diff fires only on genuine plan-SHAPE drift: a join strategy flip, a
  * lost broadcast, an extra exchange, a filter no longer pushed into
  * the scan.
  *
  * Normalizations (each masks a legitimately-unstable token):
  *  - expression ids `#123` and `plan_id=7` — shift with any unrelated
  *    analysis, carry no shape information;
  *  - subquery/CTE ordinals `subquery#N`, `cte` ids via the same rule;
  *  - file locations / InMemoryFileIndex entries — absolute paths and
  *    path counts vary with fixture layout and temp dirs;
  *  - truncation ellipses after Location (SimpleMode clips long lines);
  *  - sizes/rowcounts inside `Statistics(...)` (AQE-estimated).
  */
object PlanSnapshot {

  def physicalPlan(df: DataFrame): String =
    normalize(df.queryExecution.explainString(SimpleMode))

  def normalize(plan: String): String =
    plan.linesIterator
      .map { l =>
        l.replaceAll("#\\d+", "#N")
          // JVM-run-specific identities on typed-API lambdas and
          // reference objects: Lambda$123/0x7f..@1a2b3c
          .replaceAll("Lambda\\$\\d+/0x[0-9a-fA-F]+", "Lambda\\$N")
          .replaceAll("@[0-9a-fA-F]{6,}", "@N")
          .replaceAll("plan_id=\\d+", "plan_id=N")
          .replaceAll("Statistics\\([^)]*\\)", "Statistics(X)")
          .replaceAll("InMemoryFileIndex\\([^)]*\\)", "InMemoryFileIndex(X)")
          .replaceAll("\\[file:[^\\]]*\\]?", "[file:X]")
          .replaceAll("file:[^\\s,\\]\\)]+", "file:X")
          // SimpleMode clips scan lines at 100 chars mid-token; the clip
          // point moves with path length, so drop everything after the
          // location marker on scan lines
          .replaceAll("Location: .*", "Location: X")
          .replaceAll("\\s+$", "")
      }
      .mkString("\n")
      .trim
}
