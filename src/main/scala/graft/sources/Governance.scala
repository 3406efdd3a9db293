package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Row-level security + column masking — the reference's CREATE POLICY
  * machinery (`/root/reference/src/backend/commands/policy.c`; RLS
  * enforcement `src/backend/rewrite/rowsecurity.c`) re-expressed as
  * predicate/projection rewriting, which is exactly what the reference's
  * rewriter does: policies become quals injected ahead of the user
  * query, so every downstream operator (and the optimizer: pushdown,
  * partition pruning) sees them as ordinary filters.
  *
  * PG combination semantics, preserved precisely (GovernanceSpec):
  * PERMISSIVE policies OR together, RESTRICTIVE policies AND onto that,
  * RLS-enabled with no applicable permissive policy is DEFAULT-DENY,
  * and BYPASSRLS reads the table unfiltered. Masking mirrors column
  * privileges: unprivileged readers see the mask expression, never the
  * column — applied as a projection so a masked column's real values
  * cannot leak through any downstream expression.
  */
object Governance {

  /** One policy: `usingSql` is the qual (may reference table columns);
    * restrictive policies AND, permissive policies OR (PG's
    * CREATE POLICY ... AS { PERMISSIVE | RESTRICTIVE }). */
  final case class RowPolicy(name: String, usingSql: String,
                             restrictive: Boolean = false)

  /** Apply RLS to `df`. `bypass` models BYPASSRLS/table-owner reads. */
  def applyPolicies(df: DataFrame, policies: Seq[RowPolicy],
                    bypass: Boolean = false): DataFrame = {
    if (bypass) return df
    val (restrictive, permissive) = policies.partition(_.restrictive)
    // RLS enabled + no permissive policy grants nothing: default deny
    val grant = permissive.map(p => expr(p.usingSql))
      .reduceOption(_ || _).getOrElse(lit(false))
    val restrict = restrictive.map(p => expr(p.usingSql))
      .reduceOption(_ && _).getOrElse(lit(true))
    df.filter(grant && restrict)
  }

  /** Column masking: each (column -> maskSql) replaces the column's
    * values for readers without the column privilege. */
  def withMasks(df: DataFrame, masks: Map[String, String]): DataFrame =
    masks.foldLeft(df) { case (d, (c, m)) => d.withColumn(c, expr(m)) }
}
