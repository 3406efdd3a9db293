package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** jsonb mutation surface — `jsonb_set` / `jsonb_insert` /
  * `jsonb_delete_path` (`#-`), the reference's document-patching family
  * (`/root/reference/src/backend/utils/adt/jsonfuncs.c:4446+` setPath /
  * setPathObject / setPathArray; SQL surface `pg_proc.dat:9348`; behavior
  * shapes from `src/test/regress/sql/jsonb.sql:1100-1150`).
  *
  * Mapping: jsonb documents are dynamically typed; the Spark-first
  * equivalent is `from_json(schema)` -> structural Column edits ->
  * `to_json`, with object steps as nested `withField`/`dropFields`
  * (dotted paths) and array steps as the index-aware combinators below.
  * Paths are therefore compile-time (the schema is), which is the same
  * trade the rest of the JSON surface makes; the reference's RUNTIME
  * semantics — negative indices counting from the end, create-if-missing
  * appending/prepending on out-of-range, delete ignoring out-of-range —
  * are preserved per-row at execution time. Everything stays inside
  * whole-stage codegen: transform/slice/concat, no UDFs, no shuffle.
  */
object JsonbMut {

  /** `jsonb_set(doc, '{..., i}', v)` on an array level: replace the
    * element at `idx` (negative counts from the end, setPathArray's
    * `idx += nelems`). Out of range with `createMissing`: negative
    * prepends, positive appends (jsonb.sql:1140-1144); without it the
    * array is returned unchanged. */
  def arraySet(arr: Column, idx: Int, v: Column,
               createMissing: Boolean = true): Column = {
    val n = size(arr)
    val eff = if (idx < 0) n + idx else lit(idx)
    val replaced = transform(arr, (x, j) => when(j === eff, v).otherwise(x))
    if (createMissing)
      when(eff >= 0 && eff < n, replaced)
        .when(lit(idx < 0), concat(array(v), arr))
        .otherwise(concat(arr, array(v)))
    else
      when(eff >= 0 && eff < n, replaced).otherwise(arr)
  }

  /** `jsonb_insert(doc, '{..., i}', v [, after])`: insert before (default)
    * or after the element at `idx`; negative indices count from the end;
    * the landing slot clamps to the array bounds. */
  def arrayInsert(arr: Column, idx: Int, v: Column,
                  after: Boolean = false): Column = {
    val n = size(arr)
    val base = if (idx < 0) n + idx else lit(idx)
    val eff = greatest(lit(0), least(n, if (after) base + 1 else base))
    concat(slice(arr, lit(1), eff), array(v), slice(arr, eff + 1, n - eff))
  }

  /** `doc #- '{..., i}'` on an array level: drop the element at `idx`
    * (negative from the end); out of range returns the array unchanged
    * (setPathArray's delete no-op). */
  def arrayDelete(arr: Column, idx: Int): Column = {
    val n = size(arr)
    val eff = if (idx < 0) n + idx else lit(idx)
    when(eff >= 0 && eff < n,
      filter(arr, (_, j) => j =!= eff)).otherwise(arr)
  }

  /** `jsonb_set(doc, '{a,b,...}', v)` on object levels: nested replace,
    * or create-if-missing key append (withField adds new fields at the
    * end, matching jsonb_set's add-at-path). */
  def objectSet(doc: Column, dottedPath: String, v: Column): Column =
    doc.withField(dottedPath, v)

  /** `doc #- '{a,b,...}'` on object levels: nested key removal. */
  def objectDelete(doc: Column, dottedPaths: String*): Column =
    doc.dropFields(dottedPaths: _*)
}
