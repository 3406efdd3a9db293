package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sparse-vector (svec) family — the engine's analogue of the reference's
  * `gp_sparse_vector` contrib type
  * (`/root/reference/gpcontrib/gp_sparse_vector/sparse_vector.h`,
  * `operators.c`, SQL surface `gp_sparse_vector--1.0.1.sql`).
  *
  * The reference stores svec as RLE-compressed runs; the columnar-native
  * encoding here is `struct<dim int, idx array<int>, vals array<double>>`
  * with `idx` strictly ascending and only non-zero values kept — the same
  * information, shaped so Parquet dictionary/RLE encoding does the
  * compression and Catalyst prunes/pushes through it like any struct.
  *
  * Scalar ops (`sparsify`, norms, `toDense`, elementwise `plus`) are
  * composed from codegen-friendly higher-order functions; the hot kernel —
  * sparse dot product (`%*%` / `dot(svec, svec)` in the reference) — is a
  * native expression with whole-stage codegen doing the classic two-pointer
  * merge over the ascending index lists, so a 1%-dense vector pair costs
  * O(nnz) rather than O(dim).
  */
case class SparseDot(aIdx: Expression, aVals: Expression,
                     bIdx: Expression, bVals: Expression)
    extends QuaternaryExpression {

  override def first: Expression = aIdx
  override def second: Expression = aVals
  override def third: Expression = bIdx
  override def fourth: Expression = bVals

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(aIdx, bIdx).forall(_.dataType match {
      case ArrayType(IntegerType, _) => true; case _ => false
    }) && Seq(aVals, bVals).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true; case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<int>, array<double>) x2, got " +
        children.map(_.dataType.simpleString).mkString(", "))
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "svec_dot"

  override def nullSafeEval(ai: Any, av: Any, bi: Any, bv: Any): Any = {
    val xi = ai.asInstanceOf[ArrayData].toIntArray()
    val xv = av.asInstanceOf[ArrayData].toDoubleArray()
    val yi = bi.asInstanceOf[ArrayData].toIntArray()
    val yv = bv.asInstanceOf[ArrayData].toDoubleArray()
    var i = 0; var j = 0; var s = 0.0
    while (i < xi.length && j < yi.length) {
      val d = xi(i) - yi(j)
      if (d == 0) { s += xv(i) * yv(j); i += 1; j += 1 }
      else if (d < 0) i += 1
      else j += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (ai, av, bi, bv) => {
      val xi = ctx.freshName("xi"); val xv = ctx.freshName("xv")
      val yi = ctx.freshName("yi"); val yv = ctx.freshName("yv")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      s"""
         |int[] $xi = $ai.toIntArray();
         |double[] $xv = $av.toDoubleArray();
         |int[] $yi = $bi.toIntArray();
         |double[] $yv = $bv.toDoubleArray();
         |int $i = 0; int $j = 0; double $s = 0.0;
         |while ($i < $xi.length && $j < $yi.length) {
         |  if ($xi[$i] == $yi[$j]) { $s += $xv[$i] * $yv[$j]; $i++; $j++; }
         |  else if ($xi[$i] < $yi[$j]) { $i++; } else { $j++; }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      a: Expression, b: Expression, c: Expression, d: Expression): Expression =
    copy(aIdx = a, aVals = b, bIdx = c, bVals = d)
}

object SparseFns {
  /** Register `svec_dot(aIdx, aVals, bIdx, bVals)` for SQL/expr use.
    * Idempotent (same WARN-avoidance discipline as [[VectorFns.register]]). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("svec_dot")))
      reg.createOrReplaceTempFunction(
        "svec_dot", exprs => SparseDot(exprs(0), exprs(1), exprs(2), exprs(3)),
        "built-in")
  }

  /** Dense `array<double>` column -> svec struct, dropping |x| <= eps.
    * (The reference casts float8[] -> svec via `svec_cast_float8arr`,
    * dropping exact zeros; eps generalizes that for ML embeddings where
    * "background" values are small-but-nonzero.) */
  def sparsify(dense: String, eps: Double): Column = {
    val nz = s"filter(transform($dense, (x, i) -> named_struct('i', i, 'x', x)), " +
      s"p -> abs(p.x) > $eps)"
    struct(
      expr(s"size($dense)").as("dim"),
      expr(s"transform($nz, p -> p.i)").as("idx"),
      expr(s"transform($nz, p -> cast(p.x as double))").as("vals"))
  }

  /** svec -> dense array<double> (`svec_return_array`).
    *
    * COST NOTE: higher-order lambdas don't hoist loop-invariant
    * subexpressions, so the map literal is rebuilt per output element —
    * O(dim x nnz) per row. Fine for the audit/test surface this serves;
    * the hot path is [[SparseDot]], which never densifies. A bulk
    * densify at scale should stage `map_from_arrays` in its own column
    * and transform over that. */
  def toDense(svec: String): Column =
    expr(s"transform(sequence(0, $svec.dim - 1), " +
      s"d -> coalesce(element_at(map_from_arrays($svec.idx, $svec.vals), d), 0d))")

  /** `l1norm(svec)` — zeros contribute nothing, so only vals are read. */
  def l1norm(svec: String): Column =
    expr(s"aggregate($svec.vals, 0d, (a, y) -> a + abs(y))")

  /** `l2norm(svec)`. */
  def l2norm(svec: String): Column =
    sqrt(expr(s"aggregate($svec.vals, 0d, (a, y) -> a + y * y)"))

  /** Non-zero count (`svec_count` / the per-vector view of count_vec). */
  def nnz(svec: String): Column = expr(s"size($svec.idx)")

  /** Elementwise sum of two svecs (`svec_plus` / `+`): key-union via
    * map_zip_with, then re-canonicalize (ascending idx, zeros dropped —
    * a + (-a) annihilates like the reference's sparse add). Same cost
    * note as [[toDense]]: the zipped map is re-derived inside each
    * lambda (O(nnz^2) per row) — correct and fine at the demo/spec
    * surface; a scale path would stage the map once or merge in a
    * custom expression like [[SparseDot]]. */
  def plus(a: String, b: String): Column = {
    val m = s"map_zip_with(map_from_arrays($a.idx, $a.vals), " +
      s"map_from_arrays($b.idx, $b.vals), " +
      s"(k, x, y) -> coalesce(x, 0d) + coalesce(y, 0d))"
    val keys = s"filter(array_sort(map_keys($m)), k -> element_at($m, k) != 0d)"
    struct(
      expr(s"greatest($a.dim, $b.dim)").as("dim"),
      expr(keys).as("idx"),
      expr(s"transform($keys, k -> element_at($m, k))").as("vals"))
  }
}
