package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Codebook kernels for the quantization lanes (PQ / IVF).
  *
  * The quantization queries need per-row argmins and distance LUTs against
  * a trained codebook (PQ: 8 subspaces x 16 centroids x 8 dims; IVF: 8
  * centroids x 64 dims — the reference niche is a vector index scan, e.g.
  * ivfflat's list probing). Unrolling the codebook into literal
  * sub-expressions (one `array(lit...)` per centroid) builds expression
  * trees of thousands of nodes; analysis, optimization, and Janino
  * compilation then dominate wall time at ANY corpus size — and every
  * Lloyd iteration re-pays the cost because the literal values change.
  * Measured on the s_ann_pq_adc lane at sf0.1 (2k vectors): 8.2 s total,
  * nearly all of it fixed plan overhead.
  *
  * These expressions instead take the codebook as ONE flattened
  * array<double> literal — a single reference object in generated code —
  * and run the kernel as a tight primitive loop. Same math in the same
  * order as the unrolled form (distance = |c|^2 - 2 v_m . c with the
  * centroid norm pre-summed left-to-right, dot accumulated ascending,
  * argmin ties to the lowest index), so outputs are bit-identical; the
  * plan shrinks from ~2k expression nodes to 3.
  *
  * Layout contract: `cb` is the M x K x SUB codebook flattened row-major
  * (subspace-major, then centroid, then dimension); the input vector has
  * M*SUB elements, subspace m owning elements [m*SUB, (m+1)*SUB).
  */
abstract class CodebookKernel extends Expression {
  def children: Seq[Expression]

  protected def vChild: Expression = children.head

  override def nullable: Boolean = vChild.nullable
  override def foldable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = {
    val vOk = vChild.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    val cbOk = children(1).dataType match {
      case ArrayType(DoubleType, _) => children(1).foldable
      case _ => false
    }
    val dimsOk = children.drop(2).forall(c => c.foldable && c.dataType == IntegerType)
    if (vOk && cbOk && dimsOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<double> v, foldable array<double> cb, " +
        "foldable int m, foldable int k, foldable int sub)")
  }

  @transient protected lazy val M: Int =
    children(2).eval(null).asInstanceOf[Int]
  @transient protected lazy val K: Int =
    children(3).eval(null).asInstanceOf[Int]
  @transient protected lazy val SUB: Int =
    children(4).eval(null).asInstanceOf[Int]
  @transient protected lazy val cb: Array[Double] =
    children(1).eval(null).asInstanceOf[ArrayData].toDoubleArray()
  /** Pre-summed centroid norms, index mi*K + ki — the same left-to-right
    * `c.map(x*x).sum` the unrolled literal form used. */
  @transient protected lazy val norms: Array[Double] = {
    val out = new Array[Double](M * K)
    var mk = 0
    while (mk < M * K) {
      var s = 0.0
      var j = 0
      while (j < SUB) { s += cb(mk * SUB + j) * cb(mk * SUB + j); j += 1 }
      out(mk) = s
      mk += 1
    }
    out
  }

  /** The per-row kernel; input is the non-null vector ArrayData. */
  def kernel(v: ArrayData): Any

  override def eval(input: InternalRow): Any = {
    val v = vChild.eval(input)
    if (v == null) null else kernel(v.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // one reference object + one virtual call per row: the codebook loop
    // itself is JIT-compiled Scala, not Janino output, so the generated
    // method stays tiny no matter the codebook size
    val refName = ctx.addReferenceObj("cbKernel", this, getClass.getName)
    val childGen = vChild.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(code = code"""
      ${childGen.code}
      boolean ${ev.isNull} = ${childGen.isNull};
      $javaType ${ev.value} = null;
      if (!${ev.isNull}) {
        ${ev.value} = ($javaType) $refName.kernel(${childGen.value});
      }""")
  }
}

/** `pq_encode(v, cb, m, k, sub)` -> array<int> of `m` argmin codes. With
  * m = 1 this is the IVF cell assignment (argmin centroid of the whole
  * vector). */
case class PqEncodeExpr(children: Seq[Expression]) extends CodebookKernel {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  override def kernel(v: ArrayData): Any = {
    val x = v.toDoubleArray()
    val out = new Array[Int](M)
    var mi = 0
    while (mi < M) {
      var best = Double.PositiveInfinity
      var bi = 0
      var ki = 0
      while (ki < K) {
        var dot = 0.0
        val cbase = (mi * K + ki) * SUB
        val vbase = mi * SUB
        var j = 0
        while (j < SUB) { dot += x(vbase + j) * cb(cbase + j); j += 1 }
        val d = norms(mi * K + ki) - 2.0 * dot
        // strict <: exact ties keep the lowest code, matching the
        // struct(dist, idx) array_min of the unrolled form
        if (d < best) { best = d; bi = ki }
        ki += 1
      }
      out(mi) = bi
      mi += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}

/** `pq_luts(v, cb, m, k, sub)` -> array<array<double>>: per subspace, the
  * `k` ranking terms `|c|^2 - 2 v_m . c` (the row's own |v_m|^2 is
  * constant per row and drops out of every ranking). With m = 1 this is
  * the per-centroid distance vector used for IVF probe selection. */
case class PqLutsExpr(children: Seq[Expression]) extends CodebookKernel {
  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
  override def prettyName: String = "pq_luts"

  override def kernel(v: ArrayData): Any = {
    val x = v.toDoubleArray()
    val out = new Array[ArrayData](M)
    var mi = 0
    while (mi < M) {
      val lut = new Array[Double](K)
      var ki = 0
      while (ki < K) {
        var dot = 0.0
        val cbase = (mi * K + ki) * SUB
        val vbase = mi * SUB
        var j = 0
        while (j < SUB) { dot += x(vbase + j) * cb(cbase + j); j += 1 }
        lut(ki) = norms(mi * K + ki) - 2.0 * dot
        ki += 1
      }
      out(mi) = new GenericArrayData(lut)
      mi += 1
    }
    new GenericArrayData(out.asInstanceOf[Array[Any]])
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}

object PqFns {
  /** Register `pq_encode` / `pq_luts`. Idempotent, same guard discipline
    * as [[VectorFns.register]]. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("pq_encode"))) {
      reg.createOrReplaceTempFunction(
        "pq_encode", exprs => PqEncodeExpr(exprs), "built-in")
      reg.createOrReplaceTempFunction(
        "pq_luts", exprs => PqLutsExpr(exprs), "built-in")
    }
  }
}
