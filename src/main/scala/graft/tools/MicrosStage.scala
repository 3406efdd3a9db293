package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B measurement for the r17 long-micros overflow sweep: the q1
  * pricing-summary shape (4 dsum + 3 davg + count over 600M-row-class
  * lineitem) with its money sums staged as
  *   A. `sum(LONG micros)`            — the r1-r16 default; overflows
  *      2^63 when a (per-group) sum passes ~9.2e18, measured 3.45x OVER
  *      at the fifth decade for a GLOBAL extendedprice sum and only
  *      0.58x under per q1 group — negative headroom at sf1000;
  *   B. `sum(micros cast decimal(38,0))` — 128-bit staging, the q11 fix
  *      (TpchSynth.scala q11) applied to the shared helper. Never
  *      overflows at any conceivable corpus size (1e38 headroom).
  *
  * The r16 scaladoc's "~3x decimal penalty" (Tables.scala) was measured
  * against a FULL DecimalType(28,6) pipeline — per-row decimal
  * multiplies feeding a decimal accumulator. Variant B keeps every
  * per-row op in long/double codegen and pays decimal only in the
  * accumulator, which is a different (much smaller) cost. This tool
  * decides the r17 default: if B/A <= ~1.1 the helper flips and the
  * class dies everywhere; otherwise the per-site headroom audit stands.
  *
  * Usage: runMain graft.tools.MicrosStage [sfDir] [runs]
  */
object MicrosStage {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/.scale/probe_sf0.01_x1000")
    val runs = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def micros(c: org.apache.spark.sql.Column) =
      round(c * 1000000.0, 0).cast("long")
    def dsumLong(c: org.apache.spark.sql.Column) =
      sum(micros(c)).cast("double") / 1000000.0
    def dsumDec(c: org.apache.spark.sql.Column) =
      sum(micros(c).cast("decimal(38,0)")).cast("double") / 1000000.0

    // C. limb-split: stage each micros long as three 22-bit limbs, sum
    // each limb as a plain long (overflow only past 2^41 rows/group),
    // recombine exactly in decimal(38,0) on the tiny FINAL rows. All
    // per-row work stays in whole-stage long codegen; the decimal cost
    // is O(groups), not O(rows).
    def dsumSplit(c: org.apache.spark.sql.Column) = {
      val v = micros(c)
      val s0 = sum(v.bitwiseAND(lit(0x3FFFFFL)))
      val s1 = sum(shiftright(v, 22).bitwiseAND(lit(0x3FFFFFL)))
      val s2 = sum(shiftright(v, 44))
      ((s2.cast("decimal(38,0)") * lit(4398046511104L) +
        s1.cast("decimal(38,0)") * lit(4194304L) +
        s0.cast("decimal(38,0)")).cast("double") / 1000000.0)
    }

    // D. 2-limb split (r17b): for MAGNITUDE-BOUNDED inputs (every dsum
    // money/quantity column: |value| < 1e7 => |micros| < 1e13 < 2^44,
    // so the signed high limb is < 2^22 per row and its sum holds to
    // ~2^41 rows/group — the SAME capacity as the 3-limb form) one
    // limb extraction and one sum buffer fewer. Matters where Expand
    // multiplies agg buffers (multi-distinct shapes).
    def dsumSplit2(c: org.apache.spark.sql.Column) = {
      val v = micros(c)
      val s0 = sum(v.bitwiseAND(lit(0x3FFFFFL)))
      val s1 = sum(shiftright(v, 22))
      ((s1.cast("decimal(38,0)") * lit(4194304L) +
        s0.cast("decimal(38,0)")).cast("double") / 1000000.0)
    }

    def q1(ds: org.apache.spark.sql.Column => org.apache.spark.sql.Column): DataFrame =
      graft.Tables.t(spark, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          ds(col("l_quantity")).as("sum_qty"),
          ds(col("l_extendedprice")).as("sum_base_price"),
          ds(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
          ds(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).as("sum_charge"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))

    // The multi-DQA shape (q_agg_multi_distinct): ExpandExec multiplies
    // rows 4x and every expanded row carries the sum's agg buffers, so
    // limb count is amplified here like nowhere else — the r17 paired
    // bench A/B read the 3-limb flip at 1.31x on this lane (vs 1.05x
    // on q1), which this shape isolates.
    def mdqa(ds: org.apache.spark.sql.Column => org.apache.spark.sql.Column): DataFrame =
      graft.Tables.t(spark, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_partkey")).as("nd_part"),
          countDistinct(col("l_suppkey")).as("nd_supp"),
          countDistinct(col("l_orderkey"), col("l_linenumber")).as("nd_line"),
          count(lit(1)).as("n"),
          ds(col("l_quantity")).as("sum_qty"))
        .orderBy(col("l_returnflag"))

    // warm file listing / page cache outside the timed region
    graft.Tables.t(spark, dir, "lineitem").limit(1).collect()

    val variants = Seq("long" -> dsumLong _, "dec38" -> dsumDec _,
      "split" -> dsumSplit _, "split2" -> dsumSplit2 _)
    val shapes = Seq("q1" -> q1 _, "mdqa" -> mdqa _)
    // interleave A,B,A,B so ambient drift hits both arms equally
    val times = collection.mutable.Map[String, List[Double]]()
    for (_ <- 1 to runs; (sname, shape) <- shapes; (name, f) <- variants) {
      val t0 = System.nanoTime()
      val rows = shape(f).collect()
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[micros-stage] $sname/$name: $dt%.2f s (${rows.length} groups)")
      times(s"$sname/$name") = dt :: times.getOrElse(s"$sname/$name", Nil)
    }
    val mins = shapes.flatMap { case (sname, _) =>
      variants.map { case (vname, _) =>
        f""""$sname/$vname":${times(s"$sname/$vname").min}%.3f""" }
    }
    println(s"""{"probe":"micros_stage","dir":"$dir",${mins.mkString(",")}}""")
    spark.stop()
  }
}
