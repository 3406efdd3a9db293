package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Empirical spot-proof of the SCALING.md headroom-table projection at
  * its RISKIEST row (r17 verdict brief #6): q1's per-group charge-micros
  * sum at sf1000, projected 2.87e19 — 3.1x OVER the 2^63 long capacity
  * (the row that made the r17 lsum128 sweep a latent-crash removal, not
  * a refactor). The table projects linearly from sf0.01 measurements;
  * this probe replays the projection point itself: one group of
  * sf1000's per-group row count (6e9 lineitem / 4 return-flag groups =
  * 1.5e9 rows) at the real per-row charge-micros magnitude, with a
  * closed-form expected sum, and proves
  *
  *   1. `sum(LONG)` THROWS (ANSI arithmetic overflow — the engine-wide
  *      crash the sweep removed; partials of n/32 rows stay under 2^63,
  *      so the overflow fires at final merge, exactly the at-scale
  *      failure mode);
  *   2. [[graft.Tables.lsum128b]] returns the EXACT closed-form value at
  *      the same point (decimal(38,0) recombination of two long limb
  *      sums — both limb accumulators hold with >10^3 margin at 1.5e9
  *      rows, consistent with the documented ~2^41 rows/group capacity);
  *   3. the full [[graft.Tables.dsum]] path (double input, micros
  *      rounding, limb sum, double divide-back) lands on the same value
  *      bit-for-bit with the mirrored Scala computation.
  *
  * The value pattern v(i) = BASE + (i mod K) micros keeps per-row
  * magnitude at the true charge scale (~1.9e10 micros = $19,133 average
  * charge) while making the exact sum computable without any 128-bit
  * aggregation: E = n*BASE + (n/K) * K(K-1)/2.
  *
  * Usage: runMain graft.tools.HeadroomProbe [nRows]
  * Prints one JSON line; exits nonzero on any failed check.
  */
object HeadroomProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1500000000L) // 1.5e9
    val base = 19133333333L // per-row charge micros at the q1 average
    val k = 1000L
    require(n % k == 0, s"n=$n must be a multiple of K=$k for the closed form")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // explicit: check 1 relies on ANSI overflow (the loud failure mode
      // the scaladoc cites); Spark 4 defaults it on, pin it anyway
      .config("spark.sql.ansi.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val expected: BigInt =
      BigInt(n) * BigInt(base) + BigInt(n / k) * (BigInt(k) * (k - 1) / 2)
    System.err.println(s"[headroom] n=$n base=$base expected=$expected " +
      f"(${expected.toDouble / 9.223372036854776e18}%.2fx of 2^63)")

    val rows = spark.range(n)
      .select((lit(base) + pmod(col("id"), lit(k))).as("v"))

    // 1. the pre-sweep staging: plain long sum THROWS at this point
    val t0 = System.nanoTime()
    val overflowed =
      try { rows.agg(sum(col("v"))).collect(); false }
      catch { case e: Throwable =>
        val m = Option(e.getMessage).getOrElse("")
        m.toLowerCase.contains("overflow") || m.contains("ARITHMETIC")
      }
    val tOverflow = (System.nanoTime() - t0) / 1e9

    // 2. the limb-split accumulator is exact at the same point
    val t1 = System.nanoTime()
    val got = rows.agg(graft.Tables.lsum128b(col("v")).as("s"))
      .head.getDecimal(0)
    val tLimb = (System.nanoTime() - t1) / 1e9
    val limbExact = BigInt(got.toBigInteger) == expected

    // 3. end-to-end dsum on the DOUBLE face of the same column (micros
    // rounding recovers v exactly: <= 6 true sub-unit digits by
    // construction), vs the mirrored double conversion of E
    val t2 = System.nanoTime()
    val gotD = rows.select((col("v").cast("double") / 1000000.0).as("x"))
      .agg(graft.Tables.dsum(col("x")).as("s")).head.getDouble(0)
    val tDsum = (System.nanoTime() - t2) / 1e9
    val expD = new java.math.BigDecimal(expected.bigInteger)
      .doubleValue / 1000000.0
    val dsumExact = gotD == expD

    println(s"""{"probe":"headroom","n":$n,"base":$base,""" +
      s""""expected":"$expected","sum_long_overflowed":$overflowed,""" +
      s""""lsum128b_exact":$limbExact,"lsum128b_value":"${got.toBigInteger}",""" +
      f""""dsum_exact":$dsumExact,"dsum_value":$gotD%.6f,""" +
      f""""sec_overflow":$tOverflow%.1f,"sec_lsum128b":$tLimb%.1f,""" +
      f""""sec_dsum":$tDsum%.1f}""")
    spark.stop()
    if (!(overflowed && limbExact && dsumExact)) sys.exit(1)
  }
}
