package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** User-defined aggregates — the `CREATE AGGREGATE` surface
  * (`/root/reference/src/include/catalog/pg_aggregate.h:50`: transfn =
  * `reduce`, combinefn = `merge`, finalfn = `finish`; Spark's Aggregator is
  * the same three-function contract, distributed partial/final for free).
  */
object Aggregators {

  /** Exact interpolated median (reference: `percentile_cont` /
    * GP `median`, `/root/reference/src/backend/utils/adt/orderedsetaggs.c:423`,
    * `pg_proc.dat:11586`). Sort-based finish; buffers merge by
    * concatenation, so partial aggregation still runs map-side. Memory is
    * O(group size) — the same cost the reference pays in tuplesort; for
    * sketch-bounded memory use approx_percentile instead. */
  object ExactMedian extends Aggregator[Double, Array[Double], Double] {
    override def zero: Array[Double] = Array.empty
    override def reduce(b: Array[Double], a: Double): Array[Double] = b :+ a
    override def merge(b1: Array[Double], b2: Array[Double]): Array[Double] = b1 ++ b2
    override def finish(b: Array[Double]): Double = {
      if (b.isEmpty) return Double.NaN
      val s = b.sorted
      val n = s.length
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }
    override def bufferEncoder: Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Weighted average with exact decimal accumulation (order-independent,
    * so the distributed merge tree matches a sequential oracle exactly).
    * The classic CREATE AGGREGATE example
    * (`/root/reference/src/test/regress/sql/create_aggregate.sql`). */
  case class WeightedAccum(num: BigDecimal, den: BigDecimal)
  object WeightedAvg
      extends Aggregator[(Double, Double), WeightedAccum, Double] {
    private val scale = 6
    private def d(x: Double): BigDecimal =
      BigDecimal(x).setScale(scale, BigDecimal.RoundingMode.HALF_UP)
    override def zero: WeightedAccum = WeightedAccum(BigDecimal(0), BigDecimal(0))
    override def reduce(b: WeightedAccum, a: (Double, Double)): WeightedAccum =
      WeightedAccum(b.num + d(a._1) * d(a._2), b.den + d(a._2))
    override def merge(x: WeightedAccum, y: WeightedAccum): WeightedAccum =
      WeightedAccum(x.num + y.num, x.den + y.den)
    override def finish(b: WeightedAccum): Double =
      if (b.den == 0) Double.NaN
      else BigDecimal(b.num.toDouble / b.den.toDouble)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    override def bufferEncoder: Encoder[WeightedAccum] = Encoders.product[WeightedAccum]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
