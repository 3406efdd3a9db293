package graft

import java.sql.{Date, Timestamp}
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Generative round-trip for the COPY BINARY codec: random rows across
  * every supported type — unicode strings, NULLs anywhere, dates far from
  * the PG epoch, timestamps BEFORE 1970 with sub-millisecond micros (the
  * sign/normalization corner of the epoch arithmetic) — must survive
  * write+read bit-exactly. Deterministic seed: failures reproduce. */
class CopyBinaryPropSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val genRow: Gen[(Long, Option[Int], Option[Double], Option[String],
                           Option[Boolean], Option[Date], Option[Timestamp])] =
    for {
      id <- Gen.chooseNum(Long.MinValue + 1, Long.MaxValue)
      i  <- Gen.option(Gen.chooseNum(Int.MinValue, Int.MaxValue))
      d  <- Gen.option(Gen.frequency(
              4 -> Gen.chooseNum(-1e12, 1e12),
              1 -> Gen.oneOf(0.0, -0.0, Double.MinPositiveValue,
                             Double.MaxValue, -Double.MaxValue)))
      s  <- Gen.option(Gen.oneOf(
              Gen.asciiPrintableStr,
              Gen.const("naïve — ünïcode ✓ é中文"),
              Gen.const("")))
      b  <- Gen.option(Gen.oneOf(true, false))
      dt <- Gen.option(Gen.chooseNum(-40000L, 40000L) // ~1860..2079
              .map(days => Date.valueOf(java.time.LocalDate.ofEpochDay(days))))
      ts <- Gen.option(Gen.chooseNum(-3000000000000000L, 3000000000000000L)
              .map { micros => // ±95 years, sub-ms precision, incl. pre-1970
                val t = new Timestamp(Math.floorDiv(micros, 1000000L) * 1000L)
                t.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
                t
              })
    } yield (id, i, d, s, b, dt, ts)

  test("random rows of every supported type round-trip bit-exactly") {
    val sp = spark; import sp.implicits._
    val rows = Gen.listOfN(300, genRow)
      .apply(Gen.Parameters.default, Seed(42L))
      .getOrElse(fail("generator exhausted"))
    val df = rows.toDF("id", "i", "d", "s", "b", "dt", "ts").repartition(3)
    val dir = java.nio.file.Files.createTempDirectory("copybin_prop").toString
    graft.sources.CopyBinary.write(df, dir)
    val back = graft.sources.CopyBinary.read(spark, dir, df.schema)
    assert(back.schema == df.schema)
    // compare on double BITS so -0.0 and extreme values are exact
    def canon(r: org.apache.spark.sql.Row): Seq[Any] =
      r.toSeq.map {
        case x: Double => java.lang.Double.doubleToLongBits(x)
        case x => x
      }
    assert(back.collect().map(canon).toSet == df.collect().map(canon).toSet)
  }
}
