package graft

import org.apache.spark.sql.SparkSession

/** Shared fixture + engine lanes for the fuzzing suites
  * ([[FuzzParitySpec]] differential, [[TlpFuzzSpec]] metamorphic).
  *
  * Lane A "stock": plain Catalyst, whole-stage codegen on, 32 shuffle
  * partitions. Lane B "graft": every injected optimizer rule installed
  * and enabled, codegen forced OFF (interpreted expression paths), and
  * a different shuffle partitioning. The differential spec compares the
  * lanes against each other; the TLP spec checks each lane against a
  * logic invariant — catching bugs BOTH lanes share.
  *
  * Both lanes also register the graft scalar surface (hstore) so the
  * grammars can fuzz over custom-Expression kernels' codegen vs
  * interpreted paths.
  */
object FuzzLanes {

  lazy val (stock, graft): (SparkSession, SparkSession) = {
    val a = SparkTestSession.spark.newSession()
    val b = SparkTestSession.spark.newSession()
    plans.EagerAggRule.install(b)
    plans.PushJoinBelowUnionAllRule.install(b)
    plans.OrExpansionRule.install(b)
    plans.RangeBinJoinRule.install(b)
    b.conf.set("spark.graft.eagerAgg.enabled", "true")
    b.conf.set("spark.graft.pushJoinBelowUnionAll.enabled", "true")
    b.conf.set("spark.graft.orExpansion.enabled", "true")
    b.conf.set(plans.RangeBinJoinRule.ConfKey, "10.0")
    b.conf.set("spark.sql.codegen.wholeStage", "false")
    b.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    b.conf.set("spark.sql.shuffle.partitions", "5")
    val rnd = new scala.util.Random(42)
    def dbl(i: Int): java.lang.Double = (i % 19) match {
      case 0 => Double.NaN
      case 1 => Double.PositiveInfinity
      case 2 => Double.NegativeInfinity
      case 3 => null
      case 4 => -0.0
      case _ => math.round(rnd.nextDouble() * 2000 - 1000) / 10.0
    }
    def dec(i: Int): java.math.BigDecimal = (i % 13) match {
      case 0 => null
      case 1 => new java.math.BigDecimal("9999999999.99")
      case 2 => new java.math.BigDecimal("-9999999999.99")
      case 3 => java.math.BigDecimal.ZERO.setScale(2)
      case 4 => new java.math.BigDecimal("-0.01")
      case _ => new java.math.BigDecimal(rnd.nextInt(200000))
        .movePointLeft(2)
    }
    def str(i: Int): String = (i % 11) match {
      case 0 => null
      case 1 => ""
      case 2 => " "
      case 3 => "café"
      case 4 => "%_%"
      case _ => "s" + rnd.nextInt(40)
    }
    val fact = (0 until 300).map { i =>
      // k1 skewed: most rows share few keys
      (i, if (i % 3 == 0) 7 else rnd.nextInt(25),
        if (i % 29 == 0) null else Integer.valueOf(rnd.nextInt(12)),
        dbl(i), dec(i), str(i))
    }
    val bands = (0 until 40).map { i =>
      (rnd.nextInt(25),
        dbl(i * 5 + 3), // lo reuses the edge-value cycle
        dbl(i * 7 + 1),
        dec(i))
    }
    def reg(s: SparkSession): Unit = {
      import s.implicits._
      functions.HstoreFns.register(s)
      fact.toDF("id", "k1", "k2", "v", "d", "s").createOrReplaceTempView("f")
      bands.toDF("k", "lo", "hi", "w").createOrReplaceTempView("b")
    }
    reg(a); reg(b)
    (a, b)
  }

  def rows(s: SparkSession, sql: String): Seq[String] =
    s.sql(sql).collect().map(_.toString).sorted.toSeq
}
