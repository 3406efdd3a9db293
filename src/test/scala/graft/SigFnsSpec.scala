package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The one-pass signature kernels must equal the shuffle-based DataFrame
  * formulas they replaced, bit for bit, document by document. */
class SigFnsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  private def corpus: DataFrame = {
    val sp = spark; import sp.implicits._
    Tables.t(spark, sf, "documents").select("doc_id", "text")
      .unionByName(Seq(
        (100001L, "one two three four"),
        (100002L, "two words"),
        (100003L, "a  b c"),          // consecutive spaces -> empty word
        (100004L, " leading and trailing "),
        (100005L, "xxxxx"),
        (100006L, "tab\tstays inside one word here"))
        .toDF("doc_id", "text"))
  }

  test("minhash16 equals the explode+groupBy minhash formula") {
    graft.functions.SigFns.register(spark)
    val docs = corpus
    val raw = docs
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(w)-3), i -> concat_ws(' ', w[i], w[i+1], w[i+2]))"))
        .as("sh"))
    val hashed = raw.select(col("doc_id"), xxhash64(col("sh")).as("h64"))
    val mhCols = (0 until 16).map(i =>
      min(xxhash64(lit(i), col("h64"))).as(s"mh$i"))
    val old = hashed.groupBy(col("doc_id")).agg(mhCols.head, mhCols.tail: _*)
      .select(col("doc_id"),
        array((0 until 16).map(i => col(s"mh$i")): _*).as("old_mh"))
    val nu = docs
      .select(col("doc_id"), call_function("minhash16", col("text")).as("mh"))
      .filter(size(col("mh")) === 16)
    val joined = old.join(nu, "doc_id")
    assert(joined.count() == old.count() && joined.count() == nu.count(),
      "eligibility (>= 3 words) must agree")
    assert(joined.filter(col("old_mh") =!= col("mh")).count() == 0)
    assert(joined.count() > 0)
  }

  test("md5_windows equals the transform+slice+md5 HOF formula") {
    graft.functions.SigFns.register(spark)
    for (k <- Seq(2, 8)) {
      val docs = corpus
      val old = docs
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .filter(size(col("w")) >= k)
        .select(col("doc_id"), explode(expr(
          s"transform(sequence(1, size(w) - ${k - 1}), " +
            s"i -> struct(i AS start, " +
            s"unhex(md5(concat_ws(' ', slice(w, i, $k)))) AS dg))")).as("x"))
        .select(col("doc_id"), col("x.start").as("start"),
          col("x.dg").as("old_dg"))
      val nu = docs
        .select(col("doc_id"),
          explode(call_function("md5_windows", col("text"), lit(k))).as("x"))
        .select(col("doc_id"), col("x.start").as("start"),
          col("x.dg").as("dg"))
      val joined = old.join(nu, Seq("doc_id", "start"))
      assert(joined.count() == old.count() && joined.count() == nu.count(),
        s"k=$k: window sets must agree (incl. the < k-words dropout)")
      assert(joined.filter(col("old_dg") =!= col("dg")).count() == 0,
        s"k=$k: digests must be bit-identical")
      assert(joined.count() > 0)
    }
  }

  test("simhash48 equals the word-explode bit-sum formula") {
    graft.functions.SigFns.register(spark)
    val docs = corpus
    val words = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .select(col("doc_id"),
        conv(substring(md5(col("word").cast("binary")), 1, 12), 16, 10)
          .cast("long").as("h"))
    val bitSums = (0 until 48).map(j =>
      sum(when(expr(s"shiftright(h, $j) & 1 = 1"), 1).otherwise(-1)).as(s"s$j"))
    val old = words.groupBy(col("doc_id"))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"),
        (0 until 48).map(j =>
          when(col(s"s$j") >= 0, lit(1L << j)).otherwise(0L))
          .reduce(_ + _).as("old_sig"))
    val nu = docs.select(col("doc_id"),
      call_function("simhash48", col("text")).as("sig"))
    val joined = old.join(nu, "doc_id")
    assert(joined.filter(col("old_sig") =!= col("sig")).count() == 0)
    assert(joined.count() > 0)
  }
}
