package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.LargeObjects

/** pg_largeobject page-store laws: lossless round-trip, O(len) random
  * access, page-boundary edges, page-level overwrite. */
class LargeObjectsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf
  private val Page = 64 // small pages so fixtures span many pages

  /** (loid, b) binary objects built from document text (repeated so
    * objects span multiple pages, incl. exact-multiple lengths). */
  private def objects: DataFrame =
    Tables.t(spark, sf, "documents").filter(col("doc_id") < 20)
      .select(col("doc_id").as("loid"),
        expr("cast(repeat(text, 3) AS BINARY)").as("b"))

  private def md5Of(df: DataFrame, c: String): Map[Long, String] =
    df.select(col("loid"), md5(col(c)).as("h")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

  test("store/read round-trips every object bit-exactly") {
    val pages = LargeObjects.loStore(objects, "loid", "b", Page)
    val back = LargeObjects.loRead(pages)
    assert(md5Of(back, "data") == md5Of(objects, "b"))
    // page layout: every page but the last is full-size
    val sizes = pages.select(col("loid"), col("pageno"),
        length(col("data")).as("l")).collect()
    val maxPage = sizes.groupBy(_.getLong(0)).map { case (k, xs) =>
      k -> xs.map(_.getInt(1)).max }
    sizes.foreach { r =>
      if (r.getInt(1) < maxPage(r.getLong(0)))
        assert(r.getInt(2) == Page, s"interior page not full: $r")
    }
  }

  test("seek-read returns exactly the requested byte range") {
    val pages = LargeObjects.loStore(objects, "loid", "b", Page)
    val full = LargeObjects.loRead(pages).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    for ((off, len) <- Seq((0L, 10L), (Page - 3L, 7L), (Page.toLong, Page.toLong),
                           (2L * Page + 5, 3L), (0L, 1L))) {
      val got = LargeObjects.loSeekRead(pages, 3L, off, len, Page)
        .collect()(0).getAs[Array[Byte]](1)
      val want = full(3L).slice(off.toInt, (off + len).toInt)
      assert(got.toSeq == want.toSeq, s"seek($off, $len)")
    }
    // read past end-of-object truncates like loread
    val n = full(3L).length
    val tail = LargeObjects.loSeekRead(pages, 3L, n - 5L, 100L, Page)
      .collect()(0).getAs[Array[Byte]](1)
    assert(tail.toSeq == full(3L).slice(n - 5, n).toSeq)
  }

  test("seek-read scans only the covering pages") {
    val pages = LargeObjects.loStore(objects, "loid", "b", Page)
    // range inside one page: the filtered page relation has 1 row
    val one = pages.filter(col("loid") === 3L &&
      col("pageno").between(1L, 1L))
    assert(one.count() == 1)
    val got = LargeObjects.loSeekRead(pages, 3L, Page + 1L, Page - 2L, Page)
      .collect()(0).getAs[Array[Byte]](1)
    assert(got.length == Page - 2)
  }

  test("page-level overwrite replaces exactly the written pages") {
    val pages = LargeObjects.loStore(objects, "loid", "b", Page)
    val patch = spark.range(1).select(lit(3L).as("loid"),
      lit(1).as("pageno"),
      expr(s"cast(repeat('Z', $Page) AS BINARY)").as("data"))
    val after = LargeObjects.loWritePages(pages, patch)
    assert(after.count() == pages.count())
    val back = LargeObjects.loRead(after.filter(col("loid") === 3L))
      .collect()(0).getAs[Array[Byte]](1)
    val orig = LargeObjects.loRead(pages.filter(col("loid") === 3L))
      .collect()(0).getAs[Array[Byte]](1)
    assert(back.length == orig.length)
    assert(back.slice(0, Page).toSeq == orig.slice(0, Page).toSeq)
    assert(back.slice(Page, 2 * Page).forall(_ == 'Z'.toByte))
    assert(back.slice(2 * Page, back.length).toSeq ==
      orig.slice(2 * Page, orig.length).toSeq)
  }

  test("vacuumlo keeps exactly the referenced objects' pages") {
    val sp = spark; import sp.implicits._
    val pages = LargeObjects.loStore(objects, "loid", "b", Page)
    val referenced = Seq(3L, 7L).toDF("loid")
    val kept = LargeObjects.vacuumLo(pages, referenced)
    assert(kept.select("loid").distinct().collect()
      .map(_.getLong(0)).toSet == Set(3L, 7L))
    // surviving objects are byte-intact
    assert(md5Of(LargeObjects.loRead(kept), "data") ==
      md5Of(LargeObjects.loRead(
        pages.filter(col("loid").isin(3L, 7L))), "data"))
  }

  test("empty and null binaries store zero pages") {
    val sp = spark; import sp.implicits._
    val df = Seq((1L, Array.emptyByteArray), (2L, null: Array[Byte]),
      (3L, "abc".getBytes)).toDF("loid", "b")
    val pages = LargeObjects.loStore(df, "loid", "b", Page)
    assert(pages.groupBy(col("loid")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap == Map(3L -> 1L))
  }
}
