package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Large-object storage: page-chunked binary columns with random access.
  *
  * The Spark mapping of the reference's large-object facility
  * (`/root/reference/src/backend/catalog/pg_largeobject.c` — the
  * `pg_largeobject(loid, pageno, data)` page table, LOBLKSIZE pages;
  * read path `src/backend/libpq/be-fsstubs.c` lo_read/lo_lseek;
  * `contrib/lo` lifecycle helpers): a binary column explodes into
  * fixed-size pages keyed (loid, pageno), and reads reassemble pages in
  * page order. The page layout is WHY this scales: [[loSeekRead]]
  * touches only the ceil(len/page) pages covering the requested range —
  * a 1 MB read from a 10 GB object scans 1 MB of pages (plus pruning on
  * the pageno min/max stats when pages are stored sorted), never the
  * object. Pages default to 256 KiB (parquet-friendly; the reference's
  * LOBLKSIZE is BLCKSZ/4 = 2 KiB — same layout, tuned constant).
  *
  * Like pg_largeobject, a zero-length object stores zero pages (readers
  * that must distinguish "empty" from "absent" track loids separately,
  * as the reference does in pg_largeobject_metadata).
  */
object LargeObjects {

  /** Explode (id, bin) rows into (loid, pageno, data) pages of
    * `pageBytes`. Pure map-side: one pass, no shuffle — at scale the
    * page table inherits the source's partitioning. */
  def loStore(df: DataFrame, idCol: String, binCol: String,
              pageBytes: Int = 262144): DataFrame = {
    require(pageBytes > 0, "pageBytes must be positive")
    df.select(col(idCol).as("loid"), col(binCol).as("b"))
      .filter(col("b").isNotNull && length(col("b")) > 0)
      .select(col("loid"), posexplode(expr(
        s"transform(sequence(0, int((length(b) - 1) div $pageBytes)), " +
          s"i -> substring(b, i * $pageBytes + 1, $pageBytes))"))
        .as(Seq("pageno", "data")))
  }

  /** Reassemble whole objects: (loid, data) with pages concatenated in
    * page order (collect_list + sort on the struct — per-object state is
    * the object's own pages, grouped by loid in one shuffle). */
  def loRead(pages: DataFrame): DataFrame =
    pages.groupBy(col("loid"))
      .agg(aggregate(
        expr("transform(array_sort(collect_list(struct(pageno, data))), " +
          "p -> p.data)"),
        lit(Array.emptyByteArray),
        (acc, x) => concat(acc, x)).as("data"))

  /** Random-access read (lo_lseek + loread): `len` bytes from byte
    * `offset` (0-based) of object `loid`. Filters to the covering page
    * range BEFORE any shuffle — the scan cost is O(len), not O(object
    * size). Returns a 1-row (loid, data) frame; shorter-than-requested
    * at end-of-object, like loread. */
  def loSeekRead(pages: DataFrame, loid: Long, offset: Long, len: Long,
                 pageBytes: Int = 262144): DataFrame = {
    require(offset >= 0 && len > 0, "offset must be >= 0 and len > 0")
    val firstPage = offset / pageBytes
    val lastPage = (offset + len - 1) / pageBytes
    val skip = offset - firstPage * pageBytes
    loRead(pages.filter(col("loid") === loid &&
        col("pageno").between(firstPage, lastPage)))
      .select(col("loid"),
        expr(s"substring(data, ${skip + 1}, $len)").as("data"))
  }

  /** vacuumlo (`/root/reference/contrib/vacuumlo/vacuumlo.c`): drop the
    * pages of large objects no row references any more — one semi join
    * of the page table against the distinct referenced ids (vacuumlo
    * scans lo-typed columns for the same set). Returns the surviving
    * page relation; callers rewrite the store with it. */
  def vacuumLo(pages: DataFrame, referenced: DataFrame): DataFrame =
    pages.join(referenced.select(col("loid")).distinct(),
      Seq("loid"), "left_semi")

  /** Page-level overwrite (lo_write at a page boundary): pages of
    * `replacement` (an (loid, pageno, data) frame) win over `pages` on
    * the (loid, pageno) key — the reference's per-page UPDATE, expressed
    * as anti-join + union, one key shuffle. */
  def loWritePages(pages: DataFrame, replacement: DataFrame): DataFrame =
    pages.join(replacement.select(col("loid"), col("pageno")),
        Seq("loid", "pageno"), "left_anti")
      .unionByName(replacement)
}
