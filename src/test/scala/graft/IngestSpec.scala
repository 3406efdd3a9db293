package graft

import java.nio.file.Files
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class IngestSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf
  private def tmp(suffix: String): String =
    Files.createTempDirectory(s"graft_$suffix").toString

  test("PERMISSIVE csv ingest separates good rows from rejects") {
    val dir = tmp("csv")
    Files.writeString(java.nio.file.Path.of(dir, "in.csv"),
      """1,alpha,10.5
        |2,beta,20.25
        |not_an_int,gamma,1.0
        |4,delta,not_a_double
        |5,epsilon,50.0
        |""".stripMargin)
    val (good, bad) = graft.sources.Ingest.readCsvPermissive(
      spark, s"$dir/in.csv", "id INT, name STRING, v DOUBLE", rejectLimit = 3)
    assert(good.count() == 3)
    assert(bad.count() == 2)
    assertThrows[IllegalStateException] {
      graft.sources.Ingest.readCsvPermissive(
        spark, s"$dir/in.csv", "id INT, name STRING, v DOUBLE", rejectLimit = 1)
    }
  }

  test("partitioned CTAS prunes partitions on read") {
    val dir = tmp("ctas")
    val orders = Tables.t(spark, sf, "orders")
      .withColumn("o_year", year(col("o_orderdate")))
    val back = graft.sources.Ingest.ctasPartitioned(
      spark, orders, dir, "o_year")
    assert(back.count() == orders.count())
    val pruned = back.filter(col("o_year") === 1996)
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters"), scan)
    assert(pruned.count() ==
      orders.filter(col("o_year") === 1996).count())
  }

  test("dynamic partition pruning fires on partitioned fact x filtered dim") {
    val dir = tmp("dpp")
    val orders = Tables.t(spark, sf, "orders")
      .withColumn("o_year", year(col("o_orderdate")))
    graft.sources.Ingest.ctasPartitioned(spark, orders, dir, "o_year")
    val fact = spark.read.parquet(dir)
    // dim filtered on a NON-join column: the matching partition set is
    // only known at runtime, so static pruning can't fire — DPP must.
    // (A filter directly on the join key gets constant-propagated into
    // static PartitionFilters instead, which is even better.)
    val dim = spark.range(1995, 1999)
      .select(col("id").cast("int").as("y"),
              (col("id") % 3).cast("int").as("flag"))
      .filter(col("flag") === 1)  // happens to select y=1996
    val joined = fact.join(dim, col("o_year") === col("y"))
      .groupBy(col("o_orderstatus")).count()
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning") || plan.contains("DynamicPruning"),
      s"expected dynamic partition pruning, plan:\n$plan")
    assert(joined.collect().map(_.getLong(1)).sum ==
      orders.filter(col("o_year") === 1996).count())
  }

  test("UPDATE as rewrite changes exactly the matched rows") {
    val dir = tmp("upd")
    val cust = Tables.t(spark, sf, "customer")
    val updated = graft.sources.Ingest.updateWhere(
      spark, cust, dir,
      col("c_mktsegment") === "BUILDING",
      Map("c_acctbal" -> (col("c_acctbal") + 1000)))
    val before = cust.agg(sum(when(col("c_mktsegment") === "BUILDING", 1)
      .otherwise(0))).head.getLong(0)
    val moved = updated.join(cust.select(col("c_custkey"),
        col("c_acctbal").as("old_bal")), "c_custkey")
      .filter(col("c_acctbal") =!= col("old_bal")).count()
    assert(moved == before)
  }

  test("DELETE as rewrite removes exactly the matched rows") {
    val dir = tmp("del")
    val cust = Tables.t(spark, sf, "customer")
    val kept = graft.sources.Ingest.deleteWhere(
      spark, cust, dir, col("c_acctbal") < 0)
    val expected = cust.filter(col("c_acctbal") >= 0).count()
    assert(kept.count() == expected)
  }

  private def partFiles(dir: String): Map[String, Set[(String, Long)]] = {
    // partition-dir -> set of (file, mtime): untouched partitions must
    // keep EXACTLY these after a partition-scoped rewrite
    val root = java.nio.file.Path.of(dir)
    Files.list(root).iterator().asScala
      .filter(p => Files.isDirectory(p)).map { p =>
        p.getFileName.toString ->
          Files.list(p).iterator().asScala
            .filter(_.toString.endsWith(".parquet"))
            .map(f => (f.getFileName.toString,
                       Files.getLastModifiedTime(f).toMillis))
            .toSet
      }.toMap
  }

  test("partition-scoped UPDATE rewrites only the touched partitions") {
    val dir = tmp("updpart")
    val orders = Tables.t(spark, sf, "orders")
      .withColumn("o_year", year(col("o_orderdate")))
    graft.sources.Ingest.ctasPartitioned(spark, orders, dir, "o_year")
    val before = partFiles(dir)
    val updated = graft.sources.Ingest.updateWherePartitioned(
      spark, dir, "o_year",
      col("o_year") === 1996 && col("o_orderpriority") === "1-URGENT",
      Map("o_totalprice" -> (col("o_totalprice") + 1.0)))
    val after = partFiles(dir)
    // every partition except o_year=1996 keeps its exact files + mtimes
    assert(before.keySet == after.keySet)
    before.keys.filterNot(_ == "o_year=1996").foreach { p =>
      assert(after(p) == before(p), s"partition $p was rewritten")
    }
    assert(after("o_year=1996") != before("o_year=1996"))
    // row-level semantics: only matched rows changed, count preserved
    assert(updated.count() == orders.count())
    val changed = updated.join(orders.select(col("o_orderkey"),
        col("o_totalprice").as("old_p")), "o_orderkey")
      .filter(col("o_totalprice") =!= col("old_p")).count()
    assert(changed == orders.filter(col("o_year") === 1996 &&
      col("o_orderpriority") === "1-URGENT").count())
  }

  test("partition-scoped DELETE leaves untouched partitions byte-identical") {
    val dir = tmp("delpart")
    val orders = Tables.t(spark, sf, "orders")
      .withColumn("o_year", year(col("o_orderdate")))
    graft.sources.Ingest.ctasPartitioned(spark, orders, dir, "o_year")
    val before = partFiles(dir)
    val kept = graft.sources.Ingest.deleteWherePartitioned(
      spark, dir, "o_year",
      col("o_year") === 1997 && col("o_orderkey") % 2 === 0)
    val after = partFiles(dir)
    before.keys.filterNot(_ == "o_year=1997").foreach { p =>
      assert(after(p) == before(p), s"partition $p was rewritten")
    }
    assert(kept.count() == orders.filter(
      !(col("o_year") === 1997 && col("o_orderkey") % 2 === 0)).count())
    // fully-emptied partition: delete everything in 1995 -> dir must go
    graft.sources.Ingest.deleteWherePartitioned(
      spark, dir, "o_year", col("o_year") === 1995)
    assert(!partFiles(dir).keySet.contains("o_year=1995"))
    assert(spark.read.parquet(dir).filter(col("o_year") === 1995).count() == 0)
  }

  test("partition-scoped DELETE handles escaped names and the NULL partition") {
    val dir = tmp("delesc")
    import spark.implicits._
    // "a:b" forces URL-style escaping in the directory name; None lands in
    // the __HIVE_DEFAULT_PARTITION__ dir
    val df = Seq((1L, Some("a:b")), (2L, Some("a:b")), (3L, Some("plain")),
                 (4L, Option.empty[String]), (5L, Option.empty[String]),
                 (6L, Some("plain"))).toDF("id", "cat")
    graft.sources.Ingest.ctasPartitioned(spark, df, dir, "cat")
    assert(partFiles(dir).keySet.exists(_.contains("%3A")),
      s"expected an escaped partition dir, got ${partFiles(dir).keySet}")
    // fully empty the escaped partition; partially delete inside NULL
    val kept = graft.sources.Ingest.deleteWherePartitioned(spark, dir, "cat",
      col("cat") === "a:b" || (col("cat").isNull && col("id") === 4))
    assert(kept.count() == 3)
    assert(kept.filter(col("cat") === "a:b").count() == 0,
      "escaped partition dir must be removed when fully emptied")
    // null partition: id=4 gone, id=5 survives the rewrite
    assert(kept.filter(col("cat").isNull).select("id").as[Long].collect()
      .toSet == Set(5L))
    assert(kept.filter(col("cat") === "plain").count() == 2)
  }

  test("MERGE INTO updates matched rows and inserts unmatched ones") {
    val dir = tmp("merge")
    val nation = Tables.t(spark, sf, "nation")
    nation.write.mode("overwrite").parquet(dir)
    // source: 3 existing keys with changed names + 2 brand-new keys
    val source = nation.filter(col("n_nationkey") < 3)
      .withColumn("n_name", concat(lit("UPD_"), col("n_name")))
      .unionByName(nation.filter(col("n_nationkey") < 2)
        .withColumn("n_nationkey", col("n_nationkey") + 1000)
        .withColumn("n_name", lit("NEW_NATION")))
    val merged = graft.sources.Ingest.mergeInto(
      spark, dir, source, keys = Seq("n_nationkey"), updateCols = Seq("n_name"))
    assert(merged.count() == nation.count() + 2)
    assert(merged.filter(col("n_name").startsWith("UPD_")).count() == 3)
    assert(merged.filter(col("n_name") === "NEW_NATION").count() == 2)
    // untouched rows keep their names
    assert(merged.filter(col("n_nationkey") >= 3 && col("n_nationkey") < 1000)
      .join(nation.select(col("n_nationkey"), col("n_name").as("orig")),
        "n_nationkey")
      .filter(col("n_name") =!= col("orig")).count() == 0)
  }

  test("MERGE INTO rejects duplicate source keys (PG 'affect row a second time')") {
    val dir = tmp("mergedup")
    val nation = Tables.t(spark, sf, "nation")
    nation.write.mode("overwrite").parquet(dir)
    val dupSource = nation.filter(col("n_nationkey") < 2)
      .unionByName(nation.filter(col("n_nationkey") < 1))
    val e = intercept[IllegalArgumentException] {
      graft.sources.Ingest.mergeInto(
        spark, dir, dupSource, keys = Seq("n_nationkey"), updateCols = Seq("n_name"))
    }
    assert(e.getMessage.contains("duplicate keys"))
    // target untouched after the rejected merge
    assert(spark.read.parquet(dir).count() == nation.count())
  }

  test("partition-scoped MERGE touches only affected partitions, handles cross-partition matches") {
    val dir = tmp("mergepart")
    import spark.implicits._
    // 4 partitions x 3 rows; key does NOT include the partition column
    val base = (for (p <- Seq("a", "b", "c", "d"); i <- 1 to 3)
      yield (s"$p$i", p, 100L)).toDF("k", "part", "v")
    base.write.mode("overwrite").partitionBy("part").parquet(dir)
    // source: update a1 (source claims part=b, but the row LIVES in a —
    // the cross-partition match), update c2 in place, insert d9 and e1
    val source = Seq(
      ("a1", "b", 111L), ("c2", "c", 222L),
      ("d9", "d", 333L), ("e1", "e", 444L)).toDF("k", "part", "v")
    val merged = graft.sources.Ingest.mergeIntoPartitioned(
      spark, dir, "part", source, keys = Seq("k"), updateCols = Seq("v"))
    assert(merged.count() == 14)
    // updates landed in the partitions the matched rows LIVE in
    assert(merged.filter(col("k") === "a1").head.getAs[Long]("v") == 111L)
    assert(merged.filter(col("k") === "a1").head.getAs[String]("part") == "a")
    assert(merged.filter(col("k") === "c2").head.getAs[Long]("v") == 222L)
    // inserts landed in their own partitions, no duplicate a1 in b
    assert(merged.filter(col("k") === "d9").head.getAs[Long]("v") == 333L)
    assert(merged.filter(col("part") === "e").count() == 1)
    assert(merged.filter(col("k") === "a1").count() == 1)
    // untouched partition files are byte-identical: only part=b stayed
    // fully out of the touched set (a matched, c matched, d insert,
    // e new)... b was claimed by the a1 source row, so it IS touched;
    // the only guaranteed-untouched partitions hold no matched key and
    // no insert — none here, so assert instead on a second merge
    val after1 = partFiles(dir)
    val source2 = Seq(("d1", "d", 999L)).toDF("k", "part", "v")
    graft.sources.Ingest.mergeIntoPartitioned(
      spark, dir, "part", source2, keys = Seq("k"), updateCols = Seq("v"))
    val after2 = partFiles(dir)
    Seq("part=a", "part=b", "part=c", "part=e").foreach { p =>
      assert(after2(p) == after1(p), s"partition $p was rewritten")
    }
    assert(after2("part=d") != after1("part=d"))
    // partition column is not updatable on this path
    assertThrows[IllegalArgumentException] {
      graft.sources.Ingest.mergeIntoPartitioned(
        spark, dir, "part", source2, keys = Seq("k"),
        updateCols = Seq("v", "part"))
    }
  }

  test("COPY out/in round-trips") {
    val dir = tmp("copy")
    val nation = Tables.t(spark, sf, "nation")
    val back = graft.sources.Ingest.copyOutIn(spark, nation, dir)
    assert(back.collect().map(_.toSeq).toSet ==
           nation.collect().map(_.toSeq).toSet)
  }

  test("CLUSTER rewrite gives files disjoint key ranges; compaction merges debris") {
    val dir = tmp("cluster")
    val orders = Tables.t(spark, sf, "orders")
    // simulate ingest debris: many tiny files in random key order
    orders.orderBy(rand(42)).repartition(24)
      .write.mode("overwrite").parquet(dir)
    def fileRanges(): Seq[(Long, Long)] = spark.read.parquet(dir)
      .groupBy(input_file_name())
      .agg(min("o_orderkey").as("lo"), max("o_orderkey").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    // pre-cluster: shuffled writes give every file ~the full key span
    val before = fileRanges()
    assert(before.count { case (lo, hi) => lo < 100 && hi > 1000 } > 20,
      s"expected overlapping full-span files before clustering: $before")
    val clustered = graft.sources.Ingest
      .rewriteSorted(spark, dir, numFiles = 8, "o_orderkey")
    assert(clustered.count() == orders.count())
    val after = fileRanges()
    // disjoint ranges: every file's hi < next file's lo
    after.sliding(2).foreach {
      case Seq((_, hi), (lo2, _)) =>
        assert(hi < lo2, s"file ranges overlap after CLUSTER: $after")
      case _ =>
    }
    // a selective key filter now prunes to exactly one file
    val probe = clustered.filter(col("o_orderkey") === after(3)._1)
    assert(probe.select(input_file_name()).distinct().count() == 1)
    // compaction: merge everything back into one right-sized file
    graft.sources.Ingest.compact(spark, dir, targetFileBytes = 1L << 30)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(files.length == 1, s"expected 1 compacted file, got ${files.length}")
    assert(spark.read.parquet(dir).count() == orders.count())
  }

  test("JSON-lines and ORC round-trips preserve rows and schema") {
    val nation = Tables.t(spark, sf, "nation")
    val expect = nation.collect().map(_.toSeq).toSet
    val j = graft.sources.Ingest.copyOutInJson(spark, nation, tmp("copyjson"))
    assert(j.schema == nation.schema)
    assert(j.collect().map(_.toSeq).toSet == expect)
    val o = graft.sources.Ingest.copyOutInOrc(spark, nation, tmp("copyorc"))
    assert(o.schema == nation.schema)
    assert(o.collect().map(_.toSeq).toSet == expect)
  }

  test("COPY BINARY round-trips every supported type, NULLs included") {
    import java.sql.{Date, Timestamp}
    val sp = spark; import sp.implicits._
    // every supported type in one table, with a NULL in each column and a
    // non-ASCII string (UTF-8 payload length != char count)
    val df = Seq(
      (1L, Some(42), Some(3.5), Some("plain"), Some(true),
        Some(Date.valueOf("1997-06-15")), Some(Timestamp.valueOf("1997-06-15 12:34:56.123456"))),
      (2L, None: Option[Int], None: Option[Double], None: Option[String],
        None: Option[Boolean], None: Option[Date], None: Option[Timestamp]),
      (3L, Some(-7), Some(-0.125), Some("naïve — ünïcode"), Some(false),
        Some(Date.valueOf("2031-01-01")), Some(Timestamp.valueOf("2031-01-01 00:00:00")))
    ).toDF("id", "i", "d", "s", "b", "dt", "ts").repartition(2)
    val dir = tmp("copybin")
    graft.sources.CopyBinary.write(df, dir)
    val back = graft.sources.CopyBinary.read(spark, dir, df.schema)
    assert(back.schema == df.schema, "schema fidelity")
    assert(back.collect().map(_.toSeq).toSet == df.collect().map(_.toSeq).toSet)
    // and a real table: orders (long/string/double/date columns) at test SF
    val orders = Tables.t(spark, sf, "orders")
    val odir = tmp("copybin_orders")
    graft.sources.CopyBinary.write(orders, odir)
    val oback = graft.sources.CopyBinary.read(spark, odir, orders.schema)
    assert(oback.schema == orders.schema)
    assert(oback.collect().map(_.toSeq).toSet ==
           orders.collect().map(_.toSeq).toSet)
    // the wire bytes really are COPY BINARY: check a file's signature
    val part = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".bin")).head
    val head = java.nio.file.Files.readAllBytes(part.toPath).take(11)
    assert(head.sameElements(Array[Byte]('P', 'G', 'C', 'O', 'P', 'Y',
      '\n', 0xFF.toByte, '\r', '\n', 0)))
  }

  test("ALTER TABLE schema evolution: ADD COLUMN with default, DROP COLUMN, no rewrite") {
    val sp = spark; import sp.implicits._
    val dir = java.nio.file.Files.createTempDirectory("evolve").toString
    // v1 files: (id, a)
    Seq((1L, "x"), (2L, "y")).toDF("id", "a")
      .write.mode("append").parquet(dir)
    val v1Files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => f.getName -> f.lastModified).toMap
    // ADD COLUMN is visible IMMEDIATELY — before any new-schema file
    // exists, every row already reads the declared default
    val pre = graft.sources.Ingest
      .readEvolved(spark, dir, defaults = Map("b" -> 7))
      .orderBy("id").collect().map(_.toSeq)
    assert(pre.toSeq == Seq(Seq(1L, "x", 7), Seq(2L, "y", 7)), pre.mkString(","))
    // ALTER TABLE ADD COLUMN b INT DEFAULT 7: later appends carry b
    Seq((3L, "z", 9)).toDF("id", "a", "b")
      .write.mode("append").parquet(dir)
    val out = graft.sources.Ingest
      .readEvolved(spark, dir, defaults = Map("b" -> 7))
      .orderBy("id").collect().map(_.toSeq)
    assert(out.toSeq == Seq(Seq(1L, "x", 7), Seq(2L, "y", 7), Seq(3L, "z", 9)),
      out.mkString(","))
    // old files untouched — ADD COLUMN was metadata-only
    val after = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => f.getName -> f.lastModified).toMap
    v1Files.foreach { case (n, ts) => assert(after(n) == ts, s"$n rewritten") }
    // DROP COLUMN a: projection-on-read (attisdropped semantics)
    val dropped = graft.sources.Ingest
      .readEvolved(spark, dir, defaults = Map("b" -> 7), dropped = Seq("a"))
    assert(dropped.columns.toSeq == Seq("id", "b"))
    assert(dropped.count() == 3)
  }

  test("Z-order layout prunes on BOTH key columns; linear sort only on the leading one") {
    import org.apache.spark.sql.functions._
    val src = Tables.t(spark, sf, "lineitem")
      .select("l_partkey", "l_suppkey", "l_quantity")
    val linDir = java.nio.file.Files.createTempDirectory("zlin").toString
    val zDir = java.nio.file.Files.createTempDirectory("zord").toString
    src.write.mode("overwrite").parquet(linDir)
    src.write.mode("overwrite").parquet(zDir)
    graft.sources.Ingest.rewriteSorted(spark, linDir, 16, "l_partkey")
    graft.sources.Ingest.rewriteZOrder(spark, zDir, 16, "l_partkey", "l_suppkey")

    // per-file (min,max) boxes straight from the written files
    def boxes(dir: String): Seq[(Long, Long, Long, Long)] =
      new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).toSeq.map { f =>
          val r = spark.read.parquet(f.getPath)
            .agg(min("l_partkey"), max("l_partkey"),
              min("l_suppkey"), max("l_suppkey")).head()
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
        }
    val lin = boxes(linDir); val zo = boxes(zDir)
    assert(lin.size == 16 && zo.size == 16)
    // a selective stripe on the NON-leading suppkey column: every linear
    // file spans the whole suppkey domain, so nothing prunes; z-order
    // boxes are rectangles, so a good fraction of files fall away
    val (sLo, sHi) = (1L, 2L)
    def hits(bs: Seq[(Long, Long, Long, Long)]) =
      bs.count { case (_, _, lo, hi) => hi >= sLo && lo <= sHi }
    assert(hits(lin) == 16, s"linear layout should not prune suppkey: ${hits(lin)}")
    assert(hits(zo) <= 12, s"z-order should prune suppkey stripes: ${hits(zo)}")
    // and the leading column still prunes under z-order (coarser than
    // the perfectly-disjoint linear ranges, but far from nothing)
    val (pLo, pHi) = (1L, 10L)
    val pHits = zo.count { case (lo, hi, _, _) => hi >= pLo && lo <= pHi }
    assert(pHits <= 12, s"z-order should prune partkey stripes too: $pHits")
    // layouts hold identical data
    assert(spark.read.parquet(zDir).count() == src.count())
  }

  test("statTable reports footer-exact rows, nulls, and compression per column") {
    val dir = tmp("stat") + "/t"
    val src = Tables.t(spark, sf, "orders")
      .withColumn("maybe_null",
        when(col("o_orderkey") % 3 === 0, col("o_totalprice")))
    src.repartition(3).write.parquet(dir)
    val stats = graft.sources.Ingest.statTable(spark, dir)
      .collect().map(r => r.getString(0) -> r).toMap
    val nRows = src.count()
    val nNullsExpected = src.filter(col("maybe_null").isNull).count()
    for ((_, r) <- stats) {
      assert(r.getLong(3) == nRows, s"n_rows mismatch: $r")       // n_rows
      assert(r.getLong(1) == 3, s"n_files mismatch: $r")          // n_files
      assert(r.getLong(2) >= 3, s"row groups < files: $r")        // n_row_groups
    }
    assert(stats("maybe_null").getLong(6) == nNullsExpected)      // n_nulls
    assert(stats("o_orderkey").getLong(6) == 0)
    // stats coverage lets min/max pruning work on every column here
    assert(stats.values.forall(_.getDouble(7) == 1.0), stats)     // minmax_coverage
    // ratio sanity only: parquet's "uncompressed" size is post-encoding
    // (dictionary already applied), so codec overhead can leave any
    // column slightly under 1.0 — the ratio's job is flagging gross
    // misconfiguration, not re-proving codec math
    assert(stats.values.forall(r => r.getDouble(8) > 0.5), stats) // compression_ratio
  }

  test("bloom-filter columns are written into the parquet footers and reads stay exact") {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val dir = java.nio.file.Files.createTempDirectory("graft_bloom").toString + "/t"
    val src = Tables.t(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
              col("l_quantity"))
    graft.sources.Ingest.writeWithBloom(spark, src.repartition(4), dir,
      Seq("l_partkey"), expectedNdv = 1000L)
    // footer check: every row group carries a bloom filter for
    // l_partkey and none for the other columns
    val conf = spark.sparkContext.hadoopConfiguration
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.getAbsolutePath)
    assert(files.nonEmpty)
    files.foreach { f =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(f), conf))
      try {
        import scala.jdk.CollectionConverters._
        reader.getFooter.getBlocks.asScala.foreach { block =>
          block.getColumns.asScala.foreach { cc =>
            val hasBloom = cc.getBloomFilterOffset >= 0
            if (cc.getPath.toDotString == "l_partkey")
              assert(hasBloom, s"no bloom filter for l_partkey in $f")
            else assert(!hasBloom, s"unexpected bloom on ${cc.getPath} in $f")
          }
        }
      } finally reader.close()
    }
    // equality point lookup through the bloom-filtered files stays exact
    val key = src.select(col("l_partkey")).limit(1).collect()(0).getLong(0)
    val got = spark.read.parquet(dir).filter(col("l_partkey") === key).count()
    val want = src.filter(col("l_partkey") === key).count()
    assert(got == want && want > 0)
  }

  test("checkTable: clean CLUSTER layout verifies empty; overlap is reported") {
    val dir = java.nio.file.Files.createTempDirectory("amchk").toString
    Tables.t(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
      .write.mode("overwrite").parquet(dir)
    graft.sources.Ingest.rewriteSorted(spark, dir, numFiles = 4, "o_orderkey")
    assert(graft.sources.Ingest.checkTable(spark, dir, "o_orderkey").isEmpty,
      "clean clustered layout must verify empty")

    // corrupt the invariant: append a file whose key range spans the rest
    Tables.t(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
      .limit(50)
      .coalesce(1).write.mode("append").parquet(dir)
    val viol = graft.sources.Ingest.checkTable(spark, dir, "o_orderkey")
      .collect()
    assert(viol.nonEmpty && viol.forall(_.getString(0) == "overlap"),
      viol.mkString(", "))
  }

  test("prewarm caches: post-warm reads hit InMemoryTableScan") {
    val (warm, n) = graft.sources.Ingest.prewarm(
      Tables.t(spark, sf, "part").select(col("p_partkey"), col("p_brand")))
    try {
      assert(n > 0)
      val plan = warm.filter(col("p_partkey") > 10)
        .queryExecution.executedPlan.toString
      assert(plan.contains("InMemoryTableScan"), plan)
    } finally warm.unpersist()
  }

  test("EXCHANGE PARTITION swaps one partition with a staging table; " +
    "untouched partitions byte-identical; old image lands in staging") {
    val dir = tmp("xchg")
    val orders = Tables.t(spark, sf, "orders")
      .withColumn("o_year", year(col("o_orderdate")))
    graft.sources.Ingest.ctasPartitioned(spark, orders, dir, "o_year")
    val before = partFiles(dir)
    val old1996 = spark.read.parquet(dir)
      .filter(col("o_year") === 1996).drop("o_year")
    val old1996Count = old1996.count()
    assert(old1996Count > 0)
    // the offline-built replacement: halved 1996 with reshuffled prices
    val stagingDir = tmp("xchg_staging")
    val replacement = old1996.filter(col("o_orderkey") % 2 === 0)
      .withColumn("o_totalprice", col("o_totalprice") * 2)
    replacement.write.mode("overwrite").parquet(stagingDir)
    // expected values captured BEFORE the swap (replacement's lineage
    // reads the pre-exchange partition files, which the exchange moves)
    val replCount = replacement.count()
    val replSum = replacement.agg(sum(col("o_totalprice")))
      .collect()(0).getDouble(0)

    graft.sources.Ingest.exchangePartition(
      spark, dir, "o_year", "1996", stagingDir)

    // live table serves the staged data for 1996
    val now1996 = spark.read.parquet(dir).filter(col("o_year") === 1996)
    assert(now1996.count() == replCount)
    assert(now1996.agg(sum(col("o_totalprice"))).collect()(0).getDouble(0)
      === replSum)
    // the OLD partition image is now the staging table (exchange, not drop)
    assert(spark.read.parquet(stagingDir).count() == old1996Count)
    // untouched partitions: exactly the same files with the same mtimes
    val after = partFiles(dir)
    before.keys.filterNot(_ == "o_year=1996").foreach { p =>
      assert(after(p) == before(p), s"partition $p was touched")
    }
    // schema mismatch rejects loudly before any rename (fresh read —
    // the pre-exchange lineage's files have moved)
    val badStaging = tmp("xchg_bad")
    spark.read.parquet(dir).filter(col("o_year") === 1996).drop("o_year")
      .withColumn("extra", lit(1))
      .write.mode("overwrite").parquet(badStaging)
    val e = intercept[IllegalArgumentException] {
      graft.sources.Ingest.exchangePartition(
        spark, dir, "o_year", "1996", badStaging)
    }
    assert(e.getMessage.contains("schema"), e.getMessage)
    assert(spark.read.parquet(dir).filter(col("o_year") === 1996)
      .count() == replCount) // table unchanged after the rejected attempt
    // missing partition rejects
    val e2 = intercept[IllegalArgumentException] {
      graft.sources.Ingest.exchangePartition(
        spark, dir, "o_year", "2099", stagingDir)
    }
    assert(e2.getMessage.contains("does not exist"), e2.getMessage)
  }

  test("EXCHANGE PARTITION under concurrent readers: every successful " +
    "read sees the old image or the new, never a torn partition") {
    val dir = tmp("xchg_race")
    val orders = Tables.t(spark, sf, "orders")
      .withColumn("o_year", year(col("o_orderdate")))
    graft.sources.Ingest.ctasPartitioned(spark, orders, dir, "o_year")
    val oldCount = spark.read.parquet(dir)
      .filter(col("o_year") === 1997).count()
    val stagingDir = tmp("xchg_race_staging")
    spark.read.parquet(dir).filter(col("o_year") === 1997).drop("o_year")
      .filter(col("o_orderkey") % 3 === 0)
      .write.mode("overwrite").parquet(stagingDir)
    val newCount = spark.read.parquet(stagingDir).count()
    assert(newCount != oldCount)

    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val seen = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    val readerErrs = new java.util.concurrent.atomic.AtomicLong(0)
    val reader = new Thread(() => {
      while (!stop.get()) {
        try {
          // a FRESH plan each time: each read lists the directory anew,
          // landing before, inside, or after the rename window
          seen.add(spark.read.parquet(dir)
            .filter(col("o_year") === 1997).count())
        } catch {
          // a read that raced a mid-rename listing may fail to open a
          // moved file — that read FAILS (acceptable: the window is two
          // renames); it must never SUCCEED with partial data
          case _: Throwable => readerErrs.incrementAndGet()
        }
      }
    })
    reader.start()
    try {
      Thread.sleep(150) // let the reader observe the old image
      graft.sources.Ingest.exchangePartition(
        spark, dir, "o_year", "1997", stagingDir)
      Thread.sleep(300) // and the new one
    } finally {
      stop.set(true)
      reader.join(30000)
    }
    // every successful read returned a COMPLETE image: the old count,
    // the new count, or (inside the window) the partition wholly absent
    val ok = Set(oldCount, newCount, 0L)
    assert(seen.asScala.forall(ok), s"torn reads: ${seen.asScala} vs $ok")
    assert(seen.asScala.contains(oldCount) || seen.asScala.contains(newCount))
    // steady state: the new image, exactly
    assert(spark.read.parquet(dir).filter(col("o_year") === 1997)
      .count() == newCount)
  }
}
