package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
import org.apache.spark.sql.functions._

/** Ingest / DML layer — SURVEY §2.1 sinks and error-tolerant sources.
  *
  * Reference: external tables with single-row error handling and
  * `SEGMENT REJECT LIMIT` (`/root/reference/src/backend/cdb/cdbsreh.c:50-162`),
  * COPY in/out (`src/backend/commands/copy.c`), ModifyTable
  * (`src/backend/executor/nodeModifyTable.c:2381`), SplitUpdate for
  * distribution-key updates (`nodeSplitUpdate.c:169`).
  *
  * Spark-first mappings: PERMISSIVE CSV read with `_corrupt_record`
  * capture = single-row error tables; partitioned Parquet write = the
  * distribution/partition policy; UPDATE/DELETE = read-filter-rewrite
  * (immutable storage, the AO-table compaction model).
  */
object Ingest {

  /** Error-tolerant CSV read (cdbsreh parity): good rows + a reject
    * "error table", plus a reject-limit check. */
  def readCsvPermissive(spark: SparkSession, path: String,
                        ddl: String, rejectLimit: Int): (DataFrame, DataFrame) = {
    val raw = spark.read
      .schema(ddl + ", _corrupt_record STRING")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .option("header", "false")
      .csv(path)
      .cache()
    val bad = raw.filter(col("_corrupt_record").isNotNull)
      .select(col("_corrupt_record"))
    val good = raw.filter(col("_corrupt_record").isNull)
      .drop("_corrupt_record")
    val nBad = bad.count()
    if (nBad > rejectLimit)
      throw new IllegalStateException(
        s"segment reject limit reached: $nBad > $rejectLimit")
    (good, bad)
  }

  /** Fixed-width external-table READ formatter
    * (`/root/reference/contrib/formatter_fixedwidth/fixedwidth.c`
    * fixedwidth_in / extract_field): each line carries the columns at
    * fixed byte offsets in declaration order. Spark-first: one `text`
    * scan, per-field `substring` slices (pure codegen — no UDF), trailing
    * blanks trimmed unless `preserveBlanks` (extract_field:91-110), a
    * field equal to `nullValue` after extraction reads as NULL
    * (make_null_val_with_blanks:243), and malformed lines — wrong total
    * length or an unparseable typed field — land in the reject table
    * under the same SEGMENT REJECT LIMIT contract as
    * [[readCsvPermissive]] (cdbsreh parity).
    *
    * `fields` = (name, width, typeDDL) in file order. Returns (good,
    * rejects); throws once rejects exceed `rejectLimit`.
    */
  def readFixedWidth(spark: SparkSession, path: String,
                     fields: Seq[(String, Int, String)],
                     rejectLimit: Int,
                     preserveBlanks: Boolean = false,
                     nullValue: String = ""): (DataFrame, DataFrame) = {
    val totalWidth = fields.map(_._2).sum
    val raw = spark.read.text(path)
    // slice first, then validate: a field is BAD when its trimmed text is
    // neither empty, the null marker, nor castable to the declared type
    val offsets = fields.scanLeft(1)((acc, f) => acc + f._2)
    val sliced = fields.zip(offsets).foldLeft(raw) {
      case (df, ((name, width, _), off)) =>
        val cut = substring(col("value"), off, width)
        val v = if (preserveBlanks) cut else rtrim(cut)
        df.withColumn(s"_raw_$name",
          when(v === lit(nullValue), lit(null).cast("string")).otherwise(v))
    }
    def isStringField(ddl: String) = ddl.trim.equalsIgnoreCase("STRING")
    val castFails = fields.filterNot(f => isStringField(f._3)).map {
      case (name, _, ddl) =>
        col(s"_raw_$name").isNotNull &&
          expr(s"try_cast(trim(_raw_$name) as $ddl)").isNull
    }.reduceOption(_ || _).getOrElse(lit(false))
    val isBad = length(col("value")) =!= totalWidth || castFails
    val tagged = sliced.withColumn("_bad", isBad).cache()
    val bad = tagged.filter(col("_bad")).select(col("value").as("_rejected_record"))
    // string fields keep the extracted bytes verbatim (leading blanks are
    // significant in right-aligned fixed-width data; only TRAILING blanks
    // are formatter padding, already handled by the preserveBlanks slice);
    // numeric fields trim both sides before the cast
    val good = tagged.filter(!col("_bad"))
      .select(fields.map { case (name, _, ddl) =>
        if (isStringField(ddl)) col(s"_raw_$name").as(name)
        else expr(s"try_cast(trim(_raw_$name) as $ddl)").as(name)
      }: _*)
    val nBad = bad.count()
    if (nBad > rejectLimit)
      throw new IllegalStateException(
        s"segment reject limit reached: $nBad > $rejectLimit")
    (good, bad)
  }

  /** Fixed-width WRITE formatter (fixedwidth_out / make_val_with_blanks:
    * every value blank-padded to its declared width, NULLs rendered as
    * `nullValue` padded to the field size). Values wider than the declared
    * field width are a formatter error in the reference
    * (fixedwidth.c:283-300) — surfaced here via `raise_error`, the same
    * fail-the-load behavior. Returns the written line count. */
  def writeFixedWidth(spark: SparkSession, df: DataFrame, path: String,
                      fields: Seq[(String, Int)],
                      nullValue: String = ""): Long = {
    val line = concat(fields.map { case (name, width) =>
      val s = coalesce(col(name).cast("string"), lit(nullValue))
      when(length(s) > width,
           expr(s"raise_error(concat('fixedwidth: value too wide for $name: ', `$name`))"))
        .otherwise(rpad(s, width, " "))
    }: _*)
    val out = df.select(line.as("value"))
    out.write.mode(SaveMode.Overwrite).text(path)
    spark.read.text(path).count()
  }

  /** CTAS into a partitioned Parquet table (multi-level partitioning
    * analogue; partition pruning comes from the directory layout). */
  def ctasPartitioned(spark: SparkSession, df: DataFrame, path: String,
                      partitionCols: String*): DataFrame = {
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)
    spark.read.parquet(path)
  }

  /** `ALTER TABLE … EXCHANGE PARTITION` analogue (reference:
    * `src/backend/commands/tablecmds.c` exchange/attach path; regress
    * `aoco_projection.sql:456`) — the warehouse operator's bulk-swap
    * idiom: build and validate a replacement OFFLINE as a standalone
    * table, then swap it in as one partition of the live table in O(1)
    * directory renames. The staging dir receives the OLD partition
    * image (an exchange, not a drop — the reference keeps both tables
    * valid), untouched partitions are never touched (byte-identical),
    * and no data moves regardless of partition size — at 100 TB the
    * operation is three metadata renames.
    *
    * Validation (the reference's column-compatibility check): the
    * staging schema must equal the table schema minus the partition
    * column (directory-partitioned parquet stores the partition value
    * in the dir name, not the files).
    *
    * Crash discipline: all three renames are checked ([[renameOrDie]])
    * and the old image survives every window — it is either live, or
    * aside under a dot-prefixed name Spark's file index hides, or in
    * the staging dir. Readers never see a TORN partition (files are
    * immutable and move wholesale with their directory); a query
    * planned inside the two-rename window can see the partition
    * briefly absent — the same window as every dir-swap DML here. */
  def exchangePartition(spark: SparkSession, path: String, partCol: String,
                        partValue: String, stagingPath: String,
                        validate: Boolean = true): Unit = {
    val fs = fsOf(spark, path)
    val partDir = new Path(path, s"$partCol=$partValue")
    val staging = new Path(stagingPath)
    require(fs.exists(partDir),
      s"partition $partCol=$partValue does not exist at $path (the " +
        "reference requires an existing partition to exchange)")
    require(fs.exists(staging), s"staging table $stagingPath does not exist")
    if (validate) {
      val tableFields = spark.read.parquet(path).schema.fields
        .filterNot(_.name == partCol).map(f => (f.name, f.dataType)).toSet
      val stagingFields = spark.read.parquet(stagingPath).schema.fields
        .map(f => (f.name, f.dataType)).toSet
      require(stagingFields == tableFields,
        s"staging schema $stagingFields does not match the table's " +
          s"non-partition schema $tableFields (the reference rejects " +
          "incompatible EXCHANGE PARTITION the same way)")
    }
    // dot-prefixed aside dir: hidden from Spark's file listing if a
    // crash strands it, so a half-done exchange never double-counts
    val aside = new Path(path, s"._xchg_$partCol=$partValue")
    fs.delete(aside, true)
    renameOrDie(fs, partDir, aside)    // old image aside (still on disk)
    renameOrDie(fs, staging, partDir)  // staged table becomes the partition
    renameOrDie(fs, aside, staging)    // old image becomes the staging table
    // pure-rename DDL bypasses Spark's writers, so the session's
    // FileStatusCache still lists the pre-exchange files — invalidate
    // both tables (the reference's relcache invalidation on DDL)
    spark.catalog.refreshByPath(path)
    spark.catalog.refreshByPath(stagingPath)
  }

  /** UPDATE ... WHERE as read-modify-rewrite: rows matching `where` get
    * `set` applied; everything lands in a new table version. Whole-table
    * rewrite — the fallback for UNPARTITIONED tables; partitioned tables
    * take [[updateWherePartitioned]] (O(touched partitions), the
    * SplitUpdate parity path). */
  def updateWhere(spark: SparkSession, source: DataFrame, path: String,
                  where: Column, set: Map[String, Column]): DataFrame = {
    val updated = set.foldLeft(source) { case (df, (name, value)) =>
      df.withColumn(name, when(where, value).otherwise(col(name)))
    }
    replaceTable(spark, updated, path)
  }

  /** DELETE ... WHERE as filter-rewrite (unpartitioned fallback; see
    * [[deleteWherePartitioned]]). */
  def deleteWhere(spark: SparkSession, source: DataFrame, path: String,
                  where: Column): DataFrame = {
    replaceTable(spark, source.filter(!where || where.isNull), path)
  }

  /** Hadoop FileSystem.rename signals most failures by RETURNING FALSE,
    * not throwing — an unchecked rename can silently drop a table or
    * partition. Every directory move in this file goes through here. */
  private def renameOrDie(fs: FileSystem, src: Path, dst: Path): Unit =
    require(fs.rename(src, dst), s"rename failed: $src -> $dst")

  /** Whole-table rewrite via stage + backup-swap: `df` (which may read
    * `path`) writes to a staging dir, then directories swap — at every
    * crash point the full table exists at `path` or `path.__bak`. Each
    * rename result is checked, and the backup is only discarded after the
    * new table is verifiably in place — a failed swap never deletes the
    * sole remaining copy. */
  private[sources] def replaceTable(spark: SparkSession, df: DataFrame,
                                    path: String): DataFrame = {
    val staged = stageDir(path)
    df.write.mode(SaveMode.Overwrite).parquet(staged.toString)
    val fs = fsOf(spark, path)
    val dst = new Path(path)
    val bak = new Path(path + ".__bak")
    fs.delete(bak, true)
    if (fs.exists(dst)) renameOrDie(fs, dst, bak)
    renameOrDie(fs, staged, dst)
    require(fs.exists(dst), s"swap left no table at $dst — backup kept at $bak")
    fs.delete(bak, true)
    spark.read.parquet(path)
  }

  private def fsOf(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Fresh sibling staging directory for a rewrite of `path`. DML plans
    * write HERE while reading the live table, then directories swap into
    * place — the plan never overwrites its own input (no persist/cache-loss
    * recompute hazard) and a crash mid-write leaves the live table intact. */
  private def stageDir(path: String): Path =
    new Path(path + ".__stage_" +
      java.util.UUID.randomUUID().toString.take(8))

  /** Move every `partCol=value` child of `staged` into `dest`, replacing
    * the previous partition directory — per-partition rename, so untouched
    * partitions are never rewritten. Returns the staged partition names.
    * Mirrors [[replaceTable]]'s backup discipline per partition: the live
    * dir is renamed aside (to a dot-prefixed name, which Spark's file
    * index treats as hidden if a crash leaves it behind) before the staged
    * dir moves in, every rename result is checked, and the backup is only
    * deleted once the new dir is verifiably in place. */
  private def swapPartitionDirs(fs: FileSystem, staged: Path, dest: Path,
                                partCol: String): Set[String] = {
    val dirs = fs.listStatus(staged)
      .filter(st => st.isDirectory && st.getPath.getName.startsWith(partCol + "="))
    dirs.foreach { st =>
      val target = new Path(dest, st.getPath.getName)
      val bak = new Path(dest, "._bak_" + st.getPath.getName)
      fs.delete(bak, true)
      if (fs.exists(target)) renameOrDie(fs, target, bak)
      renameOrDie(fs, st.getPath, target)
      require(fs.exists(target),
        s"partition swap left no dir at $target — backup kept at $bak")
      fs.delete(bak, true)
    }
    fs.delete(staged, true)
    dirs.map(_.getPath.getName).toSet
  }

  /** Rows of `table` living in a touched partition. NULL-SAFE semi-join:
    * a plain equi-semi-join would drop the NULL partition's rows from the
    * rewrite, so a partial DELETE/UPDATE inside the NULL partition would
    * silently discard that partition's non-matching rows. */
  private def touchedRows(table: DataFrame, touched: DataFrame,
                          partCol: String): DataFrame =
    table.join(touched.withColumnRenamed(partCol, "__touched_v"),
      col(partCol) <=> col("__touched_v"), "left_semi")

  /** Partition-scoped UPDATE (SplitUpdate parity,
    * `/root/reference/src/backend/executor/nodeSplitUpdate.c:169` routes
    * only affected rows): the table at `path` is partitioned on `partCol`;
    * only partitions that CONTAIN a matching row are rewritten, via
    * dynamic partition overwrite. I/O cost is O(touched partitions) —
    * untouched partition files are never read for the rewrite nor
    * replaced. The touched-partition set is derived plan-side (semi-join),
    * never collected to the driver. */
  def updateWherePartitioned(spark: SparkSession, path: String, partCol: String,
                             where: Column, set: Map[String, Column]): DataFrame = {
    val table = spark.read.parquet(path)
    val touched = table.filter(where).select(col(partCol)).distinct()
    val affected = touchedRows(table, touched, partCol)
    val updated = set.foldLeft(affected) { case (df, (name, value)) =>
      df.withColumn(name, when(where, value).otherwise(col(name)))
    }
    // Stage the rewritten partitions beside the table, then swap each
    // partition directory into place (only touched partitions move).
    val staged = stageDir(path)
    updated.write.mode(SaveMode.Overwrite).partitionBy(partCol)
      .parquet(staged.toString)
    swapPartitionDirs(fsOf(spark, path), staged, new Path(path), partCol)
    spark.read.parquet(path)
  }

  /** Partition-scoped DELETE: rewrite only partitions holding matching
    * rows; untouched partitions keep their files byte-for-byte. */
  def deleteWherePartitioned(spark: SparkSession, path: String, partCol: String,
                             where: Column): DataFrame = {
    val table = spark.read.parquet(path)
    val touched = table.filter(where).select(col(partCol)).distinct()
    // touched-partition VALUES are metadata-sized (bounded by partition
    // count) — collected before any mutation, while the table is pristine.
    // Directory names must be derived with the SAME escaping Spark's
    // writer uses (URL-style escaping of special chars, the Hive sentinel
    // for NULL) or a fully-emptied partition's delete silently misses.
    val touchedVals = touched.select(col(partCol).cast("string"))
      .collect().map { r =>
        val v = if (r.isNullAt(0)) ExternalCatalogUtils.DEFAULT_PARTITION_NAME
                else ExternalCatalogUtils.escapePathName(r.getString(0))
        s"$partCol=$v"
      }
    val kept = touchedRows(table, touched, partCol)
      .filter(!where || where.isNull)
    val staged = stageDir(path)
    kept.write.mode(SaveMode.Overwrite).partitionBy(partCol)
      .parquet(staged.toString)
    val fs = fsOf(spark, path)
    val stagedNames = swapPartitionDirs(fs, staged, new Path(path), partCol)
    // a touched partition whose EVERY row matched produces no staged dir —
    // its live directory must be removed, or the deleted rows survive.
    touchedVals.filterNot(stagedNames.contains)
      .foreach(name => fs.delete(new Path(path, name), true))
    spark.read.parquet(path)
  }

  /** MERGE INTO / upsert (PG15 MERGE, `nodeModifyTable.c` merge actions;
    * the reference routes matched rows to UPDATE and unmatched source
    * rows to INSERT). Spark-first: one left join decides matched-ness per
    * target row (updateCols take the SOURCE value when matched), one
    * anti join yields the inserts — a single shuffle on the key each,
    * no driver-side row handling. Source and target must share a schema. */
  def mergeInto(spark: SparkSession, path: String, source: DataFrame,
                keys: Seq[String], updateCols: Seq[String]): DataFrame = {
    val target = spark.read.parquet(path)
    require(target.columns.sorted.sameElements(source.columns.sorted),
      s"merge schema mismatch: ${target.columns.toSeq} vs ${source.columns.toSeq}")
    // PG15 MERGE raises "cannot affect row a second time" on duplicate
    // source keys; a bare left join would instead silently multiply
    // matched target rows. One cheap agg job guards the invariant.
    val dupKeys = source.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__n")).filter(col("__n") > 1).limit(1).count()
    require(dupKeys == 0,
      "MERGE source has duplicate keys — cannot affect a target row a second time")
    val src = source.columns.foldLeft(source)(
      (df, c) => df.withColumnRenamed(c, s"__s_$c"))
    val cond = keys.map(k => col(k) === col(s"__s_$k")).reduce(_ && _)
    val matched = col(s"__s_${keys.head}").isNotNull
    val updated = target.join(src, cond, "left").select(
      target.columns.map { c =>
        if (updateCols.contains(c))
          when(matched, col(s"__s_$c")).otherwise(col(c)).as(c)
        else col(c)
      }: _*)
    val inserts = source.join(
      target.select(keys.map(col): _*).distinct(), keys, "left_anti")
    replaceTable(spark, updated.unionByName(inserts), path)
  }

  /** Partition-scoped MERGE: like [[mergeInto]], but the table at `path`
    * is partitioned on `partCol` and only partitions that receive an
    * update or an insert are rewritten — I/O is O(touched partitions),
    * the SplitUpdate-style scale path for continuous upsert feeds. The
    * touched set is the source rows' `partCol` values (where inserts
    * land) UNION the partitions holding a matched key (updates rewrite
    * the matched row IN ITS OWN partition — when the match key doesn't
    * include `partCol`, a source row can match a row living in a
    * different partition, and that partition must be rewritten, not the
    * source's). Deriving matched partitions costs one keys-only
    * projection of the table — narrow columns, no payload scan. Same
    * duplicate-source-key guard as [[mergeInto]]. */
  def mergeIntoPartitioned(spark: SparkSession, path: String, partCol: String,
                           source: DataFrame, keys: Seq[String],
                           updateCols: Seq[String]): DataFrame = {
    require(!updateCols.contains(partCol),
      s"partition column $partCol cannot be an update column — a " +
        "partition-moving merge needs the SplitUpdate whole-table path")
    val table = spark.read.parquet(path)
    require(table.columns.sorted.sameElements(source.columns.sorted),
      s"merge schema mismatch: ${table.columns.toSeq} vs ${source.columns.toSeq}")
    val dupKeys = source.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__n")).filter(col("__n") > 1).limit(1).count()
    require(dupKeys == 0,
      "MERGE source has duplicate keys — cannot affect a target row a second time")
    val matchedParts = table
      .join(source.select(keys.map(col): _*).distinct(), keys, "left_semi")
      .select(col(partCol)).distinct()
    val touched = source.select(col(partCol))
      .unionByName(matchedParts).distinct()
    val affected = touchedRows(table, touched, partCol)
    val src = source.columns.foldLeft(source)(
      (df, c) => df.withColumnRenamed(c, s"__s_$c"))
    val cond = keys.map(k => col(k) === col(s"__s_$k")).reduce(_ && _)
    val matched = col(s"__s_${keys.head}").isNotNull
    val updated = affected.join(src, cond, "left").select(
      table.columns.map { c =>
        if (updateCols.contains(c))
          when(matched, col(s"__s_$c")).otherwise(col(c)).as(c)
        else col(c)
      }: _*)
    // anti-join against the WHOLE table's keys (not just touched
    // partitions): a key matched in any partition is an update, never a
    // duplicate-creating insert
    val inserts = source.join(
      table.select(keys.map(col): _*).distinct(), keys, "left_anti")
    val staged = stageDir(path)
    updated.unionByName(inserts)
      .write.mode(SaveMode.Overwrite).partitionBy(partCol)
      .parquet(staged.toString)
    swapPartitionDirs(fsOf(spark, path), staged, new Path(path), partCol)
    spark.read.parquet(path)
  }

  /** COPY TO (csv unload) and back. */
  def copyOutIn(spark: SparkSession, df: DataFrame, path: String): DataFrame = {
    df.write.mode(SaveMode.Overwrite)
      .option("header", "true").csv(path)
    spark.read.option("header", "true")
      .schema(df.schema).csv(path)
  }

  /** CLUSTER — physically re-sort a table by `sortCols`
    * (`/root/reference/src/backend/commands/cluster.c`: rewrite the heap
    * in index order). Spark-first: range-partition on the sort key, sort
    * within partitions, rewrite via the crash-safe staging swap. Every
    * output file then covers a DISJOINT key range, so any selective
    * filter on the cluster key prunes to ~one file via parquet row-group
    * min/max stats — the same I/O win the reference gets from a
    * clustered heap + BRIN-ish stats, with no index structure at all. */
  def rewriteSorted(spark: SparkSession, path: String, numFiles: Int,
                    sortCols: String*): DataFrame = {
    val sorted = spark.read.parquet(path)
      .repartitionByRange(numFiles, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
    replaceTable(spark, sorted, path)
  }

  /** Morton (Z-order) interleave of two columns already normalized to
    * [0, 2^16): 16 bits each, LSB-first, `a` on even positions. Pure bit
    * arithmetic, stays in whole-stage codegen. */
  def zValue(a: Column, b: Column): Column =
    (0 until 16).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(1L), 2 * i)
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(1L), 2 * i + 1))
    }.reduce(_ bitwiseOR _)

  /** CLUSTER ... USING zorder — multi-column physical layout (§2 maps the
    * reference's composite-index point lookups, `nodeIndexscan.c`, to
    * "Parquet min/max + Z-order"; this is that Z-order). Linear sort
    * gives the leading column disjoint per-file ranges but lets every
    * other column span the full domain in EVERY file; interleaving the
    * key bits bounds each file to a small rectangle in (a, b) space, so
    * min/max footer stats prune selective filters on EITHER column —
    * the executor-side analogue of a composite B-tree, with no index.
    *
    * Each column is min/max-normalized to a common 16-bit domain before
    * interleaving — raw interleave would let the wider-domain column's
    * high bits dominate the curve and starve the narrow column of any
    * locality (a partkey spanning 2^11 against a suppkey spanning 2^4
    * degenerates to a plain partkey sort). The min/max pass is one tiny
    * aggregate; Delta's OPTIMIZE ZORDER makes the same normalization via
    * per-column range ids. */
  def rewriteZOrder(spark: SparkSession, path: String, numFiles: Int,
                    colA: String, colB: String): DataFrame = {
    val df = spark.read.parquet(path)
    val r = df.agg(min(col(colA)).cast("long"), max(col(colA)).cast("long"),
      min(col(colB)).cast("long"), max(col(colB)).cast("long")).head()
    // scale in DOUBLE: the integer form ((x-lo) * 65535) overflows Long
    // once the domain exceeds ~1.4e14 (epoch-micros ranges qualify) and
    // would silently scramble the curve; double keeps 52 bits of the
    // offset, far beyond the 16 bits the interleave consumes
    def norm(c: String, lo: Long, hi: Long): Column =
      ((col(c).cast("double") - lo) * 65535.0 / math.max(hi - lo, 1L))
        .cast("long")
    val z = df.withColumn("__z",
        zValue(norm(colA, r.getLong(0), r.getLong(1)),
               norm(colB, r.getLong(2), r.getLong(3))))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
    replaceTable(spark, z, path)
  }

  /** VACUUM/compaction (the AO-segment compaction half of
    * `/root/reference/src/backend/commands/vacuum.c` — reclaim the
    * small-file debris that micro-batch ingest and partition-scoped DML
    * leave behind). Coalesces the table into ceil(bytes/targetBytes)
    * files via the same crash-safe staging swap. At 100 TB the
    * small-file problem IS the scan-latency problem: footer reads and
    * task scheduling dominate once files shrink below ~100 MB. */
  def compact(spark: SparkSession, path: String,
              targetFileBytes: Long = 128L << 20): DataFrame = {
    val fs = fsOf(spark, path)
    val bytes = fs.getContentSummary(new Path(path)).getLength
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    replaceTable(spark, spark.read.parquet(path).repartition(nFiles), path)
  }

  /** Storage introspection — the pgstattuple / pg_freespacemap role
    * (`/root/reference/contrib/pgstattuple/pgstattuple.c` pgstat_heap:
    * table_len, tuple_count/len, dead-tuple accounting). Parquet mapping:
    * one row per COLUMN aggregated over every row group's footer
    * metadata — rows, row groups, files, compressed/uncompressed bytes
    * (compression ratio = the dead-space analogue), null counts, and
    * min/max-statistics coverage (what the planner can prune on).
    *
    * Footer reads are DISTRIBUTED — the file list fans out as a Dataset
    * and each task opens only its own footers (metadata-only I/O), so the
    * sweep scales to a 100 TB table's file count instead of serializing
    * through the driver. */
  def statTable(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val fs = fsOf(spark, path)
    // RECURSIVE listing so partitioned layouts (path/col=v/part-*.parquet)
    // report their leaves, not an empty frame
    val files = {
      val it = fs.listFiles(new Path(path), true)
      val b = Seq.newBuilder[String]
      while (it.hasNext) {
        val st = it.next()
        if (st.getPath.getName.endsWith(".parquet")) b += st.getPath.toString
      }
      b.result()
    }
    // session Hadoop conf shipped as a Map (the CopyBinary mechanism —
    // a bare new Configuration() on the executor would drop
    // spark.hadoop.* auth/defaultFS settings on any non-local store)
    val confMap = hadoopConfMap(spark)
    val perColumn = files.toDS().flatMap { f =>
      import org.apache.parquet.hadoop.ParquetFileReader
      import org.apache.parquet.hadoop.util.HadoopInputFile
      import scala.jdk.CollectionConverters._
      val conf = new org.apache.hadoop.conf.Configuration(false)
      confMap.foreach { case (k, v) => conf.set(k, v) }
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(
        new Path(f), conf))
      try {
        reader.getFooter.getBlocks.asScala.toSeq.flatMap { b =>
          b.getColumns.asScala.toSeq.map { c =>
            val st = Option(c.getStatistics)
            (f, c.getPath.toDotString, b.getRowCount,
             c.getTotalSize, c.getTotalUncompressedSize,
             st.filter(_.isNumNullsSet).map(_.getNumNulls).getOrElse(-1L),
             st.exists(s => s.hasNonNullValue))
          }
        }
      } finally reader.close()
    }.toDF("file", "column", "rg_rows", "comp_bytes", "uncomp_bytes",
           "n_nulls", "has_minmax")
    perColumn.groupBy(col("column"))
      .agg(countDistinct(col("file")).as("n_files"),
           count(lit(1)).as("n_row_groups"),
           sum(col("rg_rows")).as("n_rows"),
           sum(col("comp_bytes")).as("comp_bytes"),
           sum(col("uncomp_bytes")).as("uncomp_bytes"),
           sum(when(col("n_nulls") >= 0, col("n_nulls"))).as("n_nulls"),
           avg(col("has_minmax").cast("int")).as("minmax_coverage"))
      .withColumn("compression_ratio",
        round(col("uncomp_bytes") / greatest(col("comp_bytes"), lit(1L)), 3))
      .orderBy(col("column"))
  }

  /** amcheck analogue (`/root/reference/contrib/amcheck/verify_nbtree.c`
    * — index-order and bound-invariant verification; amcheck's contract
    * is "empty result = invariants hold"): verify the PHYSICAL-LAYOUT
    * invariants the engine's index analogues rely on, as a violations
    * report with one row per breach:
    *
    *   - `overlap`: two files' [min, max] ranges of the layout key
    *     overlap — breaks the CLUSTER/`rewriteSorted` premise that a
    *     selective predicate prunes to few files (the analogue of a
    *     btree page whose keys stray outside its parent's bounds);
    *   - `rowcount`: a file's parquet-footer row count disagrees with
    *     its scanned row count (metadata/data divergence — amcheck's
    *     heap/index disagreement class).
    *
    * One distributed data scan (per-file extremes via input_file_name)
    * plus one distributed footer sweep; the overlap check joins per-FILE
    * summaries — one row per file — never data, so verification scales
    * with file count like the statTable sweep. */
  def checkTable(spark: SparkSession, path: String,
                 keyCol: String): DataFrame = {
    import spark.implicits._
    val norm = (c: Column) => regexp_replace(c, "^file:/+", "file:/")
    val perFile = spark.read.parquet(path)
      .groupBy(norm(input_file_name()).as("file"))
      .agg(min(col(keyCol)).as("kmin"), max(col(keyCol)).as("kmax"),
           count(lit(1)).as("actual_rows"))
    val fs = fsOf(spark, path)
    val files = {
      val it = fs.listFiles(new Path(path), true)
      val b = Seq.newBuilder[String]
      while (it.hasNext) {
        val st = it.next()
        if (st.getPath.getName.endsWith(".parquet")) b += st.getPath.toString
      }
      b.result()
    }
    val confMap = hadoopConfMap(spark)
    val footer = files.toDS().map { f =>
      import org.apache.parquet.hadoop.ParquetFileReader
      import org.apache.parquet.hadoop.util.HadoopInputFile
      import scala.jdk.CollectionConverters._
      val conf = new org.apache.hadoop.conf.Configuration(false)
      confMap.foreach { case (k, v) => conf.set(k, v) }
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(
        new Path(f), conf))
      try (f, reader.getFooter.getBlocks.asScala.map(_.getRowCount).sum)
      finally reader.close()
    }.toDF("file", "footer_rows")
      .withColumn("file", norm(col("file")))
    val a = perFile.select(col("file").as("fa"), col("kmin").as("amin"),
      col("kmax").as("amax"))
    val b = perFile.select(col("file").as("fb"), col("kmin").as("bmin"),
      col("kmax").as("bmax"))
    val overlaps = a.join(b, col("fa") < col("fb") &&
        col("amin") <= col("bmax") && col("bmin") <= col("amax"))
      .select(lit("overlap").as("check"), col("fa").as("file"),
        col("fb").as("other_file"),
        concat(lit("key ranges ["), col("amin"), lit(", "), col("amax"),
          lit("] and ["), col("bmin"), lit(", "), col("bmax"),
          lit("] overlap")).as("detail"))
    val badCounts = perFile.join(footer, Seq("file"))
      .filter(col("actual_rows") =!= col("footer_rows"))
      .select(lit("rowcount").as("check"), col("file"),
        lit(null).cast("string").as("other_file"),
        concat(lit("scanned "), col("actual_rows"), lit(" rows, footer says "),
          col("footer_rows")).as("detail"))
    overlaps.unionByName(badCounts)
  }

  /** pg_prewarm analogue (`/root/reference/contrib/pg_prewarm/
    * pg_prewarm.c` — eagerly populate the buffer cache): materialize the
    * frame into the executor block-manager cache and return the rows
    * warmed. Subsequent actions on the RETURNED frame read
    * InMemoryTableScan, not parquet (asserted in IngestSpec). */
  def prewarm(df: DataFrame): (DataFrame, Long) = {
    val cached = df.persist()
    (cached, cached.count())
  }

  /** The session's Hadoop configuration as a serializable Map, for
    * executor-side filesystem/footer access (Configuration itself is not
    * serializable; see CopyBinary for the original rationale). */
  private[sources] def hadoopConfMap(spark: SparkSession): Map[String, String] = {
    val c = spark.sessionState.newHadoopConf()
    val b = Map.newBuilder[String, String]
    val it = c.iterator()
    while (it.hasNext) { val e = it.next(); b += (e.getKey -> e.getValue) }
    b.result()
  }

  /** Parquet BLOOM-FILTER indexing for point lookups on non-sort keys —
    * the lakehouse analogue of the reference's secondary index AMs
    * (`/root/reference/src/backend/access/brin/`, bitmap/btree indexes;
    * GP's AO tables pair block directories with indexes for the same
    * purpose). Min/max row-group stats only prune when the file is
    * SORTED by the predicate column; a bloom filter prunes row groups
    * for equality predicates on ANY column at ~1 byte/row cost. Spark's
    * parquet reader consumes them automatically under the default
    * filter pushdown, so at 100 TB a needle query touches only the row
    * groups whose filter admits the key. */
  def writeWithBloom(spark: SparkSession, df: DataFrame, path: String,
                     bloomCols: Seq[String],
                     expectedNdv: Long = 100000L): DataFrame = {
    // dictionary off for the bloom columns: parquet-mr omits the filter
    // when a chunk stays fully dictionary-encoded (the dictionary already
    // filters exactly) — a high-NDV key at scale always falls out of the
    // dictionary, so forcing the non-dict path here makes the small-SF
    // files carry the same index shape the 100 TB files would
    val w = bloomCols.foldLeft(df.write.mode(SaveMode.Overwrite)) { (w, c) =>
      w.option(s"parquet.bloom.filter.enabled#$c", "true")
        .option(s"parquet.bloom.filter.expected.ndv#$c", expectedNdv.toString)
        .option(s"parquet.enable.dictionary#$c", "false")
    }
    w.parquet(path)
    spark.read.parquet(path)
  }

  /** JSON-lines unload/load (the reference's `COPY ... (FORMAT json)` /
    * json external tables): schema re-imposed on read, so types survive
    * the text round-trip. */
  def copyOutInJson(spark: SparkSession, df: DataFrame, path: String): DataFrame = {
    df.write.mode(SaveMode.Overwrite).json(path)
    spark.read.schema(df.schema).json(path)
  }

  /** ORC unload/load — the second columnar format (AO-column-store
    * analogue beside Parquet); types carried natively. */
  def copyOutInOrc(spark: SparkSession, df: DataFrame, path: String): DataFrame = {
    df.write.mode(SaveMode.Overwrite).orc(path)
    spark.read.orc(path)
  }

  /** ALTER TABLE schema evolution, lakehouse-style
    * (`/root/reference/src/backend/commands/tablecmds.c` ADD/DROP
    * COLUMN; GP AO tables rewrite or fill defaults lazily).
    *
    * ADD COLUMN is metadata-only: newly appended files simply carry the
    * extra column; readers union file footers (`mergeSchema`) and old
    * rows surface the reference's missing-column semantics — NULL, or
    * the declared default via coalesce. Nothing is rewritten.
    * DROP COLUMN is projection-on-read (the reference, too, only marks
    * the attribute dropped — `attisdropped` — and filters it out of
    * every scan; physical reclamation waits for a table rewrite).
    *
    * Known delta vs the reference: the coalesce-over-merged-scan default
    * cannot distinguish "column absent from a pre-ADD file" from "explicit
    * NULL written after ADD COLUMN" — a new-schema row inserted with the
    * column explicitly NULL reads back as the default, where tablecmds.c
    * fills the default only for pre-existing rows. Distinguishing them
    * needs per-file schema tagging (input_file_name × footer schema);
    * accepted for now since writers here never store explicit NULLs into
    * defaulted evolved columns. */
  def readEvolved(spark: SparkSession, path: String,
                  defaults: Map[String, Any] = Map.empty,
                  dropped: Seq[String] = Nil): DataFrame = {
    val df = spark.read.option("mergeSchema", "true").parquet(path)
    val defaulted = defaults.foldLeft(df) { case (d, (c, v)) =>
      // the column may not exist in ANY file yet — ADD COLUMN is visible
      // immediately in the reference, before the first new-schema insert
      if (d.columns.contains(c)) d.withColumn(c, coalesce(col(c), lit(v)))
      else d.withColumn(c, lit(v))
    }
    val kept = defaulted.columns.filterNot(dropped.contains)
    defaulted.select(kept.map(col): _*)
  }
}
