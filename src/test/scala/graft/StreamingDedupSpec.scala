package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.streaming.Streaming

/** Streaming MinHash-LSH admission ([[Streaming.streamingMinhashDedup]]):
  * decisions must equal an INDEPENDENT sequential replay of the
  * documented contract (greedy first-wins across batches; id-minimal
  * per bucket within a batch; rejected docs never poison the store),
  * the band store must keep unique keys, the store probe must be
  * partition-pruned on pfx, and a restart with no new data must be a
  * pure no-op. */
class StreamingDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val textA = "the quick brown fox jumps over the lazy dog tonight"
  private val textB = "colorless green ideas sleep furiously under warm rain"
  private val textC = "distributed query engines shuffle data between many executors"

  private def writeBatchFile(dir: String, docs: Seq[(Long, String)]): Unit =
    docs.toDF("doc_id", "text").coalesce(1)
      .write.mode("append").parquet(dir)

  test("admission matches the sequential replay oracle across batches") {
    val src = java.nio.file.Files.createTempDirectory("sdedup_src").toString
    val store = java.nio.file.Files.createTempDirectory("sdedup_store").toString
    val ckpt = java.nio.file.Files.createTempDirectory("sdedup_ckpt").toString

    // batch 0: a pair of identical docs (within-batch dup) + a distinct
    writeBatchFile(src, Seq(1L -> textA, 2L -> textA, 3L -> textB))
    Streaming.streamingMinhashDedup(spark, src, store, ckpt)
    // batch 1: a store dup of textA, a new text (twice), a tiny doc
    writeBatchFile(src, Seq(4L -> textA, 5L -> textC, 6L -> textC, 7L -> "hi"))
    Streaming.streamingMinhashDedup(spark, src, store, ckpt)
    // MID-STREAM compaction: batches 0-1 fold into a base generation;
    // batch 2 must replay against the compacted store bit-identically
    assert(Streaming.compactStore(spark, store) > 0,
      "two committed batches must fold")
    // batch 2: store dups of both earlier survivors
    writeBatchFile(src, Seq(8L -> textC, 9L -> textB))
    val decisions = Streaming.streamingMinhashDedup(spark, src, store, ckpt)

    val got = decisions.select("doc_id", "is_dup").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got.keySet == (1L to 9L).toSet, "every doc decided exactly once")

    // ---- independent replay of the contract ---------------------------
    val allDocs = Seq(1L -> textA, 2L -> textA, 3L -> textB, 4L -> textA,
      5L -> textC, 6L -> textC, 7L -> "hi", 8L -> textC, 9L -> textB)
    val bands = graft.queries.Dedup
      .minhashBands(allDocs.toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), (r.getInt(1), r.getLong(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val batches = decisions.select("doc_id", "batch").collect()
      .map(r => r.getLong(0) -> r.getLong(2 - 1)).groupBy(_._2)
      .toSeq.sortBy(_._1).map(_._2.map(_._1).sorted)
    var storeSigs = Set.empty[(Int, Long)]
    val replayDup = scala.collection.mutable.Map.empty[Long, Boolean]
    batches.foreach { ids =>
      val storeDups = ids.filter(id =>
        bands.getOrElse(id, Set.empty).exists(storeSigs)).toSet
      val rem = ids.filterNot(storeDups)
      val withinDups = rem.filter { id =>
        rem.exists(o => o < id &&
          bands.getOrElse(id, Set.empty)
            .intersect(bands.getOrElse(o, Set.empty)).nonEmpty)
      }.toSet
      ids.foreach(id => replayDup(id) = storeDups(id) || withinDups(id))
      (rem.filterNot(withinDups)).foreach(id =>
        storeSigs ++= bands.getOrElse(id, Set.empty))
    }
    assert(got == replayDup.toMap, "stream decisions == sequential replay")
    // sanity on the crafted shape
    assert(got.filter(_._2).keySet == Set(2L, 4L, 6L, 8L, 9L))

    // ---- structural invariants ---------------------------------------
    // the store holds bands of ADMITTED docs only, with UNIQUE keys —
    // the probe is a key join with no fan-out. Read through the
    // generation-aware reader: after the mid-stream compaction the root
    // holds base_1 (batches 0-1 folded, batch now a data column) plus
    // the live batch=2 dir.
    val hconf = spark.sparkContext.hadoopConfiguration
    def storeDf = Streaming.readStore(spark, hconf, s"$store/bands",
      "band INT, sig BIGINT, owner_doc BIGINT, pfx INT, batch BIGINT").get
    // the folded dirs are gone from disk (listing is O(live batches))
    val bandDirs = new java.io.File(s"$store/bands").listFiles()
      .map(_.getName).filter(_.startsWith("batch=")).toSet
    assert(bandDirs == Set("batch=2"),
      s"batches 0-1 must be folded away, saw $bandDirs")
    val dupKeys = storeDf.groupBy("band", "sig")
      .count().filter(col("count") > 1).count()
    assert(dupKeys == 0, "store (band,sig) keys must stay unique")
    val owners = storeDf.select("owner_doc").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(owners.subsetOf(Set(1L, 3L, 5L)), s"unexpected owners $owners")

    // the probe is partition-PRUNED: filtering the store on a pfx
    // subset must reach the scan as a partition filter, not a data scan
    val pruned = storeDf.filter(col("pfx").isin(0, 1, 2))
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("pfx"),
      s"pfx must prune partitions:\n$scan")

    // ---- restart with no new data is a pure no-op --------------------
    val before = decisions.collect().map(_.toSeq).toSet
    val storeBefore = storeDf.count()
    val again = Streaming.streamingMinhashDedup(spark, src, store, ckpt)
    assert(again.collect().map(_.toSeq).toSet == before)
    assert(storeDf.count() == storeBefore)

    // ---- compaction is idempotent and preserves the batch column -----
    Streaming.compactStore(spark, store) // folds batch 2
    assert(Streaming.compactStore(spark, store) == 0, "nothing left to fold")
    val compacted = Streaming.streamingMinhashDedup(spark, src, store, ckpt)
    assert(compacted.collect().map(_.toSeq).toSet == before,
      "decisions (including original batch ids) survive full compaction")
    assert(storeDf.count() == storeBefore)

    // a fresh store is stamped with the current format version
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(store, "_format")).trim == "2")
  }

  test("a store written by an incompatible format version is refused") {
    def newDirs() = (
      java.nio.file.Files.createTempDirectory("sfmt_src").toString,
      java.nio.file.Files.createTempDirectory("sfmt_store").toString,
      java.nio.file.Files.createTempDirectory("sfmt_ckpt").toString)

    // v1 store: committed band data, no _format marker (the pre-BIGINT
    // layout). The run must refuse with a regenerate message instead of
    // dying on a parquet type mismatch mid-stream.
    val (src1, store1, ckpt1) = newDirs()
    writeBatchFile(src1, Seq(1L -> textA))
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(store1, "bands", "batch=0"))
    val e1 = intercept[IllegalStateException] {
      Streaming.streamingMinhashDedup(spark, src1, store1, ckpt1)
    }
    assert(e1.getMessage.contains("regenerate"), e1.getMessage)

    // explicit marker from a FUTURE format: also refused, clearly
    val (src2, store2, ckpt2) = newDirs()
    writeBatchFile(src2, Seq(1L -> textA))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(store2, "_format"), "99\n")
    val e2 = intercept[IllegalArgumentException] {
      Streaming.streamingMinhashDedup(spark, src2, store2, ckpt2)
    }
    assert(e2.getMessage.contains("regenerate"), e2.getMessage)

    // matching marker + empty store: runs clean (the marker is not a
    // one-shot init side effect, it is checked/kept across restarts)
    val (src3, store3, ckpt3) = newDirs()
    writeBatchFile(src3, Seq(1L -> textA, 2L -> textB))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(store3, "_format"), "2\n")
    val dec = Streaming.streamingMinhashDedup(spark, src3, store3, ckpt3)
    assert(dec.count() == 2)
  }
}
