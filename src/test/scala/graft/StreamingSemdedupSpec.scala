package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.streaming.Streaming

/** Streaming semantic-dedup admission
  * ([[Streaming.streamingSemdedupAdmission]]): decisions must equal an
  * INDEPENDENT sequential replay of the documented contract (store-owner
  * cosine verification at SemTau, greedy first-wins across batches,
  * within-batch star around each bucket's min id, min-id bucket claims),
  * the band store must keep unique keys, the vector store one row per
  * admitted vector, the store probe must be partition-pruned on pfx,
  * and a restart with no new data must be a pure no-op. */
class StreamingSemdedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  test("admission matches the sequential replay oracle across batches") {
    import graft.queries.{Dedup, Hyperplanes, Similarity}
    val tau = Similarity.SemTau
    val src = java.nio.file.Files.createTempDirectory("ssem_src").toString
    val store = java.nio.file.Files.createTempDirectory("ssem_store").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ssem_ckpt").toString

    val base = spark.read.parquet(s"$sf/embeddings.parquet")
      .selectExpr("vec_id", "CAST(embedding AS array<double>) AS v")
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    val n = base.length
    val maxId = base.map(_._1).max
    val half = n / 2
    // batch 0: first half. batch 1: second half + exact copies of three
    // batch-0 vectors under fresh ids (guaranteed store rejects: identical
    // vectors share every band at cosine 1). batch 2: two more copies +
    // one NEGATED batch-0 vector (flips every sign bit, so it shares no
    // band with its source and must admit).
    val b0 = base.take(half)
    val b1 = base.drop(half) ++
      base.take(3).zipWithIndex.map { case ((_, v), i) => (maxId + 1 + i, v) }
    val b2 = base.slice(3, 5).zipWithIndex
      .map { case ((_, v), i) => (maxId + 10 + i, v) } :+
      (maxId + 20, base.head._2.map(x => -x))
    val batches = Seq(b0, b1, b2)

    def writeWave(rows: Seq[(Long, Array[Double])]): Unit = {
      import spark.implicits._
      rows.toDF("vec_id", "embedding").coalesce(1)
        .write.mode("append").parquet(src)
    }
    var decisions: org.apache.spark.sql.DataFrame = null
    batches.zipWithIndex.foreach { case (w, i) =>
      writeWave(w)
      decisions = Streaming.streamingSemdedupAdmission(spark, src, store, ckpt)
      // MID-STREAM compaction after wave 1: batches 0-1 (vectors, bands,
      // decisions) fold into base generations; wave 2 must probe the
      // compacted store and reproduce the replay oracle bit-identically
      if (i == 1) assert(Streaming.compactStore(spark, store) > 0)
    }
    val got = decisions.select("vec_id", "is_dup").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got.keySet == batches.flatten.map(_._1).toSet,
      "every vector decided exactly once")

    // ---- independent replay of the contract ---------------------------
    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var i = 0; val m = math.min(a.length, b.length)
      while (i < m) { d += a(i) * b(i); i += 1 }
      round6(d / math.sqrt(
        a.map(x => x * x).sum * b.map(x => x * x).sum))
    }
    val planes = (0 until Dedup.EmbBands * Dedup.EmbBandBits)
      .map(j => Hyperplanes.plane(j).toArray)
    def sig(v: Array[Double]): Long = planes.indices.map { j =>
      var d = 0.0; var i = 0
      val m = math.min(v.length, planes(j).length)
      while (i < m) { d += v(i) * planes(j)(i); i += 1 }
      if (d > 0) 1L << j else 0L
    }.sum
    val mask = (1L << Dedup.EmbBandBits) - 1
    def bandsOf(v: Array[Double]): Seq[(Int, Long)] = {
      val s = sig(v)
      (0 until Dedup.EmbBands).map(b => b -> ((s >> (b * Dedup.EmbBandBits)) & mask))
    }
    val vecOf = batches.flatten.toMap
    val storeModel = scala.collection.mutable.Map.empty[(Int, Long), Long]
    val replay = scala.collection.mutable.Map.empty[Long, Boolean]
    batches.foreach { w =>
      val ids = w.map(_._1).sorted
      val storeRej = ids.filter(id => bandsOf(vecOf(id)).exists(bk =>
        storeModel.get(bk).exists(o => cos(vecOf(id), vecOf(o)) >= tau)))
      val remaining = ids.filterNot(storeRej.toSet)
      val centers = remaining.flatMap(id => bandsOf(vecOf(id)).map(_ -> id))
        .groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
      val withinRej = remaining.filter(m => bandsOf(vecOf(m)).exists(bk =>
        centers(bk) < m && cos(vecOf(centers(bk)), vecOf(m)) >= tau))
      val admitted = remaining.filterNot(withinRej.toSet)
      ids.foreach(id =>
        replay(id) = storeRej.contains(id) || withinRej.contains(id))
      admitted.foreach(id => bandsOf(vecOf(id)).foreach(bk =>
        if (!storeModel.contains(bk)) storeModel(bk) = id))
    }
    assert(got == replay.toMap, "stream decisions == sequential replay")
    // the crafted copies are rejected; the negated vector admits
    assert((maxId + 1 to maxId + 3).forall(got(_)), "copies must reject")
    assert(!got(maxId + 20), "negated vector shares no band: must admit")
    assert(got.valuesIterator.exists(identity) &&
      got.valuesIterator.exists(!_), "fixture must be nontrivial")

    // ---- structural invariants ---------------------------------------
    // generation-aware read: after the mid-stream compaction the roots
    // hold base_1 plus the live batch=2 dir
    val hconf = spark.sparkContext.hadoopConfiguration
    val bandStore = Streaming.readStore(spark, hconf, s"$store/bands",
      "band INT, key BIGINT, owner_vec BIGINT, pfx INT, batch BIGINT").get
    assert(bandStore.groupBy("band", "key").count()
      .filter(col("count") > 1).count() == 0,
      "store (band, key) keys must stay unique")
    assert(bandStore.collect().map(r => (r.getInt(0), r.getLong(1)) ->
      r.getLong(2)).toMap == storeModel.toMap,
      "store ownership must equal the replay model's")
    val vecStore = Streaming.readStore(spark, hconf, s"$store/vectors",
      "vec_id BIGINT, v ARRAY<DOUBLE>, nrm DOUBLE, vpfx INT, batch BIGINT").get
    assert(vecStore.groupBy("vec_id").count()
      .filter(col("count") > 1).count() == 0,
      "one vector-store row per admitted vector")
    assert(vecStore.select("vec_id").collect().map(_.getLong(0)).toSet ==
      got.filterNot(_._2).keySet, "vector store == admitted set")

    // probe pruning: a pfx subset filter must reach the scan as a
    // partition filter
    val pruned = bandStore.filter(col("pfx").isin(0, 1, 2))
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("pfx"),
      s"pfx must prune partitions:\n$scan")

    // ---- restart with no new data is a pure no-op --------------------
    val before = decisions.collect().map(_.toSeq).toSet
    val bandsBefore = bandStore.count()
    val again = Streaming.streamingSemdedupAdmission(spark, src, store, ckpt)
    assert(again.collect().map(_.toSeq).toSet == before)
    assert(bandStore.count() == bandsBefore)

    // format marker stamped
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(store, "_format")).trim == "1")
  }
}
