package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming count-min maintenance: linearity means the streamed sketch
  * must equal the batch-built sketch exactly, across batches and
  * restarts. */
class StreamingSketchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  private def cells(df: DataFrame): Map[(Int, Long), Long] =
    df.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap

  private def batchCells(docs: DataFrame): DataFrame = {
    import graft.queries.Sketches
    docs.select(explode(split(col("text"), " ")).as("w"))
      .select(explode(array((1 to Sketches.CmDepth).map(j =>
        struct(lit(j).as("j"),
          Sketches.bucket(j, col("w"), Sketches.CmWidth).as("b"))): _*))
        .as("jb"))
      .groupBy(col("jb.j").as("j"), col("jb.b").as("b"))
      .agg(count(lit(1)).as("c"))
  }

  test("streamed count-min equals the batch-built sketch cell-for-cell") {
    import java.nio.file.Files
    val src = Files.createTempDirectory("cms_src").toString
    val sk = Files.createTempDirectory("cms_sk").toString + "/s"
    val ckp = Files.createTempDirectory("cms_ckp").toString
    val all = Tables.t(spark, sf, "documents")
      .select(col("doc_id"), col("text")).filter(col("doc_id") < 300)
    def run(): Unit =
      graft.streaming.Streaming.streamingCountMin(spark, src, sk, ckp)
    // three batches on restarted queries over one checkpoint
    for ((lo, hi) <- Seq((0, 100), (100, 200), (200, 300))) {
      all.filter(col("doc_id") >= lo && col("doc_id") < hi)
        .write.mode("append").parquet(src)
      run()
    }
    val streamed = cells(graft.sources.Matviews.read(spark, sk)
      .select(col("j"), col("b"), col("c")))
    val batch = cells(batchCells(all))
    assert(streamed == batch,
      "linear-sketch merge must reproduce the batch build exactly")
    assert(streamed.nonEmpty && streamed.values.sum > 0)
    // idle restart: nothing re-applied
    run()
    assert(cells(graft.sources.Matviews.read(spark, sk)
      .select(col("j"), col("b"), col("c"))) == batch)
  }

  test("streaming IVF add assigns bit-equal to the batch kernel, exactly once") {
    import java.nio.file.Files
    val store = Files.createTempDirectory("ivf_store").toString
    val src = Files.createTempDirectory("ivf_src").toString
    val ckp = Files.createTempDirectory("ivf_ckp").toString
    // fit-once base index over the corpus
    graft.queries.Similarity.ivfEnsurePersisted(spark, sf, store)
    // "new arrivals": the same embeddings with shifted ids, three
    // micro-batch deliveries over restarted queries on one checkpoint
    val arrivals = Tables.t(spark, sf, "embeddings")
      .select((col("vec_id") + 100000L).as("vec_id"),
              col("embedding").cast("array<double>").as("embedding"))
    def run(): Unit =
      graft.streaming.Streaming.streamingIvfAdd(spark, src, store, ckp)
    for ((lo, hi) <- Seq((0, 150), (150, 300), (300, 500))) {
      arrivals.filter(col("vec_id") >= 100000L + lo &&
                      col("vec_id") < 100000L + hi)
        .write.mode("append").parquet(src)
      run()
    }
    val streamed = spark.read.parquet(s"$store/ivf_cells_stream")
      .select(col("vec_id"), col("cell")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    // batch reference: load the SAME persisted centroids, assign via the
    // broadcast lane over all arrivals at once
    val cs = graft.queries.Similarity.ivfLoadCentroids(spark, store)
    val batch = graft.queries.Similarity.ivfAssignBroadcast(
        arrivals.withColumnRenamed("embedding", "v"),
        graft.queries.Similarity.centroidsDf(spark, cs))
      .select(col("vec_id"), col("cell")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(streamed == batch,
      "streamed assignments must bit-equal the batch kernel over the same centroids")
    assert(streamed.size == 500)
    // exactly-once: an idle restart appends nothing, ids stay unique
    run()
    val after = spark.read.parquet(s"$store/ivf_cells_stream")
      .select(col("vec_id")).collect().map(_.getLong(0))
    assert(after.length == 500 && after.distinct.length == 500)
    // the base index is untouched: stream codes live in their own table
    assert(spark.read.parquet(s"$store/ivf_cells").count() == 500)
  }
}
