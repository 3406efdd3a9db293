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
}
