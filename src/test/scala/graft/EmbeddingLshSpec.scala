package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Dedup

/** Recall proof for the embedding sign-LSH scale path: on a corpus whose
  * qualifying pairs are GENUINE near-duplicates (the regime the operator
  * exists for — cos >= 0.9999 planted dups, exact-duplicate hot cluster,
  * orthogonal background), the banded candidate stage loses nothing:
  * d_dedup_embedding_lsh output == d_dedup_embedding (exact all-pairs)
  * output, while touching a fraction of the pair space. The sf0.01
  * driver corpus intentionally does NOT have this property — its
  * threshold pairs are background correlation at cos ~0.45-0.6, where
  * banding recall is designed-low (see Dedup.EmbBands scaladoc) and the
  * DuckDB oracle replicates the banding predicate instead. */
class EmbeddingLshSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val dim = 64
  /** deterministic planted corpus:
    *  - 64 basis docs  (vec_id k,      v = e_k) — mutually orthogonal;
    *  - 64 near-dups   (vec_id 100+k,  v = e_k + 0.01 e_((k+17)%64)),
    *    cos vs base_k = 1/sqrt(1.0001) ~ 0.99995;
    *  - 100 exact copies of e_5 (vec_id 1000..1099) — the hot cluster.
    * Every cross pair not listed sits at cos <= 0.01 — far below 0.45. */
  private def corpus: Seq[(Long, Array[Double])] = {
    def e(k: Int): Array[Double] =
      Array.tabulate(dim)(i => if (i == k) 1.0 else 0.0)
    def dup(k: Int): Array[Double] = {
      val v = e(k); v((k + 17) % dim) = 0.01; v
    }
    (0 until dim).map(k => (k.toLong, e(k))) ++
      (0 until dim).map(k => (100L + k, dup(k))) ++
      (0 until 100).map(i => (1000L + i, e(5)))
  }

  private lazy val dir: String = {
    val sp = spark; import sp.implicits._
    val d = java.nio.file.Files.createTempDirectory("emblsh").toString
    corpus.toDF("vec_id", "v")
      .select(col("vec_id"), col("v").as("embedding"), lit("a").as("label"))
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  private def pairs(name: String): Set[(Long, Long, Double)] =
    SparkEntry.queries(name)(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("LSH candidates lose no genuine near-dup: output == all-pairs output") {
    val exact = pairs("d_dedup_embedding")
    val lsh = pairs("d_dedup_embedding_lsh")
    assert(exact.nonEmpty)
    assert(lsh == exact,
      s"missed=${(exact -- lsh).take(5)} extra=${(lsh -- exact).take(5)}")
    // structure sanity: 64 planted dup pairs + hot-cluster internal pairs
    // (C(100,2)) + hot-cluster x base_5 (100) + hot-cluster x dup_5 (100)
    assert(exact.size == 64 + 100 * 99 / 2 + 100 + 100)
  }

  test("candidate stage touches a fraction of the pair space") {
    val sp = spark; import sp.implicits._
    val e = corpus.toDF("vec_id", "v")
    val n = corpus.size.toLong
    val nCand = Dedup.embeddingLshCandidates(e, Dedup.MaxBucket).count()
    // all-pairs would be n(n-1)/2; banding must prune hard even though
    // the hot cluster (identical signatures, all 6 bands) is candidate-
    // complete by construction
    assert(nCand < n * (n - 1) / 2 / 3, s"candidates $nCand not pruned")
    assert(nCand >= 100L * 99 / 2 + 64)
  }
}
