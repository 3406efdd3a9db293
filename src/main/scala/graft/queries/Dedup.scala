package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Deduplication operators for large-scale training-data pipelines —
  * additive capability beyond the reference's own surface (the reference's
  * closest analogue is DISTINCT / UNION dedup, `nodeUnique.c` /
  * `nodeSetOp.c`), designed Spark-first for the 100 TB case:
  *
  *  - exact dedup: hash-groupBy on a content digest — one shuffle on the
  *    digest, no driver state;
  *  - MinHash+LSH: shingle -> 16 minhashes -> 8 bands -> bucket join, so
  *    candidate generation is an equi-join on (band, signature), never an
  *    O(n^2) cross join; exact Jaccard verification only touches candidate
  *    pairs;
  *  - SimHash: 48-bit signature, 4-band blocking (pigeonhole: any pair at
  *    Hamming distance <= 3 shares a band), verify with bit_count;
  *  - n-gram Jaccard: blocked pairwise compare inside small blocks;
  *  - embedding cosine near-dup: brute-force within-threshold pairs (the
  *    LSH-bucketed scale path lives in Similarity.scala).
  */
object Dedup extends QueryModule {

  /** distinct word-3-shingles per doc: (doc_id, sh) */
  private def shingles(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(w)-3), i -> concat_ws(' ', w[i], w[i+1], w[i+2]))"))
        .as("sh"))
      .distinct()

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact dedup: digest-groupBy; reports per-source doc vs distinct-text
    // counts (the "how many would dedup remove" report).
    "d_dedup_exact" -> ((s, dir) => {
      t(s, dir, "documents")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
             countDistinct(md5(col("text").cast("binary"))).as("n_unique"),
             (count(lit(1)) -
              countDistinct(md5(col("text").cast("binary")))).as("n_dups"))
        .orderBy(col("source"))
    }),

    // MinHash + LSH near-dup pairs, exact-verified at jaccard >= 0.8.
    "d_dedup_minhash_lsh" -> ((s, dir) => {
      val sh = shingles(s, dir).cache()
      val seeds = s.range(0, 16).select(col("id").cast("int").as("seed"))
      // min_{shingle} xxhash64(seed, shingle) per (doc, seed)
      val minhash = sh.crossJoin(broadcast(seeds))
        .select(col("doc_id"), col("seed"),
                xxhash64(col("seed"), col("sh")).as("h"))
        .groupBy(col("doc_id"), col("seed")).agg(min(col("h")).as("mh"))
      // 8 bands x 2 rows: signature = the band's minhashes joined
      val bands = minhash
        .withColumn("band", expr("seed div 2"))
        .groupBy(col("doc_id"), col("band"))
        .agg(sort_array(collect_list(struct(col("seed"), col("mh")))).as("arr"))
        .select(col("doc_id"), col("band"),
          expr("concat_ws(':', transform(arr, x -> cast(x.mh as string)))").as("sig"))
      val cand = bands.as("a").join(bands.as("b"),
          col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
          col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
      // exact verification on candidates only
      val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
      val inter = cand
        .join(sh.as("sa"), col("doc_a") === col("sa.doc_id"))
        .join(sh.as("sb"), col("doc_b") === col("sb.doc_id") &&
                           col("sa.sh") === col("sb.sh"))
        .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("inter"))
      inter
        .join(sizes.select(col("doc_id").as("doc_a"), col("sz").as("sza")), "doc_a")
        .join(sizes.select(col("doc_id").as("doc_b"), col("sz").as("szb")), "doc_b")
        .select(col("doc_a"), col("doc_b"),
          round(col("inter").cast("double") /
                (col("sza") + col("szb") - col("inter")), 6).as("jaccard"))
        .filter(col("jaccard") >= 0.8)
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    // SimHash near-dup: 48-bit signature over word hashes, 4-band blocking,
    // Hamming <= 3 verified with bit_count. No oracle (engine-specific
    // 64-bit hash function) -> rows-only check; the *pairs themselves* are
    // cross-checked by d_dedup_minhash_lsh's jaccard gate.
    "d_dedup_simhash" -> ((s, dir) => {
      val words = t(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
        .select(col("doc_id"), xxhash64(col("word")).as("h"))
      val bits = words.select(col("doc_id"),
          posexplode(expr(
            "transform(sequence(0, 47), j -> CASE WHEN shiftright(h, j) & 1 = 1 THEN 1 ELSE -1 END)"))
          .as(Seq("j", "contrib")))
      val sig = bits.groupBy(col("doc_id"), col("j"))
        .agg(sum(col("contrib")).as("w"))
        .groupBy(col("doc_id"))
        .agg(sum(when(col("w") >= 0, expr("shiftleft(1L, j)"))
          .otherwise(0L)).as("sig"))
      val banded = sig.select(col("doc_id"), col("sig"),
          explode(expr(
            "transform(sequence(0, 3), b -> struct(b as band, shiftright(sig, b*12) & 4095 as key))"))
          .as("bk"))
        .select(col("doc_id"), col("sig"), col("bk.band"), col("bk.key"))
      banded.as("a").join(banded.as("b"),
          col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          bit_count(expr("a.sig ^ b.sig")).as("hamming"))
        .distinct()
        .filter(col("hamming") <= 3)
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    // Word-bigram Jaccard inside same-source blocks (blocked pairwise).
    "d_dedup_ngram_jaccard" -> ((s, dir) => {
      val bg = t(s, dir, "documents")
        .select(col("doc_id"), col("source"), split(col("text"), " ").as("w"))
        .select(col("doc_id"), col("source"), explode(expr(
          "transform(sequence(0, size(w)-2), i -> concat_ws(' ', w[i], w[i+1]))"))
          .as("g"))
        .distinct()
      val sizes = bg.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
      val inter = bg.as("a").join(bg.as("b"),
          col("a.source") === col("b.source") && col("a.g") === col("b.g") &&
          col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("inter"))
      inter
        .join(sizes.select(col("doc_id").as("doc_a"), col("sz").as("sza")), "doc_a")
        .join(sizes.select(col("doc_id").as("doc_b"), col("sz").as("szb")), "doc_b")
        .select(col("doc_a"), col("doc_b"),
          round(col("inter").cast("double") /
                (col("sza") + col("szb") - col("inter")), 6).as("jaccard"))
        .filter(col("jaccard") >= 0.5)
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    // Embedding-cosine near-dup pairs (brute force; LSH path in
    // Similarity). Threshold on the ROUNDED value so both engines make
    // identical keep/drop decisions.
    "d_dedup_embedding" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val withNorm = e.select(col("vec_id"), col("v"),
        expr("aggregate(v, 0d, (a, x) -> a + x * x)").as("nrm"))
      withNorm.as("a").join(withNorm.as("b"), col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
          round(expr("aggregate(zip_with(a.v, b.v, (x, y) -> x * y), 0d, (acc, p) -> acc + p)") /
                sqrt(col("a.nrm") * col("b.nrm")), 6).as("cos"))
        .filter(col("cos") >= 0.45)
        .orderBy(col("id_a"), col("id_b"))
    })
  )

  val oracle: Map[String, String] = Map(
    "d_dedup_exact" ->
      """SELECT source, COUNT(*) AS n_docs,
        |  COUNT(DISTINCT md5(text)) AS n_unique,
        |  COUNT(*) - COUNT(DISTINCT md5(text)) AS n_dups
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    // Ground truth for the LSH pipeline: brute-force pairwise exact
    // jaccard over distinct 3-shingles (LSH recall at j>=0.8 with 8 bands
    // of 2 is > 0.999 — and the sf0.01 pairs all sit at j>=0.9).
    "d_dedup_minhash_lsh" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |s AS (SELECT doc_id, list_distinct(
        |    [w[i] || ' ' || w[i+1] || ' ' || w[i+2] FOR i IN range(1, len(w)-1)]) AS sh
        |  FROM d)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  ROUND(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |        / len(list_distinct(list_concat(a.sh, b.sh))), 6) AS jaccard
        |FROM s a JOIN s b ON a.doc_id < b.doc_id
        |WHERE ROUND(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |        / len(list_distinct(list_concat(a.sh, b.sh))), 6) >= 0.8
        |ORDER BY doc_a, doc_b""".stripMargin,

    "d_dedup_ngram_jaccard" ->
      """WITH d AS (SELECT doc_id, source, string_split(text, ' ') AS w FROM documents),
        |s AS (SELECT doc_id, source, list_distinct(
        |    [w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))]) AS bg
        |  FROM d)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  ROUND(CAST(len(list_intersect(a.bg, b.bg)) AS DOUBLE)
        |        / len(list_distinct(list_concat(a.bg, b.bg))), 6) AS jaccard
        |FROM s a JOIN s b ON a.doc_id < b.doc_id AND a.source = b.source
        |WHERE ROUND(CAST(len(list_intersect(a.bg, b.bg)) AS DOUBLE)
        |        / len(list_distinct(list_concat(a.bg, b.bg))), 6) >= 0.5
        |ORDER BY doc_a, doc_b""".stripMargin,

    "d_dedup_embedding" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
        |    list_reduce(list_prepend(0.0, CAST(embedding AS DOUBLE[])),
        |                (a, x) -> a + x * x) AS nrm
        |  FROM embeddings)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  ROUND(list_dot_product(a.v, b.v) / sqrt(a.nrm * b.nrm), 6) AS cos
        |FROM e a JOIN e b ON a.vec_id < b.vec_id
        |WHERE ROUND(list_dot_product(a.v, b.v) / sqrt(a.nrm * b.nrm), 6) >= 0.45
        |ORDER BY id_a, id_b""".stripMargin
  )
}
