package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Probabilistic index/sketch structures with DETERMINISTIC hash
  * families — the contrib/bloom index niche (`/root/reference/contrib/
  * bloom/blutils.c` builds per-page bloom signatures for index scans)
  * and the heavy-hitters counting niche next to the HLL/quantile
  * sketches in CoreAgg. Both use the repo's md5-derived hash idiom
  * (`d_sample_mix` precedent): bucket = hex-prefix of md5(salt:key),
  * reproducible across engines/partitionings/reruns, so the sketches
  * themselves are hash-comparable against a DuckDB oracle that builds
  * the identical structure — the compare proves sketch == sketch, and
  * the queries carry the exact counts alongside so the output also
  * exhibits the approximation contract (over-estimation only for CM,
  * false-positives-only for bloom).
  *
  * Scale shapes: both sketches aggregate the corpus to its VOCABULARY
  * first (one token shuffle with map-side partials — the t_vocab_topk
  * discipline), then build the fixed-size structure from the vocab
  * table; the sketch/bit-set tables are tiny (depth x width, resp. <=
  * m rows) and broadcast into the probe joins. Nothing driver-side,
  * no collect: the bit set stays a relation, membership is a counted
  * equi-join, so the same plan runs at any corpus size.
  */
object Sketches extends QueryModule {

  private[graft] val CmDepth = 3
  private[graft] val CmWidth = 256
  private val BloomK = 3
  private val BloomM = 2048

  /** md5-derived bucket for (salt j, key col), mirrored in the oracle as
    * CAST('0x' || substr(md5(j || ':' || w), 1, 6) AS BIGINT) % width. */
  private[graft] def bucket(j: Int, c: Column, width: Int): Column =
    pmod(conv(substring(md5(concat(lit(s"$j:"), c)), 1, 6), 16, 10)
      .cast("long"), lit(width))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Count-min sketch heavy hitters: depth-3 x width-256 counter array
    // built from the vocabulary (cell = sum of counts of words hashing
    // there), point estimates for the top-8 exact heavy hitters as
    // min over the 3 rows — the CM guarantee est >= true surfaces as
    // over_n >= 0 on every row (collisions make it strict). The sketch
    // build touches the vocab table, not the corpus; the probe join
    // broadcasts 768 cells.
    "d_countmin_heavy" -> ((s, dir) => {
      val vocab = t(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("n"))
      val cells = vocab
        .select(col("n"), explode(array((1 to CmDepth).map(j =>
          struct(lit(j).as("j"), bucket(j, col("w"), CmWidth).as("b"))): _*))
          .as("jb"))
        .groupBy(col("jb.j").as("j"), col("jb.b").as("b"))
        .agg(sum(col("n")).as("c"))
      val probes = vocab.orderBy(col("n").desc, col("w")).limit(8)
        .select(col("w"), col("n"), explode(array((1 to CmDepth).map(j =>
          struct(lit(j).as("j"), bucket(j, col("w"), CmWidth).as("b"))): _*))
          .as("jb"))
        .select(col("w"), col("n"), col("jb.j").as("j"), col("jb.b").as("b"))
      probes.join(broadcast(cells), Seq("j", "b"))
        .groupBy(col("w"), col("n"))
        .agg(min(col("c")).as("est_n"))
        .select(col("w"), col("n").as("true_n"), col("est_n"),
          (col("est_n") - col("n")).as("over_n"))
        .orderBy(col("true_n").desc, col("w"))
    }),

    // Bloom-filter membership (contrib/bloom): k=3 bit positions in
    // m=2048 from the English vocabulary; non-English tokens probe the
    // filter. A probe hits iff all 3 of its positions are set (counted
    // equi-join against the bit-set relation — the filter never leaves
    // the executors). Every actual member hits (no false negatives,
    // bloom's contract); false positives are counted and the smallest
    // FP token is reported (NULL when the filter is clean).
    "d_bloom_membership" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      def toks(f: Column): DataFrame = docs.filter(f)
        .select(explode(split(col("text"), " ")).as("w")).distinct()
      def positions(df: DataFrame): DataFrame = df
        .select(col("w"), explode(array((1 to BloomK).map(j =>
          bucket(j, col("w"), BloomM)): _*)).as("p"))
      val bits = positions(toks(col("lang") === "en"))
        .select(col("p")).distinct()
      val probes = toks(col("lang") =!= "en")
      val hits = positions(probes)
        .join(broadcast(bits), Seq("p"))
        .groupBy(col("w")).agg(count(lit(1)).as("k_set"))
        .filter(col("k_set") === BloomK)
        .select(col("w"), lit(1).as("hit"))
      val members = toks(col("lang") === "en").select(col("w"), lit(1).as("m"))
      val nbits = bits.agg(count(lit(1)).as("n_bits_set")) // <= m = 2048
      probes
        .join(hits, Seq("w"), "left")
        .join(members, Seq("w"), "left")
        .agg(count(lit(1)).as("n_probe"),
             sum(coalesce(col("hit"), lit(0))).as("n_hit"),
             sum(coalesce(col("m"), lit(0))).as("n_member"),
             sum(when(col("hit") === 1 && col("m").isNull, 1L).otherwise(0L))
               .as("n_false_pos"),
             min(when(col("hit") === 1 && col("m").isNull, col("w")))
               .as("first_fp"))
        .crossJoin(broadcast(nbits))
    }),

    // Feature hashing ("the hashing trick", Weinberger et al. 2009 —
    // the fixed-width featurizer LM/classifier pipelines use when the
    // vocabulary is unbounded): each token maps to one of 16 dimensions
    // with a +/-1 sign, both md5-derived, and a document's feature
    // vector is the signed count sum per dimension. Rendered as a
    // sorted "dim:value" string (nested outputs are driver-unhashable).
    // Shape: one (doc, dim) shuffle with map-side partials — the vector
    // width is fixed, so the output is O(docs), never O(vocab).
    "d_feature_hash" -> ((s, dir) => {
      val toks = t(s, dir, "documents")
        .filter(col("doc_id") < 100)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      val dims = toks
        .withColumn("dim", bucket(1, col("w"), 16))
        .withColumn("sgn", bucket(2, col("w"), 2) * 2 - 1)
        .groupBy(col("doc_id"), col("dim"))
        .agg(sum(col("sgn")).as("v"))
        .filter(col("v") =!= 0)
      dims.groupBy(col("doc_id"))
        .agg(array_join(array_sort(collect_list(
               concat(col("dim"), lit(":"), col("v")))), ",").as("feats"),
             count(lit(1)).as("nnz"),
             sum(abs(col("v"))).as("l1"))
        .orderBy(col("doc_id"))
    })
  )

  /** Oracle-side md5 bucket fragment (same bytes as [[bucket]]). */
  private def duckBucket(j: Int, e: String, width: Int): String =
    s"CAST('0x' || substr(md5('$j:' || ($e)), 1, 6) AS BIGINT) % $width"

  val oracle: Map[String, String] = Map(

    "d_countmin_heavy" -> {
      val cellUnion = (1 to CmDepth).map(j =>
        s"SELECT $j AS j, ${duckBucket(j, "w", CmWidth)} AS b, n FROM vocab")
        .mkString(" UNION ALL ")
      val probeUnion = (1 to CmDepth).map(j =>
        s"SELECT w, n, $j AS j, ${duckBucket(j, "w", CmWidth)} AS b FROM probes")
        .mkString(" UNION ALL ")
      s"""WITH toks AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
         |vocab AS (SELECT w, COUNT(*) AS n FROM toks GROUP BY w),
         |cells AS (SELECT j, b, CAST(SUM(n) AS BIGINT) AS c
         |  FROM ($cellUnion) _ GROUP BY j, b),
         |probes AS (SELECT w, n FROM vocab ORDER BY n DESC, w LIMIT 8),
         |pj AS ($probeUnion)
         |SELECT pj.w, CAST(pj.n AS BIGINT) AS true_n,
         |  CAST(MIN(cells.c) AS BIGINT) AS est_n,
         |  CAST(MIN(cells.c) - pj.n AS BIGINT) AS over_n
         |FROM pj JOIN cells ON pj.j = cells.j AND pj.b = cells.b
         |GROUP BY pj.w, pj.n ORDER BY true_n DESC, w""".stripMargin
    },

    "d_bloom_membership" -> {
      def posUnion(src: String) = (1 to BloomK).map(j =>
        s"SELECT w, ${duckBucket(j, "w", BloomM)} AS p FROM $src")
        .mkString(" UNION ALL ")
      s"""WITH en AS (SELECT DISTINCT unnest(string_split(text, ' ')) AS w
         |  FROM documents WHERE lang = 'en'),
         |probes AS (SELECT DISTINCT unnest(string_split(text, ' ')) AS w
         |  FROM documents WHERE lang <> 'en'),
         |bits AS (SELECT DISTINCT p FROM (${posUnion("en")}) _),
         |hits AS (SELECT pp.w, 1 AS hit FROM (${posUnion("probes")}) pp
         |  JOIN bits ON pp.p = bits.p
         |  GROUP BY pp.w HAVING COUNT(*) = $BloomK),
         |members AS (SELECT w, 1 AS m FROM en)
         |SELECT COUNT(*) AS n_probe,
         |  CAST(SUM(COALESCE(hit, 0)) AS BIGINT) AS n_hit,
         |  CAST(SUM(COALESCE(m, 0)) AS BIGINT) AS n_member,
         |  CAST(SUM(CASE WHEN hit = 1 AND m IS NULL THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_false_pos,
         |  MIN(CASE WHEN hit = 1 AND m IS NULL THEN probes.w END) AS first_fp,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM bits) AS n_bits_set
         |FROM probes
         |LEFT JOIN hits ON probes.w = hits.w
         |LEFT JOIN members ON probes.w = members.w""".stripMargin
    },

    "d_feature_hash" ->
      s"""WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
         |  FROM documents WHERE doc_id < 100),
         |d AS (SELECT doc_id,
         |    ${duckBucket(1, "w", 16)} AS dim,
         |    (${duckBucket(2, "w", 2)}) * 2 - 1 AS sgn
         |  FROM toks),
         |v AS (SELECT doc_id, dim, CAST(SUM(sgn) AS BIGINT) AS v
         |  FROM d GROUP BY doc_id, dim HAVING SUM(sgn) <> 0)
         |SELECT doc_id,
         |  array_to_string(list_sort(list(
         |    CAST(dim AS VARCHAR) || ':' || CAST(v AS VARCHAR))), ',') AS feats,
         |  COUNT(*) AS nnz,
         |  CAST(SUM(abs(v)) AS BIGINT) AS l1
         |FROM v GROUP BY doc_id ORDER BY doc_id""".stripMargin
  )
}
