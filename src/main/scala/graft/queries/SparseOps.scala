package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.SparseFns

/** Sparse-vector (svec) operator family — the reference's
  * `gp_sparse_vector` contrib re-expressed columnar
  * (`/root/reference/gpcontrib/gp_sparse_vector/`: `operators.c` for the
  * scalar ops, `gp_sfv.c` for gp_extract_feature_histogram, the aggregate
  * surface `sum`/`count_vec` in `gp_sparse_vector--1.0.1.sql`, reference
  * tests `sql/gp_svec.sql` + `sql/gp_svec_features.sql`).
  *
  * Encoding: `struct<dim, idx array<int>, vals array<double>>`, ascending
  * idx, non-zeros only (see [[graft.functions.SparseFns]]). Embeddings are
  * sparsified at |x| > 0.15 (~77% of entries drop at the test corpus'
  * distribution), which also makes every query a lossless-encoding proof:
  * the DuckDB oracle computes the same answers from the THRESHOLDED DENSE
  * vectors, so any svec encode/compute divergence hash-fails.
  *
  * 100 TB shape: sparsify/norm/dot are pure map-side; the top-k query
  * broadcasts the (tiny) query set exactly like the dense ANN family; the
  * vec_sum/count_vec aggregate shuffles only (label, pos, val) triples —
  * nnz-proportional, never dim-proportional.
  */
object SparseOps extends QueryModule {

  private val Eps = 0.15

  /** embeddings -> (vec_id, label, sv struct) with idx/vals staged flat so
    * downstream expressions don't re-derive the filter. */
  private def svecs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings")
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("v"))
      .withColumn("sv", SparseFns.sparsify("v", Eps))
      .select(col("vec_id"), col("label"), col("sv"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Per-vector svec statistics: nnz (svec_count), l1norm, l2norm, and
    // the index list itself (JSON-rendered for the driver's compare).
    "v_svec_stats" -> ((s, dir) => {
      svecs(s, dir)
        .select(col("vec_id"),
          col("sv.dim").as("dim"),
          SparseFns.nnz("sv").as("nnz"),
          round(SparseFns.l1norm("sv"), 6).as("l1"),
          round(SparseFns.l2norm("sv"), 6).as("l2"),
          to_json(col("sv.idx")).as("idx_json"))
        .orderBy(col("vec_id"))
    }),

    // Sparse cosine top-3: the reference's `%*%` dot + l2norm composition
    // (`sql/gp_svec.sql` norm_score), shaped like the dense ANN queries —
    // queries broadcast, corpus streamed, O(nnz) merge-dot per pair.
    "v_svec_dot_topk" -> ((s, dir) => {
      SparseFns.register(s)
      val e = svecs(s, dir)
        .withColumn("nrm", SparseFns.l2norm("sv"))
        .filter(SparseFns.nnz("sv") > 0)
      val q = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("qid"), col("sv").as("qsv"),
                col("nrm").as("qn"))
      val scored = e.filter(col("vec_id") >= 8).join(broadcast(q))
        .select(col("qid"), col("vec_id").as("nid"),
          round(expr("svec_dot(qsv.idx, qsv.vals, sv.idx, sv.vals)") /
                (col("qn") * col("nrm")), 6).as("cos"))
      val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
      scored.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("qid"), col("rk"), col("nid"), col("cos"))
        .orderBy(col("qid"), col("rk"))
    }),

    // gp_extract_feature_histogram: dictionary = top-25 corpus words
    // (deterministic (count desc, word) ordinals), each document becomes
    // the sparse count-vector of dictionary words — idx ascending ordinal,
    // vals the counts, exactly the reference's SFV construction.
    "v_sfv_histogram" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val words = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      val dict = words.groupBy(col("w")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("w")).limit(25)
        .select(col("w"),
          (row_number().over(Window.orderBy(col("n").desc, col("w"))) - 1)
            .cast("int").as("ord"))
      val counts = words.join(broadcast(dict), "w")
        .groupBy(col("doc_id"), col("ord"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"))
        .agg(sort_array(collect_list(struct(col("ord"), col("c")))).as("ps"))
        .select(col("doc_id"),
          expr("transform(ps, p -> p.ord)").as("idx"),
          expr("transform(ps, p -> p.c)").as("vals"))
      docs.select(col("doc_id")).join(counts, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(size(col("idx")), lit(0)).as("nnz"),
          coalesce(expr("aggregate(vals, 0L, (a, c) -> a + c)"), lit(0L))
            .as("total"),
          coalesce(to_json(col("idx")), lit("[]")).as("idx_json"),
          coalesce(to_json(col("vals")), lit("[]")).as("cnt_json"))
        .orderBy(col("doc_id"))
    }),

    // vec_sum + count_vec aggregates: elementwise sum and non-zero count
    // per position, grouped by label — emitted unnested as (label, pos)
    // rows. Shuffles nnz triples, not dim-length arrays.
    "v_svec_sum_by_label" -> ((s, dir) => {
      svecs(s, dir)
        .select(col("label"), explode(arrays_zip(col("sv.idx"), col("sv.vals")))
          .as("p"))
        .select(col("label"), col("p.idx").as("pos"), col("p.vals").as("x"))
        .groupBy(col("label"), col("pos"))
        .agg(dsum(col("x")).as("sum_x"), count(lit(1)).as("nnz"))
        .orderBy(col("label"), col("pos"))
    })
  )

  val oracle: Map[String, String] = Map(
    "v_svec_stats" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
         |  FROM embeddings),
         |f AS (SELECT vec_id, len(v) AS dim,
         |    list_filter(v, x -> abs(x) > $Eps) AS nzv,
         |    [CAST(i AS INT) for i in range(0, len(v)) if abs(v[i + 1]) > $Eps]
         |      AS idx
         |  FROM e)
         |SELECT vec_id, CAST(dim AS INT) AS dim, CAST(len(nzv) AS INT) AS nnz,
         |  ROUND(list_reduce(list_prepend(0.0,
         |    list_transform(nzv, x -> abs(x))), (a, b) -> a + b), 6) AS l1,
         |  ROUND(sqrt(list_reduce(list_prepend(0.0,
         |    list_transform(nzv, x -> x * x)), (a, b) -> a + b)), 6) AS l2,
         |  CAST(to_json(idx) AS VARCHAR) AS idx_json
         |FROM f ORDER BY vec_id""".stripMargin,

    // same cosine from the thresholded DENSE vectors: interleaved exact
    // zeros change no IEEE sum, so a correct sparse encode/dot is
    // bit-identical to this before the final ROUND
    "v_svec_dot_topk" ->
      s"""WITH e AS (SELECT vec_id,
         |    list_transform(CAST(embedding AS DOUBLE[]),
         |      x -> CASE WHEN abs(x) > $Eps THEN x ELSE 0.0 END) AS tv
         |  FROM embeddings),
         |n AS (SELECT vec_id, tv,
         |    sqrt(list_reduce(list_prepend(0.0,
         |      list_transform(tv, x -> x * x)), (a, b) -> a + b)) AS nrm
         |  FROM e
         |  WHERE len(list_filter(tv, x -> x != 0.0)) > 0),
         |scored AS (
         |  SELECT q.vec_id AS qid, c.vec_id AS nid,
         |    ROUND(list_dot_product(q.tv, c.tv) / (q.nrm * c.nrm), 6) AS cos
         |  FROM n q JOIN n c ON q.vec_id < 8 AND c.vec_id >= 8),
         |ranked AS (
         |  SELECT qid, nid, cos,
         |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rk
         |  FROM scored)
         |SELECT qid, CAST(rk AS INT) AS rk, nid, cos FROM ranked
         |WHERE rk <= 3 ORDER BY qid, rk""".stripMargin,

    "v_sfv_histogram" ->
      """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |  FROM documents),
        |freq AS (SELECT w, COUNT(*) AS n FROM w GROUP BY w
        |  ORDER BY n DESC, w LIMIT 25),
        |dict AS (SELECT w,
        |    CAST(row_number() OVER (ORDER BY n DESC, w) - 1 AS INT) AS ord
        |  FROM freq),
        |cnt AS (SELECT t.doc_id, d.ord, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM w t JOIN dict d USING (w) GROUP BY t.doc_id, d.ord),
        |agg AS (SELECT doc_id,
        |    list_sort(list({'o': ord, 'c': c})) AS ps
        |  FROM cnt GROUP BY doc_id)
        |SELECT d.doc_id,
        |  CAST(coalesce(len(a.ps), 0) AS INT) AS nnz,
        |  CAST(coalesce(list_sum(list_transform(a.ps, p -> p.c)), 0)
        |    AS BIGINT) AS total,
        |  coalesce(CAST(to_json(list_transform(a.ps, p -> p.o)) AS VARCHAR),
        |    '[]') AS idx_json,
        |  coalesce(CAST(to_json(list_transform(a.ps, p -> p.c)) AS VARCHAR),
        |    '[]') AS cnt_json
        |FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    "v_svec_sum_by_label" ->
      s"""SELECT label, CAST(i.i AS INT) AS pos,
         |  ${sqlDsum("CAST(embedding[i.i + 1] AS DOUBLE)")} AS sum_x,
         |  COUNT(*) AS nnz
         |FROM embeddings, (SELECT unnest(range(0, 64)) AS i) i
         |WHERE abs(CAST(embedding[i.i + 1] AS DOUBLE)) > $Eps
         |GROUP BY label, i.i ORDER BY label, pos""".stripMargin
  )
}
