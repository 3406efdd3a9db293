package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** rolling_fp codegen kernel == the HOF reference chain, corpus-wide. */
class TextFnsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  private val hofExpr =
    """aggregate(split(text, ' '), 0L,
      |  (acc, word) -> (acc * 131 +
      |    aggregate(split(word, ''), 0L,
      |      (a, c) -> (a * 31 + ascii(c)) % 1000000007)
      |  ) % 1000000007)""".stripMargin

  test("rolling_fp equals the HOF chain on every corpus document") {
    graft.functions.TextFns.register(spark)
    val d = Tables.t(spark, sf, "documents")
      .select(col("doc_id"),
        expr(hofExpr).as("hof"),
        call_function("rolling_fp", col("text")).as("native"))
    assert(d.filter(col("hof") =!= col("native")).count() == 0)
    assert(d.count() > 0)
  }

  test("rolling_fp handles boundary shapes exactly like split-based HOF") {
    graft.functions.TextFns.register(spark)
    val sp = spark; import sp.implicits._
    val cases = Seq("", " ", "a", "a ", " a", "a  b", "hello world",
      "x y z", "  ", "tab\tinside word")
    val d = cases.toDF("text")
      .select(col("text"), expr(hofExpr).as("hof"),
        call_function("rolling_fp", col("text")).as("native"))
    val bad = d.filter(col("hof") =!= col("native")).collect()
    assert(bad.isEmpty, bad.mkString(", "))
  }

  /** The HOF formulation of cdc_bounds — the spec-only reference the
    * kernel must match bit-for-bit (same shape as hofExpr above). */
  private val cdcHofExpr =
    "CASE WHEN size(split(text, ' ')) >= 4 THEN " +
      "filter(sequence(4, size(split(text, ' '))), i -> (" +
      "element_at(wh, i - 3) * 2248091L + element_at(wh, i - 2) * 17161L + " +
      "element_at(wh, i - 1) * 131L + element_at(wh, i)) % 1000000007L % 8 = 0" +
      " AND i < size(split(text, ' '))) " +
      "ELSE CAST(array() AS ARRAY<INT>) END"
  private val whExpr =
    "transform(split(text, ' '), wd -> aggregate(split(wd, ''), 0L, " +
      "(a, c) -> (a * 31 + ascii(c)) % 1000000007L))"

  test("cdc_bounds equals the HOF window-filter chain corpus-wide") {
    graft.functions.TextFns.register(spark)
    val d = Tables.t(spark, sf, "documents")
      .withColumn("wh", expr(whExpr))
      .select(col("doc_id"),
        expr(cdcHofExpr).as("hof"),
        call_function("cdc_bounds", col("text")).as("native"))
    assert(d.filter(col("hof") =!= col("native")).count() == 0)
    assert(d.count() > 0)
  }

  test("cdc_bounds boundary shapes: short docs, empty words, edges") {
    graft.functions.TextFns.register(spark)
    val sp = spark; import sp.implicits._
    val cases = Seq("", " ", "a", "a b c", "a b c d", "a b c d e",
      "a  b   c d e f", "x y z w x y z w x y z w",
      (1 to 40).map(i => s"t${i % 7}").mkString(" "))
    val d = cases.toDF("text")
      .withColumn("wh", expr(whExpr))
      .select(col("text"), expr(cdcHofExpr).as("hof"),
        call_function("cdc_bounds", col("text")).as("native"))
    val bad = d.filter(col("hof") =!= col("native")).collect()
    assert(bad.isEmpty, bad.mkString(", "))
  }

  test("cdc_chunk_digests equals md5 over the HOF chunk assembly") {
    graft.functions.TextFns.register(spark)
    val sp = spark; import sp.implicits._
    val edge = Seq("", " ", "a", "a b c d e",
      "a  b   c d e f", "x y z w x y z w x y z w",
      (1 to 90).map(i => s"t${i % 7}").mkString(" "))
      .zipWithIndex.map { case (t, i) => (1000000L + i, t) }.toDF("doc_id", "text")
    val docs = Tables.t(spark, sf, "documents")
      .select(col("doc_id"), col("text")).unionByName(edge)
    val hof = graft.queries.Corpus.cdcChunkDetail(docs)
      .select(col("doc_id"),
        expr("transform(chunks, c -> unhex(md5(c)))").as("hof"))
    val nu = docs.select(col("doc_id"),
      call_function("cdc_chunk_digests", col("text")).as("native"))
    val joined = hof.join(nu, "doc_id")
    assert(joined.filter(col("hof") =!= col("native")).count() == 0)
    assert(joined.count() == docs.count())
  }

  test("word_grid_chunks equals the posexplode grid HOF chain") {
    graft.functions.TextFns.register(spark)
    val sp = spark; import sp.implicits._
    val edge = Seq("", " ", "a", "a b c d e",
      "a  b   c d e f", "x y z w x y z w x y z w",
      (1 to 90).map(i => s"t${i % 7}").mkString(" "))
      .zipWithIndex.map { case (t, i) => (1000000L + i, t) }.toDF("doc_id", "text")
    val docs = Tables.t(spark, sf, "documents")
      .select(col("doc_id"), col("text")).unionByName(edge)
    for (c <- Seq(8, 16)) {
      val hof = docs
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .select(col("doc_id"), posexplode(expr(
          s"transform(sequence(0, (size(w) - 1) div $c), " +
            s"i -> concat_ws(' ', slice(w, i * $c + 1, $c)))"))
          .as(Seq("idx", "chunk")))
        .select(col("doc_id"), col("idx"), col("chunk"),
          unhex(md5(col("chunk"))).as("old_dg"))
      val nu = docs
        .select(col("doc_id"),
          explode(call_function("word_grid_chunks", col("text"), lit(c)))
            .as("x"))
        .select(col("doc_id"), col("x.idx").as("idx"),
          col("x.chunk").as("nu_chunk"), col("x.dg").as("dg"))
      val joined = hof.join(nu, Seq("doc_id", "idx"))
      assert(joined.count() == hof.count() && joined.count() == nu.count(),
        s"c=$c: chunk sets must agree")
      assert(joined.filter(col("chunk") =!= col("nu_chunk") ||
        col("old_dg") =!= col("dg")).count() == 0, s"c=$c")
    }
  }

  test("word_max_run equals the posexplode + lag-window run formula") {
    graft.functions.TextFns.register(spark)
    val sp = spark; import sp.implicits._
    import org.apache.spark.sql.expressions.Window
    val edge = Seq("", " ", "  ", "a", "a a", "a a a b b", "a b a b",
      "x x  x", "w w w w w w")
      .zipWithIndex.map { case (t, i) => (1000000L + i, t) }.toDF("doc_id", "text")
    val docs = Tables.t(spark, sf, "documents")
      .select(col("doc_id"), col("text")).unionByName(edge)
    val wOrd = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val old = docs
      .select(col("doc_id"), posexplode(split(col("text"), " "))
        .as(Seq("pos", "word")))
      .withColumn("brk",
        when(col("word") === lag(col("word"), 1).over(wOrd), 0).otherwise(1))
      .withColumn("run_id", sum(col("brk")).over(wOrd))
      .groupBy(col("doc_id"), col("run_id")).agg(count(lit(1)).as("rl"))
      .groupBy(col("doc_id")).agg(max(col("rl")).cast("int").as("old_run"))
    val nu = docs.select(col("doc_id"),
      call_function("word_max_run", col("text")).as("run"))
    val joined = old.join(nu, "doc_id")
    assert(joined.filter(col("old_run") =!= col("run")).count() == 0)
    assert(joined.count() == docs.count())
  }

  test("chunk_assemble equals concat_ws/transform/array_sort bit-for-bit") {
    graft.functions.TextFns.register(spark)
    val sp = spark; import sp.implicits._
    val edge = Seq("", " ", "a", "a b c d e",
      "a  b   c d e f", "x y z w x y z w x y z w",
      (1 to 90).map(i => s"t${i % 7}").mkString(" "))
      .zipWithIndex.map { case (t, i) => (1000000L + i, t) }.toDF("doc_id", "text")
    val docs = Tables.t(spark, sf, "documents")
      .select(col("doc_id"), col("text")).unionByName(edge)
    // adversarial input order: reverse the grid array so the kernel's
    // sort is actually exercised (collect_list order is arbitrary);
    // also strip every 3rd chunk so the reassembly skips elements, and
    // include the all-stripped empty-array edge
    val arrs = docs.select(col("doc_id"), expr(
      "reverse(filter(transform(word_grid_chunks(text, 8), " +
        "x -> struct(x.idx as idx, x.chunk as chunk)), " +
        "x -> x.idx % 3 != 1))").as("arr"))
    val d = arrs.select(col("doc_id"),
      expr("concat_ws(' ', transform(array_sort(arr), x -> x.chunk))").as("hof"),
      expr("chunk_assemble(arr)").as("native"))
    assert(d.filter(col("hof") =!= col("native")).count() == 0)
    // the empty-array edge (every chunk removed) must yield '' exactly
    // like concat_ws over no children
    val empty = spark.sql(
      "SELECT chunk_assemble(CAST(array() AS " +
        "ARRAY<STRUCT<idx: INT, chunk: STRING>>)) AS e").collect()
    assert(empty.length == 1 && empty.head.getString(0) == "")
  }

  test("tok_inter equals size(array_intersect) on distinct token arrays") {
    graft.functions.TextFns.register(spark)
    val toks = Tables.t(spark, sf, "documents")
      .select(col("doc_id"), array_distinct(split(col("text"), " ")).as("toks"))
    val q = toks.filter(col("doc_id") < 7)
      .select(col("doc_id").as("qid"), col("toks").as("qtoks"))
    val d = toks.crossJoin(broadcast(q))
      .select(
        size(array_intersect(col("toks"), col("qtoks"))).as("hof"),
        call_function("tok_inter", col("toks"), col("qtoks")).as("native"))
    assert(d.filter(col("hof") =!= col("native")).count() == 0)
    assert(d.count() > 0)
    // edges: empty sides, the empty-string token, disjoint, identical
    val sp = spark; import sp.implicits._
    val cases = Seq(
      (Seq.empty[String], Seq("a", "b")),
      (Seq("a", "b"), Seq.empty[String]),
      (Seq(""), Seq("", "x")),
      (Seq("a", "b", "c"), Seq("d", "e")),
      (Seq("a", "b", "c"), Seq("c", "a", "b")))
    val e = cases.toDF("a", "b").select(
      size(array_intersect(col("a"), col("b"))).as("hof"),
      call_function("tok_inter", col("a"), col("b")).as("native"))
    val bad = e.filter(col("hof") =!= col("native")).collect()
    assert(bad.isEmpty, bad.mkString(", "))
  }

  test("rolling_fp participates in whole-stage codegen") {
    graft.functions.TextFns.register(spark)
    val p = Tables.t(spark, sf, "documents")
      .select(call_function("rolling_fp", col("text")))
      .queryExecution.executedPlan.toString
    // the "*(n)" prefix marks a whole-stage-codegen span in toString form;
    // a CodegenFallback expression would print an unstarred Project
    assert(p.contains("*(1) Project [rolling_fp"), p)
  }
}
