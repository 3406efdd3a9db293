package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins for the pg_trgm word-similarity family and the `%` similarity
  * join (`queries/TypeOps.scala` q_trgm_word_sim / q_trgm_join):
  *
  *  - the lane's PRUNED extent search (endpoints restricted to
  *    query-matching trigrams/words) equals the unpruned definitional
  *    maximum over ALL contiguous extents — the losslessness argument
  *    from the lane's doc comment, executed rather than argued;
  *  - construction semantics on crafted rows: a contiguous whole-word
  *    probe occurrence scores 1.0 in both forms, a probe buried inside
  *    longer words is reachable by the plain form only (the `<%` vs
  *    `<<%` distinction, trgm_op.c:1166 vs :1182);
  *  - the prefix-filtered posting join equals brute force on a random
  *    near-dup corpus (the sf0.01 oracle already proves this on real
  *    data; this pins it under a different distribution, seeded).
  */
class TrgmSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  /** pg_trgm trigram lists per word: lowercase, split on non-alnum,
    * pad "  w ", slide — duplicates and order preserved. */
  private def wordTrgms(s: String): Vector[Vector[String]] =
    s.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toVector
      .map { w =>
        val p = "  " + w + " "
        (0 to w.length).map(i => p.substring(i, i + 3)).toVector
      }

  private def micros(c: Long, u1: Long, u2: Long): Long = {
    val den = u1 + u2 - c
    (2000000L * c + den) / (2 * den)
  }

  /** Unpruned definitional word similarity: max over ALL contiguous
    * extents of the trigram sequence (plain) / word spans (strict). */
  private def bruteWordSim(query: String, text: String): (Long, Long) = {
    val q = wordTrgms(query).flatten.distinct.toSet
    val wt = wordTrgms(text)
    val t = wt.flatten
    val u1 = q.size.toLong
    var plain = 0L
    for (i <- t.indices; j <- i until t.length) {
      val d = t.slice(i, j + 1).distinct
      plain = math.max(plain, micros(d.count(q).toLong, u1, d.size.toLong))
    }
    var strict = 0L
    for (a <- wt.indices; b <- a until wt.length) {
      val d = wt.slice(a, b + 1).flatten.distinct
      strict = math.max(strict, micros(d.count(q).toLong, u1, d.size.toLong))
    }
    (plain, strict)
  }

  test("pruned extent search equals the unpruned definition at sf0.01") {
    val got = SparkEntry.queries("q_trgm_word_sim")(spark, sf)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val texts = Tables.t(spark, sf, "documents")
      .selectExpr("doc_id", "substring(text, 1, 48) AS head")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got.keySet == texts.keySet)
    // every row: the lane's pruned max == brute force over all extents
    texts.foreach { case (id, head) =>
      val want = bruteWordSim("table value part", head)
      assert(got(id) == want, s"doc $id: got ${got(id)} want $want")
    }
    // and the family ordering holds corpus-wide: plain >= strict
    got.values.foreach { case (w, sw) => assert(w >= sw) }
  }

  test("plain form reaches inside words; strict form stops at word bounds") {
    val sp = spark; import sp.implicits._
    val dir = java.nio.file.Files.createTempDirectory("trgmws").toString
    Seq(
      // probe words appear contiguously as whole words -> both 1.0
      (0L, "key table value part hash row"),
      // probe buried inside longer words -> plain beats strict
      (1L, "xtablex yvaluey zpartz filler words here"),
      // no probe trigrams at all -> both 0
      (2L, "zzz qqq www")
    ).toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("q_trgm_word_sim")(spark, dir)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(out(0L) == ((1000000L, 1000000L)), out(0L))
    assert(out(1L)._1 > out(1L)._2, s"plain should exceed strict: ${out(1L)}")
    assert(out(2L) == ((0L, 0L)), out(2L))
    // the crafted rows also agree with the unpruned brute force
    assert(out(1L) == bruteWordSim("table value part",
      "xtablex yvaluey zpartz filler words here"))
  }

  test("prefix-filtered similarity join equals brute force on a random corpus") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(42)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "omega", "kappa",
      "sigma", "theta", "lambda", "zeta", "nu", "xi")
    // 150 names of 4 words with planted near-dups (one word swapped)
    val base = Vector.fill(60)(Vector.fill(4)(vocab(rnd.nextInt(vocab.size))))
    val perturbed = base.take(45).map { ws =>
      ws.updated(rnd.nextInt(4), vocab(rnd.nextInt(vocab.size)))
    }
    val names = (base ++ perturbed ++ base.take(45)).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
    val dir = java.nio.file.Files.createTempDirectory("trgmjoin").toString
    names.toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")

    val got = SparkEntry.queries("q_trgm_join")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet

    val distinct = names.map(_._2).distinct
    val sets = distinct.map(n => n -> wordTrgms(n).flatten.distinct).toMap
    val want = (for {
      a <- distinct; b <- distinct if a < b
      ta = sets(a); tb = sets(b)
      inter = ta.count(tb.toSet).toLong
      uni = ta.size.toLong + tb.size.toLong - inter
      simU = (2000000L * inter + uni) / (2 * uni)
      if simU >= 450000L
    } yield (a, b, simU)).toSet
    assert(want.nonEmpty, "corpus must actually contain qualifying pairs")
    assert(got == want,
      s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
  }
}
