package graft.tools

import org.apache.spark.sql.SparkSession

/** Two-decade scaling spot-check (the r11 review's "make the scaling
  * claim empirical, not extrapolated" item): runs the two heaviest
  * dedup lanes — `d_dedup_minhash_lsh` (banded LSH, expected ~linear
  * in n + output) and `d_semdedup` (cluster-then-prune, inherently
  * ~n^1.5 at K = sqrt(n), see SCALING.md) — at x1 / x10 / x100 of a
  * base SF, with replicas synthesized once by [[GenScale]] (same
  * generator as the bench's x10 leg). Prints one JSON line with the
  * per-decade times and ratios.
  *
  * Usage: runMain graft.tools.ScaleProbe [baseSfDir] [runs]
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.01")
    val runs = args.lift(1).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // the semdedup production lane (K = ceil(sqrt(n)), the paper's knob)
    spark.conf.set("spark.graft.semdedup.k", "auto")
    // this tool IS the audit instrument: opt into the quarantined
    // superlinear lanes (d_semdedup legacy) explicitly so the decades
    // can still be measured after the r14 misuse guards
    spark.conf.set("spark.graft.audit", "true")
    // SPARK_GRAFT_PROBE_CONF="k=v;k=v" — extra session confs for A/B
    // isolation runs (e.g. spark.graft.eagerAgg.enabled=false)
    sys.env.get("SPARK_GRAFT_PROBE_CONF").foreach(_.split(';').foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      spark.conf.set(k.trim, v.trim)
    })

    // d_semdedup = the legacy paper-K lane (K = sqrt(n) Lloyd, ~n^1.5,
    // headline-demoted r14); d_semdedup_probes = the r13 two-level
    // sampled-anchor multi-probe lane (~n^(4/3), no Lloyd) that is the
    // production scale path; d_dedup_substring = alignment-free sliding
    // 8-gram exact-substring dedup (expected ~linear in corpus bytes);
    // s_ann_ivfpq_score = fit-once composed IVF+PQ (stores built
    // untimed per decade below, exactly like Bench's preparePq) with
    // its in-plan Verify sibling s_ann_ivfpq_topk for contrast.
    // SPARK_GRAFT_PROBE_QS=comma,list overrides (local iteration).
    val qs = sys.env.get("SPARK_GRAFT_PROBE_QS")
      .map(_.split(",").map(_.trim).toSeq)
      .getOrElse(Seq("d_dedup_minhash_lsh", "d_semdedup",
        "d_semdedup_probes", "d_semdedup_lsh", "d_dedup_substring",
        "s_ann_ivfpq_topk", "s_ann_ivfpq_score"))
    val baseName = base.replaceAll("/+$", "").split('/').last

    def dirFor(factor: Int): String =
      if (factor == 1) base
      else {
        val dst = s"/root/repo/.scale/probe_${baseName}_x$factor"
        val marker = new org.apache.hadoop.fs.Path(
          dst, "embeddings.parquet/_SUCCESS")
        val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (!fs.exists(marker)) {
          System.err.println(s"[probe] generating x$factor replica -> $dst")
          GenScale.generate(spark, base, dst, factor)
        }
        dst
      }

    // SPARK_GRAFT_PROBE_FACTORS=1,10,100,1000 overrides the decades —
    // a 4th decade separates a genuinely superlinear kernel from the
    // fixed-overhead amortization that inflates dec2 when x1/x10 are
    // sub-second (job-launch dominated)
    val factors = sys.env.get("SPARK_GRAFT_PROBE_FACTORS")
      .map(_.split(",").map(_.trim.toInt).toSeq)
      .getOrElse(Seq(1, 10, 100))
    val results = for (factor <- factors) yield {
      val dir = dirFor(factor)
      // warm the page cache / file listing once
      graft.Tables.t(spark, dir, "documents").limit(1).collect()
      graft.Tables.t(spark, dir, "embeddings").limit(1).collect()
      // fit-once ANN stores for the *_score lanes, built UNTIMED per
      // decade (model training is an offline once-per-corpus-version
      // job, not query work — same contract as Bench.preparePq)
      if (qs.exists(_.endsWith("_score"))) {
        val store = s"/root/repo/.scale/probe_pq_${baseName}_x$factor"
        graft.queries.Similarity.pqEnsurePersisted(spark, dir, store)
        graft.queries.Similarity.ivfEnsurePersisted(spark, dir, store)
        spark.conf.set(graft.queries.Similarity.PqDirConf, store)
      }
      val times = qs.map { q =>
        val secs = (1 to runs).map { _ =>
          val t0 = System.nanoTime()
          // collect, not count: count() over a GLOBAL-aggregate query
          // (d_semdedup_probes returns one summary row) lets Catalyst
          // prune the entire subtree — a global agg yields exactly one
          // row whatever its input — and the probe would time nothing
          val n = graft.SparkEntry.queries(q)(spark, dir).collect().length
          val dt = (System.nanoTime() - t0) / 1e9
          System.err.println(f"[probe] x$factor $q: $dt%.2f s ($n rows)")
          dt
        }.min
        q -> secs
      }
      factor -> times.toMap
    }

    val m = results.toMap
    def j(q: String): String = {
      val ts = factors.map(f => f -> m(f)(q))
      val vals = ts.map { case (f, t) => f""""x$f":$t%.2f""" }
      val ratios = ts.sliding(2).collect { case Seq((_, a), (f2, b)) =>
        f""""r$f2":${b / a}%.2f""" }.toSeq
      s""""$q":{${(vals ++ ratios).mkString(",")}}"""
    }
    println(s"""{"probe":"scale_decades","base":"$base",${qs.map(j).mkString(",")}}""")
    spark.stop()
  }
}
