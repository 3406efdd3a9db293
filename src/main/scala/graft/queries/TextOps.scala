package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Text-analysis operators for training-data pipelines — language ID
  * (stopword-hit heuristic), quality scoring, token counting, document
  * fingerprinting (rolling polynomial hash). Additive over the reference
  * (its text stack is full-text search, `tsvector_op.c` — out of scope per
  * SURVEY §2.8); everything here is codegen'd higher-order functions, no
  * UDFs, so the 100 TB path stays in whole-stage codegen.
  */
object TextOps extends QueryModule {

  // DEMONSTRATION heuristic, not a production language classifier:
  // stopword-hit voting over tiny fixed lists (the "zh" row is romanized
  // placeholder tokens since the fixture corpus is ASCII). A real
  // deployment would swap in a fasttext-class model behind the same
  // column contract; that model class is out of scope here.
  private val stop = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "es" -> Seq("el", "la", "los", "de", "y", "es", "un"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une"),
    "zh" -> Seq("de0", "shi4", "le0", "zai4")) // romanized placeholders

  private def hitCount(words: Column, set: Seq[String]): Column =
    size(filter(words, w => w.isInCollection(set)))

  private def hitCountSql(set: Seq[String]): String =
    s"len(list_filter(w, x -> x IN (${set.map("'" + _ + "'").mkString(",")})))"

  // Deterministic morphological inflection — the corpus-construction
  // fixture for the lexize queries below: the test corpus is all
  // singular/base forms, so each token is inflected (plural / gerund /
  // past, chosen by its ending and length — grammatical enough that the
  // stemmer's rules apply) and the lexize stage must recover the base
  // form. Stop words stay untouched so the stop filter is exercised too.
  // Both engine forms below are kept textually parallel, and the
  // `roundtrip` output column proves the recovery property per-row in
  // BOTH engines rather than trusting this comment.
  private def inflect(words: Column): Column = {
    val stops = array(graft.functions.Lexize.StopWords.map(lit): _*)
    transform(words, w =>
      when(array_contains(stops, w), w)
        .when(w.rlike("(s|x|z|ch|sh)$"), concat(w, lit("es")))
        .when(w.endsWith("y"),
          concat(w.substr(lit(1), length(w) - lit(1)), lit("ies")))
        .when(w.endsWith("e"), concat(w, lit("s")))
        .when(pmod(length(w), lit(3)) === 0, concat(w, lit("ing")))
        .when(pmod(length(w), lit(3)) === 1, concat(w, lit("ed")))
        .otherwise(concat(w, lit("s"))))
  }

  private def inflectSql(v: String): String = {
    val stops = graft.functions.Lexize.duckStopList
    s"""CASE WHEN $v IN $stops THEN $v
       | WHEN regexp_matches($v, '(s|x|z|ch|sh)$$') THEN $v || 'es'
       | WHEN suffix($v, 'y') THEN substr($v, 1, len($v) - 1) || 'ies'
       | WHEN suffix($v, 'e') THEN $v || 's'
       | WHEN len($v) % 3 = 0 THEN $v || 'ing'
       | WHEN len($v) % 3 = 1 THEN $v || 'ed'
       | ELSE $v || 's' END""".stripMargin.linesIterator.mkString(" ")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Token counting: whitespace tokens, BPE-ish regex tokens, distinct
    // words, character count.
    "t_token_count" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"),
          size(split(col("text"), " ")).as("n_ws_tokens"),
          regexp_count(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]")).as("n_bpe_tokens"),
          size(array_distinct(split(col("text"), " "))).as("n_distinct_words"),
          length(col("text")).as("n_chars_computed"),
          (length(col("text")) === col("n_chars")).as("chars_match"))
        .orderBy(col("doc_id"))
    }),

    // Quality scoring: length/stopword/word-shape heuristics -> [0,1].
    // Quality scoring in EXACT integer micros: every ratio is a rational
    // k/n_words, and float rounding of such rationals can land exactly on
    // a round-half boundary at any fixed scale (engines then disagree by
    // 1 ulp — observed at sf0.1). Half-up integer division
    // (2*10^6*k + n) div (2n) is bit-identical in any engine.
    "t_quality_score" -> ((s, dir) => {
      val words = split(col("text"), " ")
      t(s, dir, "documents")
        .withColumn("nw", size(words).cast("long"))
        .withColumn("ch", length(col("text")).cast("long"))
        .withColumn("k", hitCount(words, stop("en")).cast("long"))
        .withColumn("dc", size(array_distinct(words)).cast("long"))
        .select(col("doc_id"),
          col("nw").cast("int").as("n_words"),
          expr("(2000000 * (ch - nw + 1) + nw) div (2 * nw)").as("awl_u"),
          expr("(2000000 * k + nw) div (2 * nw)").as("stop_u"),
          expr("(2000000 * (nw - dc) + nw) div (2 * nw)").as("dup_u"),
          (least(col("nw"), lit(100L)) * 4000L +
            expr("(800000 * dc + nw) div (2 * nw)") +
            least(expr("(50000 * (ch - nw + 1) + nw) div (2 * nw)"),
              lit(200000L))).as("quality_u"))
        .orderBy(col("doc_id"))
    }),

    // dict_int dictionary (contrib/dict_int): integer tokens normalized
    // BEFORE the standard chain — absval strips signs, >6-digit tokens
    // truncate to their first 6 digits (default mode) or are rejected
    // outright (rejectlong mode); words pass through to lower/stop/stem
    // untouched. Injected numeric tokens prove every option branch:
    // 1234567890 -> 123456, -987654321 -> 987654 (absval then truncate),
    // 42 and 007 unchanged, and the reject lane drops both long ones
    // (n_reject_mode = n_trunc_mode - 2). Map-side like every lexize
    // stage; Spark Column and DuckDB CASE generated from one option set.
    "t_fts_dict_int" -> ((s, dir) => {
      import graft.functions.Lexize
      val withNums = concat_ws(" ", col("text"),
        lit("1234567890 42 -987654321 007"))
      def lexWith(reject: Boolean) =
        Lexize.tsvector(filter(
          transform(split(withNums, " "),
            w => Lexize.dictInt(w, 6, reject, absVal = true)),
          w => w.isNotNull))
      t(s, dir, "documents")
        .withColumn("lex_t", lexWith(false))
        .withColumn("lex_r", lexWith(true))
        .select(col("doc_id"),
          size(col("lex_t")).as("n_trunc_mode"),
          size(col("lex_r")).as("n_reject_mode"),
          size(filter(col("lex_t"), w => w === "123456")).as("tf_123456"),
          size(filter(col("lex_t"), w => w === "987654")).as("tf_987654"),
          size(filter(col("lex_t"), w => w === "007")).as("tf_007"),
          exists(col("lex_t"), w => w.startsWith("-")).as("any_negative"))
        .orderBy(col("doc_id"))
    }),

    // Readability scoring (Flesch reading ease + Flesch-Kincaid grade) —
    // the classic quality gate next to t_quality_score's ratio gates.
    // Deterministic syllable model: vowel-group count per word
    // (max(1, matches of [aeiouy]+)) — the standard approximation, exact
    // and engine-portable. The corpus carries no punctuation, so
    // sentence segmentation is fixed 12-word spans (n_sentences =
    // ceil(words/12)); the formula surface is the point. Both scores
    // are EXACT half-up integer micros staged like t_quality_score
    // (each rational term rounds independently, the staging IS the
    // metric definition), so the hash compare is bit-deterministic.
    // Pure map-side pass fused into the scan.
    "t_readability" -> ((s, dir) => {
      val words = split(col("text"), " ")
      t(s, dir, "documents")
        .withColumn("nw", size(words).cast("long"))
        .withColumn("ns", ceil(size(words) / lit(12.0)).cast("long"))
        .withColumn("sy", aggregate(
          transform(words, w => greatest(lit(1),
            size(regexp_extract_all(lower(w), lit("[aeiouy]+"), lit(0))))
            .cast("long")),
          lit(0L), (acc, x) => acc + x))
        .select(col("doc_id"),
          col("nw").cast("int").as("n_words"),
          col("ns").cast("int").as("n_sentences"),
          col("sy").cast("int").as("n_syllables"),
          (lit(206835000L) - expr("(2*1015000*nw + ns) div (2*ns)") -
            expr("(2*84600000*sy + nw) div (2*nw)")).as("flesch_u"),
          (expr("(2*390000*nw + ns) div (2*ns)") +
            expr("(2*11800000*sy + nw) div (2*nw)") -
            lit(15590000L)).as("fk_u"))
        .orderBy(col("doc_id"))
    }),

    // Language ID: stopword-hit scores per language, deterministic argmax
    // (score desc, language asc). Compared against the labeled column.
    "t_langid" -> ((s, dir) => {
      val words = split(col("text"), " ")
      val scored = t(s, dir, "documents")
        .withColumn("s_en", hitCount(words, stop("en")))
        .withColumn("s_de", hitCount(words, stop("de")))
        .withColumn("s_es", hitCount(words, stop("es")))
        .withColumn("s_fr", hitCount(words, stop("fr")))
        .withColumn("s_zh", hitCount(words, stop("zh")))
      scored.select(col("doc_id"), col("lang").as("labeled"),
          expr("""array_max(array(
              struct(s_en as s, 'en' as l), struct(s_de as s, 'de' as l),
              struct(s_es as s, 'es' as l), struct(s_fr as s, 'fr' as l),
              struct(s_zh as s, 'zh' as l))).l""").as("predicted"),
          col("s_en"), col("s_de"), col("s_es"), col("s_fr"), col("s_zh"))
        .orderBy(col("doc_id"))
    }),

    // PII scrubbing — training-data hygiene (additive pipeline op; the
    // synthetic corpus carries no PII, so deterministic fake PII derived
    // from doc_id is appended first, then redacted). Detection counts run
    // over the raw text BEFORE redaction; the regex chain (emails, then
    // URLs, then phone fragments) is identical in both engines, built
    // with the DataFrame API so no SQL-literal backslash mangling occurs.
    "t_pii_scrub" -> ((s, dir) => {
      val emailRe = "[a-zA-Z0-9._]+@[a-zA-Z0-9.-]+\\.[a-z]{2,}"
      val urlRe = "https?://[^ ]+"
      val phoneRe = "\\b[0-9]{3}-[0-9]{4}\\b"
      val d = t(s, dir, "documents").filter(col("doc_id") < 200)
        .withColumn("raw", concat(col("text"),
          lit(" contact user"), col("doc_id"),
          lit("@example.com or https://ex.com/u/"), col("doc_id"),
          lit(" call 555-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
      d.select(col("doc_id"),
          regexp_replace(
            regexp_replace(
              regexp_replace(col("raw"), emailRe, "<EMAIL>"),
              urlRe, "<URL>"),
            phoneRe, "<PHONE>").as("clean"),
          size(regexp_extract_all(col("raw"), lit(emailRe), lit(0)))
            .as("n_emails"),
          size(regexp_extract_all(col("raw"), lit(urlRe), lit(0)))
            .as("n_urls"),
          size(regexp_extract_all(col("raw"), lit(phoneRe), lit(0)))
            .as("n_phones"))
        .orderBy(col("doc_id"))
    }),

    // Document fingerprint: rolling polynomial hash (Rabin-Karp family)
    // over per-word char hashes — pure integer arithmetic, reproducible in
    // any engine (mod 1e9+7 keeps every intermediate below 2^63).
    // Computed by the native codegen expression rolling_fp (one zero-
    // allocation pass; the HOF aggregate/split chain it replaces is
    // CodegenFallback — TextFnsSpec proves corpus-wide equality).
    "t_fingerprint" -> ((s, dir) => {
      graft.functions.TextFns.register(s)
      t(s, dir, "documents")
        .select(col("doc_id"),
          call_function("rolling_fp", col("text")).as("fingerprint"))
        .withColumn("fp_bucket", pmod(col("fingerprint"), lit(997)))
        .orderBy(col("doc_id"))
    }),

    // Full-text search — the reference's tsvector/tsquery surface
    // (`/root/reference/src/backend/tsearch/`, `tsvector_op.c:2691`,
    // `tsrank.c`), shaped for an LLM corpus: AND-match on query terms
    // (plainto_tsquery analogue) + a ts_rank-style score. The score uses
    // tf saturation tf/(tf+1) per term and RATIONAL length normalization
    // 1/(1 + n_words/100) — deliberately no transcendental calls, so both
    // engines compute bit-identical doubles. Top-20 via bounded top-k.
    "t_fts_rank" -> ((s, dir) => {
      val words = split(col("text"), " ")
      def tf(term: String) =
        size(filter(words, w => w === term)).cast("double")
      val score =
        round((tf("hash") / (tf("hash") + 1) + tf("join") / (tf("join") + 1)) /
              (lit(1.0) + size(words) / lit(100.0)), 6)
      t(s, dir, "documents")
        .withColumn("tf_hash", tf("hash").cast("int"))
        .withColumn("tf_join", tf("join").cast("int"))
        .filter(col("tf_hash") > 0 && col("tf_join") > 0) // AND semantics
        .withColumn("score", score)
        .select(col("doc_id"), col("tf_hash"), col("tf_join"), col("score"))
        .orderBy(col("score").desc, col("doc_id"))
        .limit(20)
    }),

    // setweight + weighted ts_rank (`tsvector_op.c` tsvector_setweight,
    // `tsrank.c:60` default weights {D:0.1, C:0.2, B:0.4, A:1.0}): the
    // first 8 words are the 'A' zone (title), the rest 'D' (body); each
    // term's weighted frequency folds the zone weights before the same
    // tf-saturation used by t_fts_rank. Float op order mirrored exactly
    // in the oracle, ROUND(6) output.
    "t_fts_weighted" -> ((s, dir) => {
      val words = split(col("text"), " ")
      val title = slice(words, 1, 8)
      val body = expr("slice(split(text, ' '), 9, size(split(text, ' ')))")
      def tf(arr: Column, term: String) =
        size(filter(arr, w => w === term)).cast("double")
      def wtf(term: String) =
        lit(1.0) * tf(title, term) + lit(0.1) * tf(body, term)
      val score = round((wtf("hash") / (wtf("hash") + 1) +
        wtf("join") / (wtf("join") + 1)) /
        (lit(1.0) + size(words) / lit(100.0)), 6)
      t(s, dir, "documents")
        .withColumn("t_hash", tf(title, "hash").cast("int"))
        .withColumn("b_hash", tf(body, "hash").cast("int"))
        .withColumn("t_join", tf(title, "join").cast("int"))
        .withColumn("b_join", tf(body, "join").cast("int"))
        .filter(col("t_hash") + col("b_hash") > 0 &&
                col("t_join") + col("b_join") > 0)
        .withColumn("score", score)
        .select(col("doc_id"), col("t_hash"), col("b_hash"),
          col("t_join"), col("b_join"), col("score"))
        .orderBy(col("score").desc, col("doc_id"))
        .limit(20)
    }),

    // Phrase search: adjacency via word-boundary regex over the
    // space-joined text (tsquery <-> FOLLOWED BY analogue).
    "t_fts_phrase" -> ((s, dir) => {
      t(s, dir, "documents")
        .withColumn("n_phrase",
          regexp_count(col("text"), lit("\\bhash join\\b")).cast("int"))
        .filter(col("n_phrase") > 0)
        .select(col("doc_id"), col("n_phrase"),
          instr(col("text"), "hash join").as("first_pos"))
        .orderBy(col("doc_id"))
    }),

    // tsquery boolean combinators — the reference's full query language
    // (`/root/reference/src/backend/utils/adt/tsvector_op.c:2691` TS_execute,
    // `tsquery.c` parser; tests `src/test/regress/sql/tsearch.sql`):
    // `('hash' | 'merge') & !'stream' & 'wind':*` — OR over terms, NOT
    // (absence), and prefix match (`:*`), evaluated over the same
    // word-array tf machinery as t_fts_rank. Each leg's tf is emitted so
    // the oracle checks the operand evaluation, not just the final set.
    "t_fts_bool" -> ((s, dir) => {
      val words = split(col("text"), " ")
      def tf(term: String) =
        size(filter(words, w => w === term)).cast("int")
      t(s, dir, "documents")
        .withColumn("tf_hash", tf("hash"))
        .withColumn("tf_merge", tf("merge"))
        .withColumn("tf_stream", tf("stream"))
        .withColumn("tf_wind_prefix",
          size(filter(words, w => w.startsWith("wind"))).cast("int"))
        .filter((col("tf_hash") > 0 || col("tf_merge") > 0) &&
                col("tf_stream") === 0 && col("tf_wind_prefix") > 0)
        .select(col("doc_id"), col("tf_hash"), col("tf_merge"),
                col("tf_wind_prefix"))
        .orderBy(col("doc_id"))
    }),

    // ts_headline analogue (`/root/reference/src/backend/tsearch/wparser.c`
    // ts_headline, `wparser_def.c` prsd_headline): the +/-5-word window
    // around the FIRST query-term occurrence, matched term wrapped in
    // <b></b> (the reference's default StartSel/StopSel). Word-array
    // slicing, not regex windows: both engines compute the identical
    // snippet with no regex-greediness semantics in play. Pure map-side —
    // headline generation touches each doc once, no shuffle.
    "t_fts_headline" -> ((s, dir) => {
      val words = split(col("text"), " ")
      t(s, dir, "documents")
        .withColumn("w", words)
        .withColumn("i", array_position(col("w"), "hash"))
        .filter(col("i") > 0)
        .withColumn("snip", slice(col("w"),
          greatest(lit(1L), col("i") - 5).cast("int"),
          (least(size(col("w")).cast("long"), col("i") + 5) -
            greatest(lit(1L), col("i") - 5) + 1).cast("int")))
        .select(col("doc_id"), col("i").cast("int").as("first_idx"),
          array_join(transform(col("snip"),
            x => when(x === "hash", lit("<b>hash</b>")).otherwise(x)),
            " ").as("headline"))
        .orderBy(col("doc_id"))
    }),

    // tsquery distance operator `'hash' <2> 'join'` (tsquery_phrase_distance,
    // `/root/reference/src/backend/utils/adt/tsquery.c` <-> parsing,
    // `tsvector_op.c` TS_phrase_execute): a match is a pair of positions
    // exactly N words apart. Computed from per-term position arrays
    // (index-aware transform + filter) — still one map-side pass per doc,
    // no explode/shuffle; the position arrays are term-frequency-sized.
    "t_fts_distance" -> ((s, dir) => {
      val words = split(col("text"), " ")
      def positions(term: String) =
        filter(transform(words, (x, i) => when(x === term, i + 1).otherwise(-1)),
               p => p >= 0)
      t(s, dir, "documents")
        .withColumn("ph", positions("hash"))
        .withColumn("pj", positions("join"))
        .withColumn("n_dist2",
          size(filter(col("ph"),
            p => array_contains(col("pj"), p + 2))).cast("int"))
        .filter(col("n_dist2") > 0)
        .select(col("doc_id"), col("n_dist2"))
        .orderBy(col("doc_id"))
    }),

    // contrib/unaccent diacritic folding (`/root/reference/contrib/
    // unaccent/unaccent.c` — an FTS filter dictionary that strips
    // accents before later dictionaries run): the mapping is a shared
    // translate() table (the unaccent.rules subset the injected fixture
    // exercises), applied both standalone and as the FIRST stage in
    // front of the lexize chain — matching the reference's filter-
    // dictionary position. The corpus has no accents, so accented forms
    // are injected doc_id-keyed (the PII/lexize fixture discipline).
    "t_unaccent" -> ((s, dir) => {
      val accented = "áéíóúñüçÁÉÍÓÚÑÜÇàèìòùâêîôû"
      val folded = "aeiounucAEIOUNUCaeiouaeiou"
      val inj = element_at(array(
        lit("café récit"), lit("naïve señor"), lit("résumé Ñandú"),
        lit("über façade"), lit("àpropos crème")),
        (pmod(col("doc_id"), lit(5)) + 1).cast("int"))
      t(s, dir, "documents")
        .withColumn("raw", inj)
        .withColumn("un", translate(col("raw"), accented, folded))
        .select(col("doc_id"), col("raw"), col("un"),
          (col("un") =!= col("raw")).as("changed"),
          // folding is idempotent: a second pass is a no-op
          (translate(col("un"), accented, folded) === col("un"))
            .as("idempotent"),
          // first token of the folded text survives a later lexize stage
          split(col("un"), " ").getItem(0).as("first_tok"))
        .orderBy(col("doc_id"))
    }),

    // tsvector surgery (`tsvector_op.c`): CONCATENATION `||` shifts the
    // right operand's positions by the left's max position
    // (tsvector_concat), ts_delete removes a lexeme outright, ts_filter
    // keeps only chosen-weight lexemes (here the 'A' title zone, the
    // t_fts_weighted convention). The concat semantics are PROVEN, not
    // just mirrored: title-tsvector || body-tsvector must reproduce the
    // whole-document position list exactly, and the query asserts that
    // identity as a hash-checked boolean column (true on every row).
    "t_tsvector_concat" -> ((s, dir) => {
      val words = split(col("text"), " ")
      def posIn(arr: org.apache.spark.sql.Column, term: String) =
        filter(transform(arr, (x, i) => when(x === term, i + 1).otherwise(-1)),
               p => p >= 0)
      t(s, dir, "documents")
        .withColumn("title", slice(words, 1, 8))
        .withColumn("body",
          slice(words, lit(9), greatest(size(words) - 8, lit(0))))
        .withColumn("cat", concat(posIn(col("title"), "hash"),
          transform(posIn(col("body"), "hash"), p => p + size(col("title")))))
        .withColumn("whole", posIn(words, "hash"))
        .select(col("doc_id"),
          array_join(col("cat"), ",").as("hash_pos"),
          (col("cat") === col("whole")).as("concat_matches_whole"),
          size(array_distinct(words)).as("n_lex"),
          size(array_distinct(filter(words, w => w =!= "hash")))
            .as("n_after_delete"),
          size(array_distinct(col("title"))).as("n_filter_a"))
        .orderBy(col("doc_id"))
    }),

    // ts_rank_cd — cover-density ranking, the reference's second ranking
    // function (`/root/reference/src/backend/utils/adt/tsrank.c:847`
    // calc_rank_cd, Cover() at `:643`; four overloads at
    // `pg_proc.dat:8873-8879`). A cover is a minimal window of document
    // positions containing every query term; each contributes
    // Cpos / (1 + nNoise) where Cpos = n_entries / Σ 1/weight and
    // nNoise = (q - p) - (n_entries - 1). For a two-term AND query the
    // covers are EXACTLY the adjacent differing-term pairs of the merged
    // sorted position list (traced through Cover()'s forward/backward
    // scans: the forward scan stops at the first entry completing the
    // term set, the backward scan takes the nearest preceding entry of
    // the other term, and the restart begins past the cover's first
    // entry) — so with distinct positions n_entries = 2, nNoise = q-p-1,
    // and rank = Σ (2/ΣinvW)/(q-p). Emitted twice: unweighted (all
    // positions class D, weight 0.1 -> 0.1/(q-p) per cover) and with
    // t_fts_weighted's zone model (first 8 words class A, weight 1.0).
    // Pure per-doc array expressions — one codegen'd map-side pass, no
    // explode, no shuffle; double summation is the same left-to-right
    // fold in both engines (same IEEE op sequence, no rounding smear).
    "t_fts_rank_cd" -> ((s, dir) => {
      val words = split(col("text"), " ")
      def positions(term: String) =
        filter(transform(words, (x, i) => when(x === term, i + 1).otherwise(-1)),
               p => p >= 0)
      val merged = array_sort(concat(
        transform(col("ph"), p => struct(p.as("pos"), lit(0).as("t"))),
        transform(col("pj"), p => struct(p.as("pos"), lit(1).as("t")))))
      def invw(e: Column): Column = // zone weights: A=1.0 (invw 1), D=0.1 (invw 10)
        when(e.getField("pos") <= 8, lit(1.0)).otherwise(lit(10.0))
      def rankCd(iw: Column => Column): Column = {
        val m = col("m")
        val pairs = zip_with(slice(m, lit(1), size(m) - 1), slice(m, lit(2), size(m) - 1),
          (a, b) => when(a.getField("t") =!= b.getField("t"),
            lit(2.0) / (iw(a) + iw(b)) /
              (b.getField("pos") - a.getField("pos")).cast("double"))
            .otherwise(lit(0.0)))
        aggregate(pairs, lit(0.0), (acc, x) => acc + x)
      }
      t(s, dir, "documents")
        .withColumn("ph", positions("hash"))
        .withColumn("pj", positions("join"))
        .filter(size(col("ph")) > 0 && size(col("pj")) > 0) // @@ AND match
        .withColumn("m", merged)
        .withColumn("n_covers", size(filter(
          zip_with(slice(col("m"), lit(1), size(col("m")) - 1),
                   slice(col("m"), lit(2), size(col("m")) - 1),
            (a, b) => a.getField("t") =!= b.getField("t")),
          x => x)).cast("int"))
        .withColumn("rank_cd", round(rankCd(_ => lit(10.0)), 6))
        .withColumn("rank_cd_w", round(rankCd(invw), 6))
        .select(col("doc_id"), col("n_covers"), col("rank_cd"), col("rank_cd_w"))
        .orderBy(col("rank_cd").desc, col("doc_id"))
        .limit(20)
    }),

    // The tsquery STRING language end-to-end: the same boolean/phrase
    // semantics as t_fts_bool/t_fts_distance, but arriving through the
    // [[graft.functions.TsQuery]] recursive-descent parser (tsquery.c
    // parse_tsquery analogue — precedence, parens, quoted lexemes, :*,
    // <->/<N>) compiled to the identical Column predicates. The oracle is
    // written directly against the word arrays, independent of the
    // parser, so the hash check covers parse + compile + execute.
    "t_fts_tsquery" -> ((s, dir) => {
      val words = split(col("text"), " ")
      import graft.functions.TsQuery
      t(s, dir, "documents")
        .withColumn("m_bool", TsQuery.matches(
          "('hash' | 'merge') & !'stream' & 'wind':*", words).cast("int"))
        .withColumn("m_dist",
          TsQuery.matches("'hash' <2> 'join'", words).cast("int"))
        .withColumn("m_nested", TsQuery.matches(
          "('fast' | 'slow') <-> 'scan'", words).cast("int"))
        .filter(col("m_bool") + col("m_dist") + col("m_nested") > 0)
        .select(col("doc_id"), col("m_bool"), col("m_dist"), col("m_nested"))
        .orderBy(col("doc_id"))
    }),

    // ts_rewrite end-to-end (`tsquery_rewrite.c` findsubquery; the
    // QUERY-EXPANSION half of the reference's FTS surface — synonym/
    // related-term injection at query time): two rewrites through
    // [[graft.functions.TsQuery.rewrite]] — a leaf expanded to an OR
    // ('hash' -> 'hash | merge' inside 'hash & join') and an
    // order-insensitive AND-chain subset collapsed ('big & slow' inside
    // 'slow & scan & big' -> 'fast'). The oracle evaluates the EXPECTED
    // rewritten semantics directly on the word arrays, independent of
    // parser and rewriter.
    "t_fts_rewrite" -> ((s, dir) => {
      val words = split(col("text"), " ")
      import graft.functions.TsQuery
      val r1 = TsQuery.rewrite("hash & join", "hash", "hash | merge")
      val r2 = TsQuery.rewrite("slow & scan & big", "big & slow", "fast")
      t(s, dir, "documents")
        .withColumn("m_before",
          TsQuery.matches("hash & join", words).cast("int"))
        .withColumn("m_expanded", TsQuery.matches(r1, words).cast("int"))
        .withColumn("m_collapsed", TsQuery.matches(r2, words).cast("int"))
        .filter(col("m_before") + col("m_expanded") + col("m_collapsed") > 0)
        .select(col("doc_id"), col("m_before"), col("m_expanded"),
                col("m_collapsed"))
        .orderBy(col("doc_id"))
    }),

    // websearch_to_tsquery end-to-end (`to_tsany.c`
    // websearch_to_tsquery): free-form search syntax — implicit AND,
    // "quoted phrases", -negation, loosest-binding OR (any case) —
    // parsed by [[graft.functions.TsQuery.websearch]] onto the same AST
    // and compiled to the same array predicates as t_fts_tsquery. The
    // oracle is written directly against the word arrays, independent of
    // the parser, so the hash check covers websearch parse + compile +
    // execute.
    "t_fts_websearch" -> ((s, dir) => {
      val words = split(col("text"), " ")
      import graft.functions.TsQuery
      t(s, dir, "documents")
        .withColumn("m_or_chains", TsQuery.matchesWebsearch(
          "hash join or merge scan", words).cast("int"))
        .withColumn("m_phrase_neg", TsQuery.matchesWebsearch(
          "\"hash join\" -stream", words).cast("int"))
        .withColumn("m_mixed", TsQuery.matchesWebsearch(
          "fast OR \"slow scan\" -big", words).cast("int"))
        .filter(col("m_or_chains") + col("m_phrase_neg") + col("m_mixed") > 0)
        .select(col("doc_id"), col("m_or_chains"), col("m_phrase_neg"),
                col("m_mixed"))
        .orderBy(col("doc_id"))
    }),

    // GIN-style inverted index + index-assisted search
    // (`/root/reference/src/backend/access/gin/` — CREATE INDEX USING
    // gin(tsvector); postings-list intersection is how `@@` avoids the
    // heap scan): the posting lists (lexeme -> sorted doc ids) are built
    // with one (lexeme) shuffle — the index build — and the AND query
    // 'hash & join' is answered by INTERSECTING two posting arrays
    // instead of scanning text. At 100 TB the search touches exactly the
    // two lexemes' postings rows; the corpus is read only at build time.
    // The oracle evaluates the same query by direct text scan — the
    // index path must return the identical doc set (index == scan, the
    // property a GIN index owes you), plus each term's doc frequency
    // from the postings themselves.
    "t_fts_inverted_index" -> ((s, dir) => {
      import graft.functions.Lexize
      val postings = t(s, dir, "documents")
        .select(col("doc_id"), explode(array_distinct(
          Lexize.tsvector(split(col("text"), " ")))).as("lex"))
        .groupBy(col("lex"))
        .agg(sort_array(collect_list(col("doc_id"))).as("docs"))
      val h = postings.filter(col("lex") === "hash")
        .select(col("docs").as("h_docs"))
      val j = postings.filter(col("lex") === "join")
        .select(col("docs").as("j_docs"))
      h.crossJoin(j) // 1x1: two postings rows
        .select(size(col("h_docs")).as("df_hash"),
                size(col("j_docs")).as("df_join"),
                explode(array_intersect(col("h_docs"), col("j_docs")))
                  .as("doc_id"))
        .select(col("doc_id"), col("df_hash"), col("df_join"))
        .orderBy(col("doc_id"))
    }),

    // ts_stat (`/root/reference/src/backend/utils/adt/tsvector_op.c`
    // ts_stat_sql): corpus-wide lexeme statistics — per word, the
    // document frequency (ndoc) and total occurrences (nentry) over the
    // LEXIZED corpus (stats run over tsvectors, not raw text; stop words
    // never appear). One explode + one (word) shuffle with map-side
    // partials — the reference walks every tsvector the same way.
    "t_ts_stat" -> ((s, dir) => {
      import graft.functions.Lexize
      t(s, dir, "documents")
        .select(col("doc_id"),
          explode(Lexize.tsvector(split(col("text"), " "))).as("word"))
        .groupBy(col("word"))
        .agg(countDistinct(col("doc_id")).cast("int").as("ndoc"),
             count(lit(1)).as("nentry"))
        .orderBy(col("nentry").desc, col("word"))
        .limit(30)
    }),

    // The default text-search parser's 23 token classes
    // (`/root/reference/src/backend/tsearch/wparser_def.c`; regress
    // sql/tsearch.sql ts_parse/ts_debug): the reference's own vectors,
    // token-for-token — email, protocol/url/host/url_path compounds,
    // files, signed/scientific/version numbers, hyphenated-word part
    // emission, tags with quoted attributes, entities, exact blank
    // boundaries. The oracle VALUES table is transcribed from the
    // reference's expected/tsearch.out (TsParserRegress), so the
    // parser is judged against reference-produced output, not itself.
    "t_fts_parser" -> ((s, dir) => {
      import s.implicits._
      graft.functions.FtsParserFns.register(s)
      val aliasMap = typedLit(graft.functions.FtsDefaultParser.alias)
      TsParserRegress.vectors.map { case (vid, input, _) => (vid, input) }
        .toDF("vec_id", "txt")
        .select(col("vec_id"), posexplode(expr("ts_parse_default(txt)")))
        .select(col("vec_id"), col("pos").cast("int").as("ord"),
          col("col.tokid").as("tokid"),
          try_element_at(aliasMap, col("col.tokid")).as("tok_alias"),
          col("col.token").as("token"))
        .orderBy(col("vec_id"), col("ord"))
    }),

    // The parser feeding the production surface: documents text plus an
    // injected web-shaped tail (url, email, version, file, hyphenated
    // word keyed on doc_id), with asciiword tokens flowing into the
    // EXISTING lexize chain — the ts_debug pipeline shape
    // (parse -> token class -> dictionary chain). Pure map-side
    // expression work; the oracle derives every output from the base
    // columns and the shared Lexize rule-table SQL.
    "t_fts_parser_docs" -> ((s, dir) => {
      import graft.functions.Lexize
      graft.functions.FtsParserFns.register(s)
      val k = pmod(col("doc_id"), lit(7)).cast("int").cast("string")
      val inj = concat(lit(" visit http://ex"), k,
        lit(".example.org/doc?id="), k,
        lit(" mail user"), k, lit("@ex"), k, lit(".example.org ver 1.2."), k,
        lit(" note /usr/share/f"), k, lit(".txt go-fast"))
      def toks(id: Int): Column =
        transform(filter(col("p"), t => t("tokid") === id), t => t("token"))
      t(s, dir, "documents").filter(col("doc_id") <= 300)
        .withColumn("full_txt", concat(col("text"), inj))
        .withColumn("p", expr("ts_parse_default(full_txt)"))
        .withColumn("words", toks(1))
        .select(col("doc_id"),
          size(col("words")).as("n_word"),
          get(toks(5), lit(0)).as("the_url"),
          get(toks(6), lit(0)).as("the_host"),
          get(toks(4), lit(0)).as("the_email"),
          get(toks(8), lit(0)).as("the_version"),
          get(toks(19), lit(0)).as("the_file"),
          size(toks(14)).as("n_protocol"),
          get(toks(16), lit(0)).as("the_hword"),
          size(toks(11)).as("n_parts"),
          array_join(slice(Lexize.tsvectorChain(col("words")), -3, 3), " ")
            .as("lex_tail"))
        .orderBy(col("doc_id"))
    }),

    // The lexize stage end-to-end (ts_lexize: dict_simple.c stop list +
    // snowball stemming; see [[graft.functions.Lexize]]): the corpus is
    // deterministically INFLECTED (plurals/gerunds/past — see inflect
    // above), then lexized back; per-doc counts, stemmed tfs, the first
    // lexemes, and a per-row `roundtrip` proof that lexize(inflect(w))
    // equals the original tokens minus stop words. The oracle rebuilds
    // the whole pipeline in DuckDB from the SAME rule table (the CASE
    // SQL is generated by Lexize.duckStem*, so engine and oracle cannot
    // drift). Pure map-side lexing; one codegen'd pass.
    "t_fts_lexize" -> ((s, dir) => {
      import graft.functions.Lexize
      val raw = split(col("text"), " ")
      val stops = array(Lexize.StopWords.map(lit): _*)
      t(s, dir, "documents")
        .withColumn("infl", inflect(raw))
        .withColumn("lex", Lexize.tsvector(col("infl")))
        .select(col("doc_id"),
          size(raw).as("n_raw"),
          size(col("lex")).as("n_lex"),
          size(filter(transform(col("infl"), w => lower(w)),
            w => array_contains(stops, w))).as("n_stop"),
          size(filter(col("lex"), w => w === "hash")).as("tf_hash"),
          size(filter(col("lex"), w => w === "query")).as("tf_query"),
          array_join(slice(col("lex"), 1, 5), " ").as("first5"),
          (col("lex") === filter(raw, w => !array_contains(stops, w)))
            .as("roundtrip"))
        .orderBy(col("doc_id"))
    }),

    // The full dictionary CHAIN (ts_parse.c LexizeExec dispatch over
    // dict_ispell -> snowball -> thesaurus; `/root/reference/src/backend/
    // tsearch/spell.c`, `dict_thesaurus.c`): irregular forms resolve by
    // LOOKUP before the algorithmic stemmer ("mice" -> "mouse",
    // "wolves" -> "wolf" where the suffix rules alone would yield
    // "wolve"), and canonical-synonym folding runs over the stemmed
    // lexemes ("rapidly" -> "rapid" -> "fast"; the corpus word "big"
    // folds to "large"). Chain-exercising tokens are injected per doc
    // (doc_id-keyed, like the PII fixture) since the synthetic corpus
    // has no irregular forms. The oracle rebuilds every stage from THE
    // SAME rule tables (Lexize.duck* generators), so engine and oracle
    // cannot drift. Pure staged array transforms — map-side, no shuffle.
    "t_fts_lexize_chain" -> ((s, dir) => {
      import graft.functions.Lexize
      val inj = element_at(array(
        lit("mice ran rapidly"), lit("children wrote quickly"),
        lit("matrices went speedy"), lit("geese took huge"),
        lit("indices wolves tiny")),
        (pmod(col("doc_id"), lit(5)) + 1).cast("int"))
      def tf(term: String) =
        size(filter(col("lex"), w => w === term)).cast("int")
      t(s, dir, "documents")
        .withColumn("lex",
          Lexize.tsvectorChain(split(concat_ws(" ", col("text"), inj), " ")))
        .select(col("doc_id"),
          size(col("lex")).as("n_lex"),
          tf("mouse").as("tf_mouse"),       // mice -> mouse (ispell)
          tf("wolf").as("tf_wolf"),         // wolves -> wolf, NOT wolve
          tf("run").as("tf_run"),           // ran -> run (irregular verb)
          tf("fast").as("tf_fast"),         // rapidly/quickly/speedy fold
          tf("large").as("tf_large"),       // big/huge fold (corpus + inj)
          tf("small").as("tf_small"),       // tiny folds into corpus small
          // last-3 window: slice(-3, 3) on a <3-element array is EMPTY
          // in Spark while the oracle's lex[-3:] is the whole list, so
          // short docs take the whole-array branch explicitly (the
          // corpus fixture guarantees >=3 lexemes today; the guard keeps
          // the semantics honest when it doesn't)
          array_join(when(size(col("lex")) < 3, col("lex"))
            .otherwise(slice(col("lex"), -3, 3)), " ").as("last3"),
          (tf("mouse") + tf("goose") + tf("index") > 0).as("matches_lookup"))
        .orderBy(col("doc_id"))
    }),

    // dict_xsyn extended-synonym dictionary (contrib/dict_xsyn/
    // dict_xsyn.c): group heads expand ONE-TO-MANY — a doc containing
    // only "agg" emits aggregate/aggregation lexemes and becomes
    // findable by either synonym (the reverse of the thesaurus's
    // many-to-one folding above). Both keeporig modes are exercised:
    // keeporig=true (the contrib default) keeps the head alongside the
    // synonyms; keeporig=false replaces it — orig_dropped proves the
    // head vanished from the replaced vector exactly when the doc had
    // it. Synonym targets are out-of-vocabulary words, so m_aggregate/
    // m_seqscan can only be true via the expansion. Pure map-side
    // flatten fused into the scan, like the rest of the lexize chain.
    "t_fts_xsyn" -> ((s, dir) => {
      import graft.functions.Lexize
      t(s, dir, "documents")
        .withColumn("lex", Lexize.tsvector(split(col("text"), " ")))
        .withColumn("expanded", Lexize.xsynExpand(col("lex"), keepOrig = true))
        .withColumn("replaced", Lexize.xsynExpand(col("lex"), keepOrig = false))
        .select(col("doc_id"),
          size(col("lex")).as("n_lex"),
          size(col("expanded")).as("n_expanded"),
          size(col("replaced")).as("n_replaced"),
          array_contains(col("expanded"), "aggregate").as("m_aggregate"),
          array_contains(col("expanded"), "seqscan").as("m_seqscan"),
          (array_contains(col("lex"), "agg") &&
            !array_contains(col("replaced"), "agg")).as("orig_dropped"),
          array_join(slice(col("expanded"), 1, 8), " ").as("first8"))
        .orderBy(col("doc_id"))
    }),

    // t_fts_rank over LEXIZED tokens — the reference's actual @@ + ts_rank
    // semantics, where the query term 'hash' matches "hashes"/"hashing" in
    // the document: same tf-saturation + rational length-normalization
    // score as t_fts_rank (no transcendentals, bit-identical doubles),
    // computed over the lexeme array of the inflected corpus. Length
    // normalization uses the LEXEME count (stop words don't dilute rank —
    // matching ts_rank, which ranks over the tsvector, not raw text).
    "t_fts_rank_stemmed" -> ((s, dir) => {
      import graft.functions.Lexize
      t(s, dir, "documents")
        .withColumn("lex", Lexize.tsvector(inflect(split(col("text"), " "))))
        .withColumn("tf_hash",
          size(filter(col("lex"), w => w === "hash")).cast("int"))
        .withColumn("tf_join",
          size(filter(col("lex"), w => w === "join")).cast("int"))
        .filter(col("tf_hash") > 0 && col("tf_join") > 0)
        .withColumn("score", round(
          (col("tf_hash").cast("double") / (col("tf_hash") + 1) +
           col("tf_join").cast("double") / (col("tf_join") + 1)) /
          (lit(1.0) + size(col("lex")) / lit(100.0)), 6))
        .select(col("doc_id"), col("tf_hash"), col("tf_join"), col("score"))
        .orderBy(col("score").desc, col("doc_id"))
        .limit(20)
    }),

    // Okapi BM25 ranking (k1=1.2, b=0.75; the retrieval scorer behind
    // RAG / training-data relevance filtering — the reference ecosystem
    // ships it as the next step up from ts_rank's tf-saturation, which
    // BM25 generalizes with idf and length normalization). Two-term OR
    // query; idf is the Lucene non-negative form ln(1+(N-df+.5)/(df+.5)).
    // The ln/divide float ops are mirrored token-for-token in the oracle
    // (the q_earth_distance discipline) and the score ROUNDs far above
    // ulp noise. Shape: one map-side pass computes (tf, dl) per doc; the
    // 1-row corpus stats (N, sum dl, df per term) broadcast back; top-20
    // via bounded top-k. No shuffle touches the corpus.
    "t_bm25_rank" -> ((s, dir) => {
      val words = split(col("text"), " ")
      def tfc(term: String) = size(filter(words, w => w === term))
      val d = t(s, dir, "documents")
        .select(col("doc_id"), tfc("hash").as("tfh"), tfc("join").as("tfj"),
          size(words).as("dl"))
      val st = d.agg(count(lit(1)).as("nd"), sum(col("dl")).as("sdl"),
        sum(when(col("tfh") > 0, 1L).otherwise(0L)).as("dfh"),
        sum(when(col("tfj") > 0, 1L).otherwise(0L)).as("dfj"))
      d.crossJoin(broadcast(st))
        .filter(col("tfh") > 0 || col("tfj") > 0)
        .withColumn("avgdl", col("sdl").cast("double") / col("nd"))
        .withColumn("idfh",
          log(lit(1.0) + (col("nd") - col("dfh") + 0.5) / (col("dfh") + 0.5)))
        .withColumn("idfj",
          log(lit(1.0) + (col("nd") - col("dfj") + 0.5) / (col("dfj") + 0.5)))
        .withColumn("norm",
          lit(1.2) * (lit(0.25) + lit(0.75) * (col("dl") / col("avgdl"))))
        .select(col("doc_id"), col("tfh"), col("tfj"),
          round(col("idfh") * ((col("tfh") * 2.2) / (col("tfh") + col("norm"))) +
                col("idfj") * ((col("tfj") * 2.2) / (col("tfj") + col("norm"))),
            6).as("score"))
        .orderBy(col("score").desc, col("doc_id"))
        .limit(20)
    }),

    // Per-document TF-IDF top terms (the keyword-extraction pipeline op;
    // ts_stat's corpus statistics turned per-document): every token
    // joins its document frequency (vocab-bounded broadcast), weight =
    // tf * ln(N/df), top-3 terms per doc by (weight, term). Shape: one
    // token-keyed shuffle builds df; the per-doc ranking is a window
    // over each doc's OWN tokens (doc-keyed partitions, no global sort).
    "t_tfidf_terms" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val toks = t(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      // df/N come from the FULL corpus; only the reported docs (a fixed
      // window of 40) are ranked, and that filter prunes BEFORE the join
      val tf = toks.filter(col("doc_id") < 40)
        .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("tf"))
      val df = toks.select(col("doc_id"), col("w")).distinct()
        .groupBy(col("w")).agg(count(lit(1)).as("df"))
      val nd = t(s, dir, "documents").agg(count(lit(1)).as("nd"))
      val wnd = Window.partitionBy(col("doc_id"))
        .orderBy(col("weight").desc, col("w"))
      tf.join(broadcast(df), Seq("w")).crossJoin(broadcast(nd))
        .withColumn("weight",
          round(col("tf") * log(col("nd").cast("double") / col("df")), 6))
        .withColumn("rk", row_number().over(wnd))
        .filter(col("rk") <= 3)
        .select(col("doc_id"), col("rk"), col("w"), col("tf"), col("df"),
          col("weight"))
        .orderBy(col("doc_id"), col("rk"))
    }),

    // Vocabulary building — the training-pipeline op behind tokenizer/
    // vocab construction: corpus-wide token frequencies, top-k. Shape at
    // scale: explode -> partial map-side counts -> one shuffle of
    // (token, partial) pairs -> TakeOrderedAndProject top-k (bounded
    // driver result; the full vocab never collects).
    "t_vocab_topk" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("w"))
        .limit(25)
    }),

    // Bigram language-model counts (the n-gram count tables LM/tokenizer
    // pipelines build): adjacent-word pairs via a zip of the word array
    // with its own tail — one map-side pass per doc, no self-join — then
    // the same partial-agg shuffle discipline as t_vocab_topk.
    "t_ngram_counts" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(split(col("text"), " ").as("w"))
        .select(explode(expr(
          "zip_with(slice(w, 1, size(w) - 1), slice(w, 2, size(w) - 1), " +
            "(a, b) -> concat(a, ' ', b))")).as("bg"))
        .groupBy(col("bg")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("bg"))
        .limit(20)
    }),

    // Fingerprint-based dup grouping: docs sharing a fingerprint.
    "t_fingerprint_groups" -> ((s, dir) => {
      graft.functions.TextFns.register(s)
      t(s, dir, "documents")
        .select(col("doc_id"),
          call_function("rolling_fp", col("text")).as("fingerprint"))
        .groupBy(col("fingerprint"))
        .agg(count(lit(1)).as("n"), min(col("doc_id")).as("keeper"))
        .groupBy()
        .agg(count(lit(1)).as("n_groups"),
             sum(when(col("n") > 1, 1).otherwise(0)).as("n_dup_groups"),
             sum(col("n") - 1).as("n_removable"))
    })
  )

  private val fpSql =
    """list_reduce(list_prepend(CAST(0 AS BIGINT),
      |  list_transform(string_split(text, ' '), word ->
      |    list_reduce(list_prepend(CAST(0 AS BIGINT),
      |      list_transform(string_split(word, ''), c -> CAST(ord(c) AS BIGINT))),
      |      (a, c) -> (a * 31 + c) % 1000000007))),
      |  (acc, wh) -> (acc * 131 + wh) % 1000000007)""".stripMargin

  // The lexize pipeline as staged DuckDB CTEs — inflect, lowercase+stop,
  // then the two stem groups, each CASE GENERATED from the same rule
  // table the Spark side compiles to Columns (Lexize.duckStem*).
  private val lexPipelineSql = {
    import graft.functions.Lexize
    s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS w0 FROM documents),
       |i AS (SELECT doc_id, w0,
       |    list_transform(w0, x -> ${inflectSql("x")}) AS wi FROM d),
       |k AS (SELECT doc_id, w0, wi,
       |    list_filter(list_transform(wi, x -> lower(x)),
       |      x -> len(x) > 0 AND x NOT IN ${Lexize.duckStopList}) AS wk FROM i),
       |s1 AS (SELECT doc_id, w0, wi,
       |    list_transform(wk, x -> ${Lexize.duckStemPlural("x")}) AS ws FROM k),
       |s2 AS (SELECT doc_id, w0, wi,
       |    list_transform(ws, x -> ${Lexize.duckStemSuffix("x")}) AS lex FROM s1)""".stripMargin
  }

  /** Chain-pipeline CTEs generated from the SAME rule tables as
    * [[graft.functions.Lexize.tsvectorChain]] — one stage per CTE. */
  private val chainPipelineSql = {
    import graft.functions.Lexize
    s"""WITH d AS (SELECT doc_id, text || ' ' ||
       |    (['mice ran rapidly', 'children wrote quickly',
       |      'matrices went speedy', 'geese took huge',
       |      'indices wolves tiny'])[(doc_id % 5) + 1] AS t2
       |  FROM documents),
       |w AS (SELECT doc_id, list_filter(
       |    list_transform(string_split(t2, ' '), x -> lower(x)),
       |    x -> len(x) > 0 AND x NOT IN ${Lexize.duckStopList}) AS f FROM d),
       |c1 AS (SELECT doc_id,
       |    list_transform(f, x -> ${Lexize.duckIrregularOrPlural("x")}) AS l
       |  FROM w),
       |c2 AS (SELECT doc_id,
       |    list_transform(l, x -> ${Lexize.duckStemSuffix("x")}) AS l2
       |  FROM c1),
       |c3 AS (SELECT doc_id,
       |    list_transform(l2, x -> ${Lexize.duckSynonym("x")}) AS lex
       |  FROM c2)""".stripMargin
  }

  /** VALUES rows for the t_fts_parser oracle, rendered from the
    * regress-transcribed token table (reference-produced output). */
  private def tsParserOracleRows: String =
    TsParserRegress.vectors.flatMap { case (vid, _, exp) =>
      exp.zipWithIndex.map { case ((tokid, tok), ord) =>
        val alias = graft.functions.FtsDefaultParser.alias(tokid)
        val esc = tok.replace("'", "''")
        s"($vid, $ord, $tokid, '$alias', '$esc')"
      }
    }.mkString(",\n")

  val oracle: Map[String, String] = Map(
    "t_fts_parser" ->
      s"""SELECT * FROM (VALUES
         |$tsParserOracleRows
         |) AS t(vec_id, ord, tokid, tok_alias, token)
         |ORDER BY vec_id, ord""".stripMargin,

    "t_fts_parser_docs" -> {
      import graft.functions.Lexize
      s"""WITH d AS (SELECT doc_id, text, CAST(doc_id % 7 AS VARCHAR) AS k
         |    FROM documents WHERE doc_id <= 300),
         |w0 AS (SELECT doc_id, k,
         |    string_split(text, ' ') || ['visit','mail','ver','note'] AS words
         |  FROM d),
         |w AS (SELECT doc_id, k, words, list_filter(
         |    list_transform(words, x -> lower(x)),
         |    x -> len(x) > 0 AND x NOT IN ${Lexize.duckStopList}) AS f
         |  FROM w0),
         |c1 AS (SELECT doc_id, k, words,
         |    list_transform(f, x -> ${Lexize.duckIrregularOrPlural("x")}) AS l
         |  FROM w),
         |c2 AS (SELECT doc_id, k, words,
         |    list_transform(l, x -> ${Lexize.duckStemSuffix("x")}) AS l2
         |  FROM c1),
         |c3 AS (SELECT doc_id, k, words,
         |    list_transform(l2, x -> ${Lexize.duckSynonym("x")}) AS lex
         |  FROM c2)
         |SELECT doc_id,
         |  CAST(len(words) AS INT) AS n_word,
         |  'ex' || k || '.example.org/doc?id=' || k AS the_url,
         |  'ex' || k || '.example.org' AS the_host,
         |  'user' || k || '@ex' || k || '.example.org' AS the_email,
         |  '1.2.' || k AS the_version,
         |  '/usr/share/f' || k || '.txt' AS the_file,
         |  1 AS n_protocol,
         |  'go-fast' AS the_hword,
         |  2 AS n_parts,
         |  array_to_string(lex[-3:], ' ') AS lex_tail
         |FROM c3 ORDER BY doc_id""".stripMargin
    },

    "t_fts_lexize_chain" ->
      s"""$chainPipelineSql
         |SELECT doc_id,
         |  CAST(len(lex) AS INT) AS n_lex,
         |  CAST(len(list_filter(lex, x -> x = 'mouse')) AS INT) AS tf_mouse,
         |  CAST(len(list_filter(lex, x -> x = 'wolf')) AS INT) AS tf_wolf,
         |  CAST(len(list_filter(lex, x -> x = 'run')) AS INT) AS tf_run,
         |  CAST(len(list_filter(lex, x -> x = 'fast')) AS INT) AS tf_fast,
         |  CAST(len(list_filter(lex, x -> x = 'large')) AS INT) AS tf_large,
         |  CAST(len(list_filter(lex, x -> x = 'small')) AS INT) AS tf_small,
         |  array_to_string(lex[-3:], ' ') AS last3,
         |  len(list_filter(lex, x -> x IN ('mouse', 'goose', 'index'))) > 0
         |    AS matches_lookup
         |FROM c3 ORDER BY doc_id""".stripMargin,

    "t_fts_xsyn" -> {
      import graft.functions.Lexize
      s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS w0
         |  FROM documents),
         |k AS (SELECT doc_id,
         |    list_filter(list_transform(w0, x -> lower(x)),
         |      x -> len(x) > 0 AND x NOT IN ${Lexize.duckStopList}) AS wk
         |  FROM d),
         |s1 AS (SELECT doc_id,
         |    list_transform(wk, x -> ${Lexize.duckStemPlural("x")}) AS ws
         |  FROM k),
         |s2 AS (SELECT doc_id,
         |    list_transform(ws, x -> ${Lexize.duckStemSuffix("x")}) AS lex
         |  FROM s1),
         |x AS (SELECT doc_id, lex,
         |    flatten(list_transform(lex, x -> ${Lexize.duckXsyn("x", true)}))
         |      AS expanded,
         |    flatten(list_transform(lex, x -> ${Lexize.duckXsyn("x", false)}))
         |      AS replaced
         |  FROM s2)
         |SELECT doc_id,
         |  CAST(len(lex) AS INT) AS n_lex,
         |  CAST(len(expanded) AS INT) AS n_expanded,
         |  CAST(len(replaced) AS INT) AS n_replaced,
         |  list_contains(expanded, 'aggregate') AS m_aggregate,
         |  list_contains(expanded, 'seqscan') AS m_seqscan,
         |  list_contains(lex, 'agg') AND NOT list_contains(replaced, 'agg')
         |    AS orig_dropped,
         |  array_to_string(expanded[1:8], ' ') AS first8
         |FROM x ORDER BY doc_id""".stripMargin
    },

    "t_fts_lexize" ->
      s"""$lexPipelineSql
         |SELECT doc_id,
         |  CAST(len(w0) AS INT) AS n_raw,
         |  CAST(len(lex) AS INT) AS n_lex,
         |  CAST(len(list_filter(wi, x -> lower(x) IN
         |    ${graft.functions.Lexize.duckStopList})) AS INT) AS n_stop,
         |  CAST(len(list_filter(lex, x -> x = 'hash')) AS INT) AS tf_hash,
         |  CAST(len(list_filter(lex, x -> x = 'query')) AS INT) AS tf_query,
         |  array_to_string(lex[1:5], ' ') AS first5,
         |  lex = list_filter(w0, x -> x NOT IN
         |    ${graft.functions.Lexize.duckStopList}) AS roundtrip
         |FROM s2 ORDER BY doc_id""".stripMargin,

    "t_fts_rank_stemmed" ->
      s"""$lexPipelineSql,
         |s AS (SELECT doc_id,
         |    CAST(len(list_filter(lex, x -> x = 'hash')) AS INT) AS tf_hash,
         |    CAST(len(list_filter(lex, x -> x = 'join')) AS INT) AS tf_join,
         |    len(lex) AS nw FROM s2)
         |SELECT doc_id, tf_hash, tf_join,
         |  ROUND((CAST(tf_hash AS DOUBLE) / (tf_hash + 1) +
         |         CAST(tf_join AS DOUBLE) / (tf_join + 1))
         |        / (1.0 + CAST(nw AS DOUBLE) / 100.0), 6) AS score
         |FROM s WHERE tf_hash > 0 AND tf_join > 0
         |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,

    "t_token_count" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS INT) AS n_ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS INT) AS n_bpe_tokens,
        |  CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_distinct_words,
        |  CAST(length(text) AS INT) AS n_chars_computed,
        |  length(text) = n_chars AS chars_match
        |FROM documents ORDER BY doc_id""".stripMargin,

    "t_quality_score" ->
      s"""WITH d AS (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents),
         |m AS (SELECT doc_id,
         |    CAST(len(w) AS BIGINT) AS nw,
         |    CAST(length(text) AS BIGINT) AS ch,
         |    CAST(${hitCountSql(stop("en"))} AS BIGINT) AS k,
         |    CAST(len(list_distinct(w)) AS BIGINT) AS dc
         |  FROM d)
         |SELECT doc_id, CAST(nw AS INT) AS n_words,
         |  (2000000 * (ch - nw + 1) + nw) // (2 * nw) AS awl_u,
         |  (2000000 * k + nw) // (2 * nw) AS stop_u,
         |  (2000000 * (nw - dc) + nw) // (2 * nw) AS dup_u,
         |  least(nw, 100) * 4000 +
         |    (800000 * dc + nw) // (2 * nw) +
         |    least((50000 * (ch - nw + 1) + nw) // (2 * nw), 200000) AS quality_u
         |FROM m ORDER BY doc_id""".stripMargin,

    "t_fts_dict_int" -> {
      import graft.functions.Lexize
      def stagesFor(src: String, out: String): String =
        s"""k_$out AS (SELECT doc_id,
           |    list_filter(list_transform($src, x -> lower(x)),
           |      x -> len(x) > 0 AND x NOT IN ${Lexize.duckStopList}) AS wk
           |  FROM m),
           |p_$out AS (SELECT doc_id,
           |    list_transform(wk, x -> ${Lexize.duckStemPlural("x")}) AS wp
           |  FROM k_$out),
           |$out AS (SELECT doc_id,
           |    list_transform(wp, x -> ${Lexize.duckStemSuffix("x")}) AS lex
           |  FROM p_$out)""".stripMargin
      s"""WITH d AS (SELECT doc_id,
         |    string_split(text || ' 1234567890 42 -987654321 007', ' ')
         |      AS w0
         |  FROM documents),
         |m AS (SELECT doc_id,
         |    list_filter(list_transform(w0,
         |      x -> ${Lexize.duckDictInt("x", 6, rejectLong = false, absVal = true)}),
         |      x -> x IS NOT NULL) AS dt,
         |    list_filter(list_transform(w0,
         |      x -> ${Lexize.duckDictInt("x", 6, rejectLong = true, absVal = true)}),
         |      x -> x IS NOT NULL) AS dr
         |  FROM d),
         |${stagesFor("dt", "lt")},
         |${stagesFor("dr", "lr")}
         |SELECT lt.doc_id,
         |  CAST(len(lt.lex) AS INT) AS n_trunc_mode,
         |  CAST(len(lr.lex) AS INT) AS n_reject_mode,
         |  CAST(len(list_filter(lt.lex, x -> x = '123456')) AS INT)
         |    AS tf_123456,
         |  CAST(len(list_filter(lt.lex, x -> x = '987654')) AS INT)
         |    AS tf_987654,
         |  CAST(len(list_filter(lt.lex, x -> x = '007')) AS INT) AS tf_007,
         |  len(list_filter(lt.lex, x -> x LIKE '-%')) > 0 AS any_negative
         |FROM lt JOIN lr ON lt.doc_id = lr.doc_id
         |ORDER BY lt.doc_id""".stripMargin
    },

    "t_readability" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w
        |  FROM documents),
        |m AS (SELECT doc_id,
        |    CAST(len(w) AS BIGINT) AS nw,
        |    CAST(ceil(len(w) / 12.0) AS BIGINT) AS ns,
        |    CAST(list_reduce(list_prepend(0, list_transform(w, x ->
        |        greatest(1, len(regexp_extract_all(lower(x), '[aeiouy]+'))))),
        |      (a, x) -> a + x) AS BIGINT) AS sy
        |  FROM d)
        |SELECT doc_id,
        |  CAST(nw AS INT) AS n_words,
        |  CAST(ns AS INT) AS n_sentences,
        |  CAST(sy AS INT) AS n_syllables,
        |  206835000 - (2*1015000*nw + ns) // (2*ns)
        |    - (2*84600000*sy + nw) // (2*nw) AS flesch_u,
        |  (2*390000*nw + ns) // (2*ns)
        |    + (2*11800000*sy + nw) // (2*nw) - 15590000 AS fk_u
        |FROM m ORDER BY doc_id""".stripMargin,

    "t_langid" ->
      s"""WITH d AS (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents),
         |scored AS (SELECT doc_id, lang AS labeled,
         |    CAST(${hitCountSql(stop("en"))} AS INT) AS s_en,
         |    CAST(${hitCountSql(stop("de"))} AS INT) AS s_de,
         |    CAST(${hitCountSql(stop("es"))} AS INT) AS s_es,
         |    CAST(${hitCountSql(stop("fr"))} AS INT) AS s_fr,
         |    CAST(${hitCountSql(stop("zh"))} AS INT) AS s_zh
         |  FROM d)
         |SELECT doc_id, labeled,
         |  list_max([{'s': s_en, 'l': 'en'}, {'s': s_de, 'l': 'de'},
         |            {'s': s_es, 'l': 'es'}, {'s': s_fr, 'l': 'fr'},
         |            {'s': s_zh, 'l': 'zh'}]).l AS predicted,
         |  s_en, s_de, s_es, s_fr, s_zh
         |FROM scored ORDER BY doc_id""".stripMargin,

    "t_pii_scrub" ->
      """WITH d AS (SELECT doc_id,
        |    text || ' contact user' || doc_id ||
        |    '@example.com or https://ex.com/u/' || doc_id ||
        |    ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        |      AS raw
        |  FROM documents WHERE doc_id < 200)
        |SELECT doc_id,
        |  regexp_replace(
        |    regexp_replace(
        |      regexp_replace(raw,
        |        '[a-zA-Z0-9._]+@[a-zA-Z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
        |      'https?://[^ ]+', '<URL>', 'g'),
        |    '\b[0-9]{3}-[0-9]{4}\b', '<PHONE>', 'g') AS clean,
        |  CAST(len(regexp_extract_all(raw,
        |    '[a-zA-Z0-9._]+@[a-zA-Z0-9.-]+\.[a-z]{2,}')) AS INT) AS n_emails,
        |  CAST(len(regexp_extract_all(raw, 'https?://[^ ]+')) AS INT)
        |    AS n_urls,
        |  CAST(len(regexp_extract_all(raw, '\b[0-9]{3}-[0-9]{4}\b')) AS INT)
        |    AS n_phones
        |FROM d ORDER BY doc_id""".stripMargin,

    "t_fingerprint" ->
      s"""SELECT doc_id, $fpSql AS fingerprint,
         |  $fpSql % 997 AS fp_bucket
         |FROM documents ORDER BY doc_id""".stripMargin,

    "t_fts_rank" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |s AS (SELECT doc_id,
        |    CAST(len(list_filter(w, x -> x = 'hash')) AS INT) AS tf_hash,
        |    CAST(len(list_filter(w, x -> x = 'join')) AS INT) AS tf_join,
        |    len(w) AS nw FROM d)
        |SELECT doc_id, tf_hash, tf_join,
        |  ROUND((CAST(tf_hash AS DOUBLE) / (tf_hash + 1) +
        |         CAST(tf_join AS DOUBLE) / (tf_join + 1))
        |        / (1.0 + CAST(nw AS DOUBLE) / 100.0), 6) AS score
        |FROM s WHERE tf_hash > 0 AND tf_join > 0
        |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,

    "t_fts_weighted" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |z AS (SELECT doc_id, w[1:8] AS title, w[9:len(w)] AS body,
        |    len(w) AS nw FROM d),
        |s AS (SELECT doc_id, nw,
        |    CAST(len(list_filter(title, x -> x = 'hash')) AS INT) AS t_hash,
        |    CAST(len(list_filter(body, x -> x = 'hash')) AS INT) AS b_hash,
        |    CAST(len(list_filter(title, x -> x = 'join')) AS INT) AS t_join,
        |    CAST(len(list_filter(body, x -> x = 'join')) AS INT) AS b_join
        |  FROM z),
        |r AS (SELECT doc_id, t_hash, b_hash, t_join, b_join,
        |    1.0 * CAST(t_hash AS DOUBLE) + 0.1 * CAST(b_hash AS DOUBLE) AS wh,
        |    1.0 * CAST(t_join AS DOUBLE) + 0.1 * CAST(b_join AS DOUBLE) AS wj,
        |    nw FROM s)
        |SELECT doc_id, t_hash, b_hash, t_join, b_join,
        |  ROUND((wh / (wh + 1) + wj / (wj + 1))
        |        / (1.0 + CAST(nw AS DOUBLE) / 100.0), 6) AS score
        |FROM r WHERE t_hash + b_hash > 0 AND t_join + b_join > 0
        |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,

    "t_fts_phrase" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '\bhash join\b')) AS INT) AS n_phrase,
        |  CAST(strpos(text, 'hash join') AS INT) AS first_pos
        |FROM documents
        |WHERE len(regexp_extract_all(text, '\bhash join\b')) > 0
        |ORDER BY doc_id""".stripMargin,

    "t_fts_bool" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |s AS (SELECT doc_id,
        |    CAST(len(list_filter(w, x -> x = 'hash')) AS INT) AS tf_hash,
        |    CAST(len(list_filter(w, x -> x = 'merge')) AS INT) AS tf_merge,
        |    CAST(len(list_filter(w, x -> x = 'stream')) AS INT) AS tf_stream,
        |    CAST(len(list_filter(w, x -> x LIKE 'wind%')) AS INT) AS tf_wind_prefix
        |  FROM d)
        |SELECT doc_id, tf_hash, tf_merge, tf_wind_prefix
        |FROM s
        |WHERE (tf_hash > 0 OR tf_merge > 0)
        |  AND tf_stream = 0 AND tf_wind_prefix > 0
        |ORDER BY doc_id""".stripMargin,

    "t_fts_headline" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |p AS (SELECT doc_id, w,
        |    COALESCE(list_position(w, 'hash'), 0) AS i, len(w) AS n FROM d)
        |SELECT doc_id, CAST(i AS INT) AS first_idx,
        |  array_to_string(list_transform(
        |    w[greatest(1, i - 5):least(n, i + 5)],
        |    x -> CASE WHEN x = 'hash' THEN '<b>hash</b>' ELSE x END),
        |    ' ') AS headline
        |FROM p WHERE i > 0 ORDER BY doc_id""".stripMargin,

    "t_fts_distance" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |p AS (SELECT doc_id,
        |    [i for i in range(1, len(w) + 1) if w[i] = 'hash'] AS ph,
        |    [i for i in range(1, len(w) + 1) if w[i] = 'join'] AS pj
        |  FROM d)
        |SELECT doc_id,
        |  CAST(len([p for p in ph if list_contains(pj, p + 2)]) AS INT) AS n_dist2
        |FROM p WHERE len([p for p in ph if list_contains(pj, p + 2)]) > 0
        |ORDER BY doc_id""".stripMargin,

    "t_unaccent" ->
      """WITH inj AS (SELECT doc_id,
        |    (['café récit', 'naïve señor', 'résumé Ñandú',
        |      'über façade', 'àpropos crème'])[CAST(doc_id % 5 + 1 AS INT)]
        |      AS raw
        |  FROM documents),
        |u AS (SELECT doc_id, raw,
        |    translate(raw, 'áéíóúñüçÁÉÍÓÚÑÜÇàèìòùâêîôû',
        |                   'aeiounucAEIOUNUCaeiouaeiou') AS un
        |  FROM inj)
        |SELECT doc_id, raw, un,
        |  un <> raw AS changed,
        |  translate(un, 'áéíóúñüçÁÉÍÓÚÑÜÇàèìòùâêîôû',
        |               'aeiounucAEIOUNUCaeiouaeiou') = un AS idempotent,
        |  string_split(un, ' ')[1] AS first_tok
        |FROM u ORDER BY doc_id""".stripMargin,

    "t_tsvector_concat" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |z AS (SELECT doc_id, w, w[1:8] AS title, w[9:] AS body FROM d),
        |p AS (SELECT doc_id, w, title, body,
        |    list_concat(
        |      [i for i in range(1, len(title) + 1) if title[i] = 'hash'],
        |      [i + len(title) for i in range(1, len(body) + 1)
        |        if body[i] = 'hash']) AS cat,
        |    [i for i in range(1, len(w) + 1) if w[i] = 'hash'] AS whole
        |  FROM z)
        |SELECT doc_id,
        |  COALESCE(array_to_string(cat, ','), '') AS hash_pos,
        |  cat = whole AS concat_matches_whole,
        |  CAST(len(list_distinct(w)) AS INT) AS n_lex,
        |  CAST(len(list_distinct(list_filter(w, x -> x <> 'hash'))) AS INT)
        |    AS n_after_delete,
        |  CAST(len(list_distinct(title)) AS INT) AS n_filter_a
        |FROM p ORDER BY doc_id""".stripMargin,

    // covers of a two-term AND query = adjacent differing-term pairs of
    // the merged sorted position list (see the Spark query comment);
    // the fold is the same left-to-right double sum as the Spark plan
    "t_fts_rank_cd" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |p AS (SELECT doc_id,
        |    [i for i in range(1, len(w) + 1) if w[i] = 'hash'] AS ph,
        |    [i for i in range(1, len(w) + 1) if w[i] = 'join'] AS pj
        |  FROM d),
        |m AS (SELECT doc_id,
        |    list_sort(list_concat(
        |      list_transform(ph, x -> {'pos': x, 't': 0}),
        |      list_transform(pj, x -> {'pos': x, 't': 1}))) AS m
        |  FROM p WHERE len(ph) > 0 AND len(pj) > 0),
        |c AS (SELECT doc_id,
        |    CAST(len([i for i in range(1, len(m)) if m[i].t <> m[i+1].t])
        |      AS INT) AS n_covers,
        |    list_transform(range(1, len(m)), i ->
        |      CASE WHEN m[i].t <> m[i+1].t
        |        THEN 2.0 / (10.0 + 10.0)
        |             / CAST(m[i+1].pos - m[i].pos AS DOUBLE)
        |        ELSE 0.0 END) AS cp,
        |    list_transform(range(1, len(m)), i ->
        |      CASE WHEN m[i].t <> m[i+1].t
        |        THEN 2.0 / ((CASE WHEN m[i].pos <= 8 THEN 1.0 ELSE 10.0 END)
        |                  + (CASE WHEN m[i+1].pos <= 8 THEN 1.0 ELSE 10.0 END))
        |             / CAST(m[i+1].pos - m[i].pos AS DOUBLE)
        |        ELSE 0.0 END) AS cw
        |  FROM m)
        |SELECT doc_id, n_covers,
        |  ROUND(list_reduce(list_prepend(0.0, cp), (a, x) -> a + x), 6) AS rank_cd,
        |  ROUND(list_reduce(list_prepend(0.0, cw), (a, x) -> a + x), 6) AS rank_cd_w
        |FROM c ORDER BY rank_cd DESC, doc_id LIMIT 20""".stripMargin,

    "t_fts_tsquery" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |m AS (SELECT doc_id,
        |    CAST((len(list_filter(w, x -> x = 'hash')) > 0
        |          OR len(list_filter(w, x -> x = 'merge')) > 0)
        |      AND len(list_filter(w, x -> x = 'stream')) = 0
        |      AND len(list_filter(w, x -> x LIKE 'wind%')) > 0 AS INT) AS m_bool,
        |    CAST(len([i for i in range(1, len(w) + 1) if w[i] = 'join'
        |      and list_contains([j for j in range(1, len(w) + 1)
        |                         if w[j] = 'hash'], i - 2)]) > 0 AS INT) AS m_dist,
        |    CAST(len([i for i in range(2, len(w) + 1) if w[i] = 'scan'
        |      and (w[i-1] = 'fast' OR w[i-1] = 'slow')]) > 0 AS INT) AS m_nested
        |  FROM d)
        |SELECT doc_id, m_bool, m_dist, m_nested FROM m
        |WHERE m_bool + m_dist + m_nested > 0 ORDER BY doc_id""".stripMargin,

    "t_fts_rewrite" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |m AS (SELECT doc_id,
        |    CAST(len(list_filter(w, x -> x = 'hash')) > 0
        |      AND len(list_filter(w, x -> x = 'join')) > 0 AS INT)
        |      AS m_before,
        |    CAST((len(list_filter(w, x -> x = 'hash')) > 0
        |           OR len(list_filter(w, x -> x = 'merge')) > 0)
        |      AND len(list_filter(w, x -> x = 'join')) > 0 AS INT)
        |      AS m_expanded,
        |    CAST(len(list_filter(w, x -> x = 'scan')) > 0
        |      AND len(list_filter(w, x -> x = 'fast')) > 0 AS INT)
        |      AS m_collapsed
        |  FROM d)
        |SELECT doc_id, m_before, m_expanded, m_collapsed FROM m
        |WHERE m_before + m_expanded + m_collapsed > 0
        |ORDER BY doc_id""".stripMargin,

    "t_fts_websearch" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |m AS (SELECT doc_id,
        |    CAST((len(list_filter(w, x -> x = 'hash')) > 0
        |           AND len(list_filter(w, x -> x = 'join')) > 0)
        |      OR (len(list_filter(w, x -> x = 'merge')) > 0
        |           AND len(list_filter(w, x -> x = 'scan')) > 0) AS INT)
        |      AS m_or_chains,
        |    CAST(len([i for i in range(2, len(w) + 1) if w[i] = 'join'
        |           and w[i-1] = 'hash']) > 0
        |      AND len(list_filter(w, x -> x = 'stream')) = 0 AS INT)
        |      AS m_phrase_neg,
        |    CAST(len(list_filter(w, x -> x = 'fast')) > 0
        |      OR (len([i for i in range(2, len(w) + 1) if w[i] = 'scan'
        |            and w[i-1] = 'slow']) > 0
        |          AND len(list_filter(w, x -> x = 'big')) = 0) AS INT)
        |      AS m_mixed
        |  FROM d)
        |SELECT doc_id, m_or_chains, m_phrase_neg, m_mixed FROM m
        |WHERE m_or_chains + m_phrase_neg + m_mixed > 0 ORDER BY doc_id""".stripMargin,

    // the SCAN path: direct lexized-text evaluation of the same AND
    // query — deliberately independent of any postings construction, so
    // the hash compare proves index == scan
    "t_fts_inverted_index" ->
      s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS w0 FROM documents),
         |k AS (SELECT doc_id,
         |    list_filter(list_transform(w0, x -> lower(x)),
         |      x -> len(x) > 0 AND x NOT IN
         |        ${graft.functions.Lexize.duckStopList}) AS wk FROM d),
         |s1 AS (SELECT doc_id, list_transform(wk,
         |    x -> ${graft.functions.Lexize.duckStemPlural("x")}) AS ws FROM k),
         |s2 AS (SELECT doc_id, list_transform(ws,
         |    x -> ${graft.functions.Lexize.duckStemSuffix("x")}) AS lex FROM s1),
         |m AS (SELECT doc_id,
         |    len(list_filter(lex, x -> x = 'hash')) > 0 AS has_hash,
         |    len(list_filter(lex, x -> x = 'join')) > 0 AS has_join
         |  FROM s2),
         |df AS (SELECT
         |    CAST(SUM(CASE WHEN has_hash THEN 1 ELSE 0 END) AS INT) AS df_hash,
         |    CAST(SUM(CASE WHEN has_join THEN 1 ELSE 0 END) AS INT) AS df_join
         |  FROM m)
         |SELECT doc_id, df.df_hash, df.df_join
         |FROM m CROSS JOIN df WHERE has_hash AND has_join
         |ORDER BY doc_id""".stripMargin,

    "t_ts_stat" ->
      s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS w0 FROM documents),
         |k AS (SELECT doc_id,
         |    list_filter(list_transform(w0, x -> lower(x)),
         |      x -> len(x) > 0 AND x NOT IN
         |        ${graft.functions.Lexize.duckStopList}) AS wk FROM d),
         |s1 AS (SELECT doc_id, list_transform(wk,
         |    x -> ${graft.functions.Lexize.duckStemPlural("x")}) AS ws FROM k),
         |s2 AS (SELECT doc_id, list_transform(ws,
         |    x -> ${graft.functions.Lexize.duckStemSuffix("x")}) AS lex FROM s1),
         |u AS (SELECT doc_id, unnest(lex) AS word FROM s2)
         |SELECT word, CAST(COUNT(DISTINCT doc_id) AS INT) AS ndoc,
         |  COUNT(*) AS nentry
         |FROM u GROUP BY word ORDER BY nentry DESC, word LIMIT 30""".stripMargin,

    "t_bm25_rank" ->
      """WITH d AS (SELECT doc_id,
        |    CAST(len(list_filter(string_split(text, ' '), x -> x = 'hash'))
        |      AS INT) AS tfh,
        |    CAST(len(list_filter(string_split(text, ' '), x -> x = 'join'))
        |      AS INT) AS tfj,
        |    CAST(len(string_split(text, ' ')) AS INT) AS dl
        |  FROM documents),
        |st AS (SELECT COUNT(*) AS nd, CAST(SUM(dl) AS BIGINT) AS sdl,
        |    CAST(SUM(CASE WHEN tfh > 0 THEN 1 ELSE 0 END) AS BIGINT) AS dfh,
        |    CAST(SUM(CASE WHEN tfj > 0 THEN 1 ELSE 0 END) AS BIGINT) AS dfj
        |  FROM d),
        |sc AS (SELECT doc_id, tfh, tfj,
        |    CAST(sdl AS DOUBLE) / nd AS avgdl,
        |    ln(1.0 + (nd - dfh + 0.5) / (dfh + 0.5)) AS idfh,
        |    ln(1.0 + (nd - dfj + 0.5) / (dfj + 0.5)) AS idfj,
        |    dl FROM d, st WHERE tfh > 0 OR tfj > 0),
        |n2 AS (SELECT *, 1.2 * (0.25 + 0.75 * (dl / avgdl)) AS norm FROM sc)
        |SELECT doc_id, tfh, tfj,
        |  ROUND(idfh * ((tfh * 2.2) / (tfh + norm)) +
        |        idfj * ((tfj * 2.2) / (tfj + norm)), 6) AS score
        |FROM n2 ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,

    "t_tfidf_terms" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |  FROM documents),
        |tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM toks
        |  WHERE doc_id < 40 GROUP BY doc_id, w),
        |df AS (SELECT w, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY w),
        |nd AS (SELECT COUNT(*) AS nd FROM documents),
        |wt AS (SELECT tf.doc_id, tf.w, tf.tf, df.df,
        |    ROUND(tf.tf * ln(CAST(nd.nd AS DOUBLE) / df.df), 6) AS weight
        |  FROM tf JOIN df ON tf.w = df.w, nd),
        |rk AS (SELECT *, CAST(row_number() OVER
        |    (PARTITION BY doc_id ORDER BY weight DESC, w) AS INT) AS rk
        |  FROM wt)
        |SELECT doc_id, rk, w, CAST(tf AS BIGINT) AS tf,
        |  CAST(df AS BIGINT) AS df, weight
        |FROM rk WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin,

    "t_vocab_topk" ->
      """WITH w AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |SELECT w, CAST(COUNT(*) AS BIGINT) AS n FROM w GROUP BY w
        |ORDER BY n DESC, w LIMIT 25""".stripMargin,

    "t_ngram_counts" ->
      """WITH d AS (SELECT string_split(text, ' ') AS w FROM documents),
        |b AS (SELECT unnest([w[i] || ' ' || w[i+1]
        |                     for i in range(1, len(w))]) AS bg FROM d)
        |SELECT bg, CAST(COUNT(*) AS BIGINT) AS n FROM b GROUP BY bg
        |ORDER BY n DESC, bg LIMIT 20""".stripMargin,

    "t_fingerprint_groups" ->
      s"""WITH fp AS (SELECT doc_id, $fpSql AS fingerprint FROM documents),
         |g AS (SELECT fingerprint, COUNT(*) AS n, MIN(doc_id) AS keeper
         |  FROM fp GROUP BY fingerprint)
         |SELECT COUNT(*) AS n_groups,
         |  CAST(SUM(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_groups,
         |  CAST(SUM(n - 1) AS BIGINT) AS n_removable
         |FROM g""".stripMargin
  )
}
