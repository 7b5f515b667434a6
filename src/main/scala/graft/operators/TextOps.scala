package graft.operators

import graft.core.Materialize.MatOps
import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` table — the pieces a
  * large-scale training-data pipeline needs (tokenize/count, quality
  * scoring, language ID, fingerprinting, n-gram stats).
  *
  * Reference analog: the WordCount example is the reference's only text
  * operator (`lib/mini_hadoop/examples/word_count.ex:12-147` — tokenizer +
  * per-word count). Everything here generalizes that map→group→agg shape
  * into declarative plans that keep whole-stage codegen (no Scala UDFs on
  * the hot path — all `functions._` / higher-order functions).
  *
  * Scale notes: every query is a scan → narrow transform → single shuffle
  * (groupBy/window on a key with bounded cardinality), so it parallelizes
  * by input split at 100 TB. Word-explode multiplies rows ~55× — the
  * shuffle carries only (token, 1) style pairs thanks to partial
  * aggregation, the classic combiner win.
  */
object TextOps {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.df(s, dir, "documents")

  /** Whitespace tokens with empties dropped (texts are single-spaced,
    * lower-case; trailing space yields one empty token). */
  private val tokensExpr: Column =
    expr("filter(split(text, ' '), x -> x != '')")

  /** THE quality score, one definition for every consumer (t04, the
    * t09/t14 deciles, d15's winner ordering): adds the integer `qk` —
    * the score in exact 10⁻⁴ units, `round_half_up(10⁴·num/(n·lt))` —
    * plus its ingredient columns n/st/al/lt/num to a documents frame.
    * Exact integer arithmetic because the score rational can land
    * exactly on a ten-thousandth-and-a-half, where `round(double, 4)`
    * is engine-dependent (BASELINE.md R14.2). qk's direct form is safe
    * here because its operands are PER-DOC bounded (num ≤ ~10⁴·n·lt ≤
    * 10¹³ for a 100k-char doc); data-sized numerators (sums over the
    * corpus) must go through [[ExactRound]] instead. */
  private[operators] def withQualityQk(df: DataFrame): DataFrame =
    df.withColumn("toks", tokensExpr)
      .withColumn("n", size(col("toks")).cast("long"))
      .withColumn("st",
        size(expr("filter(toks, x -> x in ('the','a','of','and','to','in','is','on'))"))
          .cast("long"))
      .withColumn("al",
        length(regexp_replace(col("text"), "[^a-z]", "")).cast("long"))
      .withColumn("lt", length(col("text")).cast("long"))
      .withColumn("num",
        least(lit(5000L), lit(100L) * col("n")) * col("n") * col("lt") +
          lit(3000L) * (col("n") - col("st")) * col("lt") +
          lit(2000L) * col("al") * col("n"))
      .withColumn("qk", expr("(2*num + n*lt) div (2*n*lt)"))

  /** The same score's DuckDB ingredients: a CTE body over `documents`
    * producing (doc_id, text, n_tokens, n_stop, n_alpha, lt)… */
  private[operators] val qkCteDuck: String =
    """SELECT doc_id, text,
      |       len(list_filter(string_split(text,' '), x -> x <> '')) AS n_tokens,
      |       len(list_filter(string_split(text,' '),
      |           x -> x IN ('the','a','of','and','to','in','is','on'))) AS n_stop,
      |       length(regexp_replace(text, '[^a-z]', '', 'g')) AS n_alpha,
      |       length(text) AS lt
      |FROM documents""".stripMargin

  /** …and the integer qk over those columns — byte-identical semantics
    * to [[withQualityQk]]'s `qk`. */
  private[operators] val qkDuck: String =
    "((2*(least(5000, 100*n_tokens)*n_tokens*lt" +
      " + 3000*(n_tokens-n_stop)*lt + 2000*n_alpha*n_tokens)" +
      " + n_tokens*lt) // (2*n_tokens*lt))"

  // ---------------------------------------------------------------- t01
  /** WordCount, declarative: explode → count → top-100. */
  val t01 = Q("t01_wordcount",
    (s, dir) =>
      docs(s, dir)
        .select(explode(tokensExpr).as("word"))
        .groupBy("word")
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("word"))
        .limit(100),
    Some("""
      SELECT word, count(*) AS n
      FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents) t
      WHERE word <> ''
      GROUP BY word
      ORDER BY n DESC, word
      LIMIT 100"""),
    headline = true)

  // ---------------------------------------------------------------- t02
  /** Per-document token statistics (token counting for data budgets). */
  val t02 = Q("t02_token_stats",
    (s, dir) =>
      docs(s, dir)
        .select(
          col("doc_id"),
          size(tokensExpr).cast("long").as("n_tokens"),
          size(array_distinct(tokensExpr)).cast("long").as("n_distinct"),
          length(col("text")).cast("long").as("n_chars_text"))
        .orderBy("doc_id"),
    Some("""
      SELECT doc_id,
             len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tokens,
             len(list_distinct(list_filter(string_split(text, ' '), x -> x <> ''))) AS n_distinct,
             length(text) AS n_chars_text
      FROM documents
      ORDER BY doc_id"""))

  // ---------------------------------------------------------------- t03
  /** Language ID via marker-token voting (n-gram-heuristic family). The
    * voting is plain filter/CASE logic, so the DuckDB oracle spells out
    * the identical decision tree; golden tests (OpsGoldenSpec) cover
    * crafted inputs besides. */
  val t03 = Q("t03_langid",
    (s, dir) => {
      val scored = docs(s, dir)
        .withColumn("toks", tokensExpr)
        .withColumn("s_en", size(expr("filter(toks, x -> x in ('the','a','is','of','and'))")))
        .withColumn("s_de", size(expr("filter(toks, x -> x in ('der','die','das','und','ist'))")))
        .withColumn("s_es", size(expr("filter(toks, x -> x in ('el','la','de','y','es'))")))
        .withColumn("s_fr", size(expr("filter(toks, x -> x in ('le','la','de','et','est'))")))
      scored.select(
        col("doc_id"),
        when(col("s_de") > col("s_en") && col("s_de") >= col("s_es") && col("s_de") >= col("s_fr"), "de")
          .when(col("s_es") > col("s_en") && col("s_es") >= col("s_fr"), "es")
          .when(col("s_fr") > col("s_en"), "fr")
          .otherwise("en").as("pred_lang"),
        greatest(col("s_en"), col("s_de"), col("s_es"), col("s_fr")).cast("long").as("score"))
        .orderBy("doc_id")
    },
    Some("""
      WITH t AS (
        SELECT doc_id,
               len(list_filter(string_split(text,' '),
                   x -> x IN ('the','a','is','of','and'))) AS s_en,
               len(list_filter(string_split(text,' '),
                   x -> x IN ('der','die','das','und','ist'))) AS s_de,
               len(list_filter(string_split(text,' '),
                   x -> x IN ('el','la','de','y','es'))) AS s_es,
               len(list_filter(string_split(text,' '),
                   x -> x IN ('le','la','de','et','est'))) AS s_fr
        FROM documents)
      SELECT doc_id,
             CASE WHEN s_de > s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
                  WHEN s_es > s_en AND s_es >= s_fr THEN 'es'
                  WHEN s_fr > s_en THEN 'fr'
                  ELSE 'en' END AS pred_lang,
             CAST(greatest(s_en, s_de, s_es, s_fr) AS BIGINT) AS score
      FROM t
      ORDER BY doc_id"""))

  // ---------------------------------------------------------------- t04
  /** Quality scoring: length/stopword/alpha ratios combined to one score.
    *
    * All three rounded columns are computed as EXACT integer
    * round-half-up at 4 decimals — `round_4(p/q) = (2·10⁴·p + q) div
    * (2·q)` over longs — instead of `round(double, 4)`. The quality sum
    * is an exact rational (num/den below) whose true value can land
    * exactly on a ten-thousandth-and-a-half: the first sf1.0 oracle
    * board caught a doc whose quality is EXACTLY 0.93125, where Spark's
    * decimal-string HALF_UP round of the (1-ulp-low, FMA-contracted)
    * double said .9312 and DuckDB's float-multiply round said .9313.
    * Integer arithmetic makes both engines compute the same
    * well-defined value at every scale. Magnitudes fit comfortably in
    * long: num ≤ 5000·n_tokens·n_chars ≈ 5·10¹² at a 10⁵-char doc. */
  val t04 = Q("t04_quality_score",
    (s, dir) =>
      withQualityQk(docs(s, dir))
        .select(
          col("doc_id"),
          col("n").as("n_tokens"),
          expr(ExactRound.spark("st", "n", 4)).as("stop_ratio"),
          expr(ExactRound.spark("al", "lt", 4)).as("alpha_ratio"),
          (col("qk") / 10000.0).as("quality"))
        .orderBy("doc_id"),
    Some(s"""
      WITH t AS ($qkCteDuck)
      SELECT doc_id, n_tokens,
             ${ExactRound.duck("n_stop", "n_tokens", 4)} AS stop_ratio,
             ${ExactRound.duck("n_alpha", "lt", 4)} AS alpha_ratio,
             $qkDuck / 10000.0 AS quality
      FROM t
      ORDER BY doc_id"""))

  // ---------------------------------------------------------------- t05
  /** Position-weighted rolling-hash fingerprint: order-sensitive, cheap,
    * and distributable (explode → partial-sum → mod). */
  val t05 = Q("t05_fingerprint",
    (s, dir) =>
      docs(s, dir)
        .select(col("doc_id"), posexplode(tokensExpr).as(Seq("pos", "word")))
        .groupBy("doc_id")
        .agg((sum((col("pos") + 1) *
          ((ascii(col("word")) * lit(31L) + length(col("word"))) % 1000003)) %
          1000000007L).as("fp"))
        .orderBy("doc_id"),
    Some("""
      SELECT doc_id,
             CAST(sum(pos1 * ((ascii(word) * 31 + length(word)) % 1000003))
                  % 1000000007 AS BIGINT) AS fp
      FROM (SELECT doc_id,
                   unnest(list_filter(string_split(text,' '), x -> x <> '')) AS word,
                   unnest(range(1, len(list_filter(string_split(text,' '), x -> x <> '')) + 1)) AS pos1
            FROM documents) t
      GROUP BY doc_id
      ORDER BY doc_id"""))

  // ---------------------------------------------------------------- t06
  /** Word-bigram frequencies (n-gram statistics) via a lead window. */
  val t06 = Q("t06_bigrams",
    (s, dir) => {
      val w = Window.partitionBy("doc_id").orderBy("pos")
      docs(s, dir)
        .select(col("doc_id"), posexplode(tokensExpr).as(Seq("pos", "word")))
        .withColumn("next", lead("word", 1).over(w))
        .filter(col("next").isNotNull)
        .select(concat_ws(" ", col("word"), col("next")).as("bigram"))
        .groupBy("bigram")
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("bigram"))
        .limit(50)
    },
    Some("""
      WITH toks AS (
        SELECT doc_id,
               unnest(list_filter(string_split(text,' '), x -> x <> '')) AS word,
               unnest(range(1, len(list_filter(string_split(text,' '), x -> x <> '')) + 1)) AS pos
        FROM documents),
      bi AS (
        SELECT word || ' ' || lead(word) OVER (PARTITION BY doc_id ORDER BY pos) AS bigram
        FROM toks)
      SELECT bigram, count(*) AS n
      FROM bi
      WHERE bigram IS NOT NULL
      GROUP BY bigram
      ORDER BY n DESC, bigram
      LIMIT 50"""))

  // ---------------------------------------------------------------- t07
  /** TF-IDF weights per (document, term) — the classic relevance /
    * keyword-extraction primitive of a text pipeline.
    *
    * tf = term count / doc length (raw tokens); idf = ln(N / df) with
    * df = #docs containing the term. N is carried as a broadcast 1-row
    * aggregate (never a driver-side collect), doc length rides the
    * groupBy as a window-free second aggregate, and df is one more
    * bounded-key aggregate — three shuffles total, each on keys whose
    * cardinality is vocab- or corpus-bounded, so the shape holds at
    * 100 TB. Output is the full (doc, term) matrix ordered on its unique
    * key; weights are rounded so the DuckDB oracle's ulp-level ln/division
    * differences cannot perturb the hash. */
  val t07 = Q("t07_tfidf",
    (s, dir) => {
      val toks = docs(s, dir).select(col("doc_id"), explode(tokensExpr).as("term"))
      val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf_cnt"))
      val dlen = toks.groupBy("doc_id").agg(count(lit(1)).as("doc_len"))
      val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val n = docs(s, dir).agg(count(lit(1)).as("n_docs"))
      tf.join(dlen, "doc_id")
        .join(dfreq, "term")
        .crossJoin(broadcast(n))
        .select(col("doc_id"), col("term"),
          round((col("tf_cnt") / col("doc_len")) *
            log(col("n_docs") / col("df")), 6).as("tfidf"))
        .orderBy("doc_id", "term")
    },
    Some("""
      WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
      tf AS (
        SELECT doc_id, term, count(*) AS tf_cnt FROM toks
        WHERE term <> '' GROUP BY doc_id, term),
      dlen AS (
        SELECT doc_id, count(*) AS doc_len FROM toks
        WHERE term <> '' GROUP BY doc_id),
      dfreq AS (
        SELECT term, count(*) AS df FROM tf GROUP BY term),
      n AS (SELECT count(*) AS n_docs FROM documents)
      SELECT tf.doc_id, tf.term,
             round((tf.tf_cnt * 1.0 / dlen.doc_len) *
                   ln(n.n_docs * 1.0 / dfreq.df), 6) AS tfidf
      FROM tf JOIN dlen USING (doc_id) JOIN dfreq USING (term), n
      ORDER BY doc_id, term"""))

  // ---------------------------------------------------------------- t08
  /** BPE-style subword token counting: lower-case letter runs, digit
    * runs, and single punctuation marks as separate tokens (the
    * pre-tokenization split every byte-pair-encoding tokenizer applies
    * before merges). Token-budget accounting for an LLM pipeline wants
    * this, not whitespace counts — "don't." is one whitespace token but
    * three BPE-ish tokens. The regex is kept to a dialect-portable core
    * (character classes + alternation) so the DuckDB oracle runs the
    * byte-identical pattern; per-row extract is scan-local and the only
    * shuffle is the bounded final ordering. */
  val t08 = Q("t08_bpe_tokens",
    (s, dir) =>
      docs(s, dir)
        .select(col("doc_id"),
          expr("regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)").as("toks"))
        .select(col("doc_id"),
          size(col("toks")).cast("long").as("n_bpe_tokens"),
          size(expr("array_distinct(toks)")).cast("long").as("n_distinct"))
        .orderBy("doc_id"),
    Some("""
      SELECT doc_id,
             CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT)
               AS n_bpe_tokens,
             CAST(len(list_distinct(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))) AS BIGINT)
               AS n_distinct
      FROM documents
      ORDER BY doc_id"""))

  // ---------------------------------------------------------------- t09
  /** Quality-decile curriculum split: rank every document by the t04
    * quality score into 10 equal buckets — the "train on the top decile
    * first / drop the bottom one" curation step. Ties broken by doc_id so
    * both engines bucket identically. NOTE the global ntile implies a
    * total order (one range-partitioned sort); at corpus scale the same
    * split comes from approx quantile cutpoints (q20/q26 machinery) +
    * a scan-local bucket lookup — exact ntile is kept here because it is
    * what a SQL oracle can check. */
  /** t04/t09's quality score per document — shared by the exact-ntile
    * and approx-cutpoint decile formulations so they rank the same
    * corpus identically. Same exact-integer round-half-up as t04 (see
    * its scaladoc): the quality rational can land exactly on a
    * ten-thousandth-and-a-half, where `round(double, 4)` is
    * engine-dependent — here that knife edge would silently flip a
    * doc's decile, not just its 4th decimal. */
  private def qualityScored(s: SparkSession, dir: String): DataFrame =
    withQualityQk(docs(s, dir))
      .withColumn("n_tokens", col("n"))
      // downstream averages round in integer space off qk (avg of k/10⁴
      // values is itself an integer rational Σqk/n — the same knife
      // edge); quality = the user-facing double
      .withColumn("quality", col("qk") / 10000.0)

  val t09 = Q("t09_quality_deciles",
    (s, dir) => {
      qualityScored(s, dir)
        .withColumn("decile", ntile(10).over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("quality").desc, col("doc_id"))))
        .groupBy("decile")
        .agg(count(lit(1)).as("n_docs"), sum("qk").as("sq"))
        .withColumn("avg_quality",
          expr(ExactRound.unitMeanSpark("sq", "n_docs", 4)))
        .select(col("decile"), col("n_docs"), col("avg_quality"))
        .orderBy("decile")
    },
    Some(s"""
      WITH t AS ($qkCteDuck),
      scored AS (SELECT doc_id, $qkDuck AS qk FROM t),
      ranked AS (
        SELECT qk,
               ntile(10) OVER (ORDER BY qk DESC, doc_id) AS decile
        FROM scored)
      SELECT decile, count(*) AS n_docs,
             ${ExactRound.unitMeanDuck("sum(qk)", "count(*)", 4)} AS avg_quality
      FROM ranked
      GROUP BY decile
      ORDER BY decile"""))

  // ---------------------------------------------------------------- t10
  /** Domain-mixture sampling weights: per-source token counts turned into
    * temperature-scaled sampling weights w_s ∝ tokens_s^0.5 (the standard
    * alpha-sampling used to rebalance domain mixtures). The global
    * normalizer is a window over the per-source aggregate — #sources
    * rows, so the unpartitioned window is a non-issue at any corpus
    * size (the heavy work, token counting, is partial-agg'd under it). */
  val t10 = Q("t10_mix_weights",
    (s, dir) => {
      val perSource = docs(s, dir)
        .select(col("source"), size(tokensExpr).cast("long").as("n"))
        .groupBy("source")
        .agg(sum("n").as("tokens"))
      perSource
        .withColumn("w_raw", sqrt(col("tokens").cast("double")))
        .withColumn("weight", round(col("w_raw") /
          sum("w_raw").over(org.apache.spark.sql.expressions.Window
            .partitionBy()), 6))
        .select(col("source"), col("tokens"), col("weight"))
        .orderBy("source")
    },
    Some("""
      WITH per_source AS (
        SELECT source,
               CAST(sum(len(list_filter(string_split(text,' '), x -> x <> ''))) AS BIGINT) AS tokens
        FROM documents
        GROUP BY source)
      SELECT source, tokens,
             round(sqrt(CAST(tokens AS DOUBLE)) /
                   sum(sqrt(CAST(tokens AS DOUBLE))) OVER (), 6) AS weight
      FROM per_source
      ORDER BY source"""))

  // ---------------------------------------------------------------- t11
  /** PII-style redaction: scrub email-shaped tokens and digit runs to a
    * placeholder before the corpus ships — scan-local regexp_replace, no
    * shuffle except the output ordering. The email alternative is listed
    * FIRST: Java regex takes the first matching alternative while RE2
    * (DuckDB) takes the longest, so putting the longer pattern first
    * keeps both engines byte-identical on inputs like "123@abc.de".
    * Emits the redaction count and a digest of the scrubbed text (the
    * full text would bloat the compare; the digest pins every byte). */
  val t11 = Q("t11_redact",
    (s, dir) =>
      docs(s, dir)
        .select(col("doc_id"),
          size(expr("regexp_extract_all(text, '[a-z0-9.]+@[a-z0-9.]+|[0-9]+', 0)"))
            .cast("long").as("n_redacted"),
          md5(regexp_replace(col("text"), "[a-z0-9.]+@[a-z0-9.]+|[0-9]+", "<pii>")
            .cast("binary")).as("redacted_hash"))
        .orderBy("doc_id"),
    Some("""
      SELECT doc_id,
             CAST(len(regexp_extract_all(text, '[a-z0-9.]+@[a-z0-9.]+|[0-9]+')) AS BIGINT)
               AS n_redacted,
             md5(regexp_replace(text, '[a-z0-9.]+@[a-z0-9.]+|[0-9]+', '<pii>', 'g'))
               AS redacted_hash
      FROM documents
      ORDER BY doc_id"""))

  // ---------------------------------------------------------------- t12
  /** Class-balanced downsampling: keep at most 30 documents per language,
    * chosen by a deterministic digest order — the rebalancing step before
    * training on a skewed label distribution. Digest-ranking (not rand())
    * makes the sample reproducible across engines and re-runs, which is
    * what lets an oracle check it row-for-row.
    *
    * Plan shape: a bounded top-K aggregate ([[graft.functions.TopKAgg]]),
    * NOT `row_number().over(partitionBy(lang))` — the window form sorts
    * each label's full row set in one task to keep 30 rows, so a dominant
    * label (90%-English corpus) is a single straggler at 100 TB. The
    * aggregate's state is a 30-element heap with partial/merge, so skew
    * costs nothing. The window formulation survives as the ground-truth
    * twin in TopKAggSpec (byte-identical on every label), and the DuckDB
    * oracle below still states the semantics as a window. */
  val t12 = Q("t12_class_rebalance",
    (s, dir) =>
      docs(s, dir)
        .groupBy("lang")
        .agg(graft.functions.TopKAgg.topk_agg(
          md5(col("doc_id").cast("string")), col("doc_id"), 30).as("kept"))
        .select(col("lang"),
          size(col("kept")).cast("long").as("n_kept"),
          array_min(col("kept")).as("min_kept_id"))
        .orderBy("lang"),
    Some("""
      WITH ranked AS (
        SELECT lang, doc_id,
               row_number() OVER (PARTITION BY lang
                 ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        FROM documents)
      SELECT lang, count(*) AS n_kept, min(doc_id) AS min_kept_id
      FROM ranked
      WHERE rk <= 30
      GROUP BY lang
      ORDER BY lang"""))

  // ---------------------------------------------------------------- t13
  /** K-fold split assignment: every document deterministically assigned
    * to one of 5 folds by key digest — train/validation splitting that
    * is reproducible, engine-independent, and stable under re-runs and
    * repartitioning (rand()-based splits are none of these). Scan-local
    * expression + one bounded-key aggregate to profile the folds. */
  val t13 = Q("t13_kfold_split",
    (s, dir) =>
      docs(s, dir)
        .withColumn("fold",
          pmod(conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
            .cast("long"), lit(5)))
        .groupBy("fold")
        .agg(count(lit(1)).as("n_docs"),
          sum(size(tokensExpr)).cast("long").as("n_tokens"))
        .orderBy("fold"),
    Some("""
      SELECT CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 5 AS BIGINT) AS fold,
             count(*) AS n_docs,
             CAST(sum(len(list_filter(string_split(text,' '), x -> x <> ''))) AS BIGINT)
               AS n_tokens
      FROM documents
      GROUP BY fold
      ORDER BY fold"""))

  // ---------------------------------------------------------------- t14
  /** Bucket a scored corpus into value-cutpoint deciles WITHOUT a global
    * sort: cutpoints are the ascending-rank `ceil(p·N)` elements selected
    * EXACTLY over the bounded integer score grid — a per-qk count (one
    * partial-aggregated shuffle whose size is the GRID, ≤ ~10⁴ distinct
    * scores, not the corpus), a cumulative count over that grid (a
    * bounded single-partition window — deliberate), and a 9-element cut
    * array broadcast back over the scan. This is the 100 TB twin of
    * t09's exact `ntile(10)` (one range-partitioned TOTAL sort): same
    * curriculum split, no stage whose size scales with the corpus.
    * Buckets are value-based, so ties at a cutpoint all land in the
    * lower decile and bucket sizes are only ~N/10 (ntile splits ties
    * arbitrarily to force exact sizes); TopKAggSpec bounds that skew
    * against the exact split.
    *
    * r14: this replaced accuracy-10⁷ `approx_percentile`, which was
    * exact only under 10⁷ docs (the q26 latent-break class — its rank
    * error n/10⁷ crosses whole ranks past that) and carries an O(1/ε)
    * sketch buffer. Rank selection over a BOUNDED score grid needs no
    * sketch at all and is exact at every corpus size. Rank arithmetic
    * is integer on both engines: `ceil(i·n/10) = (i·n + 9) div 10`. */
  def qualityDecilesApprox(scored: DataFrame): DataFrame = {
    val wq = Window.orderBy("qk")
    val cuts = scored.groupBy("qk").agg(count(lit(1)).as("c"))
      .withColumn("cum", sum("c").over(wq))
      .withColumn("n", sum("c").over(Window.partitionBy()))
      .select(col("qk"), col("c"), col("cum"), col("n"),
        explode(expr("sequence(1, 9)")).as("i"))
      .filter(col("cum") - col("c") < expr("(i*n + 9) div 10") &&
        expr("(i*n + 9) div 10") <= col("cum"))
      .groupBy()
      .agg(sort_array(collect_list(struct(col("i"),
        (col("qk") / 10000.0).as("cq")))).as("sc"))
      .select(expr("transform(sc, x -> x.cq)").as("cuts"))
    scored
      .crossJoin(broadcast(cuts)) // 1-row scalar, t07/e07 pattern
      .withColumn("decile",
        (lit(10) - size(expr("filter(cuts, c -> c < quality)"))).cast("long"))
      .groupBy("decile")
      .agg(count(lit(1)).as("n_docs"), sum("qk").as("sq"))
      .withColumn("avg_quality",
        expr(ExactRound.unitMeanSpark("sq", "n_docs", 4)))
      .select(col("decile"), col("n_docs"), col("avg_quality"))
      .orderBy("decile")
  }

  val t14 = Q("t14_quality_deciles_approx",
    (s, dir) => qualityDecilesApprox(qualityScored(s, dir)),
    Some(s"""
      WITH t AS ($qkCteDuck),
      scored AS (SELECT doc_id, $qkDuck AS qk FROM t),
      g AS (SELECT qk, count(*) AS c FROM scored GROUP BY qk),
      cg AS (
        SELECT qk, c, sum(c) OVER (ORDER BY qk) AS cum,
               sum(c) OVER () AS n
        FROM g),
      -- the ascending element at 1-based rank ceil(i*n/10) = (i*n+9)//10,
      -- selected over the score grid's cumulative counts (cut comparison
      -- in integer qk space — quality = qk/10⁴ is monotone, so the
      -- buckets are identical)
      cuts AS (
        SELECT cg.qk AS c
        FROM cg, (SELECT unnest([1,2,3,4,5,6,7,8,9]) AS i) ps
        WHERE cum - cg.c < (i*n + 9) // 10 AND (i*n + 9) // 10 <= cum),
      bucketed AS (
        SELECT s.doc_id, s.qk,
               10 - (SELECT count(*) FROM cuts WHERE c < s.qk) AS decile
        FROM scored s)
      SELECT CAST(decile AS BIGINT) AS decile, count(*) AS n_docs,
             ${ExactRound.unitMeanDuck("sum(qk)", "count(*)", 4)} AS avg_quality
      FROM bucketed
      GROUP BY decile
      ORDER BY decile"""))

  // ---------------------------------------------------------------- t15
  /** Parameterized sequence packing: assign whole documents (rows with
    * `doc_id` and a token count `n`) to fixed-`budget` training
    * sequences — the pretraining batch-construction step. Documents are
    * packed in doc_id order WITHIN `nShards` independent shards
    * (doc_id mod nShards): each shard runs its own running token sum and
    * cuts a new pack when the budget would overflow at the doc's START
    * offset (`floor((cumsum − n)/budget)` — the streaming first-fit
    * boundary). Sharding is what makes this a scale plan: one global
    * cumsum is a single-task total order, but per-shard windows
    * parallelize freely and packs never cross shards — so `nShards`
    * scales with the input (≈ input partitions at 100 TB) without
    * changing any shard's packing (ShardedOpsSpec pins that locality).
    * Output profiles each pack (docs, tokens). */
  def sequencePack(docsWithCounts: DataFrame, budget: Long,
      nShards: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    docsWithCounts
      .select(col("doc_id"),
        pmod(col("doc_id"), lit(nShards)).as("shard"),
        col("n"))
      .withColumn("cum", sum("n").over(w))
      .withColumn("pack", floor((col("cum") - col("n")) / budget))
      .groupBy("shard", "pack")
      .agg(count(lit(1)).as("n_docs"), sum("n").as("n_tokens"))
  }

  /** The 8192-token × 8-shard instance, pinned by the DuckDB oracle. */
  val t15 = Q("t15_sequence_pack",
    (s, dir) =>
      sequencePack(
        docs(s, dir).select(col("doc_id"), size(tokensExpr).cast("long").as("n")),
        budget = 8192L, nShards = 8)
        .orderBy("shard", "pack"),
    Some("""
      WITH t AS (
        SELECT doc_id, doc_id % 8 AS shard,
               CAST(len(list_filter(string_split(text,' '), x -> x <> '')) AS BIGINT) AS n
        FROM documents),
      c AS (
        SELECT shard, n,
               sum(n) OVER (PARTITION BY shard ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM t)
      SELECT CAST(shard AS BIGINT) AS shard,
             CAST(floor((cum - n) / 8192) AS BIGINT) AS pack,
             count(*) AS n_docs, CAST(sum(n) AS BIGINT) AS n_tokens
      FROM c
      GROUP BY shard, pack
      ORDER BY shard, pack"""))

  // ---------------------------------------------------------------- t16
  /** Repetition filter (the Gopher-rule family, occurrence-fraction
    * form): per document, the fraction of 2-gram/3-gram occurrences that
    * are duplicates (1 − distinct/total) and the share of the single
    * most frequent 2-gram — the signals that catch looping boilerplate,
    * keyword-stuffed spam, and degenerate generations before training.
    * `keep` applies the thresholds in one place.
    *
    * Scale shape: gram construction is scan-local expression work (the
    * d04 slice+concat form); the only shuffles are one (doc_id, k, gram)
    * count and one (doc_id) conditional roll-up — both partial-agg,
    * keyed per document, no corpus-wide state. */
  val t16 = Q("t16_repetition_filter",
    (s, dir) => {
      val d = docs(s, dir).withColumn("w", tokensExpr)
      // BOTH gram orders from one tokenized projection — the unionAll of
      // two gramRows branches scanned + tokenized the corpus twice. The
      // 3-gram positions are a filter over the (always non-empty, since
      // size ≥ 2 here) 2-gram sequence rather than sequence(1, size-2),
      // because Spark's sequence(1, 0) is DESCENDING [1, 0], not empty.
      val counts = d
        .filter(size(col("w")) >= 2)
        .select(col("doc_id"), explode(expr(
          "concat(" +
            "transform(sequence(1, size(w) - 1), " +
            "  i -> struct(2 as k, concat_ws(' ', slice(w, i, 2)) as gram)), " +
            "transform(filter(sequence(1, size(w) - 1), i -> i <= size(w) - 2), " +
            "  i -> struct(3 as k, concat_ws(' ', slice(w, i, 3)) as gram)))"))
          .as("g"))
        .select(col("doc_id"), col("g.k").as("k"), col("g.gram").as("gram"))
        .groupBy("doc_id", "k", "gram").agg(count(lit(1)).as("c"))
      val stats = counts.groupBy("doc_id").agg(
        sum(when(col("k") === 2, col("c"))).as("tot2"),
        count(when(col("k") === 2, lit(1))).as("dist2"),
        max(when(col("k") === 2, col("c"))).as("top2"),
        sum(when(col("k") === 3, col("c"))).as("tot3"),
        count(when(col("k") === 3, lit(1))).as("dist3"))
      // the gram ratios are INTEGER rationals with per-doc denominators
      // (e.g. 1 − 31/32 = exactly 0.03125, a 4-decimal half) — exact
      // integer round-half-up (the q33/t04 knife-edge class, r14)
      docs(s, dir).select("doc_id").join(stats, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(expr(ExactRound.spark("tot2 - dist2", "tot2", 4)),
            lit(0.0)).as("dup2_frac"),
          coalesce(expr(ExactRound.spark("top2", "tot2", 4)),
            lit(0.0)).as("top2_share"),
          coalesce(expr(ExactRound.spark("tot3 - dist3", "tot3", 4)),
            lit(0.0)).as("dup3_frac"))
        .withColumn("keep",
          col("dup2_frac") <= 0.6 && col("dup3_frac") <= 0.4 &&
            col("top2_share") <= 0.1)
        .orderBy("doc_id")
    },
    Some(s"""
      WITH t AS (
        SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w
        FROM documents),
      g AS (
        SELECT doc_id, 2 AS k,
               unnest([w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))]) AS gram
        FROM t WHERE len(w) >= 2
        UNION ALL
        SELECT doc_id, 3,
               unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                       FOR i IN range(1, len(w) - 1)])
        FROM t WHERE len(w) >= 3),
      c AS (SELECT doc_id, k, gram, count(*) AS c FROM g GROUP BY 1, 2, 3),
      st AS (
        SELECT doc_id,
               sum(CASE WHEN k = 2 THEN c END) AS tot2,
               count(CASE WHEN k = 2 THEN 1 END) AS dist2,
               max(CASE WHEN k = 2 THEN c END) AS top2,
               sum(CASE WHEN k = 3 THEN c END) AS tot3,
               count(CASE WHEN k = 3 THEN 1 END) AS dist3
        FROM c GROUP BY doc_id),
      f AS (
        SELECT d.doc_id,
               coalesce(${ExactRound.duck("tot2 - dist2", "tot2", 4)}, 0)
                 AS dup2_frac,
               coalesce(${ExactRound.duck("top2", "tot2", 4)}, 0)
                 AS top2_share,
               coalesce(${ExactRound.duck("tot3 - dist3", "tot3", 4)}, 0)
                 AS dup3_frac
        FROM documents d LEFT JOIN st ON d.doc_id = st.doc_id)
      SELECT doc_id, dup2_frac, top2_share, dup3_frac,
             (dup2_frac <= 0.6 AND dup3_frac <= 0.4 AND top2_share <= 0.1) AS keep
      FROM f
      ORDER BY doc_id"""))

  // ---------------------------------------------------------------- t17
  /** Corpus-LM quality scoring (the CCNet/KenLM-perplexity pattern with
    * a unigram LM): train a maximum-likelihood unigram model on the
    * corpus itself, then score each document by its mean token
    * log10-probability. Rare-token-heavy (noisy, mojibake, off-language)
    * documents score low; fluent in-distribution text scores high —
    * the second axis of quality filtering next to t04's surface
    * heuristics.
    *
    * Scale shape: one (token) count aggregate builds the LM (vocabulary-
    * bounded, partial-agg); the corpus total is a broadcast 1-row
    * crossJoin (the t07 trick, no collect); scoring is the token explode
    * re-joined to the LM — at 100 TB the LM side is vocabulary-sized and
    * broadcasts, so the corpus streams past once. The per-token log10 is
    * exact IEEE double in both engines; the per-doc mean's summation-
    * order jitter (~1e-13) dies under round(4). */
  val t17 = Q("t17_unigram_logprob",
    (s, dir) => {
      val tok = docs(s, dir).select(col("doc_id"), explode(tokensExpr).as("w"))
      // vocabulary-bounded; materialized once so the corpus-tokenize +
      // count pipeline behind it runs once for its two consumers (the
      // scoring join and the 1-row total)
      val lm = tok.groupBy("w").agg(count(lit(1)).as("c")).materialize
      val total = lm.agg(sum("c").as("total"))
      tok.join(lm, "w")
        .crossJoin(broadcast(total))
        .groupBy("doc_id")
        .agg(round(avg(log10(col("c").cast("double") / col("total"))), 4)
          .as("avg_logprob"),
          count(lit(1)).as("n_tokens"))
        .orderBy("doc_id")
    },
    Some("""
      WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w
        FROM documents),
      t AS (SELECT doc_id, w FROM tok WHERE w <> ''),
      lm AS (SELECT w, count(*) AS c FROM t GROUP BY w),
      tot AS (SELECT sum(c) AS total FROM lm)
      SELECT t.doc_id,
             round(avg(log10(lm.c * 1.0 / tot.total)), 4) AS avg_logprob,
             count(*) AS n_tokens
      FROM t JOIN lm ON t.w = lm.w CROSS JOIN tot
      GROUP BY t.doc_id
      ORDER BY t.doc_id"""))

  // ---------------------------------------------------------------- t18
  /** Materialize the temperature-sampled mixture t10 only *plans*: each
    * source gets keep-probability p = min(1, ½ · w/f) where w is its
    * t10 mixture weight (sqrt-temperature) and f its natural token
    * share — rare sources keep (nearly) everything, dominant sources
    * are cut toward the target mix. Membership is decided by a digest
    * gate on doc_id (the t13/q31 primitive), so the sample is
    * reproducible across runs, engines, and repartitions — no rand(),
    * no seed state.
    *
    * Scale shape: the rate table is #sources rows (broadcast); the gate
    * is scan-local expression math; the only corpus-wide shuffles are
    * the per-source token aggregate and the final roll-up — both
    * partial-agg. At 100 TB the same plan emits the kept rows
    * themselves; the catalog entry rolls them up per source so the
    * result is compact and oracle-checkable. */
  val t18 = Q("t18_mixture_sample",
    (s, dir) => {
      val d = docs(s, dir).select(col("doc_id"), col("source"),
        size(tokensExpr).cast("long").as("n"))
      val per = d.groupBy("source").agg(sum("n").as("tokens"))
      val tot = per.agg(sum("tokens").as("total"))
      val rates = per.crossJoin(broadcast(tot))
        .withColumn("w", sqrt(col("tokens").cast("double")))
        .withColumn("p_keep", least(lit(1.0),
          col("w") / sum("w").over(org.apache.spark.sql.expressions.Window
            .partitionBy()) *
            col("total").cast("double") / col("tokens").cast("double") *
            lit(0.5)))
        .select(col("source"), col("p_keep"))
      // group by (source, p_keep) — p_keep is functionally dependent on
      // source, so this carries the rate into the output without a
      // second join against `rates` (which would re-aggregate the corpus)
      d.join(rates, "source")
        .filter(pmod(conv(substring(md5(col("doc_id").cast("string")), 1, 8),
          16, 10).cast("long"), lit(1000000)).cast("double") <
          col("p_keep") * 1e6)
        .groupBy("source", "p_keep")
        .agg(count(lit(1)).as("n_kept"), sum("n").as("kept_tokens"))
        .select(col("source"), round(col("p_keep"), 6).as("p_keep"),
          col("n_kept"), col("kept_tokens"))
        .orderBy("source")
    },
    Some("""
      WITH d AS (
        SELECT doc_id, source,
               len(list_filter(string_split(text, ' '), x -> x <> '')) AS n
        FROM documents),
      per AS (
        SELECT source, CAST(sum(n) AS BIGINT) AS tokens FROM d GROUP BY source),
      tot AS (SELECT CAST(sum(tokens) AS BIGINT) AS total FROM per),
      rates AS (
        SELECT source,
               least(1.0, sqrt(CAST(tokens AS DOUBLE)) /
                 sum(sqrt(CAST(tokens AS DOUBLE))) OVER () *
                 total / tokens * 0.5) AS p_keep
        FROM per CROSS JOIN tot)
      SELECT d.source, round(r.p_keep, 6) AS p_keep,
             count(*) AS n_kept,
             CAST(sum(d.n) AS BIGINT) AS kept_tokens
      FROM d JOIN rates r ON d.source = r.source
      WHERE CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
              AS BIGINT) % 1000000 AS DOUBLE) < r.p_keep * 1e6
      GROUP BY d.source, r.p_keep
      ORDER BY d.source"""))

  // ---------------------------------------------------------------- t19
  /** Deterministic epoch shuffle — the per-epoch global reorder of a
    * training corpus, reproducible from a seed string alone: every doc
    * gets the position `row_number` over `md5(seed:doc_id)` within the
    * shard that hash assigns. Same seed → identical order on any cluster
    * size, any engine; a new epoch is just a new seed.
    *
    * Scale shape: no global sort. The md5 key is uniform, so the shard
    * assignment is balanced by construction and the position window is
    * PARTITIONED BY shard — each shard orders independently (the t09→t14
    * lesson baked in from the start). At 100 TB this is one
    * repartition-by-shard + per-shard sort, exactly the shape a
    * `partitionBy(shard)` training-data write wants. */
  private[graft] def epochShuffle(ids: DataFrame, seed: String,
      nShards: Int): DataFrame = {
    val keyed = ids
      .withColumn("k", md5(concat(lit(seed + ":"), col("doc_id").cast("string"))))
      .withColumn("shard",
        pmod(conv(substring(col("k"), 1, 8), 16, 10).cast("long"), lit(nShards)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(col("k"), col("doc_id"))
    keyed.withColumn("pos", row_number().over(w).cast("long"))
      .select("doc_id", "shard", "pos")
  }

  val t19 = Q("t19_epoch_shuffle",
    (s, dir) => epochShuffle(docs(s, dir).select("doc_id"), "epoch1", 8)
      .orderBy("shard", "pos"),
    Some("""
      WITH keyed AS (
        SELECT doc_id, md5('epoch1:' || CAST(doc_id AS VARCHAR)) AS k
        FROM documents),
      sharded AS (
        SELECT doc_id, k,
               CAST(CAST(('0x' || substr(k, 1, 8)) AS BIGINT) % 8 AS BIGINT)
                 AS shard
        FROM keyed)
      SELECT doc_id, shard,
             row_number() OVER (PARTITION BY shard ORDER BY k, doc_id) AS pos
      FROM sharded
      ORDER BY shard, pos"""))

  // ---------------------------------------------------------------- t20
  /** BM25 keyword retrieval (Robertson/Spärck Jones; k1 = 1.2, b = 0.75)
    * for a fixed query-term set — the SPARSE half of a retrieval stack
    * next to the dense ANN family (s01-s03, s08). Top-10 docs by
    * summed per-term score, IDF in the ln(1 + (N−df+0.5)/(df+0.5)) form
    * that keeps scores positive.
    *
    * Scale shape: ONE corpus pass — dl and each query term's tf are
    * scan-local array expressions (no token explode for a fixed query:
    * the work is |query| array scans per doc, not |doc| shuffle rows);
    * the per-doc frame feeds the stats aggregate, the 3-row df count,
    * and the score join (once-materialized). N/avgdl and df broadcast;
    * the only data-sized shuffles are the per-doc score sum and the
    * rounded TakeOrdered top-k. */
  val t20 = Q("t20_bm25",
    (s, dir) => {
      val qterms = Seq("join", "window", "stream")
      val base = docs(s, dir)
        .withColumn("toks", tokensExpr)
        .select(col("doc_id") +:
          size(col("toks")).cast("double").as("dl") +:
          qterms.map(t =>
            size(expr(s"filter(toks, x -> x = '$t')")).cast("long").as(s"tf_$t")): _*)
        .materialize
      val hits = base.select(col("doc_id"), col("dl"),
          explode(array(qterms.map(t =>
            struct(lit(t).as("term"), col(s"tf_$t").as("tf"))): _*)).as("x"))
        .select(col("doc_id"), col("dl"), col("x.term").as("term"), col("x.tf").as("tf"))
        .filter(col("tf") > 0)
      val dfreq = hits.groupBy("term").agg(count(lit(1)).cast("double").as("df"))
      val st = base.agg(count(lit(1)).cast("double").as("n"), avg("dl").as("avgdl"))
      hits.join(broadcast(dfreq), "term")
        .crossJoin(broadcast(st))
        .withColumn("s",
          log((col("n") - col("df") + 0.5) / (col("df") + 0.5) + 1.0) *
            (col("tf") * 2.2) /
            (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))))
        .groupBy("doc_id").agg(round(sum("s"), 4).as("bm25"))
        .orderBy(col("bm25").desc, col("doc_id"))
        .limit(10)
    },
    Some("""
      WITH base AS (
        SELECT doc_id,
               CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
                 AS DOUBLE) AS dl,
               list_filter(string_split(text, ' '), x -> x <> '') AS toks
        FROM documents),
      tf AS (
        SELECT doc_id, dl, term,
               CAST(len(list_filter(toks, x -> x = term)) AS BIGINT) AS tf
        FROM base, (SELECT unnest(['join', 'window', 'stream']) AS term) q),
      hits AS (SELECT * FROM tf WHERE tf > 0),
      df AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM hits GROUP BY term),
      st AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl FROM base),
      sc AS (
        SELECT h.doc_id,
               ln((st.n - df.df + 0.5) / (df.df + 0.5) + 1) *
                 (h.tf * 2.2) /
                 (h.tf + 1.2 * (0.25 + 0.75 * h.dl / st.avgdl)) AS s
        FROM hits h JOIN df USING (term), st)
      SELECT doc_id, round(sum(s), 4) AS bm25
      FROM sc
      GROUP BY doc_id
      ORDER BY bm25 DESC, doc_id
      LIMIT 10"""))

  // ---------------------------------------------------------------- t21
  /** Weighted sampling WITHOUT replacement, top-10 per source — the
    * Efraimidis-Spirakis A-ES scheme: each row gets key u^(1/w) for a
    * uniform u and weight w, and the k largest keys per stratum are an
    * exact weighted sample without replacement. Ranking by ln(u)/w is
    * the same order (monotone transform) with one cheaper, t17-proven
    * libm call. The uniform comes from the md5 digest (t13/t18
    * discipline), so the "random" sample is bit-reproducible across
    * runs, engines, and partitionings — no rand(), no seed state.
    * Here w = token count: longer documents proportionally likelier.
    *
    * Completes the sampling family: uniform hash gate (q31), digest
    * stratification (q37/t13), temperature mixture (t18), class top-k
    * (t12) — this is the weighted-without-replacement member.
    *
    * Scale shape: key assignment rides the scan (hash + ln, expression
    * space); per-stratum top-k is a WindowGroupLimit-guarded window
    * keyed by source — bounded by stratum count × k, no global sort. */
  val t21 = Q("t21_weighted_sample",
    (s, dir) => {
      val d = docs(s, dir).select(col("doc_id"), col("source"),
          size(tokensExpr).cast("double").as("w"))
        .filter(col("w") > 0)
        .withColumn("u",
          (pmod(conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
            .cast("long"), lit(1000000)).cast("double") + 0.5) / 1e6)
        .withColumn("key", round(log(col("u")) / col("w"), 9))
      val wn = org.apache.spark.sql.expressions.Window
        .partitionBy("source").orderBy(col("key").desc, col("doc_id"))
      d.withColumn("rk", row_number().over(wn).cast("long"))
        .filter(col("rk") <= 10)
        .select(col("source"), col("rk"), col("doc_id"), col("key"))
        .orderBy("source", "rk")
    },
    Some("""
      WITH d AS (
        SELECT doc_id, source,
               CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
                 AS DOUBLE) AS w,
               (CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                  AS BIGINT) % 1000000 AS DOUBLE) + 0.5) / 1e6 AS u
        FROM documents),
      k AS (
        SELECT doc_id, source, round(ln(u) / w, 9) AS key
        FROM d WHERE w > 0),
      r AS (
        SELECT source, doc_id, key,
               row_number() OVER (PARTITION BY source
                                  ORDER BY key DESC, doc_id) AS rk
        FROM k)
      SELECT source, rk, doc_id, key
      FROM r
      WHERE rk <= 10
      ORDER BY source, rk"""))

  // ---------------------------------------------------------------- t22
  /** Per-source token-budget curation: fill each source's budget (700
    * tokens) greedily by descending document quality proxy (n_chars,
    * doc_id tiebreak) — the admission rule is "keep while the budget is
    * not yet exhausted BEFORE this doc", so the straddling document is
    * kept and every source lands at ≥ its budget (or its whole corpus).
    * Completes the budget family: t12 caps by document COUNT per class,
    * t15 packs into fixed sequence windows, t10/t18 weight by source —
    * this is the token-budgeted selection that pretraining mixtures
    * actually specify ("50B tokens of source X").
    *
    * Scale shape: token counts ride the scan; the running sum is a
    * per-source window — partitions are per source (bounded cardinality,
    * one sort each), no global sort. At 100 TB the exact-sort window
    * would be replaced by the t14 pattern: an approx-quantile threshold
    * on quality per source picks ~the budget boundary, the window then
    * runs only over the boundary decile. Output is the per-source
    * admission summary; per-doc detail is the same plan minus the final
    * agg. */
  val t22 = Q("t22_token_budget_cap",
    (s, dir) => {
      val budget = 700L
      val wn = org.apache.spark.sql.expressions.Window
        .partitionBy("source").orderBy(col("n_chars").desc, col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      docs(s, dir)
        .select(col("doc_id"), col("source"), col("n_chars"),
          size(tokensExpr).cast("long").as("n_tokens"))
        .withColumn("cum_before", coalesce(sum("n_tokens").over(wn), lit(0L)))
        .withColumn("kept", col("cum_before") < budget)
        .groupBy("source")
        .agg(count(when(col("kept"), 1)).as("n_kept"),
          count(when(!col("kept"), 1)).as("n_dropped"),
          coalesce(sum(when(col("kept"), col("n_tokens"))), lit(0L))
            .as("tokens_kept"))
        .orderBy("source")
    },
    Some("""
      WITH d AS (
        SELECT doc_id, source, n_chars,
               CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
                 AS BIGINT) AS n_tokens
        FROM documents),
      c AS (
        SELECT source, n_tokens,
               coalesce(sum(n_tokens) OVER (
                 PARTITION BY source ORDER BY n_chars DESC, doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS cum_before
        FROM d)
      SELECT source,
             count(CASE WHEN cum_before < 700 THEN 1 END) AS n_kept,
             count(CASE WHEN cum_before >= 700 THEN 1 END) AS n_dropped,
             CAST(coalesce(sum(CASE WHEN cum_before < 700 THEN n_tokens END),
                           0) AS BIGINT) AS tokens_kept
      FROM c
      GROUP BY source
      ORDER BY source"""))

  // ---------------------------------------------------------------- t23
  /** Linear (fastText-style) quality classifier: per-token weights, a
    * logistic link, and a 0.5 decision threshold. This is how production
    * corpus filters actually score documents — a learned linear model
    * applied at scan speed. The model lives in a broadcast weight table
    * (12 rows here; real vocabularies of ~1M rows still broadcast), so
    * the corpus side streams through explode→broadcast-join→partial-sum
    * with ONE shuffle on doc_id and no driver-side anything. Docs with no
    * in-vocabulary tokens still score (left join, bias only). */
  private val clfWeights: Seq[(String, Double)] = Seq(
    "spark" -> 0.8, "data" -> 0.5, "query" -> 0.6, "join" -> 0.4,
    "window" -> 0.3, "stream" -> 0.3, "table" -> 0.2, "batch" -> 0.1,
    "slow" -> -0.7, "small" -> -0.4, "noise" -> -0.6, "the" -> -0.15)
  private val clfBias = -0.2

  val t23 = Q("t23_quality_classifier",
    (s, dir) => {
      import s.implicits._
      val w = broadcast(clfWeights.toDF("token", "wt"))
      val tok = docs(s, dir)
        .select(col("doc_id"), explode(tokensExpr).as("token"))
      val z = tok.join(w, "token")
        .groupBy("doc_id").agg(sum("wt").as("sw"))
      docs(s, dir).select("doc_id")
        .join(z, Seq("doc_id"), "left")
        .withColumn("zv", lit(clfBias) + coalesce(col("sw"), lit(0.0)))
        .select(col("doc_id"),
          round(expr("1.0 / (1.0 + exp(-zv))"), 6).as("score"),
          (expr("1.0 / (1.0 + exp(-zv))") >= 0.5).as("keep"))
        .orderBy("doc_id")
    },
    Some("""
      WITH w(token, wt) AS (VALUES
        ('spark', 0.8), ('data', 0.5), ('query', 0.6), ('join', 0.4),
        ('window', 0.3), ('stream', 0.3), ('table', 0.2), ('batch', 0.1),
        ('slow', -0.7), ('small', -0.4), ('noise', -0.6), ('the', -0.15)),
      tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS token
        FROM documents),
      z AS (
        SELECT t.doc_id, sum(CAST(w.wt AS DOUBLE)) AS sw
        FROM tok t JOIN w ON t.token = w.token
        GROUP BY t.doc_id)
      SELECT d.doc_id,
             round(1.0 / (1.0 + exp(-(-0.2 + coalesce(z.sw, 0)))), 6) AS score,
             1.0 / (1.0 + exp(-(-0.2 + coalesce(z.sw, 0)))) >= 0.5 AS keep
      FROM documents d LEFT JOIN z ON d.doc_id = z.doc_id
      ORDER BY d.doc_id"""))

  // ---------------------------------------------------------------- t24
  /** Exact heavy hitters via Misra–Gries two-pass — every token whose true
    * frequency exceeds total/(k+1), with its EXACT count, without ever
    * shuffling the token key space. Pass 1 reduces each map task to a
    * ≤ k-counter summary ([[graft.functions.MisraGriesAgg]] — the only
    * shuffled bytes are O(k) per task); the deficit bound guarantees the
    * summary's keys are a superset of the true heavy hitters. Pass 2
    * broadcast-joins the ≤ k candidate strings back against the token
    * stream and counts ONLY them exactly (the groupBy key domain is ≤ k,
    * so the exchange is trivially narrow at any corpus size). t01 answers
    * the same question by exact full-histogram count — correct but
    * key-cardinality-wide; this is the 100 TB-shaped formulation.
    *
    * k = 30 < the fixture's 31-token vocabulary, so the MG decrement path
    * (the part the guarantee rests on) genuinely fires here; MisraGriesSpec
    * pins the superset guarantee and merge on adversarial/skewed streams. */
  private val hhK = 30

  val t24 = Q("t24_heavy_hitters",
    (s, dir) => {
      val tok = docs(s, dir).select(explode(tokensExpr).as("word"))
      val cand = tok
        .agg(graft.functions.MisraGriesAgg.mg_sketch(col("word"), hhK).as("sk"))
        .select(col("sk.total").as("total"), explode(col("sk.keys")).as("word"))
      tok.join(broadcast(cand), "word")
        .groupBy("word")
        .agg(count(lit(1)).as("cnt"), max("total").as("total"))
        .where(col("cnt") > col("total") / lit((hhK + 1).toDouble))
        .select(col("word"), col("cnt"))
        .orderBy(col("cnt").desc, col("word"))
    },
    Some(s"""
      WITH t AS (
        SELECT word
        FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        WHERE word <> ''),
      tot AS (SELECT count(*) AS n FROM t)
      SELECT word, count(*) AS cnt
      FROM t
      GROUP BY word
      HAVING count(*) > (SELECT n FROM tot) / ${(hhK + 1).toDouble}
      ORDER BY cnt DESC, word"""))

  val queries: Seq[Q] = Seq(t01, t02, t03, t04, t05, t06, t07, t08, t09, t10,
    t11, t12, t13, t14, t15, t16, t17, t18, t19, t20, t21, t22, t23, t24)
}
