package graft.ops

import graft.core.Tables
import graft.queries.{QueryDef, QueryModule}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for an LLM training-data pipeline, over the
  * `documents` table. All pure Catalyst expressions (no UDFs) — row-level,
  * shuffle-free, whole-stage-codegen'd, so they stream over 100 TB of text
  * at scan speed.
  *
  * Cross-engine determinism: ratios are int/int IEEE double divisions with
  * the formula mirrored token-for-token in the DuckDB oracle — identical
  * bits, no rounding needed (docs/DETERMINISM.md).
  */
object TextAnalysis extends QueryModule {

  /** Whitespace tokens, empties dropped. Shared with the hybrid
    * retrieval entry (s25) so both engines' token rule is defined once.
    */
  private[graft] def toks(c: Column): Column = filter(split(c, " "), w => length(w) > 0)

  /** The Okapi BM25 per-(doc, term) score — t15's arithmetic factored
    * out so s25 (hybrid fusion) scores with the SAME formula t15's
    * oracle hash-certifies (the p13 shared-declaration rule). The
    * frame it is selected from must carry columns `tf`, `df`, `dl`,
    * `n_docs`, `tot_tokens`. idf is the integer-quantized bit-length of
    * the floored Robertson ratio (pure integer arithmetic — ulp-exact
    * in any engine); the tf-saturation factor stays in IEEE doubles
    * with no transcendentals (docs/DETERMINISM.md).
    */
  private[graft] def bm25Sc: Column = expr(
    """CAST(length(bin(greatest((2 * n_docs - 2 * df + 1) div (2 * df + 1),
      |                         CAST(1 AS BIGINT)))) AS DOUBLE)
      |  * ((CAST(tf AS DOUBLE) * 2.2) /
      |     (CAST(tf AS DOUBLE) + 1.2 *
      |      (0.25 + 0.75 * (CAST(dl AS DOUBLE) /
      |        (CAST(tot_tokens AS DOUBLE) / CAST(n_docs AS DOUBLE))))))""".stripMargin)

  /** The DuckDB mirror of [[bm25Sc]], parameterized by the caller's
    * qualified column references; `tot` must be the totals CTE in scope.
    */
  private[graft] def bm25ScDuck(tf: String, df: String, dl: String): String =
    s"""CAST(length(bin(greatest((2 * tot.n_docs - 2 * $df + 1) // (2 * $df + 1),
       |                             CAST(1 AS BIGINT)))) AS DOUBLE)
       |      * ((CAST($tf AS DOUBLE) * 2.2) /
       |         (CAST($tf AS DOUBLE) + 1.2 *
       |          (0.25 + 0.75 * (CAST($dl AS DOUBLE) /
       |            (CAST(tot.tot_tokens AS DOUBLE) / CAST(tot.n_docs AS DOUBLE))))))""".stripMargin

  /** t01: token/char counting — the cheapest quality signal. */
  private def t01(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(
      col("doc_id"),
      size(toks(col("text"))).cast("long").as("n_tokens"),
      length(col("text")).cast("long").as("n_chars_text"),
      col("n_chars"))

  private val t01Sql =
    """SELECT doc_id,
      |  CAST(len(list_filter(string_split(text, ' '), w -> len(w) > 0)) AS BIGINT) AS n_tokens,
      |  CAST(length(text) AS BIGINT) AS n_chars_text,
      |  n_chars
      |FROM documents""".stripMargin

  private val stopwords = Seq("the", "a", "of", "and", "to", "in", "is", "it")

  /** Shared with the composed pipeline (p02), which reuses the exact
    * t02/t03 formulas so its oracle is their composition.
    */
  private[ops] def stopwordList: Seq[String] = stopwords

  /** t02: quality scoring — length, stopword ratio, mean token length,
    * distinct-token ratio. Formula mirrored exactly in the oracle.
    */
  private def t02(s: SparkSession, dir: String): DataFrame = {
    val w = toks(col("text"))
    val nTok = size(w).cast("long")
    val stopHits = size(filter(w, t => t.isInCollection(stopwords))).cast("long")
    val sumLen = aggregate(transform(w, t => length(t).cast("long")), lit(0L), (acc, x) => acc + x)
    val nDistinct = size(array_distinct(w)).cast("long")
    // zero-token guard: a whitespace-only document must yield null ratios
    // (and so a null quality), not a divide error / engine-dependent NaN
    def ratio(num: org.apache.spark.sql.Column) = when(nTok > 0, num / nTok)
    Tables.documents(s, dir).select(
      col("doc_id"),
      nTok.as("n_tokens"),
      ratio(stopHits).as("stop_ratio"),
      ratio(sumLen).as("mean_tok_len"),
      ratio(nDistinct).as("distinct_ratio"))
      .withColumn("quality",
        col("stop_ratio") * 0.25 + col("distinct_ratio") * 0.5 + col("mean_tok_len") * 0.05)
  }

  private val t02Sql =
    s"""SELECT doc_id, n_tokens, stop_ratio, mean_tok_len, distinct_ratio,
       |  stop_ratio * 0.25 + distinct_ratio * 0.5 + mean_tok_len * 0.05 AS quality
       |FROM (
       |  SELECT doc_id,
       |    CAST(len(w) AS BIGINT) AS n_tokens,
       |    CASE WHEN len(w) > 0 THEN CAST(len(list_filter(w, t -> t IN (${stopwords.map("'" + _ + "'").mkString(",")}))) AS BIGINT)
       |      / CAST(len(w) AS BIGINT) END AS stop_ratio,
       |    CASE WHEN len(w) > 0 THEN CAST(list_sum(list_transform(w, t -> CAST(length(t) AS BIGINT))) AS BIGINT)
       |      / CAST(len(w) AS BIGINT) END AS mean_tok_len,
       |    CASE WHEN len(w) > 0 THEN CAST(len(list_distinct(w)) AS BIGINT) / CAST(len(w) AS BIGINT) END AS distinct_ratio
       |  FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> len(x) > 0) AS w
       |        FROM documents))""".stripMargin

  /** Per-language marker-word sets for the n-gram/stopword language-ID
    * heuristic. Tiny on purpose: language ID at pipeline scale is a
    * first-pass router, not a classifier.
    */
  private val markers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "ist", "das", "nicht"),
    "en" -> Seq("the", "and", "of", "to", "is", "in"),
    "es" -> Seq("el", "la", "los", "que", "es", "y"),
    "fr" -> Seq("le", "les", "des", "et", "est", "une"),
  )

  private[ops] def markerList: Seq[(String, Seq[String])] = markers

  /** t03: language ID by marker-word voting, deterministic argmax (ties
    * break toward the alphabetically-first language — the CASE chain
    * encodes that identically on both engines). Falls back to "und"
    * (undetermined) when no marker hits.
    */
  private def t03(s: SparkSession, dir: String): DataFrame = {
    val w = toks(col("text"))
    val scored = Tables.documents(s, dir).select(
      (Seq(col("doc_id"), col("lang")) ++ markers.map { case (l, ms) =>
        size(filter(w, t => t.isInCollection(ms))).cast("long").as(s"c_$l")
      }): _*)
    val Seq(de, en, es, fr) = markers.map(m => col(s"c_${m._1}"))
    scored.withColumn("pred_lang",
      when(de + en + es + fr === 0, lit("und"))
        .when(de >= en && de >= es && de >= fr, lit("de"))
        .when(en >= es && en >= fr, lit("en"))
        .when(es >= fr, lit("es"))
        .otherwise(lit("fr")))
  }

  private val t03Sql = {
    val counts = markers.map { case (l, ms) =>
      s"CAST(len(list_filter(w, t -> t IN (${ms.map("'" + _ + "'").mkString(",")}))) AS BIGINT) AS c_$l"
    }.mkString(",\n    ")
    s"""SELECT doc_id, lang, c_de, c_en, c_es, c_fr,
       |  CASE WHEN c_de + c_en + c_es + c_fr = 0 THEN 'und'
       |       WHEN c_de >= c_en AND c_de >= c_es AND c_de >= c_fr THEN 'de'
       |       WHEN c_en >= c_es AND c_en >= c_fr THEN 'en'
       |       WHEN c_es >= c_fr THEN 'es'
       |       ELSE 'fr' END AS pred_lang
       |FROM (
       |  SELECT doc_id, lang,
       |    $counts
       |  FROM (SELECT doc_id, lang, list_filter(string_split(text, ' '), x -> len(x) > 0) AS w
       |        FROM documents))""".stripMargin
  }

  /** t04: order-insensitive document fingerprint — md5 over the sorted
    * distinct token set. Detects word-reorder duplicates; row-level, no
    * shuffle, and the fingerprint doubles as an exact-dedup key at scale.
    */
  private def t04(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(
      col("doc_id"),
      md5(array_join(array_sort(array_distinct(toks(col("text")))), " ")).as("fingerprint"))

  private val t04Sql =
    """SELECT doc_id,
      |  md5(array_to_string(list_sort(list_distinct(list_filter(string_split(text, ' '), x -> len(x) > 0))), ' ')) AS fingerprint
      |FROM documents""".stripMargin

  /** t05: term/document frequency inverted index — the shape under tf-idf
    * ranking and vocabulary pruning. Counts only (ints): the idf log is
    * left to the consumer because libm transcendentals aren't bit-stable
    * across engines (DETERMINISM.md).
    */
  private def t05(s: SparkSession, dir: String): DataFrame = {
    val words = Tables.documents(s, dir)
      .select(col("doc_id"), explode(toks(col("text"))).as("word"))
    val tf = words.groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("word")).agg(count(lit(1)).as("df"))
    tf.join(df, "word").select(col("doc_id"), col("word"), col("tf"), col("df"))
  }

  private val t05Sql =
    """WITH w AS (
      |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> len(x) > 0)) AS word
      |  FROM documents),
      |tf AS (SELECT doc_id, word, count(*) AS tf FROM w GROUP BY 1, 2),
      |df AS (SELECT word, count(*) AS df FROM tf GROUP BY 1)
      |SELECT doc_id, tf.word AS word, tf, df
      |FROM tf JOIN df ON tf.word = df.word""".stripMargin

  /** t06: BPE-ish token counting — alnum runs + individual punctuation,
    * the standard cheap proxy for subword-tokenizer counts. The pattern
    * uses only constructs Java regex and RE2 agree on.
    */
  private def t06(s: SparkSession, dir: String): DataFrame = {
    val bpe = regexp_extract_all(lower(col("text")), lit("[a-z0-9]+|[^a-z0-9 ]"), lit(0))
    val nWs = size(toks(col("text"))).cast("long")
    val nBpe = size(bpe).cast("long")
    Tables.documents(s, dir).select(
      col("doc_id"),
      nWs.as("n_ws_tokens"),
      nBpe.as("n_bpe_tokens"),
      when(nBpe > 0, length(col("text")).cast("long") / nBpe).as("chars_per_bpe"))
  }

  private val t06Sql =
    """SELECT doc_id,
      |  CAST(len(list_filter(string_split(text, ' '), w -> len(w) > 0)) AS BIGINT) AS n_ws_tokens,
      |  CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n_bpe_tokens,
      |  CASE WHEN len(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9 ]')) > 0
      |    THEN CAST(length(text) AS BIGINT)
      |      / CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9 ]')) AS BIGINT)
      |  END AS chars_per_bpe
      |FROM documents""".stripMargin

  /** t07: order-sensitive rolling-hash fingerprint (native expression;
    * t04 is the order-insensitive set fingerprint).
    */
  private def t07(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(
      col("doc_id"),
      graft.functions.TextFunctions.rolling_hash(col("text")).as("roll_hash"))

  private val t07Sql =
    """SELECT doc_id,
      |  list_reduce(
      |    list_prepend(CAST(0 AS BIGINT),
      |      list_transform(string_split(text, ''), c -> CAST(ord(c) AS BIGINT))),
      |    (a, b) -> (a * 31 + b) % 1000000007) AS roll_hash
      |FROM documents""".stripMargin

  /** t08: denylist scrubbing — the PII-redaction shape (regexp_replace a
    * pattern alternation with a placeholder + count the hits per doc).
    * Production swaps the denylist alternation for email/phone/ssn
    * patterns (unit-tested on injected rows in TextSpec — this corpus's
    * synthetic vocab contains no digits, so those patterns would match
    * nothing here); the pattern below uses only constructs Java regex and
    * RE2 agree on (`\b` is the ASCII word boundary in both). Row-local
    * projection: scan-speed, no shuffle.
    */
  private val ScrubPat = "\\b(slow|big)\\b"

  /** Production PII patterns for [[scrub]] (Java-regex/RE2-common). */
  private[graft] val EmailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private[graft] val PhonePat = "\\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\\b"

  /** The scrub kernel: replace every match of `pat` in `textCol` with
    * `token` and count the hits — one row-local projection.
    */
  private[graft] def scrub(df: DataFrame, textCol: String, pat: String, token: String): DataFrame =
    df
      .withColumn("scrubbed", regexp_replace(col(textCol), pat, token))
      .withColumn("n_hits",
        size(regexp_extract_all(col(textCol), lit(pat), lit(0))).cast("long"))

  private def t08(s: SparkSession, dir: String): DataFrame =
    scrub(Tables.documents(s, dir), "text", ScrubPat, "<unk>")
      .select(col("doc_id"), col("scrubbed"), col("n_hits"))

  private val t08Sql =
    """SELECT doc_id,
      |  regexp_replace(text, '\b(slow|big)\b', '<unk>', 'g') AS scrubbed,
      |  CAST(len(regexp_extract_all(text, '\b(slow|big)\b')) AS BIGINT) AS n_hits
      |FROM documents""".stripMargin

  /** t09: vocabulary coverage / OOV rate — fraction of a document's
    * tokens outside the corpus top-K vocabulary (tokenizer-coverage
    * analysis). The vocab is an aggregate-then-limit (tiny after the
    * groupBy, deterministic count-desc/word tiebreak) broadcast to a
    * map-side membership probe; the only per-row shuffle is the doc_id
    * aggregation.
    */
  private val VocabK = 10

  private def t09(s: SparkSession, dir: String): DataFrame = {
    val words = Tables.documents(s, dir)
      .select(col("doc_id"), explode(toks(col("text"))).as("word"))
    val vocab = words.groupBy(col("word")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("word")).limit(VocabK)
      .select(col("word"), lit(1).as("in_vocab"))
    words.join(broadcast(vocab), Seq("word"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
  }

  private val t09Sql =
    s"""WITH w AS (
       |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> len(x) > 0)) AS word
       |  FROM documents),
       |vc AS (SELECT word FROM (SELECT word, count(*) AS c FROM w GROUP BY 1)
       |       ORDER BY c DESC, word LIMIT $VocabK)
       |SELECT doc_id, count(*) AS n_tokens,
       |  CAST(sum(CASE WHEN vc.word IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
       |FROM w LEFT JOIN vc ON w.word = vc.word
       |GROUP BY doc_id""".stripMargin

  /** t10: adjacent token-pair (bigram) counts — the pair-frequency step
    * a BPE/WordPiece trainer runs each merge iteration (t06 counts the
    * resulting tokens; this is the statistic that CHOOSES the next
    * merge). Positions come from the generator (posexplode), pairing is
    * one partitioned window lead per document, then a partial+final hash
    * aggregate and a global top-30 (TakeOrderedAndProject, never a full
    * sort). 100 TB shape: shuffle keys are (doc_id) then (pair) — both
    * high-cardinality and unskewed after lowercasing.
    */
  private val TopPairs = 30

  /** Full (pre-limit) bigram pair counts — exposed so Round4Spec can
    * check the pairing identity Σn == Σ_docs max(tokens−1, 0) against
    * t01's independent token counts (a dropped or doubled pair per doc
    * would survive any ordering-only assertion on the top-k).
    */
  private[graft] def bigramPairs(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("i"))
    Tables.documents(s, dir)
      .select(col("doc_id"), posexplode(toks(lower(col("text")))).as(Seq("i", "tok")))
      .withColumn("pair", concat(col("tok"), lit(" "), lead(col("tok"), 1).over(w)))
      .filter(col("pair").isNotNull)
      .groupBy(col("pair"))
      .agg(count(lit(1)).as("n"))
  }

  private def t10(s: SparkSession, dir: String): DataFrame =
    bigramPairs(s, dir)
      .orderBy(col("n").desc, col("pair"))
      .limit(TopPairs)

  private val t10Sql =
    s"""WITH toks AS (
       |  SELECT d.doc_id, d.w[x.i] AS tok, x.i
       |  FROM (SELECT doc_id, list_filter(string_split(lower(text), ' '), t -> len(t) > 0) AS w
       |        FROM documents) d,
       |    LATERAL (SELECT unnest(range(1, coalesce(len(d.w), 0) + 1)) AS i) x),
       |pairs AS (
       |  SELECT tok || ' ' || lead(tok) OVER (PARTITION BY doc_id ORDER BY i) AS pair
       |  FROM toks)
       |SELECT pair, CAST(count(*) AS BIGINT) AS n
       |FROM pairs WHERE pair IS NOT NULL
       |GROUP BY 1 ORDER BY n DESC, pair LIMIT $TopPairs""".stripMargin

  /** t11 window geometry: 32-token windows, stride 16 (50% overlap) —
    * the shape a context-window chunker feeds a tokenizer/packer.
    */
  private val ChunkW      = 32
  private val ChunkStride = 16

  /** t11: token-window chunking — split each document's token stream into
    * fixed-size OVERLAPPING windows (the step between cleaning and batch
    * packing in a training-data pipeline: long documents become
    * context-window-sized training samples, the overlap preserving
    * cross-boundary spans). One row per (doc, window): chunk_id, the
    * re-joined window text, and its token count (the tail window may be
    * short).
    *
    * Row-local and shuffle-free: tokens split once, window starts are a
    * generated sequence, `slice` takes each window — all codegen'd
    * collection expressions, so chunking streams over 100 TB at scan
    * speed and inherits the document partitioning (no skew surface: a
    * huge document costs rows proportional to its own length only).
    * Empty/whitespace-only documents yield no chunks (the guard also
    * keeps `sequence(0, -1)` from throwing).
    */
  /** t11 core over any (doc_id, text) frame — shared with the composed
    * clean→chunk pipeline (p13), which chunks d12's scrubbed text with
    * exactly this kernel so its oracle is the CTE composition.
    */
  private[graft] def chunkWindows(docs: DataFrame): DataFrame = {
    val w = toks(col("text"))
    docs
      .select(col("doc_id"), w.as("toks"))
      .select(col("doc_id"), col("toks"),
        explode(when(size(col("toks")) > 0,
          sequence(lit(0), size(col("toks")) - 1, lit(ChunkStride)))
          .otherwise(array())).as("s"))
      .select(
        col("doc_id"),
        (col("s") / ChunkStride).cast("long").as("chunk_id"),
        array_join(slice(col("toks"), col("s") + 1, lit(ChunkW)), " ").as("chunk_text"),
        least(lit(ChunkW), size(col("toks")) - col("s")).cast("long").as("n_tokens"))
  }

  private def t11(s: SparkSession, dir: String): DataFrame =
    chunkWindows(Tables.documents(s, dir).select(col("doc_id"), col("text")))

  /** DuckDB mirror of [[chunkWindows]] over a relation exposing
    * (doc_id, w) with w the token list — defined ONCE (the Sampling
    * "defined once" rule) so t11 and p13 cannot drift.
    */
  private[graft] def chunkSelectSql(rel: String): String =
    s"""SELECT doc_id,
       |  CAST(s // $ChunkStride AS BIGINT) AS chunk_id,
       |  array_to_string(w[(s + 1):(s + $ChunkW)], ' ') AS chunk_text,
       |  CAST(least($ChunkW, len(w) - s) AS BIGINT) AS n_tokens
       |FROM (
       |  SELECT doc_id, w, unnest(range(0, len(w), $ChunkStride)) AS s
       |  FROM $rel)""".stripMargin

  private val t11Sql =
    s"""WITH tw AS (
       |  SELECT doc_id, list_filter(string_split(text, ' '), x -> len(x) > 0) AS w
       |  FROM documents)
       |${chunkSelectSql("tw")}""".stripMargin

  /** t12: per-document repetition profile — the Gopher-family quality
    * filter (Rae et al. 2021 §A1.1 use duplicate-line and repeated-n-gram
    * fractions; these single-line docs get the token-level analogues):
    * distinct-token ratio and the most-frequent bigram's share of all
    * bigram slots. A doc whose top bigram fills most of its slots is
    * generated/boilerplate text a training pipeline drops. Ties on the
    * top bigram break lexicographically, so the report is deterministic
    * in both engines. Docs with fewer than two tokens have no bigram and
    * are excused (both sides filter identically).
    *
    * Scale shape: bigram counts group on (doc_id, pair) and the top-1
    * pick windows on doc_id — the lead-window's hash(doc_id) exchange
    * already satisfies BOTH downstream distributions (equal (doc_id,
    * pair) tuples share a doc_id), so the whole pair path rides ONE
    * exchange; the row-local stats branch joins back on the same key.
    * Per-doc work is linear in that doc's own length — no cross-doc key
    * can skew it.
    */
  private def t12(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.spread(Tables.documents(s, dir))
      .select(col("doc_id"), toks(lower(col("text"))).as("w"))
      .filter(size(col("w")) >= 2)
      .persist() // feeds both the stats branch and the bigram branch
    val stats = base.select(
      col("doc_id"),
      size(col("w")).cast("long").as("n_tokens"),
      size(array_distinct(col("w"))).cast("long").as("n_distinct"))
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("i"))
    val rankW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("n").desc, col("pair"))
    val top = base
      .select(col("doc_id"), posexplode(col("w")).as(Seq("i", "tok")))
      .withColumn("pair", concat(col("tok"), lit(" "), lead(col("tok"), 1).over(byDoc)))
      .filter(col("pair").isNotNull)
      .groupBy(col("doc_id"), col("pair"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rn", row_number().over(rankW))
      .filter(col("rn") === 1)
    stats.join(top, Seq("doc_id"))
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
        col("pair").as("top_pair"), col("n").as("top_pair_n"),
        (col("n_distinct").cast("double") / col("n_tokens")).as("distinct_ratio"),
        (col("n").cast("double") / (col("n_tokens") - 1)).as("top_pair_frac"))
  }

  private val t12Sql =
    """WITH base AS (
      |  SELECT doc_id, w
      |  FROM (SELECT doc_id, list_filter(string_split(lower(text), ' '), t -> len(t) > 0) AS w
      |        FROM documents)
      |  WHERE len(w) >= 2),
      |stats AS (
      |  SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens,
      |    CAST(len(list_distinct(w)) AS BIGINT) AS n_distinct
      |  FROM base),
      |toks AS (
      |  SELECT base.doc_id, base.w[x.i] AS tok, x.i
      |  FROM base, LATERAL (SELECT unnest(range(1, len(base.w) + 1)) AS i) x),
      |pairs AS (
      |  SELECT doc_id, tok || ' ' || lead(tok) OVER (PARTITION BY doc_id ORDER BY i) AS pair
      |  FROM toks),
      |pc AS (
      |  SELECT doc_id, pair, CAST(count(*) AS BIGINT) AS n
      |  FROM pairs WHERE pair IS NOT NULL GROUP BY 1, 2),
      |top AS (
      |  SELECT doc_id, pair, n,
      |    row_number() OVER (PARTITION BY doc_id ORDER BY n DESC, pair) AS rn
      |  FROM pc)
      |SELECT s.doc_id, s.n_tokens, s.n_distinct, t.pair AS top_pair, t.n AS top_pair_n,
      |  CAST(s.n_distinct AS DOUBLE) / s.n_tokens AS distinct_ratio,
      |  CAST(t.n AS DOUBLE) / (s.n_tokens - 1) AS top_pair_frac
      |FROM stats s JOIN top t ON s.doc_id = t.doc_id AND t.rn = 1""".stripMargin

  /** t13: unigram-surprise quality score — the perplexity-filter proxy
    * (CCNet scores docs with a unigram/KenLM model; Wenzek et al. 2020
    * §3.2): fit the unigram model ON the corpus itself (one aggregate),
    * then score each document by its tokens' average information
    * content. The log2 is QUANTIZED to whole bits via binary bit-length
    * — surprise(t) = bitlen(N) − bitlen(count(t)), i.e.
    * ⌊log2 N⌋ − ⌊log2 cnt⌋ ≈ log2(N/cnt) within ±1 bit — because JVM
    * `Math.log` and DuckDB `ln` disagree in the last ulp ~1/2000 inputs
    * (measured; docs/DETERMINISM.md forbids transcendentals on the hash
    * path), while bit-length is exact integer arithmetic in both
    * engines (`length(bin(x))`, no leading zeros in either). A doc of
    * rare tokens (high mean bits) is gibberish/OCR noise; a doc of
    * only-common tokens (low mean bits, low max) is boilerplate — the
    * two tails a perplexity filter cuts.
    *
    * Scale shape: token stream persisted once, feeding (a) the vocab
    * count aggregate — one shuffle on the token — and (b) the per-doc
    * score join + doc_id aggregate. The 1-row corpus total rides a
    * capped broadcast (the p11 totals contract); the vocab frame is
    * corpus-derived and therefore NOT broadcast-hinted (ScaleLint
    * kind-4) — at real scale the Zipf-truncated vocab still fits a
    * stats-chosen broadcast, but that's the planner's call.
    * Determinism: all-integer bits, one int/int IEEE division for the
    * mean.
    */
  /** t13 core over any (doc_id, text) frame — factored so tests can
    * plant rare/common token mixes with hand-computable bit values.
    */
  private[graft] def unigramSurprise(docs: DataFrame): DataFrame = {
    val tk = Tables.spread(docs)
      .select(col("doc_id"), explode(toks(col("text"))).as("tok"))
      .persist()
    val cnt = tk.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
    val tot = tk.agg(count(lit(1)).as("n_total"))
    val bits = cnt.crossJoin(broadcast(tot))
      .select(col("tok"),
        (length(bin(col("n_total"))) - length(bin(col("cnt")))).cast("long").as("bits"))
    tk.join(bits, Seq("tok"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("bits")).as("sum_bits"),
        max(col("bits")).as("max_bits"))
      .select(col("doc_id"), col("n_tokens"),
        (col("sum_bits") / col("n_tokens")).as("mean_bits"), col("max_bits"))
  }

  private def t13(s: SparkSession, dir: String): DataFrame =
    unigramSurprise(Tables.documents(s, dir).select(col("doc_id"), col("text")))

  // ---- t14: bigram surprise (conditional LM quality proxy) ------------

  /** t14: per-document BIGRAM surprise — the conditional next-token
    * version of t13's unigram score, i.e. the CCNet-style "LM quality"
    * proxy one step up the n-gram ladder: a document whose adjacent-token
    * transitions are rare under the corpus bigram model reads as noise or
    * boilerplate-free novelty; one whose transitions are all common reads
    * as templated text. Per bigram, `P(cur|prev) = c(prev,cur) /
    * c(prev,·)` with the prefix count taken over bigram PREFIXES (so the
    * conditional distribution normalizes exactly, and a document-final
    * token never skews its own denominator).
    *
    * Cross-engine determinism: same bit-length quantization as t13 —
    * `bits = bitlen(c(prev,·)) - bitlen(c(prev,cur))` ≈ −log2 P, pure
    * integer arithmetic, ulp-exact in any engine; the only float is the
    * final mean (one division of two exact longs, identical in IEEE on
    * both sides).
    *
    * Scale shape: bigram expansion is ROW-LOCAL (a transform over the
    * token array — no self-join, no window); one shuffle pre-aggregates
    * (doc, prev, cur) with map-side combine, the corpus bigram/prefix
    * model is two small aggs over that, and the bits join back is keyed
    * on (prev, cur) — at 100 TB every stage is hash-partitioned and
    * linear, with the model table ~vocab² bounded far below the corpus.
    */
  private[graft] def bigramSurprise(docs: DataFrame): DataFrame = {
    val withBg = Tables.spread(docs)
      .select(col("doc_id"), toks(col("text")).as("w"))
      .filter(size(col("w")) >= 2)
      .select(col("doc_id"),
        explode(expr(
          "transform(sequence(1, size(w)-1), i -> struct(w[i-1] AS prev, w[i] AS cur))"))
          .as("bg"))
      .select(col("doc_id"), col("bg.prev").as("prev"), col("bg.cur").as("cur"))
    // one corpus-wide shuffle; everything model-side derives from it
    val perDoc = withBg.groupBy(col("doc_id"), col("prev"), col("cur"))
      .agg(count(lit(1)).as("k")).persist()
    val model = perDoc.groupBy(col("prev"), col("cur")).agg(sum(col("k")).as("cnt"))
    val prefix = model.groupBy(col("prev")).agg(sum(col("cnt")).as("pcnt"))
    val bits = model.join(prefix, Seq("prev"))
      .select(col("prev"), col("cur"),
        (length(bin(col("pcnt"))) - length(bin(col("cnt")))).cast("long").as("bits"))
    perDoc.join(bits, Seq("prev", "cur"))
      .groupBy(col("doc_id"))
      .agg(sum(col("k")).as("n_bigrams"),
        sum(col("k") * col("bits")).as("sum_bits"),
        max(col("bits")).as("max_bits"))
      .select(col("doc_id"), col("n_bigrams"),
        (col("sum_bits") / col("n_bigrams")).as("mean_bits"), col("max_bits"))
  }

  private def t14(s: SparkSession, dir: String): DataFrame =
    bigramSurprise(Tables.documents(s, dir).select(col("doc_id"), col("text")))

  private val t14Sql =
    """WITH w AS (
      |  SELECT doc_id, list_filter(string_split(text,' '), x -> len(x) > 0) AS w
      |  FROM documents),
      |bg AS (
      |  SELECT doc_id, unnest(w[1:-2]) AS prev, unnest(w[2:-1]) AS cur
      |  FROM w WHERE len(w) >= 2),
      |pd AS (SELECT doc_id, prev, cur, count(*) AS k FROM bg GROUP BY 1, 2, 3),
      |m AS (SELECT prev, cur, sum(k) AS cnt FROM pd GROUP BY 1, 2),
      |p AS (SELECT prev, sum(cnt) AS pcnt FROM m GROUP BY 1),
      |b AS (
      |  SELECT m.prev, m.cur,
      |    CAST(length(bin(p.pcnt)) - length(bin(m.cnt)) AS BIGINT) AS bits
      |  FROM m JOIN p USING (prev))
      |SELECT pd.doc_id, CAST(sum(pd.k) AS BIGINT) AS n_bigrams,
      |  sum(pd.k * b.bits) / sum(pd.k) AS mean_bits, max(b.bits) AS max_bits
      |FROM pd JOIN b USING (prev, cur)
      |GROUP BY 1""".stripMargin

  private val t13Sql =
    """WITH tk AS (
      |  SELECT doc_id, unnest(list_filter(string_split(text,' '), x -> len(x) > 0)) AS tok
      |  FROM documents),
      |c AS (SELECT tok, count(*) AS cnt FROM tk GROUP BY 1),
      |tot AS (SELECT count(*) AS n_total FROM tk),
      |b AS (
      |  SELECT tok, CAST(length(bin(tot.n_total)) - length(bin(c.cnt)) AS BIGINT) AS bits
      |  FROM c, tot)
      |SELECT tk.doc_id, count(*) AS n_tokens,
      |  sum(b.bits) / count(*) AS mean_bits, max(b.bits) AS max_bits
      |FROM tk JOIN b USING (tok)
      |GROUP BY 1""".stripMargin

  // ---- t15: BM25 retrieval (corpus search / quality-ranked lookup) ----

  /** t15: BM25 top-k retrieval — the ranked-lookup step behind
    * dedup-audit "find me docs like this" queries and retrieval-based
    * decontamination. The query is CORPUS-DERIVED and deterministic: the
    * 8 highest-document-frequency terms of length ≥ 5 (ties by term), so
    * both engines reconstruct the identical query with no side channel.
    *
    * Scoring is Okapi BM25 (k1 = 1.2, b = 0.75) with the idf log2
    * QUANTIZED to whole bits, the t13/t14 trick: the Robertson ratio
    * (N − df + 0.5)/(df + 0.5) = (2N − 2df + 1)/(2df + 1) is floored by
    * exact integer division, clamped ≥ 1, and its binary bit-length is
    * the idf weight — pure integer arithmetic, ulp-exact in any engine,
    * where libm `ln` is not (DETERMINISM.md). The tf saturation term
    * stays in IEEE doubles with the formula mirrored token-for-token
    * (single int/int divisions and exact-binary or identically-parsed
    * constants; no transcendentals). Per-doc total = left-to-right fold
    * over the term-SORTED matches (the q41/s08 fixed-order-fold rule).
    *
    * Scale shape: one token shuffle builds tf; df and per-doc length both
    * derive from tf (no second corpus shuffle); the query-term frame is
    * LIMIT-8-capped so its broadcast is constant-size (the s07/s11
    * capped-broadcast contract — NOT a corpus-sized hint); corpus totals
    * ride one broadcast row (p11 contract); the final top-20 is a
    * distributed TakeOrderedAndProject, never a single-partition sort.
    * At 100 TB: linear scans, hash joins on (word) and (doc_id), and a
    * constant-size query — the classic sparse-retrieval shape.
    */
  /** t15 core over any (doc_id, text) frame — factored so tests can
    * plant corpora with hand-computable df/tf/idf-bits values.
    */
  private[graft] def bm25Retrieval(docs: DataFrame): DataFrame = {
    val tf = Tables.spread(docs)
      .select(col("doc_id"), explode(toks(col("text"))).as("word"))
      .groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).as("tf"))
      .persist()
    val dfreq = tf.groupBy(col("word")).agg(count(lit(1)).as("df"))
    val qterms = dfreq.filter(length(col("word")) >= 5)
      .orderBy(col("df").desc, col("word"))
      .limit(8)
    val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    val tot = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("tot_tokens"))
    val matched = tf.join(broadcast(qterms), "word")
      .join(dl, "doc_id")
      .crossJoin(broadcast(tot))
      .select(col("doc_id"), col("word"), bm25Sc.as("sc"))
    matched.groupBy(col("doc_id"))
      .agg(array_sort(collect_list(struct(col("word"), col("sc")))).as("ts"))
      .select(col("doc_id"), size(col("ts")).cast("long").as("n_terms"),
        expr("aggregate(ts, CAST(0.0 AS DOUBLE), (a, x) -> a + x.sc)").as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(20)
  }

  private def t15(s: SparkSession, dir: String): DataFrame =
    bm25Retrieval(Tables.documents(s, dir).select(col("doc_id"), col("text")))

  private lazy val t15Sql =
    s"""WITH tk AS (
      |  SELECT doc_id, unnest(list_filter(string_split(text,' '), x -> len(x) > 0)) AS word
      |  FROM documents),
      |tf AS (SELECT doc_id, word, count(*) AS tf FROM tk GROUP BY 1, 2),
      |dfq AS (SELECT word, count(*) AS df FROM tf GROUP BY 1),
      |qt AS (SELECT word, df FROM dfq WHERE len(word) >= 5
      |       ORDER BY df DESC, word LIMIT 8),
      |dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY 1),
      |tot AS (SELECT count(*) AS n_docs, sum(dl) AS tot_tokens FROM dl),
      |m AS (
      |  SELECT tf.doc_id, tf.word,
      |    ${bm25ScDuck("tf.tf", "qt.df", "dl.dl")} AS sc
      |  FROM tf JOIN qt USING (word) JOIN dl USING (doc_id) CROSS JOIN tot),
      |g AS (
      |  SELECT doc_id, list_sort(list(struct_pack(word := word, sc := sc))) AS ts
      |  FROM m GROUP BY 1)
      |SELECT doc_id, CAST(len(ts) AS BIGINT) AS n_terms,
      |  list_sum(list_transform(ts, x -> x.sc)) AS score
      |FROM g ORDER BY score DESC, doc_id LIMIT 20""".stripMargin

  // ---- t16: keyword-in-context snippets -------------------------------

  /** t16: KWIC snippet extraction — the "show me WHY this doc matched"
    * step a retrieval audit (t15) or a decontamination review (d11)
    * needs: for each document containing a query term, the ±2-token
    * window around the term's FIRST occurrence. Query terms are t15's
    * corpus-derived deterministic rule (top-8 document-frequency terms
    * of length ≥ 5) restated as the same sub-plan, the p13 composition
    * rule: shared declarations mirror as shared CTEs so they cannot
    * drift.
    *
    * Scale shape: the 8-row query-term frame rides a capped broadcast
    * into a row-local probe (`array_position` + `slice` per doc×term —
    * a constant 8× scan fanout, zero shuffles beyond the tiny df aggs
    * that pick the terms). Snippets never leave the row they came from.
    */
  private[graft] def kwicSnippets(docs0: DataFrame): DataFrame = {
    val docs = Tables.spread(docs0)
    val tf = docs
      .select(col("doc_id"), explode(toks(col("text"))).as("word"))
      .groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("tf"))
    val qterms = tf.groupBy(col("word")).agg(count(lit(1)).as("df"))
      .filter(length(col("word")) >= 5)
      .orderBy(col("df").desc, col("word"))
      .limit(8)
      .select(col("word"))
    val start = greatest(col("pos") - 2, lit(1L))
    val len = least(col("pos") + 2, size(col("w")).cast("long")) - start + 1
    docs.select(col("doc_id"), toks(col("text")).as("w"))
      .crossJoin(broadcast(qterms))
      .withColumn("pos", array_position(col("w"), col("word")))
      .filter(col("pos") > 0)
      .select(col("doc_id"), col("word"), col("pos"),
        array_join(slice(col("w"), start.cast("int"), len.cast("int")), " ").as("snippet"))
  }

  private def t16(s: SparkSession, dir: String): DataFrame =
    kwicSnippets(Tables.documents(s, dir).select(col("doc_id"), col("text")))

  private val t16Sql =
    """WITH tk AS (
      |  SELECT doc_id, unnest(list_filter(string_split(text,' '), x -> len(x) > 0)) AS word
      |  FROM documents),
      |tf AS (SELECT doc_id, word, count(*) AS tf FROM tk GROUP BY 1, 2),
      |dfq AS (SELECT word, count(*) AS df FROM tf GROUP BY 1),
      |qt AS (SELECT word FROM dfq WHERE len(word) >= 5
      |       ORDER BY df DESC, word LIMIT 8),
      |w AS (
      |  SELECT doc_id, list_filter(string_split(text,' '), x -> len(x) > 0) AS w
      |  FROM documents),
      |hit AS (
      |  SELECT w.doc_id, qt.word,
      |    CAST(coalesce(list_position(w.w, qt.word), 0) AS BIGINT) AS pos, w.w
      |  FROM w CROSS JOIN qt)
      |SELECT doc_id, word, pos,
      |  array_to_string(w[greatest(pos - 2, 1):least(pos + 2, len(w))], ' ') AS snippet
      |FROM hit WHERE pos > 0""".stripMargin

  // ---- t17: corpus boilerplate n-gram coverage ------------------------

  /** Boilerplate geometry: 5-token shingles, top-20 corpus-wide. */
  private val BoilN   = 5
  private val BoilTop = 20

  /** t17: boilerplate detection — the C4/CCNet cleaning step that drops
    * template text (nav bars, cookie banners, license footers): the
    * corpus's [[BoilTop]] most frequent [[BoilN]]-token shingles are
    * declared boilerplate, and each document reports what fraction of
    * its shingle positions they cover (the drop/keep signal). Distinct
    * from t12 (WITHIN-doc repetition): this flags text repeated ACROSS
    * documents.
    *
    * Tie rule at the top-K cutoff: (count DESC, gram ASC) — total, so
    * the boilerplate set is unique on both engines.
    *
    * Scale shape: one shuffle on the shingle string builds the frequency
    * table (map-side combine); the top-20 is an aggregate-then-limit
    * broadcast back into a map-side membership probe; the per-doc
    * rollup rides one doc_id exchange. Shingle fan-out is ≤ n_tokens
    * rows per doc — linear in corpus size.
    */
  private def t17(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.spread(Tables.documents(s, dir))
      .select(col("doc_id"), toks(lower(col("text"))).as("w"))
    // persisted (d25/d28's gram-stream discipline): the stream feeds the
    // top-K frequency aggregate AND the membership-probe join leg — un-
    // persisted, the tokenize + slice + concat_ws explode ran twice per
    // query. One 5-gram string per token position, memory-and-disk at
    // warehouse scale, against a full second tokenize+explode pass saved.
    val grams = docs
      .select(col("doc_id"),
        explode(when(size(col("w")) >= BoilN,
          transform(sequence(lit(0), size(col("w")) - BoilN),
            i => concat_ws(" ", slice(col("w"), i + 1, lit(BoilN)))))
          .otherwise(array().cast("array<string>"))).as("gram"))
      .persist()
    val top = grams.groupBy(col("gram")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("gram")).limit(BoilTop)
      .select(col("gram"), lit(1L).as("hit"))
    grams.join(broadcast(top), Seq("gram"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_grams"),
        sum(coalesce(col("hit"), lit(0L))).as("n_boiler"))
      .withColumn("boiler_ratio", col("n_boiler").cast("double") / col("n_grams"))
  }

  private val t17Sql =
    s"""WITH toksr AS (
       |  SELECT doc_id, list_filter(string_split(lower(text), ' '), t -> len(t) > 0) AS w
       |  FROM documents),
       |grams AS (
       |  SELECT doc_id, array_to_string(list_slice(w, i.i, i.i + ${BoilN - 1}), ' ') AS gram
       |  FROM toksr, LATERAL (SELECT unnest(range(1, len(w) - ${BoilN - 2})) AS i) i),
       |top AS (
       |  SELECT gram, 1 AS hit FROM (
       |    SELECT gram, count(*) AS n FROM grams GROUP BY 1
       |    ORDER BY n DESC, gram LIMIT $BoilTop)),
       |j AS (SELECT g.doc_id, t.hit FROM grams g LEFT JOIN top t USING (gram))
       |SELECT doc_id, count(*) AS n_grams,
       |  CAST(sum(coalesce(hit, 0)) AS BIGINT) AS n_boiler,
       |  CAST(CAST(sum(coalesce(hit, 0)) AS BIGINT) AS DOUBLE) / count(*) AS boiler_ratio
       |FROM j GROUP BY 1""".stripMargin

  // ---- t18: Zipf rank-frequency profile -------------------------------

  private val ZipfTop = 50

  /** t18: Zipf rank-frequency profile — the corpus vocabulary's top-50
    * (rank, word, count, cumulative mass fraction) curve: the
    * sanity-check behind tokenizer sizing (how much of the stream do K
    * types cover) and corpus-health checks (a broken scrape shows up as
    * a deformed head). Complements t09 (per-DOC OOV against a fixed
    * vocab): this is the corpus-level curve itself.
    *
    * Determinism: rank order is (count DESC, word ASC) — total; the
    * cumulative sum runs over that total order; cum_frac is one
    * long/long IEEE division against the exact corpus token total.
    *
    * Scale shape: one shuffle builds word counts (map-side combine);
    * the top-50 is aggregate-then-limit (TakeOrdered — no global sort);
    * the rank/cum-sum window runs over the LIMIT-bounded 50-row frame
    * (constant at any corpus size — not a corpus-wide single-partition
    * window); the 1-row total rides a broadcast.
    */
  private def t18(s: SparkSession, dir: String): DataFrame = {
    val counts = Tables.spread(Tables.documents(s, dir))
      .select(explode(toks(lower(col("text")))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).as("total"))
    val w = Window.orderBy(col("n").desc, col("word"))
    counts.orderBy(col("n").desc, col("word")).limit(ZipfTop)
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("cum_n",
        sum(col("n")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(total))
      .select(col("rank"), col("word"), col("n"),
        (col("cum_n").cast("double") / col("total")).as("cum_frac"))
  }

  private val t18Sql =
    s"""WITH c AS (
       |  SELECT word, count(*) AS n
       |  FROM (SELECT unnest(list_filter(string_split(lower(text), ' '), t -> len(t) > 0)) AS word
       |        FROM documents)
       |  GROUP BY 1),
       |tot AS (SELECT sum(n) AS total FROM c),
       |top AS (SELECT word, n FROM c ORDER BY n DESC, word LIMIT $ZipfTop),
       |r AS (
       |  SELECT word, n,
       |    CAST(row_number() OVER (ORDER BY n DESC, word) AS BIGINT) AS rank,
       |    sum(n) OVER (ORDER BY n DESC, word
       |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_n
       |  FROM top)
       |SELECT rank, word, n, CAST(cum_n AS DOUBLE) / total AS cum_frac
       |FROM r CROSS JOIN tot""".stripMargin

  // ---- t24: the BPE merge-training LOOP ------------------------------

  /** Merge iterations the trainer runs. Like s20's KmSteps Lloyd
    * loop, the step count is a config knob; three steps exercise
    * the full recurrence (selection feeds rewrite feeds next selection)
    * including a merged token competing in later pair statistics.
    */
  private[graft] val MergeSteps = 3

  /** Token delimiter / merge joiner for the delimited corpus-string
    * representation. Control characters: absent from any text the
    * corpus can contain (tokens are whitespace-split, so they cannot
    * contain 0x01/0x02 without the document carrying raw control bytes
    * — which t08's scrub gate rejects upstream in a real pipeline).
    */
  private[graft] val Sep    = "\u0001"
  private[graft] val Joiner = "\u0002"

  /** The corpus as one delimited token string per doc: 0x01-separated
    * lowercased whitespace tokens with leading/trailing delimiters, so
    * every token occurrence — first, last, merged — is addressable as
    * the exact substring `Sep tok Sep`. Zero-token docs become `SepSep`
    * and fall out of pair statistics naturally.
    */
  private[graft] def delimited(c: Column): Column =
    concat(lit(Sep), array_join(toks(lower(c)), Sep), lit(Sep))

  /** Adjacent-pair counts over a delimited corpus frame (doc_id, s) —
    * t10's statistic, but built ROW-LOCALLY (re-split the string, zip
    * each token with its successor) instead of t10's posexplode +
    * per-doc window: inside the training loop this runs once per merge
    * step, so the per-step cost must be one map-side-combined pair
    * aggregate and NOTHING else — no doc_id exchange, no window sort.
    * Docs with <2 tokens produce NULL (explode emits no rows).
    *
    * The token array materializes in its OWN projection before the
    * zip: higher-order functions evaluate interpreted, so an array
    * expression referenced inside a lambda body is RE-EVALUATED per
    * element — the first cut built pairs as `transform(sequence(...),
    * i -> (element_at(a, i), element_at(a, i+1)))` with `a` the
    * split+filter expression, re-tokenizing the document once per
    * token position: O(len²) per doc, measured 14 s at sf0.1 for what
    * is a 6-scan query. The two-slice zip references the materialized
    * column O(1) times per row (CollapseProject keeps the boundary —
    * split is not "cheap" and is referenced more than once).
    */
  private[graft] def stepPairs(corpus: DataFrame): DataFrame = {
    val w = col("w")
    corpus
      .select(filter(split(col("s"), Sep), t => length(t) > 0).as("w"))
      .select(explode(when(size(w) >= 2,
        arrays_zip(slice(w, lit(1), size(w) - 1), slice(w, lit(2), size(w) - 1)))).as("p"))
      .select(col("p.0").as("lhs"), col("p.1").as("rhs"))
      .groupBy(col("lhs"), col("rhs"))
      .agg(count(lit(1)).as("pair_n"))
  }

  /** Apply one selected merge (a 1-row (lhs, rhs) frame) to the
    * delimited corpus: every `Sep lhs Sep rhs Sep` occurrence becomes
    * the single token `lhs Joiner rhs`. `replace` rewrites occurrences
    * LEFT-TO-RIGHT, NON-OVERLAPPING, resuming after each replacement —
    * identical semantics in Spark (UTF8String.replace) and DuckDB — so
    * back-to-back occurrences sharing a delimiter (x y x y; x x x)
    * leave every second one untouched in one pass, and a SECOND pass
    * catches exactly those (after pass one, two adjacent unmerged
    * occurrences cannot remain, since pass one would have matched at
    * the second). The two-pass composition IS the operator's defined
    * semantics — deterministic, engine-mirrored, and equal to greedy
    * BPE merging except on chained self-overlapping runs, where it
    * merges the same token multiset at shifted positions.
    */
  private[graft] def applyMerge(corpus: DataFrame, b: DataFrame): DataFrame = {
    val pat = concat(lit(Sep), col("lhs"), lit(Sep), col("rhs"), lit(Sep))
    val rep = concat(lit(Sep), col("lhs"), lit(Joiner), col("rhs"), lit(Sep))
    corpus.crossJoin(broadcast(b.select(col("lhs"), col("rhs"))))
      .withColumn("s", replace(replace(col("s"), pat, rep), pat, rep))
      .drop("lhs", "rhs")
  }

  /** t24: the BPE MERGE-TRAINING LOOP — the iterative trainer t10's
    * one-shot statistic feeds: [[MergeSteps]] rounds of (count adjacent
    * pairs → select the most frequent, ties lexicographic → merge every
    * occurrence corpus-wide), emitting one row per round with the
    * selected pair, its count at selection time, and the corpus token
    * count after the rewrite — the merge table IS the trained tokenizer
    * artifact. The text-family twin of s20's Lloyd loop: train-step
    * machinery composed into an actual multi-step trainer.
    *
    * Scale shape: per step, ONE map-side-combined pair aggregate over
    * the corpus (shuffle keys are pairs — high-cardinality, unskewed
    * after lowercasing), a TakeOrdered top-1 persisted and FORCED (the
    * s20 per-step-codebook discipline: the tiny artifact caches; the
    * corpus frame stays lazy, its rewrite chain replaying row-locally
    * under the cached 1-row broadcasts), and a row-local string
    * rewrite. The corpus never shuffles for the rewrite and no
    * doc-keyed window exists anywhere in the loop.
    *
    * Determinism: counts are integers; selection ties break (pair_n
    * DESC, lhs, rhs) — pure-ASCII collation; the rewrite is the exact
    * two-pass `replace` contract mirrored in [[applyMerge]]'s doc.
    */
  /** The training recurrence, factored for t24 (reports the merge
    * table) and t25 (freezes it and encodes held-out text): per step,
    * the forced 1-row selection and the lazily-rewritten corpus.
    */
  private[graft] def mergeChain(docs0: DataFrame): Seq[(DataFrame, DataFrame)] = {
    // Each step's corpus is PERSISTED: step k's rewritten corpus is read
    // by step k+1's pair aggregate AND by the caller's per-step reports
    // (t24's tokens_after, t25/es25's encode) — un-persisted, step k's
    // consumer replayed the whole k-deep tokenize+replace chain from the
    // raw scan, so the loop re-did O(steps²) rewrites (measured round 17:
    // six ~0.2-0.3 s chain-replay stages per t24 run). Persisting keeps
    // each rewrite pass run-once — the same materialize-per-iteration
    // discipline every production BPE trainer uses (and s20's per-step
    // codebook rule applied to the corpus side). Memory: ≤ MergeSteps
    // delimited-corpus copies, MEMORY_AND_DISK by default, swept by the
    // caller's lifecycle (bench sweep / session end).
    // NOT spread (round-17 measurement): the per-step corpora are tiny
    // cached frames consumed by six sequential 1-row aggregates — a
    // parallelism floor here added a scheduling wave per step and
    // measured t24 1.67 s → 2.41 s, t25 1.47 s → 1.82 s at sf0.1.
    var corpus = docs0.persist()
    (1 to MergeSteps).map { _ =>
      val b = stepPairs(corpus)
        .orderBy(col("pair_n").desc, col("lhs"), col("rhs")).limit(1).persist()
      b.count() // force: the step's one corpus aggregate runs exactly here
      corpus = applyMerge(corpus, b).persist()
      (b, corpus)
    }
  }

  /** Delimited token count per row of a (doc_id, s) frame. */
  private def tokenCount(c: Column): Column =
    size(filter(split(c, Sep), t => length(t) > 0)).cast("long")

  private def t24(s: SparkSession, dir: String): DataFrame = {
    val docs0 = Tables.documents(s, dir)
      .select(col("doc_id"), delimited(col("text")).as("s"))
    mergeChain(docs0).zipWithIndex.map { case ((b, corpus), k0) =>
      val tc = corpus.agg(sum(tokenCount(col("s"))).as("tokens_after"))
      b.select(lit((k0 + 1).toLong).as("step"), col("lhs"), col("rhs"), col("pair_n"))
        .crossJoin(tc)
    }.reduce(_ unionByName _)
  }

  /** One oracle merge round: pairs p$k from the delimited corpus
    * s${k-1}, top-1 b$k, rewritten corpus s$k (the literal two-pass
    * replace), post-rewrite token count tc$k.
    */
  private def t24StepSql(k: Int): String = {
    val in = s"s${k - 1}"
    val pat = s"chr(1) || b.lhs || chr(1) || b.rhs || chr(1)"
    val rep = s"chr(1) || b.lhs || chr(2) || b.rhs || chr(1)"
    s"""p$k AS (
       |  SELECT d.w[x.i] AS lhs, d.w[x.i + 1] AS rhs, count(*) AS pair_n
       |  FROM (SELECT list_filter(string_split(s, chr(1)), t -> len(t) > 0) AS w FROM $in) d,
       |    LATERAL (SELECT unnest(range(1, coalesce(len(d.w), 0))) AS i) x
       |  GROUP BY 1, 2),
       |b$k AS (SELECT lhs, rhs, pair_n FROM p$k ORDER BY pair_n DESC, lhs, rhs LIMIT 1),
       |s$k AS (
       |  SELECT doc_id, replace(replace(t.s, $pat, $rep), $pat, $rep) AS s
       |  FROM $in t CROSS JOIN b$k b),
       |tc$k AS (
       |  SELECT CAST(sum(len(list_filter(string_split(s, chr(1)), t -> len(t) > 0))) AS BIGINT)
       |    AS tokens_after FROM s$k)""".stripMargin
  }

  /** The delimited-corpus-string projection in DuckDB, optionally
    * filtered — t24 trains on the whole table, t25 on the non-delta
    * split only.
    */
  private def delimitedSql(where: String): String =
    s"""SELECT doc_id,
       |    chr(1) || array_to_string(list_filter(string_split(lower(text), ' '),
       |      t -> len(t) > 0), chr(1)) || chr(1) AS s
       |  FROM documents$where""".stripMargin

  private val t24Sql = {
    val steps = (1 to MergeSteps).map(t24StepSql).mkString(",\n")
    val rows = (1 to MergeSteps).map(k =>
      s"SELECT CAST($k AS BIGINT) AS step, lhs, rhs, pair_n, tokens_after FROM b$k, tc$k")
      .mkString("\nUNION ALL\n")
    s"""WITH s0 AS (
       |  ${delimitedSql("")}),
       |$steps
       |$rows""".stripMargin
  }

  /** t25: ENCODE with a FROZEN merge table — the serving leg of t24's
    * training loop, split the d22 way: the tokenizer trains on the
    * corpus side (doc_id % 10 <> 0) and the day's delta docs are
    * encoded with those merges AS TRAINED, never re-fit (the
    * train/serve contract a production tokenizer keeps — re-fitting on
    * the delta would drift the vocabulary shard by shard). One row per
    * delta doc: raw and encoded token counts, occurrences merged, and
    * the compression ratio a capacity planner reads.
    *
    * Scale shape: training is t24's loop over the corpus split; the
    * encode itself is a PURE ROW-LOCAL fold — MergeSteps chained
    * replace() rewrites under the cached 1-row broadcasts — so the
    * delta never shuffles at all (both token counts project from the
    * same row). Work ∝ corpus (train, amortized across ingests in
    * production) + |Δ| (encode).
    *
    * Determinism: counts are integers; ratio is one long/long IEEE
    * division, NULL-guarded for zero-token docs (rule 15 covers the
    * rewrite; DETERMINISM.md rule 3 the division).
    */
  /** Frozen-merge training over a raw documents-shaped frame: the
    * forced 1-row merge selections, in training order. Shared by t25
    * and es25 (the streaming encode trains once, before the stream).
    */
  private[graft] def trainMergesOn(docs: DataFrame): Seq[DataFrame] =
    mergeChain(docs.select(col("doc_id"), delimited(col("text")).as("s"))).map(_._1)

  /** Per-doc encode report of a raw documents-shaped frame under a
    * FROZEN merge table — a pure row-local fold (t25's serving kernel,
    * also es25's per-micro-batch body; one definition, no drift).
    */
  private[graft] def encodeReport(delta: DataFrame, merges: Seq[DataFrame]): DataFrame = {
    val d0 = delta.select(col("doc_id"), delimited(col("text")).as("s"))
      .withColumn("n_raw", tokenCount(col("s")))
    val enc = merges.foldLeft(d0)(applyMerge)
    enc.select(col("doc_id"), col("n_raw"), tokenCount(col("s")).as("n_enc"))
      .select(col("doc_id"), col("n_raw"), col("n_enc"),
        (col("n_raw") - col("n_enc")).as("n_merged"),
        when(col("n_raw") > 0, col("n_enc") / col("n_raw")).as("ratio"))
  }

  private def t25(s: SparkSession, dir: String): DataFrame = {
    val isDelta = col("doc_id") % 10 === 0
    val merges = trainMergesOn(Tables.documents(s, dir).filter(!isDelta))
    encodeReport(Tables.documents(s, dir).filter(isDelta), merges)
  }

  /** Shared with es25 (the same frozen-merge encode run live — the
    * stateless stream emits exactly the batch report).
    */
  private[graft] val t25Sql = {
    val steps = (1 to MergeSteps).map(t24StepSql).mkString(",\n")
    val encs = (1 to MergeSteps).map { k =>
      val pat = s"chr(1) || b.lhs || chr(1) || b.rhs || chr(1)"
      val rep = s"chr(1) || b.lhs || chr(2) || b.rhs || chr(1)"
      s"""e$k AS (
         |  SELECT doc_id, n_raw, replace(replace(t.s, $pat, $rep), $pat, $rep) AS s
         |  FROM e${k - 1} t CROSS JOIN b$k b)""".stripMargin
    }.mkString(",\n")
    val nEnc = "CAST(len(list_filter(string_split(s, chr(1)), t -> len(t) > 0)) AS BIGINT)"
    s"""WITH s0 AS (
       |  ${delimitedSql(" WHERE doc_id % 10 <> 0")}),
       |$steps,
       |e0 AS (
       |  SELECT doc_id, $nEnc AS n_raw, s FROM (
       |  ${delimitedSql(" WHERE doc_id % 10 = 0")})),
       |$encs
       |SELECT doc_id, n_raw, $nEnc AS n_enc, n_raw - $nEnc AS n_merged,
       |  CASE WHEN n_raw > 0 THEN $nEnc / n_raw END AS ratio
       |FROM e$MergeSteps""".stripMargin
  }

  override def defs: Seq[QueryDef] = Seq(
    QueryDef("t01_token_stats", t01, Some(t01Sql)),
    QueryDef("t02_quality_score", t02, Some(t02Sql)),
    QueryDef("t03_langid", t03, Some(t03Sql)),
    QueryDef("t04_fingerprint", t04, Some(t04Sql)),
    QueryDef("t05_tf_df", t05, Some(t05Sql)),
    QueryDef("t06_bpe_tokens", t06, Some(t06Sql)),
    QueryDef("t07_rolling_hash", t07, Some(t07Sql)),
    QueryDef("t08_scrub", t08, Some(t08Sql)),
    QueryDef("t09_vocab_coverage", t09, Some(t09Sql)),
    QueryDef("t10_bigram_pairs", t10, Some(t10Sql)),
    QueryDef("t11_token_chunks", t11, Some(t11Sql)),
    QueryDef("t12_repetition", t12, Some(t12Sql)),
    QueryDef("t13_unigram_surprise", t13, Some(t13Sql)),
    QueryDef("t14_bigram_surprise", t14, Some(t14Sql)),
    QueryDef("t15_bm25_retrieval", t15, Some(t15Sql)),
    QueryDef("t16_kwic_snippets", t16, Some(t16Sql)),
    QueryDef("t17_boilerplate", t17, Some(t17Sql)),
    QueryDef("t18_zipf_profile", t18, Some(t18Sql)),
    QueryDef("t19_shard_stitch", t19, Some(t19Sql)),
    QueryDef("t20_langid_confusion", t20, Some(t20Sql)),
    QueryDef("t21_readability", t21, Some(t21Sql)),
    QueryDef("t22_heaps_curve", t22, Some(t22Sql)),
    QueryDef("t23_pii_density", t23, Some(t23Sql)),
    QueryDef("t24_bpe_merge_loop", t24, Some(t24Sql)),
    QueryDef("t25_merge_encode", t25, Some(t25Sql)),
  )

  /** t20: language-ID confusion audit — cross-tabulate the declared
    * `lang` label against t03's n-gram prediction: per (declared,
    * predicted) cell, the doc count and its per-mille-of-a-million share
    * of the declared language's corpus. The label-quality report a
    * pipeline runs before trusting either column for filtering: a hot
    * off-diagonal cell is a mislabeled source (or a classifier gap)
    * localized to one language pair.
    *
    * Composes t03 VERBATIM (same plan, same oracle text as a CTE), so
    * the audit cannot drift from the classifier it audits. Scale shape:
    * the classifier is row-local scan work; the cross-tab is one hash
    * aggregate on a ≤ |langs|² cell space, share arithmetic is integer
    * floor division — bit-free on both engines.
    */
  private def t20(s: SparkSession, dir: String): DataFrame = {
    val pred = t03(s, dir).select(col("lang"), col("pred_lang"))
    val conf = pred.groupBy(col("lang"), col("pred_lang")).agg(count(lit(1)).as("n"))
    val tot = pred.groupBy(col("lang")).agg(count(lit(1)).as("n_lang"))
    conf.join(tot, "lang")
      .select(col("lang"), col("pred_lang"), col("n"), col("n_lang"),
        expr("n * 1000000 DIV n_lang").as("share_ppm"))
  }

  private val t20Sql =
    s"""WITH t03 AS ($t03Sql),
       |conf AS (SELECT lang, pred_lang, count(*) AS n FROM t03 GROUP BY 1, 2),
       |tot AS (SELECT lang, count(*) AS n_lang FROM t03 GROUP BY 1)
       |SELECT conf.lang, conf.pred_lang, conf.n, tot.n_lang,
       |  conf.n * 1000000 // tot.n_lang AS share_ppm
       |FROM conf JOIN tot USING (lang)""".stripMargin

  // ---- t19: shard-stitch (document continuation) detection ------------

  /** Overlap-key width. A production stitcher keys on ~50-token
    * overlaps; 3 here so this vocabulary actually produces matches.
    * The cap bounds join fanout when an overlap key is boilerplate
    * (the d03 DfCap rule) — far above this corpus's max key frequency,
    * so the oracle mirrors it structurally without being data-binding.
    */
  private val StitchK   = 3
  private val StitchCap = 100L

  /** t19: shard-stitch detection — find document pairs where A's token
    * SUFFIX equals B's token PREFIX: the signature of one source
    * document split across scrape shards (truncated page + continuation)
    * that should be re-joined before training. The repair step d09/d12
    * don't cover: they find REPEATED content; this finds SPLIT content.
    *
    * Scale shape: each doc contributes one (suffix, prefix) key row —
    * corpus-linear; candidates come from ONE equi-join on the overlap
    * key (never all-pairs); boilerplate keys above [[StitchCap]] are
    * dropped before the join bounds fanout.
    */
  private def t19(s: SparkSession, dir: String): DataFrame = {
    val keys = Tables.spread(Tables.documents(s, dir))
      .select(col("doc_id"), toks(col("text")).as("w"))
      .filter(size(col("w")) >= StitchK)
      .select(col("doc_id"),
        concat_ws(" ", slice(col("w"), -StitchK, StitchK)).as("suf"),
        concat_ws(" ", slice(col("w"), 1, StitchK)).as("pre"))
    val allowed = keys.groupBy(col("pre").as("k")).agg(count(lit(1)).as("c"))
      .filter(col("c") <= StitchCap).select(col("k"))
    keys.select(col("doc_id").as("ida"), col("suf"))
      .join(allowed, col("suf") === col("k")).drop("k")
      .join(keys.select(col("doc_id").as("idb"), col("pre")), col("suf") === col("pre"))
      .filter(col("ida") =!= col("idb"))
      .select(col("ida"), col("idb"), col("suf").as("overlap_key"))
  }

  private val t19Sql =
    s"""WITH w AS (
       |  SELECT doc_id, list_filter(string_split(text, ' '), x -> len(x) > 0) AS w
       |  FROM documents),
       |keys AS (
       |  SELECT doc_id,
       |    array_to_string(w[len(w) - ${StitchK - 1}:len(w)], ' ') AS suf,
       |    array_to_string(w[1:$StitchK], ' ') AS pre
       |  FROM w WHERE len(w) >= $StitchK),
       |allowed AS (
       |  SELECT pre AS k FROM keys GROUP BY 1 HAVING count(*) <= $StitchCap)
       |SELECT a.doc_id AS ida, b.doc_id AS idb, a.suf AS overlap_key
       |FROM keys a
       |JOIN allowed ON a.suf = allowed.k
       |JOIN keys b ON a.suf = b.pre AND a.doc_id <> b.doc_id""".stripMargin

  /** t21: readability profile — per (lang, source): word, sentence and
    * syllable-proxy counts plus words/sentence, syllables/word, and the
    * Flesch reading-ease score 206.835 − 1.015·(W/S) − 84.6·(Y/W)
    * (Flesch 1948; the audience-level audit a corpus card publishes
    * next to p19's quality quantiles — children's text, prose, and
    * legal/technical scrape separate cleanly on this one number).
    * Sentences are counted as maximal [.!?]+ runs and syllables as
    * maximal vowel-group runs [aeiouy]+ — the standard cheap proxies;
    * both regexes are backtracking-free character classes that Java and
    * DuckDB's regex engines match identically (the t06 precedent).
    *
    * Determinism: the three counts are exact per-row integers summed as
    * longs; the two ratios are int/int IEEE divisions (zero-guarded via
    * greatest(·,1)); the Flesch expression is the same left-associated
    * chain of literals in both engines — bit-equal with no rounding.
    *
    * Scale shape: row-local regexp counting inside whole-stage codegen
    * (scan-speed over 100 TB), then ONE (lang, source) hash aggregate
    * with map-side combine. No joins, no windows, no broadcast.
    */
  private def t21(s: SparkSession, dir: String): DataFrame = {
    val wps = col("n_words").cast("double") /
      greatest(col("n_sentences"), lit(1L)).cast("double")
    val spw = col("n_syllables").cast("double") /
      greatest(col("n_words"), lit(1L)).cast("double")
    Tables.documents(s, dir)
      .select(col("lang"), col("source"),
        size(toks(col("text"))).cast("long").as("w"),
        regexp_count(col("text"), lit("[.!?]+")).cast("long").as("sen"),
        regexp_count(lower(col("text")), lit("[aeiouy]+")).cast("long").as("syl"))
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("w")).as("n_words"),
        sum(col("sen")).as("n_sentences"), sum(col("syl")).as("n_syllables"))
      .select(col("lang"), col("source"), col("n_docs"), col("n_words"),
        col("n_sentences"), col("n_syllables"),
        wps.as("words_per_sentence"), spw.as("syllables_per_word"),
        (lit(206.835) - lit(1.015) * wps - lit(84.6) * spw).as("flesch"))
  }

  private val t21Sql =
    """WITH c AS (
      |  SELECT lang, source,
      |    CAST(len(list_filter(string_split(text, ' '), x -> len(x) > 0)) AS BIGINT) AS w,
      |    CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT) AS sen,
      |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT) AS syl
      |  FROM documents),
      |g AS (
      |  SELECT lang, source, count(*) AS n_docs,
      |    CAST(sum(w) AS BIGINT) AS n_words,
      |    CAST(sum(sen) AS BIGINT) AS n_sentences,
      |    CAST(sum(syl) AS BIGINT) AS n_syllables
      |  FROM c GROUP BY 1, 2)
      |SELECT lang, source, n_docs, n_words, n_sentences, n_syllables,
      |  CAST(n_words AS DOUBLE) / CAST(greatest(n_sentences, 1) AS DOUBLE) AS words_per_sentence,
      |  CAST(n_syllables AS DOUBLE) / CAST(greatest(n_words, 1) AS DOUBLE) AS syllables_per_word,
      |  206.835 - 1.015 * (CAST(n_words AS DOUBLE) / CAST(greatest(n_sentences, 1) AS DOUBLE))
      |          - 84.6 * (CAST(n_syllables AS DOUBLE) / CAST(greatest(n_words, 1) AS DOUBLE)) AS flesch
      |FROM g""".stripMargin

  /** t22: vocabulary-growth (Heaps' law) curve — cumulative token count
    * and cumulative DISTINCT-vocabulary size at ten doc_id-ordered
    * corpus prefixes. The "does vocab growth flatten" curve that sizes
    * a subword tokenizer's merge budget and detects corpus-composition
    * shifts mid-ingest (a new source bends the curve upward); read next
    * to t18's Zipf profile — same law, other axis.
    *
    * Each token is attributed to its doc's decile bucket (pure integer
    * arithmetic on doc_id against the 1-row max broadcast); a word's
    * FIRST bucket is one min-aggregate; the ten cumulative sums come
    * from joining the ≤10-row bucket aggregates against a literal
    * 10-row frame (the p20 suffix-sum trick — no global window, no
    * per-prefix re-scan). Scale shape: one token shuffle for the vocab
    * min + one for the bucket counts, both map-side combined; empty
    * buckets still emit (0-filled) rows.
    */
  private def t22(s: SparkSession, dir: String): DataFrame = {
    val mx = Tables.documents(s, dir).groupBy().agg(max(col("doc_id")).as("mx"))
    val tk = Tables.spread(Tables.documents(s, dir)).crossJoin(broadcast(mx))
      .select(expr("least(9L, (doc_id * 10) DIV (mx + 1))").as("bkt"),
        explode(toks(col("text"))).as("tok"))
      .persist()
    val perBkt = tk.groupBy(col("bkt")).agg(count(lit(1)).as("n_toks"))
    val firstB = tk.groupBy(col("tok")).agg(min(col("bkt")).as("fb"))
      .groupBy(col("fb")).agg(count(lit(1)).as("n_new"))
    val frame = s.range(0, 10).select(col("id").as("bucket"))
    val cumT = frame.join(broadcast(perBkt), col("bkt") <= col("bucket"), "left")
      .groupBy(col("bucket"))
      .agg(coalesce(sum(col("n_toks")), lit(0L)).as("cum_tokens"))
    val cumV = frame.join(broadcast(firstB), col("fb") <= col("bucket"), "left")
      .groupBy(col("bucket"))
      .agg(coalesce(sum(col("n_new")), lit(0L)).as("cum_vocab"))
    cumT.join(cumV, "bucket")
  }

  private val t22Sql =
    """WITH mx AS (SELECT max(doc_id) AS mx FROM documents),
      |tk AS (
      |  SELECT least(9, (d.doc_id * 10) // (mx.mx + 1)) AS bkt,
      |    unnest(list_filter(string_split(d.text, ' '), x -> len(x) > 0)) AS tok
      |  FROM documents d CROSS JOIN mx),
      |pb AS (SELECT bkt, count(*) AS n_toks FROM tk GROUP BY 1),
      |fw AS (SELECT tok, min(bkt) AS fb FROM tk GROUP BY 1),
      |nf AS (SELECT fb, count(*) AS n_new FROM fw GROUP BY 1),
      |b AS (SELECT unnest(range(0, 10)) AS bucket),
      |ct AS (
      |  SELECT b.bucket, CAST(coalesce(sum(pb.n_toks), 0) AS BIGINT) AS cum_tokens
      |  FROM b LEFT JOIN pb ON pb.bkt <= b.bucket GROUP BY 1),
      |cv AS (
      |  SELECT b.bucket, CAST(coalesce(sum(nf.n_new), 0) AS BIGINT) AS cum_vocab
      |  FROM b LEFT JOIN nf ON nf.fb <= b.bucket GROUP BY 1)
      |SELECT ct.bucket, ct.cum_tokens, cv.cum_vocab
      |FROM ct JOIN cv USING (bucket)""".stripMargin

  /** t23: PII/denylist density report — per source: document and token
    * counts, hits for each of the three t08 patterns (denylist terms,
    * email, phone — the same [[ScrubPat]]/[[EmailPat]]/[[PhonePat]]
    * definitions, so the audit cannot drift from the scrubber it
    * audits), documents carrying ≥1 hit, and denylist hits per million
    * tokens. The privacy/compliance table a release review reads BEFORE
    * t08's scrub runs (which sources need it, how much text it will
    * touch); emails/phones count zero on this synthetic corpus by
    * construction — TextSpec pins those patterns on injected rows.
    *
    * Determinism: all counts exact integers; the ppm is exact integer
    * division hits·10⁶ DIV tokens. Scale shape: three row-local
    * codegen'd regexp counts + ONE source aggregate, no joins.
    */
  private def t23(s: SparkSession, dir: String): DataFrame = {
    def hits(pat: String): Column =
      size(regexp_extract_all(col("text"), lit(pat), lit(0))).cast("long")
    Tables.documents(s, dir)
      .select(col("source"),
        size(toks(col("text"))).cast("long").as("w"),
        hits(ScrubPat).as("dl"), hits(EmailPat).as("em"), hits(PhonePat).as("ph"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("w")).as("n_tokens"),
        sum(col("dl")).as("denylist_hits"),
        sum(col("em")).as("email_hits"),
        sum(col("ph")).as("phone_hits"),
        sum(when(col("dl") + col("em") + col("ph") > 0, 1L).otherwise(0L))
          .as("docs_with_hits"))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        col("denylist_hits"), col("email_hits"), col("phone_hits"),
        col("docs_with_hits"),
        expr("denylist_hits * 1000000 DIV greatest(n_tokens, 1)").as("denylist_ppm"))
  }

  private val t23Sql = {
    // single-quoted SQL literals of the shared Java/RE2-common patterns —
    // DuckDB string literals keep backslashes verbatim (the t08 precedent),
    // so only quotes need escaping
    val dl = ScrubPat.replace("'", "''")
    val em = EmailPat.replace("'", "''")
    val ph = PhonePat.replace("'", "''")
    s"""WITH c AS (
       |  SELECT source,
       |    CAST(len(list_filter(string_split(text, ' '), x -> len(x) > 0)) AS BIGINT) AS w,
       |    CAST(len(regexp_extract_all(text, '$dl')) AS BIGINT) AS dl,
       |    CAST(len(regexp_extract_all(text, '$em')) AS BIGINT) AS em,
       |    CAST(len(regexp_extract_all(text, '$ph')) AS BIGINT) AS ph
       |  FROM documents)
       |SELECT source, count(*) AS n_docs, CAST(sum(w) AS BIGINT) AS n_tokens,
       |  CAST(sum(dl) AS BIGINT) AS denylist_hits,
       |  CAST(sum(em) AS BIGINT) AS email_hits,
       |  CAST(sum(ph) AS BIGINT) AS phone_hits,
       |  CAST(sum(CASE WHEN dl + em + ph > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_hits,
       |  CAST(sum(dl) AS BIGINT) * 1000000 // greatest(CAST(sum(w) AS BIGINT), 1) AS denylist_ppm
       |FROM c GROUP BY 1""".stripMargin
  }
}
