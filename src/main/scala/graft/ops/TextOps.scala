package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, document fingerprinting, quality scoring, language ID.
  *
  * All are narrow per-row transforms built from codegen'd built-in
  * functions (no UDFs): at 100 TB they run map-side inside one
  * whole-stage-codegen pipeline over the scan, shuffle-free.
  *
  * Every metric is DuckDB-reproducible: integer counts or single-division
  * ratios with identical operation order on both sides.
  */
object TextOps {

  /** Whitespace tokenization; empty/blank text → 0 tokens. */
  def tokenCount(text: Column): Column =
    when(trim(text) === "", 0)
      .otherwise(size(split(trim(text), "\\s+")))

  def tokenCountSql(text: String): String =
    s"CASE WHEN trim($text) = '' THEN 0 ELSE " +
      s"CAST(len(regexp_split_to_array(trim($text), '\\s+')) AS INTEGER) END"

  /** Word n-gram OCCURRENCES (non-distinct, in text order) — the
    * language-model counting shape, vs [[Dedup.shingles]]' distinct-set
    * shape for dedup. Same O(1)-per-position `get` assembly. */
  def ngramArray(text: Column, n: Int): Column = {
    val toks = split(trim(text), "\\s+")
    filter(
      transform(toks, (_, i) =>
        when(i <= size(toks) - n,
          concat_ws(" ", (0 until n).map(j => get(toks, i + j)): _*))),
      x => x.isNotNull)
  }

  /** Document fingerprint: md5 of the whitespace-normalized, lowercased
    * text — the canonical near-dup-resistant exact-dedup key.
    */
  def fingerprint(text: Column): Column =
    md5(lower(regexp_replace(trim(text), "\\s+", " ")))

  def fingerprintSql(text: String): String =
    s"md5(lower(regexp_replace(trim($text), '\\s+', ' ', 'g')))"

  /** # regex matches in text (Spark `regexp_count` ≡ DuckDB
    * `len(regexp_extract_all(...))`); patterns must be RE2-safe. */
  def matchCount(text: Column, pattern: String): Column =
    regexp_count(text, lit(pattern))

  def matchCountSql(text: String, pattern: String): String =
    s"len(regexp_extract_all($text, '$pattern'))"

  /** BPE-ish token count: alphabetic runs, digit runs, and single
    * non-space symbols — the pre-tokenization shape BPE vocabularies
    * split on (letters|digits|punctuation), as opposed to whitespace
    * tokens. RE2-safe, identical in Spark and DuckDB.
    */
  val bpeTokenPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  def bpeTokenCount(text: Column): Column =
    regexp_count(text, lit(bpeTokenPattern))

  def bpeTokenCountSql(text: String): String =
    s"len(regexp_extract_all($text, '$bpeTokenPattern'))"

  /** Document quality signals: mean word length, punctuation ratio,
    * alphabetic ratio, stopword ratio — each an integer-count pair
    * divided ONCE (identical arithmetic both engines). Rows with zero
    * tokens yield nulls (0/0 -> engine-consistent via NULLIF guard).
    */
  private val punctPattern = "[^A-Za-z0-9\\s]"
  private val alphaPattern = "[A-Za-z]"
  private val stopwordPattern = "\\b(the|a|an|and|of|to|is|in|it|that)\\b"

  def qualityScores(text: Column): Seq[(String, Column)] = {
    val toks = tokenCount(text)
    val chars = length(text)
    Seq(
      "n_tokens" -> toks,
      "mean_word_len" ->
        (length(regexp_replace(text, "\\s+", "")).cast("double") /
          nullif(toks, lit(0))),
      "punct_ratio" ->
        (regexp_count(text, lit(punctPattern)).cast("double") /
          nullif(chars, lit(0))),
      "alpha_ratio" ->
        (regexp_count(text, lit(alphaPattern)).cast("double") /
          nullif(chars, lit(0))),
      "stopword_ratio" ->
        (regexp_count(text, lit(stopwordPattern)).cast("double") /
          nullif(toks, lit(0))),
      // Repetition signal (the Gopher-style repeated-content filter):
      // fraction of tokens that are repeats of an earlier token. 0 for
      // all-distinct text, ->1 for boilerplate loops.
      "dup_token_frac" ->
        ((toks - size(array_distinct(split(trim(text), "\\s+"))))
          .cast("double") / nullif(toks, lit(0))))
  }

  def qualityScoresSql(text: String): Seq[(String, String)] = {
    val toks = tokenCountSql(text)
    Seq(
      "n_tokens" -> toks,
      "mean_word_len" ->
        s"CAST(len(regexp_replace($text, '\\s+', '', 'g')) AS DOUBLE) / nullif($toks, 0)",
      "punct_ratio" ->
        s"CAST(len(regexp_extract_all($text, '$punctPattern')) AS DOUBLE) / nullif(len($text), 0)",
      "alpha_ratio" ->
        s"CAST(len(regexp_extract_all($text, '$alphaPattern')) AS DOUBLE) / nullif(len($text), 0)",
      "stopword_ratio" ->
        s"CAST(len(regexp_extract_all($text, '$stopwordPattern')) AS DOUBLE) / nullif($toks, 0)",
      "dup_token_frac" ->
        (s"CAST($toks - len(list_distinct(regexp_split_to_array(trim($text), '\\s+'))) AS DOUBLE)" +
          s" / nullif($toks, 0)"))
  }

  /** Canonical text cleanup: NFC-normalize (custom codegen'd
    * [[graft.functions.NfcNormalize]] — Spark has no built-in), strip
    * non-whitespace control characters, collapse whitespace runs, trim.
    * Run before any hashing/dedup so byte-different but char-identical
    * crawl copies converge. Pure map-side, whole-stage-codegen.
    */
  private val ctrlPattern = "[\\x00-\\x08\\x0b-\\x1f\\x7f]"

  def cleanText(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(
        call_function(graft.functions.NfcNormalize.name, text),
        ctrlPattern, ""),
      "\\s+", " "))

  def cleanTextSql(text: String): String =
    s"trim(regexp_replace(regexp_replace(nfc_normalize($text), " +
      s"'$ctrlPattern', '', 'g'), '\\s+', ' ', 'g'))"

  /** Gopher-style intra-document repetition signals (Rae et al. 2021,
    * §A1.1 repetition filters) over word n-grams:
    *
    *  - `top{N}_frac`: fraction of n-gram characters covered by the
    *    single most frequent N-gram (`max(c·l) / sum(c·l)`),
    *  - `dup{M}_frac`: fraction of n-gram characters inside M-grams
    *    occurring more than once (`sum(c·l | c>1) / sum(c·l)`).
    *
    * This corpus is single-line (so the line/paragraph variants
    * degenerate); the n-gram variants are the discriminating ones.
    * All inputs to the two divisions are integer counts, so the
    * doubles are engine-exact.
    *
    * Scale shape: BOTH n-gram sizes are assembled and exploded from ONE
    * scan (a tagged (n, ngram) struct array — a union of two selects
    * would scan and repartition the corpus twice); the (id, n, ngram)
    * count is one partial-aggregated shuffle, the per-doc rollup a
    * second on the already doc-sized rows. No joins, no windows —
    * survives any corpus size.
    */
  def repetitionSignals(df: DataFrame, idCol: String, textCol: String,
      topN: Int = 2, dupN: Int = 5): DataFrame = {
    require(topN != dupN, "use distinct n for the top- and dup- signals")
    def tag(n: Int): Column =
      transform(ngramArray(col(textCol), n),
        g => struct(lit(n).as("n"), g.as("ngram")))
    val grams = df.filter(trim(col(textCol)) =!= "")
      .select(col(idCol), explode(concat(tag(topN), tag(dupN))).as("g"))
      .select(col(idCol), col("g.n").as("n"), col("g.ngram").as("ngram"))
    val counts = grams
      .groupBy(col(idCol), col("n"), col("ngram"))
      .agg(count(lit(1)).as("c"))
      .withColumn("cl", col("c") * length(col("ngram")))
    counts.groupBy(col(idCol))
      .agg(
        (max(when(col("n") === topN, col("cl"))).cast("double") /
          nullif(sum(when(col("n") === topN, col("cl"))), lit(0L)))
          .as(s"top${topN}_frac"),
        (coalesce(sum(when(col("n") === dupN && col("c") > 1, col("cl"))),
          lit(0L)).cast("double") /
          nullif(sum(when(col("n") === dupN, col("cl"))), lit(0L)))
          .as(s"dup${dupN}_frac"))
      .orderBy(idCol)
  }

  /** DuckDB list-comprehension n-gram twin of [[ngramArray]]. */
  private def ngramListSql(toks: String, n: Int): String =
    s"list_transform(generate_series(1, len($toks) - ${n - 1}), " +
      s"i -> array_to_string(list_slice($toks, i, i + ${n - 1}), ' '))"

  /** DuckDB twin of [[repetitionSignals]]. */
  def repetitionSignalsSql(table: String, id: String, text: String,
      topN: Int = 2, dupN: Int = 5): String =
    s"""WITH base AS (
  SELECT $id AS id, regexp_split_to_array(trim($text), '\\s+') AS toks
  FROM $table WHERE trim($text) <> ''),
g AS (
  SELECT id, $topN AS n, unnest(${ngramListSql("toks", topN)}) AS ngram
  FROM base
  UNION ALL
  SELECT id, $dupN AS n, unnest(${ngramListSql("toks", dupN)}) AS ngram
  FROM base),
c AS (
  SELECT id, n, ngram, CAST(count(*) AS BIGINT) AS c,
    CAST(count(*) AS BIGINT) * len(ngram) AS cl
  FROM g GROUP BY id, n, ngram)
SELECT id AS $id,
  CAST(max(CASE WHEN n = $topN THEN cl END) AS DOUBLE) /
    nullif(CAST(sum(CASE WHEN n = $topN THEN cl END) AS BIGINT), 0)
    AS top${topN}_frac,
  CAST(coalesce(CAST(sum(CASE WHEN n = $dupN AND c > 1 THEN cl END)
      AS BIGINT), 0) AS DOUBLE) /
    nullif(CAST(sum(CASE WHEN n = $dupN THEN cl END) AS BIGINT), 0)
    AS dup${dupN}_frac
FROM c GROUP BY id ORDER BY id"""

  /** PII scrubbing patterns, applied in order (emails and IPs first so
    * the generic digit-run rule cannot eat their digits). RE2-safe (no
    * backreferences or lookaround), so Spark's Java regex and DuckDB's
    * RE2 match the same spans. The digit-run rule stands in for the
    * id/phone/account-number class of scrub a real pipeline runs.
    */
  val piiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b", "<IP>"),
    ("digits", "[0-9]{2,}", "<NUM>"))

  /** Redact every PII pattern (map-side, codegen'd regexp_replace chain —
    * at 100 TB this is a pure scan-side rewrite, no shuffle). */
  def piiScrub(text: Column): Column =
    piiPatterns.foldLeft(text) { case (c, (_, p, r)) =>
      regexp_replace(c, p, r)
    }

  def piiScrubSql(text: String): String =
    piiPatterns.foldLeft(text) { case (c, (_, p, r)) =>
      s"regexp_replace($c, '$p', '$r', 'g')"
    }

  /** Per-pattern match counts over the ORIGINAL text (counted before any
    * replacement so the counts are order-independent; the scrub itself
    * applies patterns in sequence). */
  def piiCounts(text: Column): Seq[(String, Column)] =
    piiPatterns.map { case (name, p, _) =>
      s"n_$name" -> matchCount(text, p)
    }

  def piiCountsSql(text: String): Seq[(String, String)] =
    piiPatterns.map { case (name, p, _) =>
      s"n_$name" -> matchCountSql(text, p)
    }

  /** Winnowing document fingerprints (Schleimer et al., SIGMOD'03): a
    * Rabin–Karp rolling hash over byte k-grams, keeping the minimum hash
    * of every `window` consecutive k-grams (rightmost on ties). The
    * selected minima are a locality-preserving fingerprint set — edits
    * perturb only nearby fingerprints, so near-dup docs share most of
    * theirs. Runs as a batched mapPartitions (genuine per-row imperative
    * logic), no shuffle.
    *
    * Returns (id, fingerprints: sorted distinct array<long>).
    */
  def winnowingFingerprints(df: DataFrame, idCol: String, textCol: String,
      k: Int = 8, window: Int = 4): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val spark = df.sparkSession
    val rdd = df.select(col(idCol).cast("long"), col(textCol))
      .rdd.mapPartitions { rows =>
        val B = 257L
        val M = (1L << 61) - 1 // Mersenne prime modulus
        // (a*b) mod M without overflow: the 128-bit product is hi*2^64+lo
        // and 2^64 = 8 (mod 2^61-1), so a*b = hi*8 + top3(lo) + low61(lo).
        // All operands < M < 2^61, so hi < 2^58 and the sum stays < 2^63.
        def mulmod(a: Long, b: Long): Long = {
          val hi = Math.multiplyHigh(a, b)
          val lo = a * b
          var r = hi * 8 + (lo >>> 61) + (lo & M)
          while (r >= M) r -= M
          r
        }
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = Option(r.getString(1)).getOrElse("")
            .getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val n = bytes.length - k + 1
          val fps = scala.collection.mutable.SortedSet[Long]()
          if (n > 0) {
            // rolling k-gram hashes
            val hs = new Array[Long](n)
            var h = 0L
            var pow = 1L
            var i = 0
            while (i < k) {
              h = (mulmod(h, B) + (bytes(i) & 0xff)) % M
              if (i < k - 1) pow = mulmod(pow, B)
              i += 1
            }
            hs(0) = h
            i = 1
            while (i < n) {
              val drop = mulmod(bytes(i - 1) & 0xff, pow)
              h = (mulmod(h - drop + M, B) + (bytes(i + k - 1) & 0xff)) % M
              hs(i) = h
              i += 1
            }
            // winnow: min of each window, rightmost on ties
            var w0 = 0
            while (w0 <= n - window) {
              var mn = Long.MaxValue
              var pick = w0
              var j = w0
              while (j < w0 + window) {
                if (hs(j) <= mn) { mn = hs(j); pick = j }
                j += 1
              }
              fps += hs(pick)
              w0 += 1
            }
            if (n < window && n > 0) fps += hs.take(n).min
          }
          Row(id, fps.toSeq)
        }
      }
    spark.createDataFrame(rdd, StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("fingerprints", ArrayType(LongType, containsNull = false),
        nullable = false))))
  }

  /** Engine-portable winnowing twin (the md5-twin precedent of
    * [[Dedup.simhashMd5]] / minhashLshPortable): character k-grams over
    * the ASCII projection of the text, md5-prefix (32-bit, BIGINT-safe
    * on both engines) gram hashes, per-window minima, per-doc distinct
    * fingerprint set. The production path ([[winnowingFingerprints]])
    * stays byte-based with the rolling Karp–Rabin hash (one modular
    * multiply per position vs a cryptographic hash per gram) and
    * rows-only; this twin puts the WINNOWING machinery — gram
    * extraction, window-min selection, set semantics — under the
    * cross-engine hash gate. Tie-breaking (production picks the
    * rightmost minimum) cannot diverge here: tied positions share the
    * same hash VALUE, and the fingerprint set stores values, so the
    * selected set is tie-order-independent by construction.
    * Shape mirrors the q_winnow_fp projection: (id, n_fp, min_fp).
    */
  def winnowMd5(df: DataFrame, idCol: String, textCol: String,
      k: Int = 8, window: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.select(col(idCol).cast("long").as("id"),
        regexp_replace(col(textCol), "[^\\x20-\\x7e]", "").as("t"))
      .filter(length(col("t")) >= k)
    val grams = base.select(col("id"),
      posexplode(expr(
        s"transform(sequence(1, length(t) - ${k - 1}), i -> substring(t, i, $k))"))
        .as(Seq("pos", "g")))
    val perDoc = Window.partitionBy("id")
    val wmin = Window.partitionBy("id").orderBy("pos")
      .rowsBetween(-(window - 1), 0)
    grams
      .withColumn("h", conv(substring(md5(col("g")), 1, 8), 16, 10).cast("long"))
      .withColumn("n", count(lit(1)).over(perDoc))
      .withColumn("mn", min(col("h")).over(wmin))
      // full windows only — except a doc with fewer grams than the
      // window, whose LAST row's trailing frame covers every gram
      // (the production n<window fallback: min of all hashes).
      .filter(col("pos") >= window - 1 || col("pos") === col("n") - 1)
      .groupBy(col("id").as(idCol))
      .agg(countDistinct(col("mn")).as("n_fp"), min(col("mn")).as("min_fp"))
      .orderBy(idCol)
  }

  /** DuckDB oracle for [[winnowMd5]] — identical gram/hash/window-min
    * pipeline in SQL. */
  def winnowMd5Sql(table: String, id: String, text: String,
      k: Int = 8, window: Int = 4): String =
    s"""WITH base AS (
  SELECT $id AS id, regexp_replace($text, '[^\\x20-\\x7e]', '', 'g') AS t
  FROM $table
), g AS (
  SELECT id, i - 1 AS pos, length(t) - ${k - 1} AS n,
    CAST('0x' || substr(md5(substring(t, CAST(i AS INTEGER), $k)), 1, 8) AS BIGINT) AS h
  FROM base, unnest(range(1, length(t) - ${k - 2})) u(i)
  WHERE length(t) >= $k
), w AS (
  SELECT id, pos, n, min(h) OVER (PARTITION BY id ORDER BY pos
    ROWS BETWEEN ${window - 1} PRECEDING AND CURRENT ROW) AS mn
  FROM g
)
SELECT id AS $id, count(DISTINCT mn) AS n_fp, min(mn) AS min_fp
FROM w WHERE pos >= ${window - 1} OR pos = n - 1
GROUP BY id ORDER BY $id"""

  /** Stopword marker sets per language for the n-gram/stopword language
    * heuristic. Deterministic and tiny by design.
    */
  val langMarkers: Seq[(String, String)] = Seq(
    "en" -> "\\b(the|a|and|of|to|is|in)\\b",
    "de" -> "\\b(der|die|das|und|ist|nicht|ein)\\b",
    "fr" -> "\\b(le|la|les|et|est|une|dans)\\b",
    "es" -> "\\b(el|los|las|y|es|una|que)\\b")

  /** Non-ASCII character count — proxy score for CJK/other scripts. */
  val otherPattern = "[^\\x00-\\x7f]"

  /** Language-ID heuristic: argmax of per-language stopword hit counts,
    * ties broken by marker-list order, all-zero → 'unknown'.
    * Emitted as a when-chain so the DuckDB CASE mirror is exact.
    */
  def langScores(text: Column): Seq[(String, Column)] =
    langMarkers.map { case (l, p) => l -> matchCount(text, p) } :+
      ("other" -> matchCount(text, otherPattern))

  def langId(scoreCols: Seq[(String, Column)]): Column = {
    val names = scoreCols.map(_._1)
    val byName = scoreCols.toMap
    names.foldRight(lit("unknown")) { (l, els) =>
      val isMax = names.filter(_ != l)
        .map(o => byName(l) >= byName(o))
        .reduce(_ && _) && byName(l) > 0
      when(isMax, lit(l)).otherwise(els)
    }
  }

  def langIdSql(text: String): String = {
    val scores = (langMarkers.map { case (l, p) =>
      l -> matchCountSql(text, p)
    } :+ ("other" -> matchCountSql(text, otherPattern))).toMap
    val names = scores.keys.toSeq.sortBy(
      n => (langMarkers.map(_._1) :+ "other").indexOf(n))
    val whens = names.map { l =>
      val conds = names.filter(_ != l)
        .map(o => s"${scores(l)} >= ${scores(o)}")
        .mkString(" AND ")
      s"WHEN $conds AND ${scores(l)} > 0 THEN '$l'"
    }.mkString(" ")
    s"CASE $whens ELSE 'unknown' END"
  }

  /** Exact TF-IDF over whitespace tokens — the declarative twin of the
    * MLlib hashing pipeline ([[MlPipeline.tfidf]]), with real terms
    * instead of hash buckets so the result is engine-portable.
    * Per-term output: document frequency, total term frequency, and the
    * max per-doc tf-idf weight with smoothed idf
    * `ln((1 + N) / (1 + df))`.
    *
    * Scale shape: tokenize + explode run map-side; `tf` is one partial-
    * aggregated shuffle on (doc, term); `df` another on term. The
    * df-side of the join is vocabulary-sized and left UN-hinted — under
    * the broadcast threshold it broadcasts, past it (an open-web-scale
    * vocabulary) Spark degrades to a shuffled join on term, still
    * linear. The corpus size N is a broadcast one-row cross join, not a
    * driver-side collect, so the whole operator is one lazy plan.
    *
    * Float discipline: tf·idf is one IEEE multiply per row and the
    * per-term aggregates are `max` (order-independent) and integer sums
    * — no float summation order to diverge on. The one engine-unstable
    * step is `ln` itself (JVM Math.log and DuckDB's libm differ by
    * 1 ulp on some inputs — measured on this corpus), so the surfaced
    * score is rounded to 6 decimals on BOTH sides: each engine then
    * emits the nearest double to the same 6-decimal literal.
    */
  def tfidfExact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol).as("id"),
      explode(split(trim(col(textCol)), "\\s+")).as("term"))
    val tf = toks.groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val dfT = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val nDf = df.agg(count(lit(1)).as("n"))
    tf.join(dfT, "term")
      .crossJoin(broadcast(nDf))
      .groupBy(col("term"), col("df"))
      .agg(sum(col("tf")).as("total_tf"),
        round(max(col("tf") *
          log((lit(1.0) + col("n")) / (lit(1.0) + col("df")))), 6)
          .as("max_tfidf"))
      .orderBy("term")
  }

  /** Zipf power-law fit over the corpus term-frequency distribution:
    * closed-form least squares of log₁₀(count) on log₁₀(rank) over the
    * top-N terms — slope ≈ −1 is Zipfian; a much flatter slope flags a
    * synthetic/templated corpus, a steeper one a degenerate vocabulary.
    * One number summarizing "does this corpus look like natural
    * language", computed without collecting anything.
    *
    * Scale shape: tokenize+explode map-side, ONE partial-aggregated
    * shuffle on term, then TakeOrdered for the top-N — the rank window
    * and the Σx/Σy/Σxy/Σx² fold run on N rows, never the vocabulary.
    * The regression is closed-form inside the plan (no driver math, no
    * iterative solver).
    *
    * Float discipline: the only engine-unstable steps are log₁₀
    * (≤1 ulp across libms) and the N-term float sums (order differs
    * across engines), both absorbed by 6-decimal rounding of the two
    * surfaced coefficients — the q_tfidf_exact precedent.
    */
  def zipfFit(df: DataFrame, textCol: String, topN: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = df.select(
      explode(split(trim(col(textCol)), "\\s+")).as("term"))
    val top = toks.groupBy("term").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term")).limit(topN)
    // unpartitioned window over ≤ topN (post-limit) rows — benign
    val ranked = top.withColumn("rank",
      row_number().over(Window.orderBy(col("cnt").desc, col("term"))))
    val x = log10(col("rank").cast("double"))
    val y = log10(col("cnt").cast("double"))
    ranked
      .agg(count(lit(1)).cast("double").as("n"),
        sum(x).as("sx"), sum(y).as("sy"),
        sum(x * x).as("sxx"), sum(x * y).as("sxy"))
      .select(col("n"), col("sx"), col("sy"),
        ((col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx"))).as("m"))
      .select(col("n").cast("long").as("n_terms"),
        round(col("m"), 6).as("slope"),
        round((col("sy") - col("m") * col("sx")) / col("n"), 6)
          .as("intercept"))
  }

  /** DuckDB twin of [[zipfFit]] — same tokenization, ranking, and
    * closed-form arithmetic. */
  def zipfFitSql(table: String, text: String, topN: Int): String =
    s"""WITH toks AS (
  SELECT unnest(regexp_split_to_array(trim($text), '\\s+')) AS term
  FROM $table
), c AS (
  SELECT term, CAST(count(*) AS BIGINT) AS cnt FROM toks GROUP BY term
), top AS (
  SELECT cnt, row_number() OVER (ORDER BY cnt DESC, term) AS rank
  FROM c ORDER BY cnt DESC, term LIMIT $topN
), s AS (
  SELECT CAST(count(*) AS DOUBLE) AS n,
    sum(log10(rank)) AS sx, sum(log10(cnt)) AS sy,
    sum(log10(rank) * log10(rank)) AS sxx,
    sum(log10(rank) * log10(cnt)) AS sxy
  FROM top
)
SELECT CAST(n AS BIGINT) AS n_terms,
  round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
  round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 6)
    AS intercept
FROM s"""

  /** DuckDB twin of [[tfidfExact]]. */
  def tfidfExactSql(table: String, id: String, text: String): String =
    s"""WITH toks AS (
  SELECT $id AS id, unnest(regexp_split_to_array(trim($text), '\\s+')) AS term
  FROM $table
), tf AS (
  SELECT id, term, CAST(count(*) AS BIGINT) AS tf FROM toks GROUP BY id, term
), dfx AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term
), n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM $table)
SELECT term, df, CAST(sum(tf) AS BIGINT) AS total_tf,
  round(max(tf * ln((1.0 + n) / (1.0 + df))), 6) AS max_tfidf
FROM tf JOIN dfx USING (term) CROSS JOIN n
GROUP BY term, df ORDER BY term"""

  /** ADAPTIVE per-language quality thresholding (the FineWeb-style
    * pattern): instead of a fixed cutoff, each language's threshold is
    * the exact p-quantile of its own stopword-ratio distribution —
    * computed as an explicit ORDER STATISTIC (the floor(p·(n−1))-th
    * smallest, ties broken by id), never an interpolated quantile, so
    * the threshold is a VALUE from the data and bit-identical on any
    * engine. Docs at or above their language's threshold pass. Output:
    * per-language (n_docs, n_kept, thr).
    *
    * Scale note: the per-language rank is a window sort — the exact,
    * oracle-able formulation. At 100 TB the production path computes
    * the threshold with approx_percentile (the sketch-vs-exact error
    * harness is its own catalog entry) and only the threshold JOIN
    * stays; the window disappears. Null scores (token-less docs) sort
    * FIRST on both engines (pinned explicitly — DuckDB defaults NULLS
    * LAST) and never pass the `>=` comparison.
    */
  def adaptiveQualityFilter(df: DataFrame, idCol: String, textCol: String,
      langCol: String, p: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = qualityScores(col(textCol)).toMap.apply("stopword_ratio")
    val scored = df.select(col(idCol).as("id"), col(langCol).as("lang"),
      q.as("q"))
    val w = Window.partitionBy("lang")
      .orderBy(col("q").asc_nulls_first, col("id"))
    val ranked = scored
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("lang")))
    val thr = ranked
      .filter(col("rn") === floor(lit(p) * (col("n") - 1)).cast("long") + 1)
      .select(col("lang"), col("q").as("thr"))
    scored.join(thr, Seq("lang"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        count(when(col("q") >= col("thr"), 1)).as("n_kept"),
        max(col("thr")).as("thr"))
      .orderBy("lang")
  }

  /** DuckDB twin of [[adaptiveQualityFilter]] — same order statistic,
    * same NULLS FIRST rank, same `>=` pass test. */
  def adaptiveQualityFilterSql(table: String, id: String, text: String,
      lang: String, p: Double): String = {
    val q = qualityScoresSql(text).toMap.apply("stopword_ratio")
    s"""WITH scored AS (
  SELECT $id AS id, $lang AS lang, $q AS q FROM $table
), ranked AS (
  SELECT *, row_number() OVER
      (PARTITION BY lang ORDER BY q ASC NULLS FIRST, id) AS rn,
    count(*) OVER (PARTITION BY lang) AS n
  FROM scored
), thr AS (
  SELECT lang, q AS thr FROM ranked
  WHERE rn = CAST(floor(CAST($p AS DOUBLE) * (n - 1)) AS BIGINT) + 1)
SELECT s.lang AS lang, CAST(count(*) AS BIGINT) AS n_docs,
  CAST(count(CASE WHEN s.q >= t.thr THEN 1 END) AS BIGINT) AS n_kept,
  max(t.thr) AS thr
FROM scored s JOIN thr t ON s.lang = t.lang
GROUP BY s.lang ORDER BY lang"""
  }

  /** The PRODUCTION-PATH twin of [[adaptiveQualityFilter]]: per-language
    * thresholds via `percentile_approx` (a GK/KLL mergeable sketch that
    * aggregates map-side — ONE partial-agg shuffle of sketch bytes, no
    * per-language window sort), then a broadcast threshold join. This is
    * the 100 TB formulation the exact entry's scaladoc promises: the
    * window disappears; nothing data-sized is ever sorted.
    *
    * Guarantee: the sketch's returned value has RANK error ≤ n/accuracy,
    * so the kept set differs from the exact filter's by at most that
    * many docs per language (plus ties at the boundary) —
    * [[adaptiveQualityFilterBounds]] hash-gates exactly that contract.
    *
    * Null semantics (spec-PINNED in OpsSpec "null semantics PINNED"):
    * `percentile_approx` ignores null scores while the exact path ranks
    * them FIRST, so on a corpus with token-less docs the two thresholds
    * differ by exactly the null-count rank offset (the sketch's
    * threshold is invariant to adding/removing null-score docs; the
    * exact path's shifts). This is the divergence the production path
    * accepts in exchange for dropping the window sort. Same output
    * shape as the exact path: per-language (n_docs, n_kept, thr).
    */
  def adaptiveQualityFilterApprox(df: DataFrame, idCol: String,
      textCol: String, langCol: String, p: Double,
      accuracy: Int = 10000): DataFrame = {
    val q = qualityScores(col(textCol)).toMap.apply("stopword_ratio")
    val scored = df.select(col(idCol).as("id"), col(langCol).as("lang"),
      q.as("q"))
    val thr = scored.groupBy("lang")
      .agg(percentile_approx(col("q"), lit(p), lit(accuracy)).as("thr"))
    scored.join(broadcast(thr), Seq("lang"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        count(when(col("q") >= col("thr"), 1)).as("n_kept"),
        max(col("thr")).as("thr"))
      .orderBy("lang")
  }

  /** Guarantee-gate for [[adaptiveQualityFilterApprox]] (the
    * q_sketch_bounds precedent): per language, the approx threshold's
    * EXACT rank must bracket p within tol = 1/accuracy + 2/n (sketch
    * rank guarantee + discretization slack), and the approx-kept count
    * must sit within ceil(tol·n) + boundary ties of the exact-kept
    * count (the rank bound transported through `>= thr`, with ties at
    * either threshold absorbing the value-vs-rank ambiguity). The
    * engine-specific sketch VALUE stays out of the hashed output; the
    * exact threshold and the two CONTRACT booleans are what DuckDB
    * verifies.
    */
  def adaptiveQualityFilterBounds(df: DataFrame, idCol: String,
      textCol: String, langCol: String, p: Double,
      accuracy: Int = 10000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = qualityScores(col(textCol)).toMap.apply("stopword_ratio")
    val scored = df.select(col(idCol).as("id"), col(langCol).as("lang"),
      q.as("q"))
    val w = Window.partitionBy("lang")
      .orderBy(col("q").asc_nulls_first, col("id"))
    val thrE = scored
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("lang")))
      .filter(col("rn") === floor(lit(p) * (col("n") - 1)).cast("long") + 1)
      .select(col("lang"), col("q").as("thr_e"))
    val thrA = scored.groupBy("lang")
      .agg(percentile_approx(col("q"), lit(p), lit(accuracy)).as("thr_a"))
    val per = scored.join(broadcast(thrE.join(thrA, "lang")), Seq("lang"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("q") < col("thr_a"), 1L).otherwise(0L)).as("lt_a"),
        sum(when(col("q") <= col("thr_a"), 1L).otherwise(0L)).as("le_a"),
        sum(when(col("q") >= col("thr_a"), 1L).otherwise(0L)).as("kept_a"),
        sum(when(col("q") >= col("thr_e"), 1L).otherwise(0L)).as("kept_e"),
        sum(when(col("q") === col("thr_e"), 1L).otherwise(0L)).as("ties_e"),
        sum(when(col("q") === col("thr_a"), 1L).otherwise(0L)).as("ties_a"),
        max(col("thr_e")).as("thr_exact"))
    val tol = lit(1.0 / accuracy) + lit(2.0) / col("n")
    per.select(col("lang"), col("n").as("n_docs"), col("thr_exact"),
        (col("le_a") >= (lit(p) - tol) * col("n") &&
          col("lt_a") <= (lit(p) + tol) * col("n")).as("ok_rank"),
        (abs(col("kept_a") - col("kept_e")) <=
          ceil(tol * col("n")) + col("ties_e") + col("ties_a") + 2)
          .as("ok_drift"))
      .orderBy("lang")
  }

  /** DuckDB twin of [[adaptiveQualityFilterBounds]]: the exact
    * references (per-language n and the order-statistic threshold) are
    * recomputed exactly; the contract booleans are literal `true` —
    * the hash gate fails iff Spark's sketch broke its guarantee. */
  def adaptiveQualityFilterBoundsSql(table: String, id: String,
      text: String, lang: String, p: Double): String = {
    val q = qualityScoresSql(text).toMap.apply("stopword_ratio")
    s"""WITH scored AS (
  SELECT $id AS id, $lang AS lang, $q AS q FROM $table
), ranked AS (
  SELECT *, row_number() OVER
      (PARTITION BY lang ORDER BY q ASC NULLS FIRST, id) AS rn,
    count(*) OVER (PARTITION BY lang) AS n
  FROM scored)
SELECT lang, n AS n_docs, q AS thr_exact,
  true AS ok_rank, true AS ok_drift
FROM ranked
WHERE rn = CAST(floor(CAST($p AS DOUBLE) * (n - 1)) AS BIGINT) + 1
ORDER BY lang"""
  }

  /** Alphanumeric-run pre-tokenization for BPE training: every token is
    * regex-safe by construction (no escaping needed when a learned
    * symbol becomes a pattern), mirroring how production BPE trainers
    * split punctuation off before learning merges. */
  val bpeWordPattern = "[\\p{L}\\p{N}]+"

  /** BPE MERGE LEARNING over the corpus — the tokenizer-training
    * counterpart of [[bpeTokenCount]]'s pre-tokenization: learn the
    * first `k` merge rules (most frequent adjacent symbol pair per
    * round, greedily applied before the next round), exactly the
    * structure of production BPE trainers.
    *
    * Spark-first shape (and the 100 TB shape): ONE corpus-sized
    * shuffle builds the word-frequency table; every subsequent round
    * operates on that VOCAB-sized table only — pair counts are a
    * vocab-sized aggregate weighted by word frequency, the winning
    * pair is a 1-row collect, and the merge applies as one map-side
    * `regexp_replace` over the vocab. The corpus is never rescanned.
    * (The per-element HOF pair expansion is fine here precisely
    * because it runs over the vocab, not the corpus — the PLANS.md
    * interpreter-tax rule.)
    *
    * Determinism: ties break (count DESC, lhs ASC, rhs ASC) — byte
    * order equals codepoint order in UTF-8 on both engines. Merge
    * application is TWO non-overlapping left-to-right regex passes:
    * one pass's scan resumes after each match (consuming the shared
    * separator before a back-to-back occurrence), and a pass-1-skipped
    * occurrence is never adjacent to another skipped one, so the
    * second pass provably reaches the fixpoint — NO (lhs,rhs)
    * adjacency survives a round. Identical in Spark (Java regex) and
    * DuckDB (RE2). Deviation from canonical BPE: a run of the same
    * symbol pairs up every-other from the left, so odd/even run
    * interiors can group (and under-merge) differently than the
    * simultaneous-scan convention — spec-pinned.
    *
    * Output: one row per round — (merge_round, lhs, rhs, pair_count,
    * total_symbols), the last being the corpus-wide symbol count AFTER
    * applying that round's merge (Σ word_count · symbols-per-word, a
    * vocab-sized aggregate): the tokenizer's compression curve.
    */
  /** The shared BPE training loop: k greedy merge rounds over the word
    * frequency table. `perRound` observes each round's learned merge,
    * the SUM of all cnt-weighted pair counts over the round's PRE-merge
    * word table (see [[bpeMerges]] — it derives the compression curve
    * from these for free), and the post-merge word table (persisted);
    * the FINAL word table is returned still persisted — the caller owns
    * its unpersist.
    *
    * r21 (guide §1.2 — the per-round job floor dominates this
    * vocab-sized loop): the winning pair is an argmax FUSED into the
    * pair-count aggregation as `min(struct(-c, l, r))` — structurally
    * the same winner as the former `ORDER BY c DESC, l, r LIMIT 1`
    * (min of (-c, l, r) lexicographic = max c, then l asc, r asc; both
    * compare strings as UTF8 binary), returned in the SAME single-row
    * job that also carries Σc, so learned merges are byte-identical
    * and bpeMerges' former one-total-job-per-round is gone. */
  private def bpeLoop(df: DataFrame, textCol: String, k: Int)(
      perRound: (Int, String, String, Long, Long, DataFrame) => Unit)
      : (DataFrame, () => Unit) = {
    var words = df
      .select(explode(regexp_extract_all(col(textCol),
        lit(bpeWordPattern), lit(0))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      // " a b c " symbol form: spaces as symbol separators, a leading
      // and trailing space so every adjacency is ' l r ' exactly.
      .select(concat(lit(" "),
        trim(regexp_replace(col("w"), "(.)", "$1 ")), lit(" ")).as("sym"),
        col("cnt"))
      .persist()
    // r21: intermediates stay persisted until the CALLER's final action
    // and are released through the returned cleanup thunk. The former
    // per-round words.unpersist() dropped round r-1's cache BEFORE
    // anything had materialized round r's persist, so the next round's
    // aggregation recomputed the ENTIRE lineage — corpus scan included
    // — once per round (bpeMerges only escaped because its per-round
    // total job happened to materialize `next` first; bpeEncodedVocab
    // paid k corpus scans since its introduction). k+1 vocab-sized
    // tables (~10k rows each) is trivial executor storage.
    val kept = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    for (round <- 1 to k) {
      val row = words
        .select(col("cnt"), split(trim(col("sym")), " ").as("arr"))
        .select(col("cnt"), explode(expr(
          "filter(transform(arr, (x, i) -> IF(i < size(arr) - 1, " +
            "named_struct('l', x, 'r', arr[i + 1]), NULL)), " +
            "p -> isnotnull(p))")).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("cnt")).as("c"))
        .agg(min(struct((-col("c")).as("negc"), col("l"), col("r")))
          .as("best"), sum(col("c")).as("sumc"))
        .collect()(0)
      require(!row.isNullAt(0), s"no adjacent pairs left at round $round")
      val best = row.getStruct(0)
      val (l, r, c) = (best.getString(1), best.getString(2),
        -best.getLong(0))
      val next = words
        .withColumn("sym",
          regexp_replace(
            regexp_replace(col("sym"), s" $l $r ", s" $l$r "),
            s" $l $r ", s" $l$r "))
        .persist()
      perRound(round, l, r, c, row.getLong(1), next)
      kept += words
      words = next
    }
    val fin = words
    (fin, () => { kept.foreach(_.unpersist()); fin.unpersist(); () })
  }

  def bpeMerges(df: DataFrame, textCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val recs =
      scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    val sumcs = scala.collection.mutable.ArrayBuffer.empty[Long]
    val (fin, cleanup) = bpeLoop(df, textCol, k) { (round, l, r, c, sumc, _) =>
      recs += ((round, l, r, c)); sumcs += sumc; ()
    }
    // Compression-curve totals WITHOUT a per-round job (r21): a word's
    // adjacency count is (symbols − 1) and word frequencies never
    // change, so round r+1's Σc (over the post-round-r table) equals
    // total_symbols(r) − Σcnt exactly — integer identity, same values
    // as the former per-round Σ cnt·symbols job. Only the LAST round's
    // total still needs a job, fused with Σcnt over the final table.
    val finRow = fin.agg(sum(col("cnt")),
      sum(col("cnt") * size(split(trim(col("sym")), " ")))).head()
    val (wordTotal, totalK) = (finRow.getLong(0), finRow.getLong(1))
    cleanup()
    recs.toSeq.map { case (round, l, r, c) =>
      val total = if (round < k) sumcs(round) + wordTotal else totalK
      (round, l, r, c, total)
    }
      .toDF("merge_round", "lhs", "rhs", "pair_count", "total_symbols")
      .orderBy("merge_round")
  }

  /** The ENCODE half of the tokenizer lifecycle ([[bpeMerges]] learns
    * the rules; this applies them): the corpus token distribution a
    * k-merge BPE tokenizer produces — top-N symbols by total
    * occurrence after the k greedy merges, ties by symbol. The result
    * is vocab-sized, so it is collected eagerly and the loop's word
    * table released (orc-roundtrip precedent). */
  def bpeEncodedVocab(df: DataFrame, textCol: String, k: Int,
      topN: Int = 30): DataFrame = {
    val spark = df.sparkSession
    val (fin, cleanup) = bpeLoop(df, textCol, k)((_, _, _, _, _, _) => ())
    val hist = fin
      .select(col("cnt"), explode(split(trim(col("sym")), " ")).as("symbol"))
      .groupBy("symbol").agg(sum(col("cnt")).as("cnt"))
      .orderBy(col("cnt").desc, col("symbol")).limit(topN)
    val rows = hist.collect().toSeq
    cleanup()
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), hist.schema)
  }

  /** DuckDB twin of [[bpeMerges]]: the same k rounds unrolled as
    * chained CTEs — identical pre-tokenization, symbol form, pair
    * weighting, tie-break, and regex-greedy merge application. */
  /** Shared CTE prefix of the BPE twins: toks, w0, and the k unrolled
    * (pair-count, best-merge, apply) stages ending at w$k. */
  private def bpeStagesSql(table: String, text: String, k: Int): String = {
    val stages = (1 to k).map { r =>
      val prev = s"w${r - 1}"
      s"""p$r AS (
  SELECT l, r, CAST(sum(cnt) AS BIGINT) AS c FROM (
    SELECT cnt, arr[i] AS l, arr[i + 1] AS r FROM
      (SELECT cnt, regexp_split_to_array(trim(sym), ' ') AS arr
       FROM $prev),
      LATERAL (SELECT unnest(generate_series(1, len(arr) - 1)) AS i)
  ) GROUP BY 1, 2
), b$r AS (SELECT l, r, c FROM p$r ORDER BY c DESC, l, r LIMIT 1),
w$r AS (
  SELECT regexp_replace(
      regexp_replace(sym, ' ' || b.l || ' ' || b.r || ' ',
        ' ' || b.l || b.r || ' ', 'g'),
      ' ' || b.l || ' ' || b.r || ' ',
      ' ' || b.l || b.r || ' ', 'g') AS sym, cnt FROM $prev, b$r b
)"""
    }.mkString(",\n")
    s"""WITH toks AS (
  SELECT unnest(regexp_extract_all($text, '[\\p{L}\\p{N}]+')) AS w
  FROM $table
), w0 AS (
  SELECT ' ' || trim(regexp_replace(w, '(.)', '\\1 ', 'g')) || ' ' AS sym,
    CAST(count(*) AS BIGINT) AS cnt
  FROM toks GROUP BY 1
),
$stages"""
  }

  def bpeMergesSql(table: String, text: String, k: Int): String = {
    def totalOf(r: Int): String =
      s"(SELECT CAST(sum(cnt * len(regexp_split_to_array(trim(sym), ' ')))" +
        s" AS BIGINT) FROM w$r)"
    val rows = (1 to k).map { r =>
      (if (r == 1) s"SELECT $r AS merge_round, l AS lhs, r AS rhs, " +
        s"c AS pair_count, ${totalOf(r)} AS total_symbols FROM b$r"
      else s"SELECT $r, l, r, c, ${totalOf(r)} FROM b$r")
    }.mkString("\n  UNION ALL ")
    s"""${bpeStagesSql(table, text, k)}
SELECT * FROM (
  $rows
) ORDER BY merge_round"""
  }

  /** DuckDB twin of [[bpeEncodedVocab]]: the same k unrolled stages,
    * then the symbol histogram over the final word table. */
  def bpeEncodedVocabSql(table: String, text: String, k: Int,
      topN: Int = 30): String =
    s"""${bpeStagesSql(table, text, k)}
SELECT symbol, CAST(sum(cnt) AS BIGINT) AS cnt FROM (
  SELECT cnt, unnest(regexp_split_to_array(trim(sym), ' ')) AS symbol
  FROM w$k)
GROUP BY symbol ORDER BY cnt DESC, symbol LIMIT $topN"""
}
