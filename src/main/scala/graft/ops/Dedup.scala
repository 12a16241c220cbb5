package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact (hash
  * group-by), MinHash+LSH banding, SimHash, and exact n-gram Jaccard.
  *
  * Scale shape: exact dedup is one hash-partitioned window/aggregation on
  * the fingerprint (the only shuffle). MinHash signatures are map-side;
  * LSH banding shuffles (band, bandHash) key pairs — tiny rows — so the
  * full text is never shuffled; candidate pairs are verified with one
  * join per side. This is the standard shingle→minhash→band→bucket-join
  * plan and survives 100 TB as long as bucket skew is bounded: LSH
  * buckets are capped (`maxBucketSize`) and the exact-Jaccard join is
  * document-frequency-capped, since an uncapped hot key yields O(k²)
  * join rows.
  */
object Dedup {

  /** Exact dedup, keep-first: one row per distinct fingerprint, keeping
    * the smallest id. `groupBy(fingerprint).min(id)` instead of a window —
    * partial (map-side) aggregation halves the shuffle and avoids the
    * per-partition sort a `row_number` window would force.
    */
  def exactKeepFirst(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("__fp"))
      .agg(min(col(idCol)).as(idCol))
      .select(col(idCol))
      .orderBy(col(idCol))

  def exactKeepFirstSql(table: String, id: String, text: String): String =
    s"SELECT $id FROM (SELECT $id, row_number() OVER " +
      s"(PARTITION BY md5($text) ORDER BY $id) AS rn FROM $table) " +
      s"WHERE rn = 1 ORDER BY $id"

  /** Incremental dedup against a frozen corpus — the continuous-crawl
    * ingestion shape: the already-ingested corpus contributes only its
    * fingerprint set (at 100 TB that index is a checkpointed table,
    * re-read per batch, never recomputed); the new batch keeps one row
    * per novel fingerprint (smallest id) and drops anything the corpus
    * already has.
    *
    * Scale shape: within-batch keep-first is one partial-aggregated
    * shuffle on the fingerprint; the corpus check is a LEFT ANTI join
    * keyed on the same fingerprint — batch-sized, not corpus-sized,
    * rows move, and Spark reuses the hash partitioning between the two.
    * No broadcast hint: the index side IS the big side at scale, and a
    * shuffled anti join on a hash key is the stable plan.
    */
  def incrementalDedup(batch: DataFrame, corpus: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val index = corpus.select(md5(col(textCol)).as("__fp")).distinct()
    batch.groupBy(md5(col(textCol)).as("__fp"))
      .agg(min(col(idCol)).as(idCol))
      .join(index, Seq("__fp"), "left_anti")
      .select(col(idCol))
      .orderBy(col(idCol))
  }

  def incrementalDedupSql(batchSql: String, corpusSql: String,
      id: String, text: String): String =
    // NOT EXISTS, not NOT IN: a NULL corpus text would make NOT IN
    // return zero rows (three-valued logic) while Spark's left_anti
    // keeps every novel batch row.
    s"""WITH batch AS ($batchSql), corpus AS ($corpusSql),
kept AS (
  SELECT min($id) AS $id, md5($text) AS fp FROM batch GROUP BY md5($text))
SELECT $id FROM kept
WHERE NOT EXISTS (SELECT 1 FROM corpus WHERE md5(corpus.$text) = kept.fp)
ORDER BY $id"""

  /** Corpus-level dup stats in one aggregation. */
  def stats(df: DataFrame, textCol: String): DataFrame =
    df.agg(
      count(lit(1)).as("n_docs"),
      countDistinct(md5(col(textCol))).as("n_unique"),
      (count(lit(1)) - countDistinct(md5(col(textCol)))).as("n_dups"))

  def statsSql(table: String, text: String): String =
    s"SELECT count(*) AS n_docs, count(DISTINCT md5($text)) AS n_unique, " +
      s"count(*) - count(DISTINCT md5($text)) AS n_dups FROM $table"

  /** Word n-gram shingles as a distinct-element array column. Each
    * shingle is assembled from n O(1) `get` lookups — `slice(toks,i,n)`
    * is O(|toks|) per position and turns the whole expression quadratic
    * in document length (measured 10× slower on 400-token docs).
    */
  def shingles(text: Column, n: Int): Column = {
    val toks = split(trim(text), "\\s+")
    array_distinct(
      filter(
        transform(toks, (_, i) =>
          when(i <= size(toks) - n,
            concat_ws(" ", (0 until n).map(j => get(toks, i + j)): _*))),
        x => x.isNotNull))
  }

  /** MinHash signatures for every doc: explode shingles once, then ONE
    * partial-aggregated shuffle computing all `numHashes` seeded minima.
    * (An array-expression formulation — `array_min(transform(...))` per
    * hash — duplicates the shingle subtree numHashes times in the plan
    * and recomputes it per hash; measured 60× slower.)
    */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
      n: Int, numHashes: Int): DataFrame = {
    val sh = df.select(col(idCol).as("id"),
      explode(shingles(col(textCol), n)).as("shingle"))
    val aggs = (0 until numHashes).map { seed =>
      min(xxhash64(lit(seed), col("shingle"))).as(s"__h$seed")
    }
    sh.groupBy("id")
      .agg(aggs.head, aggs.tail: _*)
      .select(col("id"),
        array((0 until numHashes).map(i => col(s"__h$i")): _*).as("sig"))
  }

  /** MinHash estimator accuracy harness (the dedup-family analog of
    * Similarity.annRecall): over the exact near-dup ground-truth pairs,
    * compare the signature estimate — matching-minima fraction over
    * `numHashes` seeded hashes — against the exact Jaccard, and report
    * the error distribution. This is the number that sizes a production
    * signature (k hashes ⇒ ±1/k estimate granularity): queryable, not
    * a code comment. Signatures are one partial-aggregated groupBy over
    * the shared shingle table; the ground-truth pair set is bounded, so
    * the two signature joins broadcast.
    *
    * Caveat (documented, inherent): the exact pipeline computes Jaccard
    * over DF-capped rare shingles while signatures hash all shingles —
    * on a boilerplate-heavy corpus the two universes differ; here the
    * cap only drops boilerplate shared by >maxShingleDf docs.
    */
  def minhashAccuracy(exploded: DataFrame, exactPairs: DataFrame,
      numHashes: Int = 16): DataFrame = {
    val aggs = (0 until numHashes).map { seed =>
      min(xxhash64(lit(seed), col("shingle"))).as(s"__h$seed")
    }
    val sigs = exploded.groupBy("id")
      .agg(aggs.head, aggs.tail: _*)
      .select(col("id"),
        array((0 until numHashes).map(i => col(s"__h$i")): _*).as("sig"))
    val withSigs = exactPairs
      .join(sigs.select(col("id").as("id_a"), col("sig").as("sig_a")), "id_a")
      .join(sigs.select(col("id").as("id_b"), col("sig").as("sig_b")), "id_b")
    val matches = size(filter(
      zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), b => b))
    withSigs
      .select(col("jaccard"),
        (matches.cast("double") / numHashes).as("est"))
      .agg(count(lit(1)).as("n_pairs"),
        avg(abs(col("est") - col("jaccard"))).as("mean_abs_err"),
        max(abs(col("est") - col("jaccard"))).as("max_abs_err"))
  }

  /** Engine-portable twin of [[minhashAccuracy]]: md5 signatures (the
    * [[minhashLshPortable]] hash family) so the per-pair MinHash
    * estimate, its exact-Jaccard reference, and the absolute error are
    * identical arithmetic on both engines — the signature-sizing
    * measurement itself lands under the hash-equality gate, per pair,
    * not just as a rows-only aggregate. `est` is an exact multiple of
    * 1/numHashes and `jaccard` a single integer division, so no
    * cross-partition float summation is involved anywhere.
    */
  def minhashErrPortable(exploded: DataFrame, exactPairs: DataFrame,
      numHashes: Int = 8): DataFrame = {
    val aggs = (0 until numHashes).map { k =>
      min(md5(concat(lit(s"$k:"), col("shingle")))).as(s"__h$k")
    }
    val sigs = exploded.groupBy("id").agg(aggs.head, aggs.tail: _*)
      .select(col("id"),
        array((0 until numHashes).map(i => col(s"__h$i")): _*).as("sig"))
    val withSigs = exactPairs
      .join(sigs.select(col("id").as("id_a"), col("sig").as("sig_a")), "id_a")
      .join(sigs.select(col("id").as("id_b"), col("sig").as("sig_b")), "id_b")
    val matches = size(filter(
      zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), b => b))
    withSigs
      .select(col("id_a"), col("id_b"), col("jaccard"),
        (matches.cast("double") / numHashes).as("est"))
      .withColumn("abs_err", abs(col("est") - col("jaccard")))
      .orderBy("id_a", "id_b")
  }

  /** DuckDB twin of [[minhashErrPortable]] over the same shingle set
    * (uncapped signatures, DF-capped exact pairs — matching the Spark
    * side's inputs). */
  def minhashErrPortableSql(table: String, id: String, text: String,
      n: Int, threshold: Double, maxShingleDf: Int,
      numHashes: Int = 8): String = {
    val mins = (0 until numHashes)
      .map(k => s"min(md5('$k:' || shingle)) AS h$k").mkString(", ")
    val matchSum = (0 until numHashes)
      .map(k => s"(CASE WHEN a.h$k = b.h$k THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"""WITH allsh AS (
${shinglesSql(table, id, text, n)}
), sig AS (
  SELECT id, $mins FROM allsh GROUP BY id
), sh AS (
  SELECT id, shingle FROM allsh
  WHERE shingle IN (SELECT shingle FROM allsh GROUP BY shingle
                    HAVING count(*) <= $maxShingleDf)
), cnt AS (SELECT id, count(*) AS n_sh FROM sh GROUP BY id),
inter AS (
  SELECT a.id AS id_a, b.id AS id_b, count(*) AS inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
  GROUP BY 1, 2
), pairs AS (
  SELECT id_a, id_b,
    CAST(inter AS DOUBLE) / (ca.n_sh + cb.n_sh - inter) AS jaccard
  FROM inter JOIN cnt ca ON ca.id = id_a JOIN cnt cb ON cb.id = id_b
  WHERE CAST(inter AS DOUBLE) / (ca.n_sh + cb.n_sh - inter) >= $threshold
)
SELECT p.id_a, p.id_b, p.jaccard,
  CAST($matchSum AS DOUBLE) / $numHashes AS est,
  abs(CAST($matchSum AS DOUBLE) / $numHashes - p.jaccard) AS abs_err
FROM pairs p JOIN sig a ON a.id = p.id_a JOIN sig b ON b.id = p.id_b
ORDER BY id_a, id_b"""
  }

  /** MinHash+LSH banding: split the signature into `bands` bands of
    * `rowsPerBand`, bucket by (band, hash(band slice)), emit candidate
    * pairs that collide in ≥1 band with their signature-estimated
    * Jaccard. Shuffles only (id, bandHash) pairs.
    *
    * Skew guard: a bucket holding k docs emits k² candidate pairs, so
    * buckets above `maxBucketSize` (e.g. a boilerplate page duplicated a
    * million times) are dropped before the self-join — their members are
    * still found via exact dedup or other bands; this bounds the join
    * output at (bands · buckets · cap²) regardless of input skew.
    */
  def minhashCandidates(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, bands: Int = 16, rowsPerBand: Int = 2,
      maxBucketSize: Int = 1000): DataFrame = {
    val numHashes = bands * rowsPerBand
    val sigs = minhashSignatures(df, idCol, textCol, n, numHashes)
    val banded = sigs.select(col("id"), col("sig"),
      posexplode(array((0 until bands).map { b =>
        hash(slice(col("sig"), b * rowsPerBand + 1, rowsPerBand))
      }: _*)).as(Seq("band", "bucket")))
    // Bucket-size cap as a WINDOW over the one (band, bucket) shuffle:
    // a separate count-aggregation branch + join would make three
    // consumers of the signature pipeline; with the window both
    // self-join sides share a single exchange subtree (ReuseExchange),
    // so signatures are computed once.
    val bounded = banded
      .withColumn("__bsz", count(lit(1)).over(
        Window.partitionBy("band", "bucket")))
      .filter(col("__bsz") <= maxBucketSize)
      .drop("__bsz")
    val l = bounded.select(col("band"), col("bucket"),
      col("id").as("id_a"), col("sig").as("sig_a"))
    val r = bounded.select(col("band"), col("bucket"),
      col("id").as("id_b"), col("sig").as("sig_b"))
    l.join(r, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(filter(zip_with(col("sig_a"), col("sig_b"), _ === _),
          x => x)) / lit(numHashes.toDouble)).as("est_jaccard"))
      .distinct()
  }

  /** MinHash+LSH with ENGINE-PORTABLE hashes: identical pipeline shape
    * to [[minhashCandidates]] but every hash is md5 (which DuckDB also
    * implements bit-for-bit), so the full pipeline — signatures, band
    * buckets, capped self-join, candidate pairs — is oracle-checkable
    * end-to-end rather than rows-only. The xxhash64 path stays the
    * production default (one 64-bit mix vs a 128-bit cryptographic hash
    * per shingle·seed); this twin exists so the LSH MACHINERY itself is
    * under the hash-equality gate.
    *
    * Input is a pre-exploded `(id, shingle)` table (share the corpus
    * shingle materialization). Per-band bucket key = md5 over the
    * band's signature slice; buckets over `maxBucketSize` are dropped
    * INSIDE the aggregation buffer (capped collect — over-cap ⇒ NULL),
    * and candidate pairs are generated map-side from each bucket's
    * sorted member array, the same posting-list shape as the exact
    * Jaccard pipeline. Output: (id_a, id_b, n_bands) candidate pairs
    * with the number of colliding bands.
    */
  def minhashLshPortable(exploded: DataFrame, numHashes: Int = 8,
      rowsPerBand: Int = 2, maxBucketSize: Int = 50): DataFrame = {
    require(numHashes % rowsPerBand == 0)
    val bands = numHashes / rowsPerBand
    val aggs = (0 until numHashes).map { k =>
      min(md5(concat(lit(s"$k:"), col("shingle")))).as(s"__h$k")
    }
    val sigs = exploded.groupBy("id").agg(aggs.head, aggs.tail: _*)
    val banded = sigs.select(col("id"),
      posexplode(array((0 until bands).map { b =>
        md5(concat_ws("|",
          (0 until rowsPerBand).map(r => col(s"__h${b * rowsPerBand + r}")): _*))
      }: _*)).as(Seq("band", "bk")))
    graft.functions.CappedCollectSetLong.ensureRegistered(exploded.sparkSession)
    val buckets = banded.groupBy("band", "bk")
      .agg(expr(s"${graft.functions.CappedCollectSetLong.name}(id, $maxBucketSize)")
        .as("ids"))
      .filter(col("ids").isNotNull && size(col("ids")) >= 2)
    val pairArr = flatten(transform(col("ids"), (a, i) =>
      transform(slice(col("ids"), i + 2, size(col("ids"))), b2 =>
        struct(a.as("id_a"), b2.as("id_b")))))
    buckets.select(explode(pairArr).as("p"))
      .groupBy(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))
      .agg(count(lit(1)).as("n_bands"))
      .orderBy("id_a", "id_b")
  }

  /** DuckDB twin of [[minhashLshPortable]] over the same shingle set. */
  def minhashLshPortableSql(table: String, id: String, text: String,
      n: Int, numHashes: Int = 8, rowsPerBand: Int = 2,
      maxBucketSize: Int = 50): String = {
    val bands = numHashes / rowsPerBand
    val mins = (0 until numHashes)
      .map(k => s"min(md5('$k:' || shingle)) AS h$k").mkString(", ")
    val bandRows = (0 until bands).map { b =>
      val key = (0 until rowsPerBand).map(r => s"h${b * rowsPerBand + r}")
        .mkString(" || '|' || ")
      s"SELECT id, $b AS band, md5($key) AS bk FROM sig"
    }.mkString("\n  UNION ALL ")
    s"""WITH sh AS (
${shinglesSql(table, id, text, n)}
), sig AS (
  SELECT id, $mins FROM sh GROUP BY id
), banded AS (
  $bandRows
), bounded AS (
  SELECT id, band, bk FROM banded
  QUALIFY count(*) OVER (PARTITION BY band, bk) <= $maxBucketSize
)
SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_bands
FROM bounded a JOIN bounded b ON a.band = b.band AND a.bk = b.bk AND a.id < b.id
GROUP BY a.id, b.id ORDER BY id_a, id_b"""
  }

  /** SimHash-64: per token, xxhash64; per bit, sum of ±1 weighted by the
    * bit; fingerprint = OR of (1<<i) where the sum is positive. Bitwise
    * assembly avoids ANSI-mode long-overflow on the sign bit.
    * One shuffle on doc id after the token explode.
    */
  /** Engine-portable SimHash twin: md5 per token instead of xxhash64,
    * split into two 32-bit halves so every value stays BIGINT-safe on
    * both engines (a 64-bit unsigned md5 prefix would overflow DuckDB's
    * BIGINT and Spark's conv() round-trip alike). Same per-bit ±1 vote
    * aggregation as [[simhash64]] — 64 conditional sums in ONE hash
    * aggregate, no bit-explosion row multiplier. The xxhash64 path
    * stays the production default (one 64-bit mix vs a cryptographic
    * hash per token); this twin puts the SimHash VOTE MACHINERY under
    * the hash-equality gate.
    */
  def simhashMd5(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol).as("id"),
      explode(split(trim(col(textCol)), "\\s+")).as("tok"))
      .withColumn("hx", md5(col("tok")))
      .withColumn("hi", conv(substring(col("hx"), 1, 8), 16, 10).cast("long"))
      .withColumn("lo", conv(substring(col("hx"), 9, 8), 16, 10).cast("long"))
    def bitSums(c: String, p: String) = (0 until 32).map { i =>
      sum(when(col(c).bitwiseAND(shiftleft(lit(1L), i)) =!= 0L, 1L)
        .otherwise(-1L)).as(s"$p$i")
    }
    def assemble(p: String) = (0 until 32).map { i =>
      when(col(s"$p$i") > 0, shiftleft(lit(1L), i)).otherwise(0L)
    }.reduce(_.bitwiseOR(_))
    val aggs = bitSums("hi", "hb") ++ bitSums("lo", "lb")
    toks.groupBy(col("id"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("id"), assemble("hb").as("sim_hi"),
        assemble("lb").as("sim_lo"))
      .orderBy("id")
  }

  /** DuckDB twin of [[simhashMd5]] (hex-prefix casts are bit-identical
    * across the engines; every sum is CAST to BIGINT). */
  def simhashMd5Sql(table: String, idCol: String, textCol: String,
      where: String = ""): String = {
    def half(c: String, lo: Int) =
      s"('0x'||substr(md5(tok),$lo,8))::BIGINT AS $c"
    def bitSums(c: String, p: String) = (0 until 32).map { i =>
      s"CAST(sum(CASE WHEN ($c >> $i) & 1 = 1 THEN 1 ELSE -1 END) " +
        s"AS BIGINT) AS $p$i"
    }
    def assemble(p: String) = (0 until 32).map { i =>
      s"CASE WHEN $p$i > 0 THEN CAST(${1L << i} AS BIGINT) ELSE 0 END"
    }.mkString(" + ")
    s"""WITH toks AS (
  SELECT $idCol AS id, unnest(regexp_split_to_array(trim($textCol), '\\s+')) AS tok
  FROM $table $where
), h AS (
  SELECT id, ${half("hi", 1)}, ${half("lo", 9)} FROM toks
), bits AS (
  SELECT id, ${(bitSums("hi", "hb") ++ bitSums("lo", "lb")).mkString(", ")}
  FROM h GROUP BY id
)
SELECT id, CAST(${assemble("hb")} AS BIGINT) AS sim_hi,
       CAST(${assemble("lb")} AS BIGINT) AS sim_lo
FROM bits ORDER BY id"""
  }

  def simhash64(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol).as("id"),
      explode(split(trim(col(textCol)), "\\s+")).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val bitSums = (0 until 64).map { i =>
      sum(when(col("h").bitwiseAND(shiftleft(lit(1L), i)) =!= 0L, 1)
        .otherwise(-1)).as(s"b$i")
    }
    val fp = (0 until 64).map { i =>
      when(col(s"b$i") > 0, shiftleft(lit(1L), i)).otherwise(0L)
    }.reduce(_.bitwiseOR(_))
    toks.groupBy(col("id"))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("id"), fp.as("simhash"))
      .orderBy("id")
  }

  /** Exact n-gram Jaccard near-dup pairs ≥ threshold: distinct shingles
    * exploded, self-joined on shingle (co-partitioned by the join key),
    * intersection counted, union from per-doc shingle counts. The ratio
    * is a single division of two ints — DuckDB-reproducible.
    *
    * Skew guard: a shingle shared by m docs yields m² join rows, so
    * shingles with document frequency > `maxShingleDf` are excluded from
    * BOTH the intersection and the per-doc counts (the cap is part of the
    * operator's semantics and is mirrored in the SQL oracle). Stop-shingle
    * removal like this is the standard fix; near-dup pairs whose overlap
    * is exclusively ultra-common shingles are not near-dups of interest.
    */
  /** The exploded per-doc distinct-shingle table `(id, shingle)` — the
    * shared input of the near-dup pair pipeline AND benchmark
    * decontamination. A production pipeline computes (and checkpoints)
    * this once per corpus snapshot and feeds every consumer, rather
    * than re-running the tokenize+shingle scan per operator.
    */
  def explodeShingles(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame =
    df.select(col(idCol).as("id"),
      explode(shingles(col(textCol), n)).as("shingle"))

  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double, maxShingleDf: Int = 10000,
      materialize: Boolean = false): DataFrame =
    ngramJaccardPairsFromShingles(
      explodeShingles(df, idCol, textCol, n), threshold, maxShingleDf,
      materialize)

  /** [[ngramJaccardPairs]] over a pre-exploded `(id, shingle)` table
    * (see [[explodeShingles]]) so several consumers can share one
    * shingle materialization. */
  /** The (id_a, id_b, cnt) PAIR-STATISTICS table over the capped
    * shingle universe: cnt(a, b) = |shared rare shingles| for a < b
    * and cnt(a, a) = |rare shingles of a| (the self-pair rows). This
    * is the shared intermediate of BOTH the symmetric Jaccard pipeline
    * and the asymmetric containment pipeline — same shingle table,
    * same df cap, same aggregation — so a caller materializing both
    * (the catalog does) should compute it ONCE and hand it to each via
    * `precomputedPairStats` (r20: the two shared builds each re-paid
    * the posting-list collect + pair expansion + pair-count shuffle).
    * Unpinned: the caller owns persistence.
    *
    * INVARIANT for `precomputedPairStats` consumers (ADVICE r20 #1): a
    * supplied frame MUST have been built by THIS function over the
    * SAME exploded table and the SAME maxShingleDf the consumer would
    * otherwise use — when stats are supplied, the consumer's own
    * exploded/cap arguments no longer participate, so a mismatched
    * frame yields silently wrong pairs. The catalog's `pair_stats`
    * shared build is the only supplier today and shares both by
    * construction (one build site, consts from the same entry family). */
  def pairStatsFromShingles(exploded: DataFrame,
      maxShingleDf: Int): DataFrame = {
    graft.functions.CappedCollectSetLong.ensureRegistered(exploded.sparkSession)
    val byShingle = exploded
      .groupBy("shingle")
      .agg(expr(s"${graft.functions.CappedCollectSetLong.name}(id, $maxShingleDf)")
        .as("ids"))
      .filter(col("ids").isNotNull)
    val distinctLists = byShingle.groupBy("ids")
      .agg(count(lit(1)).as("w"))
    val pairArr = concat(
      transform(col("ids"), a => struct(a.as("id_a"), a.as("id_b"))),
      flatten(transform(col("ids"), (a, i) =>
        transform(slice(col("ids"), i + 2, size(col("ids"))), b =>
          struct(a.as("id_a"), b.as("id_b"))))))
    distinctLists.select(col("w"), explode(pairArr).as("p"))
      .groupBy(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))
      .agg(sum(col("w")).as("cnt"))
  }

  def ngramJaccardPairsFromShingles(exploded: DataFrame, threshold: Double,
      maxShingleDf: Int, materialize: Boolean = false,
      precomputedPairStats: Option[DataFrame] = None): DataFrame = {
    // ONE groupBy(shingle) shuffle builds the per-shingle posting list
    // (sorted doc-id set); the DF cap is a size filter on the list, and
    // candidate pairs are generated MAP-SIDE from each list (no
    // self-join shuffle — the earlier exploded-self-join formulation
    // paid two extra shuffles of the full shingle table). A rare
    // shingle's list has ≤ maxShingleDf entries, so the generated pair
    // array is ≤ cap²/2 per shingle — the same skew bound the self-join
    // had, now explicit in the expression.
    //
    // Each list emits its ordered pairs (i < j) PLUS one self-pair
    // (a, a) per member, so a single partial-aggregated pair-count
    // shuffle yields BOTH statistics: cnt(a, b) = |shared rare
    // shingles| (the intersection) and cnt(a, a) = |rare shingles of
    // a| (the per-doc count the union needs) — self-pairs cannot
    // collide with real pairs because i < j makes those strictly
    // ordered. The whole pipeline is two shuffles end-to-end (posting
    // lists, pair stats) plus broadcast joins.
    //
    // `materialize = true` additionally runs the pipeline eagerly,
    // persists the (tiny) pair result, and releases the intermediate
    // cache — for callers that feed the pairs to several downstream
    // consumers (e.g. the near-dup report AND cluster formation).
    // DF-cap enforcement happens INSIDE the aggregation buffer: the
    // posting list is built with the custom capped collect
    // (functions/CappedCollectSet.scala), whose buffer never exceeds
    // maxShingleDf+1 ids — an over-cap group (a boilerplate shingle
    // shared by millions of docs) evaluates to NULL and is filtered,
    // costing O(cap) reducer memory instead of O(group). The built-in
    // collect_set + size filter has the right semantics but buffers the
    // whole hot group first; a count-prepass + anti-join stays bounded
    // but pays an extra full shuffle (measured +3 s at sf0.1).
    // POSTING-LIST DEDUP before pair expansion (see
    // pairStatsFromShingles, where the machinery now lives): distinct
    // lists weighted by multiplicity bound the k²/2 expansion by
    // DISTINCT-list volume (the r12 derived-100x lesson: 1168 s of
    // repeated-list fan-out collapsed to list-count-proportional).
    //
    // pairStats feeds THREE subtrees (counts twice + inter), so it must
    // compute once — but HOW it is pinned differs by caller lifecycle.
    // precomputedPairStats: the caller owns the pin (the catalog's
    // shared build computes it once for Jaccard AND containment).
    // materialize=true (the shared-cache posture): persist, then
    // unpersist explicitly once the tiny result is materialized.
    // materialize=false (one-shot callers): lazy localCheckpoint — the
    // same once-compute + storage-level behavior, but the blocks are
    // ContextCleaner-collectable as soon as the caller's result frame
    // becomes unreachable. A persist here instead leaks FOREVER: the
    // CacheManager holds a strong reference to the cached plan that no
    // GC can clear and no caller can unpersist (no handle) — the
    // stable 12.19 MB end-of-roster storage residual in the r13/r14
    // bench artifacts was exactly this frame, planted by the one
    // materialize=false catalog caller (q_dedup_keep_best_eq).
    val ownStats = precomputedPairStats.isEmpty
    val pairStats = precomputedPairStats.getOrElse {
      val base = pairStatsFromShingles(exploded, maxShingleDf)
      if (materialize) base
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else base.localCheckpoint(false)
    }
    val counts = pairStats.filter(col("id_a") === col("id_b"))
      .select(col("id_a").as("id"), col("cnt").as("n_sh"))
    val inter = pairStats.filter(col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b"), col("cnt").as("inter"))
    val out = inter
      .join(counts.select(col("id").as("id_a"), col("n_sh").as("na")), "id_a")
      .join(counts.select(col("id").as("id_b"), col("n_sh").as("nb")), "id_b")
      .select(col("id_a"), col("id_b"), col("inter"),
        (col("na") + col("nb") - col("inter")).as("union_sz"),
        (col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .orderBy("id_a", "id_b")
    if (!materialize) out
    else {
      val res = out.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      res.count()
      if (ownStats) pairStats.unpersist()
      res
    }
  }

  /** Asymmetric n-gram CONTAINMENT join — the document-inclusion
    * detector a training pipeline runs beside symmetric near-dup:
    * C(sub→sup) = |shingles(sub) ∩ shingles(sup)| / |shingles(sub)|,
    * flagging docs mostly quoted/embedded inside another (boilerplate
    * wrappers around a shared article, chunk-of-a-longer-doc leaks)
    * that Jaccard misses whenever the host is much longer than the
    * guest (J = inter/union stays low while inter/|sub| ≈ 1).
    *
    * Same posting-list scheme as [[ngramJaccardPairsFromShingles]]
    * (one capped-collect shuffle builds per-shingle doc lists, pairs
    * generated map-side, one pair-count shuffle; self-pairs carry the
    * per-doc shingle counts) — the df cap bounds skew identically.
    * Each unordered pair then emits up to TWO directional rows, gated
    * by the EXACT INTEGER comparison 100·inter ≥ tauPct·n_sub (no
    * float crosses the gate; `containment` itself is one IEEE division
    * of two exact longs, bit-identical cross-engine).
    */
  def ngramContainmentPairs(exploded: DataFrame, tauPct: Int,
      maxShingleDf: Int, materialize: Boolean = false,
      precomputedPairStats: Option[DataFrame] = None): DataFrame = {
    // Shared pair-statistics machinery (see pairStatsFromShingles and
    // the pinning discussion in ngramJaccardPairsFromShingles): the
    // catalog's shared build computes pairStats ONCE and hands it to
    // both this pipeline and the Jaccard twin via precomputedPairStats.
    val ownStats = precomputedPairStats.isEmpty
    val pairStats = precomputedPairStats.getOrElse {
      val base = pairStatsFromShingles(exploded, maxShingleDf)
      if (materialize) base
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else base.localCheckpoint(false)
    }
    val counts = pairStats.filter(col("id_a") === col("id_b"))
      .select(col("id_a").as("id"), col("cnt").as("n_sh"))
    val inter = pairStats.filter(col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b"), col("cnt").as("inter"))
    // Both directions of each unordered pair, then one join to the
    // sub-side count (the only count the gate needs).
    val dirs = inter.select(col("id_a").as("id_sub"),
        col("id_b").as("id_sup"), col("inter"))
      .unionByName(inter.select(col("id_b").as("id_sub"),
        col("id_a").as("id_sup"), col("inter")))
    val out = dirs
      .join(counts.select(col("id").as("id_sub"), col("n_sh").as("n_sub")),
        "id_sub")
      .filter(col("inter") * 100 >= col("n_sub") * tauPct)
      .select(col("id_sub"), col("id_sup"), col("inter"), col("n_sub"),
        (col("inter").cast("double") / col("n_sub")).as("containment"))
      .orderBy("id_sub", "id_sup")
    if (!materialize) out
    else {
      val res = out.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      res.count()
      if (ownStats) pairStats.unpersist()
      res
    }
  }

  /** DuckDB oracle for [[ngramContainmentPairs]] over the same word
    * n-gram shingle universe as [[ngramJaccardPairsSql]]. */
  def ngramContainmentPairsSql(table: String, id: String, text: String,
      n: Int, tauPct: Int, maxShingleDf: Int): String =
    s"""WITH toks AS (
  SELECT $id AS id, u.tok, u.pos
  FROM (SELECT $id, regexp_split_to_array(trim($text), '\\s+') AS arr FROM $table),
  LATERAL (SELECT unnest(arr) AS tok, generate_subscripts(arr, 1) AS pos) u
), sh0 AS (
  SELECT DISTINCT id, tok${(1 until n).map(i => s" || ' ' || lead(tok, $i) OVER w").mkString} AS shingle
  FROM toks WINDOW w AS (PARTITION BY id ORDER BY pos)
  QUALIFY lead(tok, ${n - 1}) OVER w IS NOT NULL
), sh AS (
  SELECT id, shingle FROM sh0
  WHERE shingle IN (SELECT shingle FROM sh0 GROUP BY shingle
                    HAVING count(*) <= $maxShingleDf)
), cnt AS (SELECT id, count(*) AS n_sh FROM sh GROUP BY id),
inter AS (
  SELECT a.id AS id_a, b.id AS id_b, count(*) AS inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
  GROUP BY 1, 2
), dirs AS (
  SELECT id_a AS id_sub, id_b AS id_sup, inter FROM inter
  UNION ALL
  SELECT id_b AS id_sub, id_a AS id_sup, inter FROM inter
)
SELECT id_sub, id_sup, inter, c.n_sh AS n_sub,
  CAST(inter AS DOUBLE) / c.n_sh AS containment
FROM dirs JOIN cnt c ON c.id = dirs.id_sub
WHERE inter * 100 >= c.n_sh * $tauPct
ORDER BY id_sub, id_sup"""

  /** Sorted-neighborhood near-dup detection (Hernández & Stolfo's
    * merge/purge): sort records by a normalized key and compare each
    * record only to its `win` successors within a blocking prefix —
    * the record-linkage scheme whose comparison count is O(N·win)
    * instead of the candidate join's worst-case O(N²).
    *
    * Normalization lowercases and collapses every non-[a-z0-9] run to
    * one space (result is pure ASCII, so edit distance has no Unicode
    * collation surface to diverge on); the sort/compare key is the
    * first `keyLen` chars (SNM compares on a bounded key by design —
    * the edit-distance cost per pair is keyLen², a constant). A pair
    * is a dup when 100·lev ≤ maxEditPct·max(|ka|,|kb|) — EXACT INTEGER
    * gate, classic Levenshtein on both engines.
    *
    * Scale shape: the window partitions by the `blockLen`-char prefix
    * and sorts WITHIN blocks — range-partitioned sorting, no global
    * single-partition window — and each row emits ≤ `win` candidate
    * pairs map-side off the lead() columns. One sort shuffle, one
    * census aggregation; the text never joins against itself. The
    * census output (blocks, candidates, dups, id-pair checksum) is the
    * audit artifact; dup pairs feed the same cluster-formation ops as
    * the other candidate generators.
    */
  def sortedNeighborhoodCensus(df: DataFrame, idCol: String,
      textCol: String, blockLen: Int, keyLen: Int, win: Int,
      maxEditPct: Int): DataFrame = {
    val norm = trim(regexp_replace(lower(col(textCol)), "[^a-z0-9]+", " "))
    val keyed = df.select(col(idCol).as("id"),
      substring(norm, 1, keyLen).as("k"),
      substring(norm, 1, blockLen).as("blk"))
    val w = Window.partitionBy("blk").orderBy("k", "id")
    val nbrs = keyed.select(Seq(col("blk"), col("id"), col("k")) ++
      (1 to win).flatMap(i => Seq(lead(col("id"), i).over(w).as(s"id_$i"),
        lead(col("k"), i).over(w).as(s"k_$i"))): _*)
    val pairs = (1 to win).map { i =>
      nbrs.filter(col(s"id_$i").isNotNull)
        .select(col("blk"), col("id").as("id_a"), col(s"id_$i").as("id_b"),
          levenshtein(col("k"), col(s"k_$i")).as("lev"),
          greatest(length(col("k")), length(col(s"k_$i"))).as("mx"))
    }.reduce(_ unionByName _)
    val flagged = pairs.withColumn("is_dup",
      (col("lev") * 100 <= col("mx") * maxEditPct).cast("long"))
    flagged.agg(
        countDistinct(col("blk")).as("n_blocks"),
        count(lit(1)).as("n_candidates"),
        sum(col("is_dup")).as("n_dups"),
        coalesce(sum(when(col("is_dup") === 1,
          pmod(col("id_a"), lit(1009L)) * 31 + pmod(col("id_b"), lit(1009L)))),
          lit(0L)).as("checksum"))
      .select(col("n_blocks"), col("n_candidates"), col("n_dups"),
        col("checksum"))
  }

  /** DuckDB oracle for [[sortedNeighborhoodCensus]]. */
  def sortedNeighborhoodCensusSql(table: String, id: String, text: String,
      blockLen: Int, keyLen: Int, win: Int, maxEditPct: Int): String = {
    val pairSelects = (1 to win).map { i =>
      s"""  SELECT blk, id AS id_a,
    lead(id, $i) OVER w$i AS id_b, lead(k, $i) OVER w$i AS k_b, k AS k_a
  FROM keyed WINDOW w$i AS (PARTITION BY blk ORDER BY k, id)"""
    }.mkString("\n  UNION ALL\n")
    s"""WITH keyed AS (
  SELECT $id AS id,
    substr(trim(regexp_replace(lower($text), '[^a-z0-9]+', ' ', 'g')), 1, $keyLen) AS k,
    substr(trim(regexp_replace(lower($text), '[^a-z0-9]+', ' ', 'g')), 1, $blockLen) AS blk
  FROM $table),
pairs AS (
$pairSelects
),
flagged AS (
  SELECT blk, id_a, id_b,
    CASE WHEN levenshtein(k_a, k_b) * 100
      <= greatest(len(k_a), len(k_b)) * $maxEditPct THEN 1 ELSE 0 END AS is_dup
  FROM pairs WHERE id_b IS NOT NULL)
SELECT CAST(count(DISTINCT blk) AS BIGINT) AS n_blocks,
  CAST(count(*) AS BIGINT) AS n_candidates,
  CAST(sum(is_dup) AS BIGINT) AS n_dups,
  CAST(coalesce(sum(CASE WHEN is_dup = 1
    THEN (id_a % 1009) * 31 + (id_b % 1009) END), 0) AS BIGINT) AS checksum
FROM flagged"""
  }

  /** Prefix-filtered set-similarity self-join (the PPJoin candidate
    * scheme of Xiao et al., "Efficient Similarity Joins for Near
    * Duplicate Detection"): identical OUTPUT to
    * [[ngramJaccardPairsFromShingles]] — same capped shingle universe,
    * same (id_a, id_b, inter, union_sz, jaccard) rows — through a
    * provably lossless candidate filter instead of posting-list pair
    * expansion.
    *
    * The theorem: order the universe totally by (df asc, shingle asc)
    * and give each doc x the prefix of its first
    * |x| − ⌈t·|x|⌉ + 1 shingles. If J(x,y) ≥ t, the order-smallest
    * common shingle w lies in BOTH prefixes — were w outside x's
    * prefix, every common shingle would sit in x's last ⌈t|x|⌉ − 1
    * positions, yet J ≥ t forces |x∩y| ≥ t·|x| > ⌈t|x|⌉ − 1.
    * So joining prefixes on the shingle loses no qualifying pair, and
    * exact Jaccard is then computed for candidates only.
    *
    * Scale shape vs the posting-list path: that one expands cap²/2
    * pairs per shingle across the WHOLE universe; this one touches
    * only prefix tokens — by construction the RAREST ⌈(1−t)|x|⌉+1
    * tokens of each doc — so candidate volume falls as t rises,
    * independent of the df cap. At 100 TB with a loose cap this is
    * the survivable path: the heavy shuffles carry (id, shingle, df)
    * prefix rows and candidate pairs, never cap-squared expansions.
    * The per-doc rank/size windows partition by doc id over
    * doc-length-sized frames (never corpus-sized).
    */
  def ngramJaccardPairsPrefix(exploded: DataFrame, threshold: Double,
      maxShingleDf: Int): DataFrame = {
    val dfreq = exploded.groupBy("shingle")
      .agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxShingleDf)
    // r21 DICTIONARY ENCODING (guide §2.3 — narrower types through
    // every exchange): the shingle STRINGS used to flow through the
    // set aggregation, the prefix explode, the candidate self-join and
    // both verification arrays; every stage after the dfreq join only
    // needs identity + the (df asc, shingle asc) prefix total order,
    // so each capped shingle gets a LONG sid that preserves exactly
    // that order — range-repartition by (df, shingle) (range ids
    // ascend with the sort key), sort within partitions, then
    // monotonically_increasing_id = (partition << 33) + row position.
    // Correctness does not depend on WHICH total order the sids
    // realize (the prefix theorem holds for any fixed total order and
    // the verify step computes exact intersections), but it does
    // depend on every consumer seeing ONE consistent assignment:
    // monotonically_increasing_id is marked nondeterministic, so the
    // tiny universe-sized dict is pinned with a localCheckpoint —
    // unlike the `sets` pin r20 measured slower, this materializes
    // |capped universe| rows, not |docs| arrays.
    val dict = dfreq
      .repartitionByRange(col("df"), col("shingle"))
      .sortWithinPartitions("df", "shingle")
      .withColumn("sid", monotonically_increasing_id())
      .localCheckpoint(false)
    val capped = exploded.join(dict, "shingle")
      .select(col("id"), col("sid"), col("df"))
    // Per-doc capped-shingle SET, ordered by the prefix total order
    // (df asc, sid asc — sid ties are impossible, sids are unique; the
    // struct sort equals the (df, shingle) order by construction of
    // sid): ONE partial-aggregated groupBy replaces the two per-doc
    // windows the r19 shape paid (row_number + count over the same
    // partition), and the same arrays then serve BOTH the prefix
    // derivation (a map-side slice) and candidate verification below.
    // sets feeds THREE subtrees (the prefix derivation and both
    // verification joins): ReuseExchange dedups the aggregation's
    // exchange but each consumer re-runs the FINAL aggregate
    // (collect_list merge + sort) on the shuffled partials. With the
    // r20 STRING arrays a localCheckpoint pin measured slower (7.2 s
    // vs 5.6 s — materialize+read-back of ~20-byte shingle strings
    // cost more than the reuse saved); with the r21 LONG-sid arrays
    // the pin flips to a win (5.2–5.6 s vs 5.9–6.3 s min-of-5 at
    // sf0.1): the blocks are ~2.5× smaller and the triple final-agg
    // recompute is gone. Lazy, unpinned-on-unreachable (the
    // materialize=false ContextCleaner posture).
    val sets = capped
      .groupBy(col("id"))
      .agg(sort_array(collect_list(struct(col("df"), col("sid"))))
        .as("ds"))
      .select(col("id"),
        transform(col("ds"), x => x("sid")).as("sh"),
        size(col("ds")).cast("long").as("m"))
      .localCheckpoint(false)
    // The doc's full capped-shingle count m rides the prefix rows
    // (r19, VERDICT r18 #9): na/nb reach the candidate pairs through
    // the self-join itself — no separate counts aggregation.
    val prefix = sets.select(col("id"), col("m"),
      explode(slice(col("sh"), lit(1),
        (col("m") - ceil(col("m") * lit(threshold)).cast("long") + 1)
          .cast("int"))).as("sid"))
    // PPJoin LENGTH FILTER in the join condition (r21, lossless):
    // J(x,y) ≥ t implies inter ≥ t(na+nb)/(1+t) and inter ≤ min(na,nb),
    // so min(na,nb) ≥ t·max(na,nb) — size-mismatched candidates are
    // pruned BEFORE the distinct exchange and the verification joins.
    // The 1e-6 slack makes the double comparison provably admit every
    // pair the exact filter downstream could accept (double rounding
    // error on t·m is ~1e-10 at worst here); false positives just get
    // verified and rejected exactly, as before.
    val cand = prefix.as("a").join(prefix.as("b"),
        col("a.sid") === col("b.sid") && col("a.id") < col("b.id") &&
          col("a.m").cast("double") >=
            col("b.m") * lit(threshold) - lit(1e-6) &&
          col("b.m").cast("double") >=
            col("a.m") * lit(threshold) - lit(1e-6))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.m").as("na"), col("b.m").as("nb"))
      .distinct()
    // Verification fetches both records' shingle arrays and intersects
    // map-side (the PPJoin paper's verify step): |cand| rows through
    // two joins against the doc-count-sized set table. The r19 shape
    // instead expanded every candidate by ALL of id_a's shingles and
    // re-joined on (id_b, shingle) — a 26M-row intermediate through an
    // exchange + pair-grouping aggregation at sf0.1 (409k candidates ×
    // ~52 shingles/doc), measured as ~60% of the entry's time. Set
    // arrays are distinct, so array_intersect's size is the exact
    // intersection count.
    val out = cand
      .join(sets.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sets.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("long")
          .as("inter"),
        col("na"), col("nb"))
    out
      .select(col("id_a"), col("id_b"), col("inter"),
        (col("na") + col("nb") - col("inter")).as("union_sz"),
        (col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .orderBy("id_a", "id_b")
  }

  /** Benchmark decontamination — the training-data step that removes
    * corpus documents overlapping an evaluation set (train/test
    * contamination): a doc is contaminated when it shares at least
    * `minHits` distinct word n-grams with ANY benchmark document.
    * Returns (id, n_hits) for contaminated docs, ordered by id.
    *
    * Scale shape: the benchmark is tiny relative to the corpus (eval
    * sets are KBs–MBs vs TBs), so its distinct shingle set is
    * BROADCAST and the corpus side is one map-side shingle explode +
    * broadcast-hash join; the only shuffle carries the HIT rows (doc
    * id + count), which are benchmark-bounded, never the corpus. No
    * UDFs — the shingle expression and joins are codegen'd built-ins.
    */
  def decontaminate(corpus: DataFrame, idCol: String, textCol: String,
      benchmark: DataFrame, benchTextCol: String, n: Int,
      minHits: Int): DataFrame =
    decontaminateShingles(
      explodeShingles(corpus, idCol, textCol, n),
      benchmark
        .select(explode(shingles(col(benchTextCol), n)).as("shingle"))
        .distinct(),
      idCol, minHits)

  /** [[decontaminate]] over pre-exploded shingle tables: `corpusSh` is
    * `(id, shingle)` (see [[explodeShingles]]), `benchSh` a distinct
    * `(shingle)` set. Lets the corpus shingle materialization be shared
    * with the near-dup pair pipeline. */
  def decontaminateShingles(corpusSh: DataFrame, benchSh: DataFrame,
      idCol: String, minHits: Int): DataFrame =
    corpusSh
      .join(org.apache.spark.sql.functions.broadcast(benchSh), Seq("shingle"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_hits"))
      .filter(col("n_hits") >= minHits)
      .select(col("id").as(idCol), col("n_hits"))
      .orderBy(idCol)

  /** Per-doc DISTINCT word n-gram shingles as SQL (DuckDB), the twin of
    * [[shingles]]: `SELECT id, shingle FROM ...`. */
  def shinglesSql(table: String, id: String, text: String, n: Int): String =
    s"""SELECT DISTINCT id, shingle FROM (
  SELECT $id AS id, tok${(1 until n).map(i => s" || ' ' || lead(tok, $i) OVER w").mkString} AS shingle
  FROM (
    SELECT $id, u.tok, u.pos
    FROM (SELECT $id, regexp_split_to_array(trim($text), '\\s+') AS arr FROM $table),
    LATERAL (SELECT unnest(arr) AS tok, generate_subscripts(arr, 1) AS pos) u
  ) WINDOW w AS (PARTITION BY $id ORDER BY pos)
  QUALIFY lead(tok, ${n - 1}) OVER w IS NOT NULL
)"""

  /** DuckDB oracle for [[decontaminate]] where the benchmark is a SQL
    * selection over a document table. */
  def decontaminateSql(corpusTable: String, id: String, text: String,
      benchSql: String, benchText: String, n: Int, minHits: Int): String =
    s"""WITH corpus_sh AS (
${shinglesSql(corpusTable, id, text, n)}
), bench_sh AS (
  SELECT DISTINCT shingle FROM (
${shinglesSql(s"($benchSql)", id, benchText, n)}
  )
)
SELECT c.id AS $id, count(*) AS n_hits
FROM corpus_sh c JOIN bench_sh b USING (shingle)
GROUP BY c.id HAVING count(*) >= $minHits ORDER BY $id"""

  /** Connected components over an undirected near-dup pair list — the
    * cluster-formation step a dedup pipeline runs after candidate
    * generation (MinHash/Jaccard pairs → dup clusters → keep one
    * canonical doc per cluster). Returns (id, comp) with comp = the
    * minimum id reachable in the component.
    *
    * Iterative min-label propagation: every node starts labeled with its
    * own id; each round takes the min label over itself and its
    * neighbors. Rounds = component diameter — near-dup clusters are
    * shallow (stars/cliques around a shared template), so few rounds —
    * and each round is ONE join+aggregation shuffling only (id, label)
    * pairs, never text. The label sum is monotonically non-increasing,
    * so convergence is an unchanged scalar sum (one cheap action per
    * round, no diff join). Each round is exactly ONE action — the new
    * label table is lazily local-checkpointed and materialized by its
    * own sum aggregation (AQE still schedules one job per query stage,
    * but the round's work executes once) — and the checkpoint truncates
    * the logical plan, so round N's analysis cost does not grow with N
    * (a persist-only chain re-analyzes an ever-growing tree; an eager
    * checkpoint doubles the action count). At cluster scale swap for a
    * reliable `checkpoint` to cheap storage. `maxIter` caps
    * pathological chains — for adversarial diameters switch to the
    * alternating large-star/small-star variant (O(log n) rounds),
    * overkill for dedup graphs.
    */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 20, reliableEvery: Int = 0): DataFrame = {
    val fwd = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
    // The edge list is re-joined every round on `dst`; pre-partitioning
    // it by the join key once means each round's join shuffles only the
    // label table (edges never move again).
    val edges = fwd
      .union(fwd.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .repartition(col("dst"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Round 1 fused into initialization: comp = min(id, min neighbor)
    // in the same aggregation that enumerates the node set (every node
    // appears as src of the undirected edge list).
    val init = edges.groupBy(col("src").as("id"))
      .agg(min(col("dst")).as("__nbr"))
      .select(col("id"), least(col("id"), col("__nbr")).as("comp"))
    // coalesce: sum over an EMPTY label table (no input pairs) is SQL
    // NULL — an empty graph must converge immediately, not NPE.
    def labelSum(df: DataFrame): Long =
      df.agg(coalesce(sum(col("comp")), lit(0L))).head().getLong(0)
    val trace: (Int, Long, Boolean) => Unit =
      if (sys.env.contains("GRAFT_CC_TRACE"))
        (r, s, c) => println(s"[cc] round $r sum=$s converged=$c")
      else (_, _, _) => ()
    // One round = min over {self label} ∪ {neighbor labels}: the
    // neighbor contributions (one join, edges side pre-partitioned)
    // unioned with the self labels, collapsed by one partial-
    // aggregated groupBy. Two label-sized shuffles per round — the
    // previous nbrMin + left-join shape paid three. Iterate.iterateUntil
    // truncates lineage per round (a dropped round's checkpoint blocks
    // are released by the ContextCleaner once its Dataset is
    // unreachable; only the current round stays pinned).
    val (labels, _, converged) = Iterate.iterateUntil(init, maxIter, trace,
      reliableEvery = reliableEvery) {
      cur =>
        val contrib = edges.join(cur, edges("dst") === cur("id"))
          .select(edges("src").as("id"), col("comp"))
        cur.unionByName(contrib)
          .groupBy("id").agg(min(col("comp")).as("comp"))
    }(labelSum)
    if (!converged)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"connectedComponents stopped at maxIter=$maxIter without label " +
          "convergence: a component's diameter exceeds the round budget " +
          "and the returned labels are NOT final. Raise maxIter or switch " +
          "to the large-star/small-star variant for deep graphs.")
    edges.unpersist()
    labels.orderBy("id")
  }

  /** DuckDB oracle for [[connectedComponents]]: transitive closure via a
    * recursive CTE over the same pair set (fine at oracle scale; the
    * Spark side is the scalable plan). */
  def connectedComponentsSql(pairsSql: String): String =
    s"""WITH RECURSIVE pairs AS (
$pairsSql
), edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
), walk(id, reach) AS (
  SELECT src, src FROM edges
  UNION
  SELECT w.id, e.dst FROM walk w JOIN edges e ON e.src = w.reach
)
SELECT id, min(reach) AS comp FROM walk GROUP BY id ORDER BY id"""

  /** Connected components via alternating large-star/small-star
    * (Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC'14) — the O(log n)-round alternative to
    * [[connectedComponents]]'s min-label propagation, whose round count
    * is the component DIAMETER. Same contract: (id, comp) with comp =
    * the component's minimum id, ordered by id.
    *
    * One round = large-star then small-star, each a single
    * groupBy(min) + join over the symmetrized edge list:
    *   - large-star: per node u with m = min(Γ(u) ∪ {u}), rewire every
    *     LARGER neighbor v > u to (v, m);
    *   - small-star: per node u with m = min of its ≤-neighbors ∪ {u},
    *     rewire those neighbors (and u itself) to (v, m).
    * Both preserve connectivity and strictly flatten long chains, so
    * the edge set converges to per-component stars rooted at the
    * minimum in O(log n) rounds — the bound that matters for
    * ADVERSARIALLY DEEP graphs (chain-of-near-dups corpora) where
    * diameter-proportional label propagation would run thousands of
    * rounds at 100 TB. Convergence is detected by edge-multiset
    * stability (count ⊕ modular checksum, one scalar action per
    * round); every round's plan is lineage-truncated through
    * [[Iterate.iterateUntil]], and each shuffles only (node, node)
    * pairs. `trace` observes (round, fingerprint, converged).
    */
  def connectedComponentsStar(pairs: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 12,
      trace: (Int, Long, Boolean) => Unit = (_, _, _) => (),
      reliableEvery: Int = 0): DataFrame = {
    val e0 = pairs.select(col(aCol).as("u"), col(bCol).as("v"))
      .filter(col("u") =!= col("v")).distinct()
    def sym(e: DataFrame): DataFrame =
      e.unionByName(e.select(col("v").as("u"), col("u").as("v")))
    def largeStar(e: DataFrame): DataFrame = {
      val s = sym(e)
      val m = s.groupBy("u").agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      // v > u ≥ m, so (v, m) is never a self-loop.
      s.join(m, "u").filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v")).distinct()
    }
    def smallStar(e: DataFrame): DataFrame = {
      val s = sym(e).filter(col("v") < col("u"))
      val m = s.groupBy("u").agg(min(col("v")).as("m"))
      val nbrs = s.join(m, "u")
        .select(col("v").as("nu"), col("m").as("nv"))
        .select(col("nu").as("u"), col("nv").as("v"))
      nbrs.unionByName(m.select(col("u"), col("m").as("v")))
        .filter(col("u") =!= col("v")).distinct()
    }
    def fingerprint(e: DataFrame): Long = {
      val r = e.agg(count(lit(1)).as("n"),
        coalesce(sum(pmod(abs(col("u")), lit(1000003L)) * 31 +
          pmod(abs(col("v")), lit(1000003L))), lit(0L)).as("s")).head()
      r.getLong(0) * 2147483647L + r.getLong(1)
    }
    val (fin, _, converged) =
      Iterate.iterateUntil(e0, maxIter, trace, reliableEvery = reliableEvery)(
        e => smallStar(largeStar(e)))(fingerprint)
    if (!converged)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"connectedComponentsStar hit maxIter=$maxIter before the edge " +
          "set stabilized; labels may be non-final. Raise maxIter " +
          "(rounds needed grow only logarithmically in graph size).")
    fin.select(col("u").as("id"), col("v").as("comp"))
      .unionByName(fin.select(col("v").as("id"), col("v").as("comp")))
      .groupBy("id").agg(min(col("comp")).as("comp"))
      .orderBy("id")
  }

  /** Line-level dedup (the CCNet/C4 boilerplate filter): drop every line
    * whose DOCUMENT frequency — the number of distinct docs containing
    * it, so within-doc repetition alone can never mark a line hot —
    * exceeds `maxDf` (headers, cookie banners, nav text), keep the rest
    * in original order, and return one row per surviving doc: (id,
    * n_kept, md5 of the reassembled text). Docs whose lines are all
    * boilerplate disappear (an empty doc is not worth keeping).
    *
    * Scale shape: three shuffles, all linear — (1) the hot-line count is
    * a partial-aggregated distinct-doc count keyed by the 16-byte line
    * hash (not the line text); (2) the anti-join keys lines by the same
    * hash, and AQE broadcasts the hot side when it is small (with a df
    * cap of k the hot set is at most total_distinct_(line,doc)/k
    * entries); (3) reassembly groups by doc id, collecting only each
    * doc's own lines (bounded by doc size). No all-pairs step anywhere.
    */
  def lineDedup(df: DataFrame, idCol: String, textCol: String,
      maxDf: Int): DataFrame = {
    val lines = df.select(col(idCol).as("id"),
      posexplode(split(col(textCol), "\n", -1)).as(Seq("pos", "line")))
    val hot = lines.groupBy(md5(trim(col("line"))).as("h"))
      .agg(countDistinct(col("id")).as("c"))
      .filter(col("c") > maxDf)
      .select(col("h"))
    val kept = lines.join(hot, md5(trim(col("line"))) === col("h"), "left_anti")
    kept.groupBy(col("id"))
      .agg(count(lit(1)).cast("int").as("n_kept"),
        md5(array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("line")))),
            x => x.getField("line")),
          "\n")).as("cleaned_fp"))
      .select(col("id").as(idCol), col("n_kept"), col("cleaned_fp"))
      .orderBy(idCol)
  }

  /** DuckDB twin of [[lineDedup]]: same split (trailing empties kept on
    * both engines), same md5(trim(line)) key, same NOT IN anti-join,
    * same in-order reassembly. */
  def lineDedupSql(table: String, id: String, text: String,
      maxDf: Int): String =
    s"""WITH parts AS (
  SELECT $id AS id, string_split($text, chr(10)) AS ls FROM $table
), lines AS (
  SELECT id, i AS pos, ls[i] AS line
  FROM parts, LATERAL (SELECT unnest(generate_series(1, len(ls))) AS i) t
), kept AS (
  SELECT * FROM lines WHERE md5(trim(line)) NOT IN (
    SELECT md5(trim(line)) FROM lines
    GROUP BY 1 HAVING count(DISTINCT id) > $maxDf)
)
SELECT id AS $id, CAST(count(*) AS INTEGER) AS n_kept,
       md5(string_agg(line, chr(10) ORDER BY pos)) AS cleaned_fp
FROM kept GROUP BY id ORDER BY id"""

  def ngramJaccardPairsSql(table: String, id: String, text: String,
      n: Int, threshold: Double, maxShingleDf: Int = 10000): String = {
    // word n-grams via token position windows; distinct shingles per doc
    s"""WITH toks AS (
  SELECT $id AS id, u.tok, u.pos
  FROM (SELECT $id, regexp_split_to_array(trim($text), '\\s+') AS arr FROM $table),
  LATERAL (SELECT unnest(arr) AS tok, generate_subscripts(arr, 1) AS pos) u
), sh0 AS (
  SELECT DISTINCT id, tok${(1 until n).map(i => s" || ' ' || lead(tok, $i) OVER w").mkString} AS shingle
  FROM toks WINDOW w AS (PARTITION BY id ORDER BY pos)
  QUALIFY lead(tok, ${n - 1}) OVER w IS NOT NULL
), sh AS (
  SELECT id, shingle FROM sh0
  WHERE shingle IN (SELECT shingle FROM sh0 GROUP BY shingle
                    HAVING count(*) <= $maxShingleDf)
), cnt AS (SELECT id, count(*) AS n_sh FROM sh GROUP BY id),
inter AS (
  SELECT a.id AS id_a, b.id AS id_b, count(*) AS inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
  GROUP BY 1, 2
)
SELECT id_a, id_b, inter, ca.n_sh + cb.n_sh - inter AS union_sz,
  CAST(inter AS DOUBLE) / (ca.n_sh + cb.n_sh - inter) AS jaccard
FROM inter JOIN cnt ca ON ca.id = id_a JOIN cnt cb ON cb.id = id_b
WHERE CAST(inter AS DOUBLE) / (ca.n_sh + cb.n_sh - inter) >= $threshold
ORDER BY id_a, id_b"""
  }

  /** Corpus-wide duplicated-span measurement (the ExactSubstr audit pass
    * of Lee et al., "Deduplicating Training Data Makes Language Models
    * Better"): per doc, the fraction of token n-gram span OCCURRENCES
    * whose span also appears in at least one OTHER document. Cross-doc
    * only — within-doc repetition is [[graft.ops.TextOps.repetitionSignals]]'
    * axis; this measures inter-document contamination, the thing span
    * removal would excise.
    *
    * Scale shape: span hashing is map-side (array transform + md5, no
    * window); then two partial-aggregated shuffles — (id, hash) counts,
    * then hash→distinct-doc counts on already-distinct rows — and one
    * hash-keyed join back. Only 16-byte hashes shuffle, never span text.
    * `dup_frac` is a double division of two exact longs — bit-identical
    * on any IEEE engine, so the oracle checks it without rounding.
    */
  /** Positional span-hash occurrences (id, pos, h) — the shared input of
    * [[spanDupStats]] and [[spanDedup]]; the md5-per-span hashing is the
    * dominant cost of both, so the catalog computes it once per
    * (session, dir) and persists. ngramArray drops only tail positions
    * (i > size-n), so the filtered array's index IS the span's start
    * token position. The hash is stored as 16 RAW md5 bytes
    * (unhex), not the 32-char hex string: grouping/join equality is
    * identical (hex encoding is bijective) while the persisted frame
    * and every downstream shuffle carry half the bytes — at 100 TB the
    * span frame is corpus-token-sized, so its width is the cost. */
  def spanOccurrences(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame =
    df.filter(trim(col(textCol)) =!= "")
      .select(col(idCol).as("id"),
        posexplode(TextOps.ngramArray(col(textCol), n)).as(Seq("pos", "span")))
      .select(col("id"), col("pos"), unhex(md5(col("span"))).as("h"))

  def spanDupStats(df: DataFrame, idCol: String, textCol: String,
      n: Int, spans: Option[DataFrame] = None): DataFrame = {
    val sp = spans.getOrElse(spanOccurrences(df, idCol, textCol, n))
    val perDoc = sp.groupBy("id", "h").agg(count(lit(1)).as("c"))
    val hot = perDoc.groupBy("h").agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") > 1)
      .select(col("h"), lit(1).as("dup"))
    perDoc.join(hot, Seq("h"), "left")
      .groupBy(col("id"))
      .agg(sum(col("c")).as("n_spans"),
        coalesce(sum(when(col("dup") === 1, col("c"))), lit(0L))
          .as("n_dup_spans"))
      .withColumn("dup_frac",
        col("n_dup_spans").cast("double") / col("n_spans").cast("double"))
      .select(col("id").as(idCol), col("n_spans"), col("n_dup_spans"),
        col("dup_frac"))
      .orderBy(idCol)
  }

  /** DuckDB twin of [[spanDupStats]]: same whitespace tokens, same
    * positional n-gram list, same cross-doc criterion. */
  def spanDupStatsSql(table: String, id: String, text: String,
      n: Int): String =
    s"""WITH base AS (
  SELECT $id AS id, regexp_split_to_array(trim($text), '\\s+') AS toks
  FROM $table WHERE trim($text) <> ''),
sp AS (
  SELECT id, md5(unnest(list_transform(
    generate_series(1, len(toks) - ${n - 1}),
    i -> array_to_string(list_slice(toks, i, i + ${n - 1}), ' ')))) AS h
  FROM base),
c AS (SELECT id, h, count(*) AS c FROM sp GROUP BY 1, 2),
d AS (SELECT h FROM c GROUP BY h HAVING count(*) > 1)
SELECT c.id AS $id, CAST(sum(c.c) AS BIGINT) AS n_spans,
  CAST(coalesce(sum(CASE WHEN d.h IS NOT NULL THEN c.c END), 0) AS BIGINT)
    AS n_dup_spans,
  CAST(coalesce(sum(CASE WHEN d.h IS NOT NULL THEN c.c END), 0) AS DOUBLE)
    / CAST(sum(c.c) AS DOUBLE) AS dup_frac
FROM c LEFT JOIN d ON c.h = d.h
GROUP BY c.id ORDER BY c.id"""

  /** ExactSubstr-lite span removal (the remediation half of
    * [[spanDupStats]]): every token n-gram span that occurs more than
    * once in the corpus — cross-doc OR within-doc, matching ExactSubstr's
    * any-repeat criterion — keeps only its globally-first occurrence
    * (smallest (doc, position)); every token covered by a later
    * occurrence is excised. Output is the per-doc manifest: surviving
    * token count and the md5 of the re-joined surviving token stream.
    * Docs whose tokens are all excised disappear (same convention as
    * [[lineDedup]]).
    *
    * Scale shape: span hashing is map-side; the first-occurrence winner
    * is one partial-aggregated shuffle on the 16-byte hash
    * (min(struct(id, pos)) — no window sort); non-first occurrences
    * explode into exactly n (id, covered-pos) rows — LINEAR in the
    * number of duplicated occurrences, never the tokens×spans range
    * join the naive coverage test would cost — and the excision is a
    * doc-keyed anti join. Reassembly groups each doc's own tokens.
    */
  def spanDedup(df: DataFrame, idCol: String, textCol: String,
      n: Int, spansIn: Option[DataFrame] = None): DataFrame = {
    val base = df.filter(trim(col(textCol)) =!= "")
    val toks = base.select(col(idCol).as("id"),
      posexplode(split(trim(col(textCol)), "\\s+")).as(Seq("pos", "tok")))
    val spans = spansIn.getOrElse(spanOccurrences(df, idCol, textCol, n))
    val winners = spans.groupBy("h")
      .agg(count(lit(1)).as("occ"),
        min(struct(col("id"), col("pos"))).as("w"))
      .filter(col("occ") > 1)
    val nonfirst = spans.join(winners, Seq("h"))
      .filter(!(col("id") === col("w.id") && col("pos") === col("w.pos")))
      .select(col("id"), col("pos"))
    val removed = nonfirst
      .select(col("id"),
        explode(sequence(col("pos"), col("pos") + lit(n - 1))).as("pos"))
      .distinct()
    toks.join(removed, Seq("id", "pos"), "left_anti")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_kept"),
        md5(array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
            x => x.getField("tok")),
          " ")).as("kept_fp"))
      .select(col("id").as(idCol), col("n_kept"), col("kept_fp"))
      .orderBy(idCol)
  }

  /** DuckDB twin of [[spanDedup]]: same 0-based positions (i - 1), same
    * (id, pos)-lexicographic winner, same n-position coverage excision. */
  def spanDedupSql(table: String, id: String, text: String,
      n: Int): String =
    s"""WITH base AS (
  SELECT $id AS id, regexp_split_to_array(trim($text), '\\s+') AS toks
  FROM $table WHERE trim($text) <> ''),
tok AS (
  SELECT id, i - 1 AS pos, toks[i] AS tok
  FROM base, LATERAL (SELECT unnest(generate_series(1, len(toks))) AS i) t),
sp AS (
  SELECT id, i - 1 AS pos,
    md5(array_to_string(list_slice(toks, i, i + ${n - 1}), ' ')) AS h
  FROM base, LATERAL (
    SELECT unnest(generate_series(1, len(toks) - ${n - 1})) AS i) t),
ranked AS (
  SELECT id, pos, count(*) OVER (PARTITION BY h) AS occ,
    row_number() OVER (PARTITION BY h ORDER BY id, pos) AS rn
  FROM sp),
removed AS (
  SELECT DISTINCT id, pos + j AS pos
  FROM (SELECT id, pos FROM ranked WHERE occ > 1 AND rn > 1) nf,
  LATERAL (SELECT unnest(generate_series(0, ${n - 1})) AS j) t),
kept AS (
  SELECT t.id, t.pos, t.tok FROM tok t
  LEFT JOIN removed r ON r.id = t.id AND r.pos = t.pos
  WHERE r.id IS NULL)
SELECT id AS $id, count(*) AS n_kept,
  md5(string_agg(tok, ' ' ORDER BY pos)) AS kept_fp
FROM kept GROUP BY id ORDER BY id"""
}
