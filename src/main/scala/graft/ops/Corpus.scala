package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-management operators for training-data pipelines: balanced
  * source mixes and sequence packing. These go beyond the reference's
  * own surface (it models single tables) — they are the operations a
  * 100 TB pretraining-data pipeline runs between dedup and tokenization.
  */
object Corpus {

  /** Deterministic stratified (per-stratum) downsampling: keep the rows
    * whose key is 0 mod the stratum's modulus — the balanced-mix step of
    * a training pipeline (e.g. downweight a crawl source 10:1, keep
    * books 1:1). A systematic key-slice instead of seeded RNG sampling,
    * so the result is engine-reproducible and stable across runs.
    * Map-side only (a filter; no shuffle): at 100 TB this costs one
    * scan, and with key-partitioned storage it prunes files.
    */
  def stratifiedSample(df: DataFrame, stratumCol: String, keyCol: String,
      moduli: Map[String, Int], defaultModulus: Int = 1): DataFrame = {
    val m = moduli.foldLeft(lit(defaultModulus)) { case (acc, (k, v)) =>
      when(col(stratumCol) === k, lit(v)).otherwise(acc)
    }
    df.filter(pmod(col(keyCol), m) === 0)
  }

  /** The WHERE clause twin of [[stratifiedSample]] for SQL oracles.
    * Emits a pmod-equivalent expression — Spark's `pmod` is always
    * non-negative while SQL `%` keeps the dividend's sign, so a bare
    * `key % m = 0`-style twin would diverge on negative keys. */
  def stratifiedSampleWhereSql(stratum: String, key: String,
      moduli: Map[String, Int], defaultModulus: Int = 1): String = {
    val cases = moduli.toSeq.sortBy(_._1).map { case (k, v) =>
      s"WHEN $stratum = '$k' THEN $v"
    }.mkString(" ")
    val m = s"(CASE $cases ELSE $defaultModulus END)"
    s"((($key % $m) + $m) % $m) = 0"
  }

  /** Exact token-budget source mixing: per source, keep documents in a
    * FROZEN order (md5 of the id — append-stable, reproducible) while
    * the running token sum stays within the source's budget — the
    * "2B tokens of wiki, 500M of forums" mixture spec, cut exactly, not
    * by sampling rate.
    *
    * Scale shape — a distributed prefix sum, NOT the naive
    * `sum() OVER (PARTITION BY source ORDER BY ord)` (whose window
    * partitions are source-sized: one dominant source = one
    * executor-crushing sorted partition). The order key's first hex
    * byte splits each source into 256 buckets; per-(source, bucket)
    * subtotals (sources×256 rows, driver-bounded) produce exclusive
    * bucket offsets that broadcast back, and the cumulative window then
    * runs per (source, bucket) — partitions 1/256th the size, same
    * exact semantics, which is what the single-window DuckDB oracle
    * checks.
    *
    * Returns the kept rows plus `run_tokens` (the inclusive running
    * total that admitted the row).
    */
  def tokenBudgetMix(df: DataFrame, sourceCol: String, idCol: String,
      tokensCol: String, budgets: Map[String, Long],
      defaultBudget: Long): DataFrame = {
    val t = df
      .withColumn("__n", col(tokensCol).cast("long"))
      .withColumn("__ord", md5(col(idCol).cast("string")))
      .withColumn("__bkt", substring(col("__ord"), 1, 2))
    val subtotals = t.groupBy(col(sourceCol).as("__src"), col("__bkt"))
      .agg(sum(col("__n")).as("__bn"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val offsets = subtotals.groupBy(_._1).toSeq.flatMap { case (src, rows) =>
      rows.toList.sortBy(_._2)
        .scanLeft((src, "", 0L)) { case ((_, _, acc), (s, b, n)) =>
          (s, b, acc + n)
        }
        .sliding(2).map { case Seq((_, _, prev), (s, b, _)) =>
          (s, b, prev)
        }
    }
    val spark = df.sparkSession
    import spark.implicits._
    val offsetsDf = offsets.toDF("__osrc", "__obkt", "__off")
    val w = Window.partitionBy(col(sourceCol), col("__bkt"))
      .orderBy(col("__ord"), col(idCol))
    val budgetCol = budgets.foldRight(lit(defaultBudget)) {
      case ((s, b), els) => when(col(sourceCol) === s, lit(b)).otherwise(els)
    }
    // Null-safe equality: a NULL source is a legitimate partition in
    // the single-window oracle; a plain === would silently drop it.
    t.join(broadcast(offsetsDf),
        col(sourceCol) <=> col("__osrc") && col("__bkt") <=> col("__obkt"))
      .withColumn("run_tokens", sum(col("__n")).over(w) + col("__off"))
      .filter(col("run_tokens") <= budgetCol)
      .drop("__n", "__ord", "__bkt", "__osrc", "__obkt", "__off")
  }

  /** DuckDB twin of [[tokenBudgetMix]] (the naive single window — the
    * SEMANTICS; the Spark side is the scalable two-level plan),
    * aggregated per source. */
  def tokenBudgetMixSql(table: String, source: String, id: String,
      tokensSql: String, budgets: Map[String, Long],
      defaultBudget: Long): String = {
    val budgetCase = "CASE " + budgets.map { case (s, b) =>
      s"WHEN src = '$s' THEN $b"
    }.mkString(" ") + s" ELSE $defaultBudget END"
    s"""WITH t AS (
  SELECT $source AS src, $id AS id, CAST($tokensSql AS BIGINT) AS n,
         md5(CAST($id AS VARCHAR)) AS ord
  FROM $table),
c AS (
  SELECT src, n, sum(n) OVER (PARTITION BY src ORDER BY ord, id
    ROWS UNBOUNDED PRECEDING) AS run
  FROM t)
SELECT src AS $source, count(*) AS n_kept,
  CAST(sum(n) AS BIGINT) AS tokens_kept
FROM c WHERE run <= $budgetCase
GROUP BY src ORDER BY $source"""
  }

  /** Temperature-based group rebalancing at α = 0.5 — the multilingual
    * LLM mixing rule (sampling weight ∝ p^α with α < 1 flattens the
    * head language/source): each group is DOWNsampled with
    * rate_g = sqrt(min_n / n_g), so the smallest group keeps everything
    * and the head shrinks toward balance. Membership is frozen by an
    * md5 threshold on the row id (append-stable, like the hash split).
    *
    * α is fixed at 0.5 ON PURPOSE: the rate enters an integer threshold
    * compare, and sqrt + division are IEEE-correctly-rounded in both
    * engines while a general pow(x, α) is only faithfully rounded —
    * libm differences could flip a boundary row. One count aggregation
    * (group-cardinality-sized), rates broadcast back, map-side filter;
    * the scan never shuffles.
    */
  def temperatureMix(df: DataFrame, groupCol: String,
      idCol: String): DataFrame = {
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("n_orig"))
    val minN = counts.agg(min(col("n_orig")).as("min_n"))
    val rates = counts.crossJoin(broadcast(minN))
      .withColumn("thresh",
        floor(sqrt(col("min_n").cast("double") / col("n_orig")) *
          lit(1000000L)).cast("long"))
      .select(col(groupCol), col("n_orig"), col("thresh"))
    val hash32 = conv(substring(md5(col(idCol).cast("string")), 1, 8),
      16, 10).cast("long")
    df.join(broadcast(rates), groupCol)
      .filter(pmod(hash32, lit(1000000L)) < col("thresh"))
      .groupBy(col(groupCol), col("n_orig"), col("thresh"))
      .agg(count(lit(1)).as("n_kept"))
      .orderBy(groupCol)
  }

  /** DuckDB twin of [[temperatureMix]]. */
  def temperatureMixSql(table: String, group: String, id: String): String =
    s"""WITH counts AS (SELECT $group, count(*) AS n_orig FROM $table GROUP BY $group),
mn AS (SELECT min(n_orig) AS min_n FROM counts),
rates AS (SELECT $group, n_orig,
  CAST(floor(sqrt(CAST(min_n AS DOUBLE) / n_orig) * 1000000) AS BIGINT)
    AS thresh FROM counts, mn)
SELECT d.$group, r.n_orig, r.thresh, count(*) AS n_kept
FROM $table d JOIN rates r USING ($group)
WHERE ('0x'||substr(md5(CAST(d.$id AS VARCHAR)),1,8))::BIGINT % 1000000
  < r.thresh
GROUP BY d.$group, r.n_orig, r.thresh ORDER BY d.$group"""

  /** Greedy sequence packing: concatenate docs (in id order) into packs
    * of at most `maxTokens` tokens — the step that turns a deduped
    * corpus into fixed-budget training sequences. Docs longer than
    * `maxTokens` are truncated into their own pack. Returns one row per
    * pack: (pack_id = first doc id, n_docs, n_tokens).
    *
    * Distributed shape: range-repartition by id + per-partition sort,
    * then a single `mapPartitions` pass — packing is embarrassingly
    * parallel per id range and nothing but (id, n_tokens) pairs move in
    * the one range shuffle. Pack boundaries are a pure function of the
    * data within each id range (each partition opens a fresh pack), so
    * the output is deterministic for a fixed partition count.
    */
  def packSequences(df: DataFrame, idCol: String, nTokensCol: String,
      maxTokens: Int, partitions: Int = 8): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val sorted = df
      .select(col(idCol).cast("long").as("id"),
        col(nTokensCol).cast("int").as("n"))
      .repartitionByRange(partitions, col("id"))
      .sortWithinPartitions("id")
    sorted.as[(Long, Int)].mapPartitions(it => packGreedy(it, maxTokens))
      .toDF("pack_id", "n_docs", "n_tokens").orderBy("pack_id")
  }

  /** Deterministic sequence packing over FIXED-WIDTH id ranges: docs are
    * grouped by `rid = id div rangeWidth`, packed greedily in id order
    * within each range, and every range opens a fresh pack. Unlike
    * [[packSequences]] (whose range boundaries come from
    * `repartitionByRange`'s sampling pass), the grouping here is a pure
    * function of the ids — the output is identical for ANY partition
    * count or data layout, which makes it SQL-expressible (see
    * [[packSequencesByRangeSql]]) and reproducible across engines. At
    * scale it is also cheaper: one hash shuffle on `rid`, no sampling
    * job. Requires non-negative ids (`div` truncates toward zero;
    * DuckDB's `//` floors — they agree on non-negatives).
    */
  def packSequencesByRange(df: DataFrame, idCol: String, nTokensCol: String,
      maxTokens: Int, rangeWidth: Long): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val sorted = df
      .select(col(idCol).cast("long").as("id"),
        col(nTokensCol).cast("int").as("n"))
      .withColumn("rid", expr(s"id div $rangeWidth"))
      .repartition(col("rid"))
      .sortWithinPartitions("rid", "id")
    sorted.select("rid", "id", "n").as[(Long, Long, Int)]
      .mapPartitions(it => packGreedyGrouped(it, maxTokens))
      .toDF("pack_id", "n_docs", "n_tokens").orderBy("pack_id")
  }

  /** DuckDB oracle for [[packSequencesByRange]]: the greedy fold is a
    * recursive CTE stepping one row at a time in (rid, id) order — fine
    * at oracle scale; the Spark side is the parallel plan. `nTokensSql`
    * is the SQL twin of the Spark-side token-count column. */
  /** The recursion walks each id-range INDEPENDENTLY (rn partitioned by
    * rid): every range advances one doc per iteration in parallel, so
    * recursion depth is bounded by docs-per-range (≤ rangeWidth for
    * unique ids) no matter the corpus size. The previous global
    * `rn = w.rn + 1` walk recursed once per document — 15k iterations
    * at 3× testdata scale ran for CPU-hours in DuckDB; this form is
    * equivalent because a rid change always closes the pack (each
    * range folds independently by construction). */
  def packSequencesByRangeSql(table: String, id: String, nTokensSql: String,
      maxTokens: Int, rangeWidth: Long): String =
    s"""WITH RECURSIVE toks AS (
  SELECT $id AS id, $id // $rangeWidth AS rid,
         LEAST($nTokensSql, $maxTokens) AS n
  FROM $table
), ord AS (
  SELECT id, rid, n,
         row_number() OVER (PARTITION BY rid ORDER BY id) AS rn FROM toks
), walk AS (
  SELECT rn, rid, id, n, id AS pack_id, n AS acc FROM ord WHERE rn = 1
  UNION ALL
  SELECT o.rn, o.rid, o.id, o.n,
    CASE WHEN w.acc + o.n <= $maxTokens THEN w.pack_id ELSE o.id END,
    CASE WHEN w.acc + o.n <= $maxTokens THEN w.acc + o.n ELSE o.n END
  FROM ord o JOIN walk w ON o.rid = w.rid AND o.rn = w.rn + 1
)
SELECT pack_id, CAST(count(*) AS INTEGER) AS n_docs,
       CAST(sum(n) AS INTEGER) AS n_tokens
FROM walk GROUP BY pack_id ORDER BY pack_id"""

  /** The grouped greedy kernel: like [[packGreedy]] but a change of
    * `rid` always closes the current pack (each id range packs
    * independently). Rows must arrive sorted by (rid, id). */
  private[graft] def packGreedyGrouped(rows: Iterator[(Long, Long, Int)],
      maxTokens: Int): Iterator[(Long, Int, Int)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Int)]
    var curRid = Long.MinValue
    var cur: (Long, Int, Int) = null
    rows.foreach { case (rid, id, n) =>
      val nn = math.min(n, maxTokens)
      if (cur == null || rid != curRid || cur._3 + nn > maxTokens) {
        if (cur != null) out += cur
        cur = (id, 1, nn)
        curRid = rid
      } else cur = (cur._1, cur._2 + 1, cur._3 + nn)
    }
    if (cur != null) out += cur
    out.iterator
  }

  /** Deterministic train/val/test assignment by content-free key hash:
    * the first hex digit of md5(key) buckets every row into 16 equal
    * slices, and `bounds` carves those into named splits — ("train","c")
    * ++ ("val","e") gives train = digits 0-b (12/16), val = c-d (2/16),
    * test = the rest. The assignment is a pure row-local function of the
    * key: map-side only, no shuffle, stable under repartitioning,
    * engine-reproducible (md5 hex is identical everywhere), and new data
    * never moves old rows between splits — the properties a 100 TB
    * pipeline needs so the eval split stays frozen across reruns.
    */
  def hashSplit(key: Column,
      bounds: Seq[(String, String)] = Seq("train" -> "c", "val" -> "e"),
      last: String = "test"): Column = {
    val h = substring(md5(key.cast("string")), 1, 1)
    bounds.foldRight(lit(last)) { case ((name, upper), els) =>
      when(h < upper, lit(name)).otherwise(els)
    }
  }

  def hashSplitSql(key: String,
      bounds: Seq[(String, String)] = Seq("train" -> "c", "val" -> "e"),
      last: String = "test"): String = {
    val h = s"substr(md5(CAST($key AS VARCHAR)), 1, 1)"
    val whens = bounds.map { case (name, upper) =>
      s"WHEN $h < '$upper' THEN '$name'"
    }.mkString(" ")
    s"CASE $whens ELSE '$last' END"
  }

  /** Deterministic global shuffle: order by md5(key) (key as the
    * tiebreak) — the "shuffle the corpus before training" step, as a
    * reproducible total order instead of an RNG permutation. At scale
    * this is one range-partitioned sort (Spark samples hash boundaries,
    * then sorts partitions independently); a prefix (`LIMIT n`) instead
    * runs as TakeOrdered without the global sort.
    */
  def deterministicShuffle(df: DataFrame, keyCol: String): DataFrame =
    df.withColumn("shuffle_key", md5(col(keyCol).cast("string")))
      .orderBy("shuffle_key", keyCol)

  /** Final corpus materialization: write `numShards` shard files whose
    * CONCATENATION in shard order is exactly the [[deterministicShuffle]]
    * order — the training-data layout step (each shard internally
    * ordered, shard boundaries deterministic). Shard assignment is a
    * pure function of the key hash's leading bits (not
    * `repartitionByRange`, whose sampled boundaries vary run to run):
    * md5 keys are uniform, so shards balance to the law of large
    * numbers, append-stable and reproducible. One exchange hashed on
    * the shard id (4× over-bucketed so shard-id hash collisions rarely
    * stack two shards on one task) + per-shard sort; every row of a
    * shard colocates in one task, so each shard is exactly ONE file.
    * Returns a manifest (shard, n_rows, first/last shuffle_key).
    */
  def writeShards(df: DataFrame, keyCol: String, numShards: Int,
      path: String): DataFrame = {
    require(numShards >= 1 && numShards <= 4096)
    val keyed = df
      .withColumn("shuffle_key", md5(col(keyCol).cast("string")))
      // leading 3 hex chars = 4096 cells, folded onto shards: contiguous
      // hash ranges per shard, so concatenating shards 0..n in order
      // reproduces the global shuffle_key order.
      .withColumn("shard",
        floor(conv(substring(col("shuffle_key"), 1, 3), 16, 10)
          .cast("long") * numShards / 4096).cast("int"))
    keyed
      .repartition(numShards * 4, col("shard"))
      .sortWithinPartitions(col("shard"), col("shuffle_key"), col(keyCol))
      .write.partitionBy("shard").mode("overwrite").parquet(path)
    keyed.sparkSession.read.parquet(path)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("shuffle_key")).as("first_key"),
        max(col("shuffle_key")).as("last_key"))
      .orderBy("shard")
  }

  /** DuckDB twin of [[deterministicShuffle]] (+ LIMIT prefix): same
    * hash, same tiebreak — kept next to the op so a semantics change
    * updates both sides in one place. */
  def deterministicShuffleSql(table: String, key: String,
      limit: Int): String =
    s"SELECT md5(CAST($key AS VARCHAR)) AS shuffle_key, $key " +
      s"FROM $table ORDER BY shuffle_key, $key LIMIT $limit"

  /** Deterministic weighted sampling WITHOUT replacement (Efraimidis–
    * Spirakis "A-ES"): each row draws priority `u^(1/w)` from a
    * md5-derived uniform `u` and its weight `w`; the k largest
    * priorities are a weighted sample without replacement — the
    * "sample documents proportional to quality score" step of a
    * training-data mix, as a pure row-local function instead of an RNG
    * stream. Any worker (or engine) recomputes the same sample with
    * zero coordination, and membership is append-stable: adding rows
    * never reshuffles the priorities of existing ones.
    *
    * `u = (h + 0.5) / 2^32` with `h` the first 8 md5 hex digits is
    * EXACT in double (h < 2^32 integral, +0.5 exact, the divisor a
    * power of two), so both engines feed bit-identical uniforms into
    * `pow`; the surfaced priority is rounded to 6 decimals because
    * `pow` itself is only ≤1-ulp reproducible across libms (the
    * q_tfidf_exact precedent). Top-k selection keys on the raw double
    * — rank-neighbor priority gaps on real data are ~1e-6, ten orders
    * above the ulp noise.
    *
    * Scale shape: the scoring is map-side (one md5 + one pow per row);
    * the top-k plans as TakeOrderedAndProject — per-partition bounded
    * heaps, then a k-row driver merge. No shuffle, no global sort, no
    * RNG state.
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
      k: Int, seed: Long): DataFrame = {
    val h = conv(substring(md5(concat(col(idCol).cast("string"),
      lit(s":$seed"))), 1, 8), 16, 10).cast("long")
    val u = (h.cast("double") + lit(0.5)) / lit(4294967296.0)
    val key = pow(u, lit(1.0) / col(weightCol).cast("double"))
    df.filter(col(weightCol) > 0)
      .select(col(idCol), col(weightCol).cast("long").as("weight"),
        key.as("__k"))
      .orderBy(col("__k").desc, col(idCol))
      .limit(k)
      .select(col(idCol), col("weight"), round(col("__k"), 6).as("priority"))
  }

  /** DuckDB twin of [[weightedSample]] — same hash, same uniform, same
    * priority arithmetic. */
  def weightedSampleSql(table: String, id: String, weight: String,
      k: Int, seed: Long): String =
    s"""WITH t AS (
  SELECT $id, $weight,
    (CAST(('0x' || substr(md5(CAST($id AS VARCHAR) || ':$seed'), 1, 8))
      AS BIGINT) + 0.5) / 4294967296.0 AS u
  FROM $table WHERE $weight > 0
)
SELECT $id, CAST($weight AS BIGINT) AS weight,
  round(pow(u, 1.0 / $weight), 6) AS priority
FROM t ORDER BY pow(u, 1.0 / $weight) DESC, $id LIMIT $k"""

  /** The pure greedy first-fit kernel over (id, nTokens) in input order:
    * one (packId = first doc id, nDocs, nTokens) row per pack; docs over
    * the budget are truncated into their own pack. Property-tested
    * directly (budget, conservation, greedy maximality). */
  private[graft] def packGreedy(rows: Iterator[(Long, Int)],
      maxTokens: Int): Iterator[(Long, Int, Int)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Int)]
    var cur: (Long, Int, Int) = null
    rows.foreach { case (id, n) =>
      val nn = math.min(n, maxTokens)
      if (cur == null || cur._3 + nn > maxTokens) {
        if (cur != null) out += cur
        cur = (id, 1, nn)
      } else cur = (cur._1, cur._2 + 1, cur._3 + nn)
    }
    if (cur != null) out += cur
    out.iterator
  }
}
