package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational analytics operators that need more than a declarative
  * one-liner to be scale-safe.
  */
object Relational {

  /** Two-table point-in-time join on the custom Catalyst operator
    * ([[org.apache.spark.sql.graft.AsofJoinExec]]): each left row gets
    * the right row with the same key and the largest right ts ≤ its ts
    * (nulls if none) — pandas merge_asof / DuckDB ASOF LEFT JOIN.
    * One exchange + sort per side (sort-merge-join cost), O(1) merge
    * state per partition — or, when the right side's stats fit under
    * autoBroadcastJoinThreshold (or `broadcast = Some(true)`), a
    * broadcast exec that leaves the left side entirely unshuffled and
    * unsorted. Column names must be disjoint across sides.
    */
  def asofJoinTables(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String,
      direction: String = "backward",
      toleranceUs: Long = -1L,
      broadcast: Option[Boolean] = None): DataFrame =
    org.apache.spark.sql.graft.AsofJoin.asofJoin(
      left, right, leftKey, rightKey, leftTs, rightTs,
      direction, toleranceUs, broadcast)

  /** Event debounce (telemetry burst collapse): flag each row as kept
    * iff it is the first in its (keys) group or arrived more than
    * `gapSeconds` after its predecessor — the standard batch dedup for
    * retry storms / double-fires before sessionization or counting.
    * Marks rather than filters so callers can audit drop rates; filter
    * on `debounce_keep` to apply.
    *
    * Scale shape: one shuffle on the (typically high-cardinality) key
    * tuple + per-partition sort — identical cost profile to
    * sessionization, no self-join. The gap compares timestamp
    * DIFFERENCES to an interval (engine-portable; avoids epoch-cast
    * truncation mismatches between µs and ns readers).
    */
  def debounce(df: DataFrame, keys: Seq[String], tsCol: String,
      tieCol: String, gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol), col(tieCol))
    val gap = col(tsCol) - lag(col(tsCol), 1).over(w)
    df.withColumn("debounce_keep",
      gap.isNull || gap > expr(s"INTERVAL $gapSeconds SECOND"))
  }

  /** Exact top-k rows per group, safe for LOW-cardinality (or skewed)
    * group keys where the plain `row_number() OVER (PARTITION BY g)`
    * window would sort data-sized partitions (3 groups over a fact
    * table = 3 executor-crushing sorts).
    *
    * Phase 1 prunes each INPUT partition to its local top-k per group
    * with a bounded heap (`mapPartitions`, zero shuffle, memory =
    * groups·k rows per partition); phase 2 runs the rank window on the
    * pruned union, whose per-group size is ≤ k·numInputPartitions
    * instead of data-sized. Semantics are identical to the plain window
    * because a row in the global top-k is necessarily in its input
    * partition's local top-k.
    *
    * Ordering: `orderCol` DESC, then `tieCols` ASC as the unique
    * tie-break. All ordering fields must be non-null Comparables
    * (numerics, strings, timestamps); the group key may be any
    * non-null type.
    */
  def topKPerGroup(df: DataFrame, groupCol: String, orderCol: String,
      tieCols: Seq[String], k: Int): DataFrame = {
    require(k > 0)
    val cols = Seq(groupCol, orderCol) ++ tieCols
    val proj = df.select(cols.map(col): _*)
    val nFields = cols.length
    // Rank order: orderCol desc, ties asc. Reversed (worst-first) it is
    // the heap order, so the heap head is always the eviction victim.
    val rankOrd: Ordering[Row] = new Ordering[Row] {
      private def cmp(a: Any, b: Any): Int =
        a.asInstanceOf[Comparable[Any]].compareTo(b)
      override def compare(x: Row, y: Row): Int = {
        var c = -cmp(x.get(1), y.get(1))
        var i = 2
        while (c == 0 && i < nFields) { c = cmp(x.get(i), y.get(i)); i += 1 }
        c
      }
    }
    val pruned = proj.mapPartitions { rows =>
      val heaps = scala.collection.mutable.Map
        .empty[Any, scala.collection.mutable.PriorityQueue[Row]]
      rows.foreach { r =>
        val h = heaps.getOrElseUpdate(r.get(0),
          scala.collection.mutable.PriorityQueue.empty[Row](rankOrd))
        h.enqueue(r)
        if (h.size > k) h.dequeue()
      }
      heaps.valuesIterator.flatMap(_.iterator)
    }(Encoders.row(proj.schema))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(orderCol).desc +: tieCols.map(col(_).asc): _*)
    pruned.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
      .orderBy(col(groupCol) +: (col(orderCol).desc +:
        tieCols.map(col(_).asc)): _*)
  }

  /** Changelog/CDC compaction: keep the LATEST record per key, ordered
    * by `orderCols` lexicographically (make the tuple total — e.g.
    * (ts, event_id) — so the winner is deterministic). The upsert-log →
    * current-state step every incremental pipeline runs before joining
    * dimension state.
    *
    * Scale shape: `max_by(struct(payload), struct(order))` is a plain
    * partial-aggregable agg — each map task keeps ONE candidate row per
    * key, so the exchange carries keys × partitions rows, group skew
    * (one hot entity with millions of updates) collapses at the
    * mappers, and nothing sorts. The window formulation
    * (`row_number() OVER (PARTITION BY key ORDER BY ...) = 1` — the
    * oracle) shuffles and sorts the full log instead.
    */
  def latestByKey(df: DataFrame, keyCol: String, orderCols: Seq[String],
      payloadCols: Seq[String]): DataFrame =
    df.groupBy(col(keyCol))
      .agg(max_by(struct(payloadCols.map(col): _*),
        struct(orderCols.map(col): _*)).as("__last"))
      .select(col(keyCol) +: payloadCols.map(c => col(s"__last.$c").as(c)): _*)

  /** Skew-salted equi-join: spread each (possibly hot) join key of the
    * big side over `buckets` sub-keys via a deterministic per-row salt,
    * replicate the dim side to every bucket, and join on (key, salt) —
    * semantically identical to the plain join (the oracle checks
    * exactly that), but the shuffle hash-partitions on the WIDENED key,
    * so one hot key's rows land on `buckets` reducers instead of one.
    *
    * When to reach for it at 100 TB: both sides too big to broadcast
    * and the key histogram has a head (a celebrity user, a default
    * value) — the case AQE's skew-join handling covers only for
    * sort-merge joins it can split, and plain hash partitioning turns
    * into a single-task straggler. The salt must come from a column
    * that varies WITHIN the hot key (a row id), never from the key
    * itself. Dim replication is `buckets`× — keep buckets small (8-64)
    * and the dim narrow.
    */
  def saltedJoin(big: DataFrame, dim: DataFrame, key: String,
      rowKey: org.apache.spark.sql.Column, buckets: Int): DataFrame = {
    require(buckets >= 1)
    val salted = big.withColumn("__salt", pmod(hash(rowKey), lit(buckets)))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Skew-salted distinct-count aggregation: `count(DISTINCT d)`, `sum`,
    * and `count(*)` per group key, computed as TWO cascaded partial
    * aggregations instead of one.
    *
    * The plain `groupBy(key).agg(countDistinct(d))` plan shuffles every
    * (key, d) pair to the one reducer owning `key` — with a handful of
    * hot keys over a fact table that is a single-task straggler (partial
    * map-side aggregation cannot help a distinct). Stage 1 here groups by
    * (key, salt) where salt = hash(d) % buckets: each distinct `d` value
    * lands in exactly one salt bucket, so per-bucket distinct counts are
    * disjoint and stage 2's plain sum over the `buckets`-bounded rows is
    * exact — not an approximation. Additive aggregates (sum/count)
    * cascade trivially. This is the generic two-stage skew pattern:
    * AQE's skew handling covers joins, not single-key aggregation
    * hotspots, so the salt must be in the plan.
    */
  def saltedDistinctAgg(df: DataFrame, keyCol: String, distinctCol: String,
      sumCol: String, buckets: Int = 64): DataFrame =
    df.groupBy(col(keyCol),
        pmod(hash(col(distinctCol)), lit(buckets)).as("__salt"))
      .agg(countDistinct(col(distinctCol)).as("__nd"),
        sum(col(sumCol)).as("__sum"),
        count(lit(1)).as("__cnt"))
      .groupBy(col(keyCol))
      .agg(sum(col("__nd")).as(s"n_distinct"),
        sum(col("__sum")).as(s"sum_val"),
        sum(col("__cnt")).as("cnt"))
      .orderBy(keyCol)

  /** DuckDB twin of [[saltedDistinctAgg]] — the UNsalted declarative
    * form, because the salting is a physical rewrite with identical
    * semantics (that equality is exactly what the oracle checks). */
  def saltedDistinctAggSql(table: String, key: String, distinct: String,
      sumCol: String): String =
    s"SELECT $key, count(DISTINCT $distinct) AS n_distinct, " +
      s"sum($sumCol) AS sum_val, count(*) AS cnt " +
      s"FROM $table GROUP BY $key ORDER BY $key"

  /** Bucketed interval join ("how many right-events in the window
    * [leftTs − window, leftTs) per left-event, same key"), the scale-safe
    * formulation of an event range join.
    *
    * The naive `ON l.key = r.key AND r.ts BETWEEN ...` plan degenerates
    * to a per-key cartesian (BroadcastNestedLoopJoin or a sort-merge
    * over every key pair) because Catalyst has no equi-bucket for the
    * range predicate. Bucketing time into `window`-sized cells restores
    * an EQUI-join: a right row in [leftTs − window, leftTs) necessarily
    * lives in the left row's cell or the one before it, so the left side
    * explodes to exactly 2 (key, cell) probes, the join runs hash-
    * partitioned on (key, cell), and the range check is a residual
    * filter — candidate multiplicity is bounded by per-cell density, not
    * per-key history. A LEFT join keeps zero-match left events (`count`
    * over the right timestamp ignores the null rows; a right row can
    * match only the probe equal to its own cell, so nothing double-
    * counts).
    *
    * Returns per-key totals: n_left events, n_matches in-window.
    */
  def rangeJoinBucketed(events: DataFrame, keyCol: String, tsCol: String,
      leftType: String, rightType: String, typeCol: String,
      idCol: String, windowSec: Long): DataFrame = {
    val cellUs = windowSec * 1000000L
    val left = events.filter(col(typeCol) === leftType)
      .select(col(keyCol).as("k"), col(idCol).as("lid"), col(tsCol).as("lts"),
        floor(unix_micros(col(tsCol)) / cellUs).as("cell"))
      .withColumn("probe", explode(array(col("cell"), col("cell") - 1)))
    val right = events.filter(col(typeCol) === rightType)
      .select(col(keyCol).as("rk"), col(tsCol).as("rts"),
        floor(unix_micros(col(tsCol)) / cellUs).as("rcell"))
    left.join(right,
        col("k") === col("rk") && col("probe") === col("rcell") &&
          col("rts") >= col("lts") - expr(s"INTERVAL $windowSec SECOND") &&
          col("rts") < col("lts"),
        "left")
      .groupBy(col("k").as(keyCol))
      .agg(countDistinct(col("lid")).as("n_left"),
        count(col("rts")).as("n_matches"))
      .orderBy(keyCol)
  }

  /** DuckDB twin of [[rangeJoinBucketed]] — the declarative range join
    * (the engine is free to nested-loop it at oracle scale). */
  def rangeJoinBucketedSql(table: String, key: String, ts: String,
      leftType: String, rightType: String, typeCol: String,
      idCol: String, windowSec: Long): String =
    s"""WITH l AS (
  SELECT $key AS k, $idCol AS lid, $ts AS lts FROM $table
  WHERE $typeCol = '$leftType'
), r AS (
  SELECT $key AS k, $ts AS rts FROM $table WHERE $typeCol = '$rightType'
)
SELECT l.k AS $key, count(DISTINCT l.lid) AS n_left,
       count(r.rts) AS n_matches
FROM l LEFT JOIN r ON r.k = l.k
  AND r.rts >= l.lts - INTERVAL $windowSec SECOND AND r.rts < l.lts
GROUP BY l.k ORDER BY $key"""

  /** N-stage event funnel: per entity, stage i's timestamp is the
    * earliest `stages(i)` event STRICTLY AFTER stage i−1's timestamp
    * (stage 0 is the plain earliest). Output is one row of entity
    * counts — `n_users`, then one cumulative-entry count per stage
    * named by the joined stage prefix (n_view, n_view_click, …).
    *
    * The chained condition is what one-pass groupBy aggregation cannot
    * express: each min is conditioned on the previous stage's result.
    * All stage windows share one exchange on the entity key (same
    * partitioning, no ORDER BY → no per-partition sort), the per-entity
    * collapse and final rollup move only entity-count rows.
    */
  def funnel(df: DataFrame, userCol: String, tsCol: String,
      typeCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val w = Window.partitionBy(col(userCol))
    val tCols = stages.indices.map(i => s"__t_$i")
    val staged = stages.zipWithIndex.foldLeft(df) { case (acc, (st, i)) =>
      val cond =
        if (i == 0) col(typeCol) === st
        else col(typeCol) === st && col(tsCol) > col(tCols(i - 1))
      acc.withColumn(tCols(i), min(when(cond, col(tsCol))).over(w))
    }
    val countCols = stages.indices.map { i =>
      count(col(tCols(i))).as("n_" + stages.take(i + 1).mkString("_"))
    }
    staged.select((userCol +: tCols).map(col): _*).distinct()
      .agg(count(lit(1)).as("n_users"), countCols: _*)
  }

  /** Slowly-changing-dimension type-2 build from a change log: collapse
    * each key's event stream to its state-CHANGE rows (consecutive
    * repeats of the same state open no new version), then close every
    * version with the next change's timestamp — `[valid_from,
    * valid_to)` intervals with `valid_to IS NULL` (flagged
    * `is_current`) on the live version. The standard way a warehouse
    * derives a temporal dimension from an append-only CDC/event feed.
    *
    * Scale shape: ONE exchange on the key and ONE per-partition sort —
    * the change-collapse `lag`, the filter, and the interval-closing
    * `lead` all use the same (key, ts, tie) window, and a Filter
    * preserves child ordering/partitioning, so EnsureRequirements
    * inserts nothing between the two window operators. No self-join
    * (the naive formulation joins the log to itself on "next change"),
    * no data-sized window frames — each frame advances one row.
    */
  def scd2(df: DataFrame, key: String, state: String, tsCol: String,
      tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(tsCol), col(tieCol))
    df.withColumn("__prev", lag(col(state), 1).over(w))
      .filter(col("__prev").isNull || col("__prev") =!= col(state))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .select(col(key), col(state), col(tsCol).as("valid_from"),
        col("valid_to"),
        when(col("valid_to").isNull, 1).otherwise(0).as("is_current"))
  }

  /** DuckDB twin of [[scd2]] (ANSI window functions, runs on both
    * engines verbatim). */
  def scd2Sql(table: String, key: String, state: String, ts: String,
      tie: String): String =
    s"""WITH ordered AS (
  SELECT $key, $ts, $tie, $state,
    lag($state) OVER (PARTITION BY $key ORDER BY $ts, $tie) AS prev
  FROM $table
), changes AS (
  SELECT $key, $ts, $tie, $state FROM ordered
  WHERE prev IS NULL OR prev <> $state
)
SELECT $key, $state, $ts AS valid_from,
  lead($ts) OVER (PARTITION BY $key ORDER BY $ts, $tie) AS valid_to,
  CASE WHEN lead($ts) OVER (PARTITION BY $key ORDER BY $ts, $tie)
    IS NULL THEN 1 ELSE 0 END AS is_current
FROM changes ORDER BY $key, valid_from"""

  /** Batch sessionization on Spark's NATIVE `session_window` — the
    * declarative twin of the transformWithState episode operator
    * ([[graft.streaming.EventStream]]): events of one key merge into a
    * session while each is within `gapMinutes` of the previous; per
    * session emit (key, first ts, last ts, count).
    *
    * Boundary semantics (spec-pinned in OpsSpec): an event exactly
    * `gapMinutes` after its predecessor still MERGES — Spark's session
    * window end is inclusive (`ts + gap` itself belongs to the
    * session), so the oracle's new-session test is strict `>`.
    *
    * Scale shape: one exchange on the key; session merging happens
    * inside Spark's native UpdatingSessionsExec + partial aggregation —
    * no self-join, no data-sized window frame. Output is session-sized,
    * not event-sized.
    */
  def sessionize(df: DataFrame, keyCol: String, tsCol: String,
      gapMinutes: Int): DataFrame =
    df.groupBy(col(keyCol), session_window(col(tsCol), s"$gapMinutes minutes"))
      .agg(min(col(tsCol)).as("s_start"), max(col(tsCol)).as("s_end"),
        count(lit(1)).as("n_events"))
      .select(col(keyCol), col("s_start"), col("s_end"), col("n_events"))
      .orderBy(col(keyCol), col("s_start"))

  /** DuckDB twin of [[sessionize]]: classic lag-gap flag + running-sum
    * session ids. New-session test is strict `>` (see boundary note). */
  def sessionizeSql(table: String, key: String, ts: String,
      gapMinutes: Int): String =
    s"""WITH m AS (
  SELECT $key, $ts,
    CASE WHEN lag($ts) OVER w IS NULL
      OR $ts - lag($ts) OVER w > INTERVAL '$gapMinutes minutes'
    THEN 1 ELSE 0 END AS new_s
  FROM $table WINDOW w AS (PARTITION BY $key ORDER BY $ts)
), s AS (
  -- RANGE (not ROWS): a tie group at a session start has exactly one
  -- new_s=1 row, and RANGE's peer-inclusive frame gives every tied row
  -- the same running sum regardless of tie order — ROWS would let sid
  -- depend on the engine's sort order among equal timestamps.
  SELECT $key, $ts, sum(new_s) OVER
    (PARTITION BY $key ORDER BY $ts RANGE UNBOUNDED PRECEDING) AS sid
  FROM m)
SELECT $key, min($ts) AS s_start, max($ts) AS s_end,
  CAST(count(*) AS BIGINT) AS n_events
FROM s GROUP BY $key, sid ORDER BY $key, s_start"""

  /** Table reconciliation (data-diff): classify every key of two
    * snapshot versions as added / removed / changed-per-column /
    * unchanged, in ONE co-partitioned full-outer join on the key plus
    * ONE aggregate pass — the warehouse audit primitive (what
    * datacompy / Delta CHANGE FEED reconstruction / migration
    * validation runs). At 100 TB both sides shuffle once on the key
    * (or zero times if both are bucketed by it); the output is a
    * fixed metric census, never row-sized. Compared columns must be
    * null-safe-equatable; `<=>` handles nulls on either side.
    *
    * Null KEYS never match an equi-join, so without care a null-key
    * row lands in no bucket and the census stops conserving row
    * counts — fatal for an audit primitive (r11 advisor finding).
    * Presence flags (`__lp`/`__rp`) distinguish "row exists with a
    * null key" from "no match": null-key rows are counted in explicit
    * `null_key_left`/`null_key_right` metrics, and
    * added+removed+changed_any+unchanged+null_key_* == |L|+|R| always.
    */
  def tableDiff(left: DataFrame, right: DataFrame, key: String,
      cols: Seq[String]): DataFrame = {
    val l = left.select(col(key).as("__k"), lit(1).as("__lp"),
      struct(cols.map(col): _*).as("__l"))
    val r = right.select(col(key).as("__k2"), lit(1).as("__rp"),
      struct(cols.map(col): _*).as("__r"))
    val j = l.join(r, col("__k") === col("__k2"), "full_outer")
    val added = sum((col("__lp").isNull && col("__rp").isNotNull &&
      col("__k2").isNotNull).cast("long")).as("added")
    val removed = sum((col("__lp").isNotNull && col("__rp").isNull &&
      col("__k").isNotNull).cast("long")).as("removed")
    val nullKeyLeft = sum((col("__lp").isNotNull && col("__k").isNull)
      .cast("long")).as("null_key_left")
    val nullKeyRight = sum((col("__rp").isNotNull && col("__k2").isNull)
      .cast("long")).as("null_key_right")
    val both = col("__lp").isNotNull && col("__rp").isNotNull
    val changedCols = cols.map { c =>
      sum((both && !(col(s"__l.$c") <=> col(s"__r.$c"))).cast("long"))
        .as(s"changed_$c")
    }
    val anyChanged = cols.map(c => !(col(s"__l.$c") <=> col(s"__r.$c")))
      .reduce(_ || _)
    val changedAny = sum((both && anyChanged).cast("long"))
      .as("changed_any")
    val unchanged = sum((both && !anyChanged).cast("long")).as("unchanged")
    val aggCols = Seq(added, removed, changedAny, unchanged,
      nullKeyLeft, nullKeyRight) ++ changedCols
    val wide = j.agg(aggCols.head, aggCols.tail: _*)
    // Unpivot the single census row to (metric, value) — stable shape
    // no matter how many columns are compared.
    val metrics = Seq("added", "removed", "changed_any", "unchanged",
      "null_key_left", "null_key_right") ++
      cols.map(c => s"changed_$c")
    wide.select(explode(array(metrics.map(m =>
        struct(lit(m).as("metric"), col(m).as("value"))): _*)).as("kv"))
      .select(col("kv.metric"), col("kv.value"))
      .orderBy("metric")
  }
}
