package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators over the event stream (the `events`
  * table's schema: event_id, ts, user_id, event_type, value, props).
  *
  * The reference has no streaming surface (SURVEY §2.9); these are the
  * stream-native re-expressions of its aggregation patterns plus the
  * standard training-data-pipeline stream ops: watermarked windowed
  * aggregation and stateful sessionization via
  * `flatMapGroupsWithState`. Both transforms are written against
  * unbounded inputs — at scale, state is partitioned by key across
  * executors and bounded by the watermark.
  */
object EventStream {

  /** Field names match the events parquet schema so Dataset[Event]
    * columns line up with the DataFrame ops. */
  final case class Event(event_id: Long, ts: java.sql.Timestamp,
      user_id: Long, event_type: String, value: Double)

  final case class SessionSummary(userId: Long, nEvents: Long,
      totalValue: Double, startMs: Long, endMs: Long)

  /** Public: the state encoder's generated code must construct it. */
  final case class SessionState(nEvents: Long, totalValue: Double,
      startMs: Long, lastMs: Long)

  /** Watermarked hourly windowed aggregation — the streaming analog of
    * the batch `q_events_hourly` entry. Works on both batch and
    * streaming DataFrames (identical code path; Spark picks the
    * stateful implementation for streams).
    */
  def hourlyCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame = {
    val src =
      if (events.isStreaming) events.withWatermark("ts", watermark)
      else events
    src.groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value")).as("total_value"),
        approx_count_distinct(col("user_id")).as("approx_users"))
      .select(col("w.start").as("hour"), col("event_type"),
        col("cnt"), col("total_value"), col("approx_users"))
  }

  /** Watermarked NATIVE session_window aggregation — the streaming twin
    * of the batch [[graft.ops.Relational.sessionize]] entry (same
    * inclusive-gap merge semantics; see its boundary note). In append
    * mode a session row is emitted once the watermark passes its window
    * end (last event + gap) — bounded state, sessions evicted on
    * emission. Works on both batch and streaming frames.
    */
  def sessionWindows(events: DataFrame, gapMinutes: Int,
      watermark: String = "2 hours"): DataFrame = {
    val src =
      if (events.isStreaming) events.withWatermark("ts", watermark)
      else events
    src.groupBy(col("user_id"),
        session_window(col("ts"), s"$gapMinutes minutes"))
      .agg(min(col("ts")).as("s_start"), max(col("ts")).as("s_end"),
        count(lit(1)).as("n_events"))
      .select(col("user_id"), col("s_start"), col("s_end"),
        col("n_events"))
  }

  /** Stateful sessionization: per user, events closer than `gapMs`
    * belong to one session; a session is emitted when the group sees a
    * later event past the gap, or (with `useTimeout`) when the
    * processing-time timeout fires with no new events. State per key is
    * O(1) — the canonical `flatMapGroupsWithState` shape.
    */
  def sessionize(events: Dataset[Event], gapMs: Long,
      useTimeout: Boolean = true): Dataset[SessionSummary] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionSummary](
        OutputMode.Append(),
        if (useTimeout) GroupStateTimeout.ProcessingTimeTimeout()
        else GroupStateTimeout.NoTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(
              SessionSummary(userId, s.nEvents, s.totalValue, s.startMs, s.lastMs))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var cur = state.getOption
            val out = scala.collection.mutable.ArrayBuffer[SessionSummary]()
            for (e <- sorted) {
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.lastMs <= gapMs =>
                  cur = Some(SessionState(s.nEvents + 1, s.totalValue + e.value,
                    s.startMs, t))
                case Some(s) =>
                  out += SessionSummary(userId, s.nEvents, s.totalValue,
                    s.startMs, s.lastMs)
                  cur = Some(SessionState(1, e.value, t, t))
                case None =>
                  cur = Some(SessionState(1, e.value, t, t))
              }
            }
            cur.foreach { s =>
              state.update(s)
              if (useTimeout) state.setTimeoutDuration(gapMs)
            }
            out.iterator
          }
      }
  }

  /** Streaming exact dedup: drop repeated event ids within the watermark
    * horizon (`dropDuplicates` keeps per-key state; the watermark bounds
    * it — the streaming twin of [[graft.ops.Dedup.exactKeepFirst]]). */
  def dedupEvents(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicates("event_id")

  /** Streaming first-occurrence-per-key: emit each distinct key tuple
    * once, on first sight — the streaming twin of the corpus exact
    * dedup ([[graft.ops.Dedup]] keep-first) for a live ingest feed.
    * `dropDuplicates` over NON-event-time keys keeps one state row per
    * distinct key for the stream's lifetime (exact global dedup; state
    * is key-cardinality-sized, the same bound the batch dedup's shuffle
    * has). When the key space is unbounded and business rules allow it,
    * `dropDuplicatesWithinWatermark` trades exactness for eviction —
    * but its output then depends on arrival timing, which is exactly
    * why THIS form is the oracle-checkable one.
    */
  def firstPerKey(events: DataFrame, keys: Seq[String]): DataFrame =
    events.select(keys.map(org.apache.spark.sql.functions.col): _*)
      .dropDuplicates(keys)

  /** Streaming twin of [[graft.ops.Relational.debounce]]: emit an event
    * iff it arrives more than `gapMs` after the last emitted one for its
    * (user, type) key — burst/retry collapse on a live stream. State is
    * ONE timestamp per key (constant size), dropped once the watermark
    * passes the gap edge, so total state is bounded by the active key
    * set — the same watermark discipline as sessionization.
    *
    * Note the semantics difference from the batch lag-window form: the
    * stream compares against the last KEPT event (state is the kept
    * frontier); the batch form compares against the previous event
    * kept-or-not. StreamingSpec pins the streaming semantics on a burst
    * that distinguishes the two.
    */
  final case class DebounceState(lastKeptUs: Long)

  /** Timestamp → µs since epoch. `getTime` alone is ms-truncated, but
    * the events carry µs precision and the batch twins (and the DuckDB
    * oracle) compare at full precision — ms rounding here would flip
    * keep/drop decisions on sub-ms gap boundaries. */
  private[streaming] def micros(t: java.sql.Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  def debounceEvents(events: Dataset[Event], gapMs: Long,
      watermark: String = "10 minutes"): Dataset[Event] = {
    import events.sparkSession.implicits._
    val gapUs = gapMs * 1000L
    events
      .withWatermark("ts", watermark)
      .groupByKey(e => (e.user_id, e.event_type))
      .flatMapGroupsWithState[DebounceState, Event](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_: (Long, String), rows: Iterator[Event],
            state: GroupState[DebounceState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = rows.toSeq.sortBy(e => (micros(e.ts), e.event_id))
            var last = state.getOption.map(_.lastKeptUs)
            val out = scala.collection.mutable.ArrayBuffer[Event]()
            for (e <- sorted) {
              val t = micros(e.ts)
              if (last.forall(t - _ > gapUs)) {
                out += e
                last = Some(t)
              }
            }
            last.foreach { m =>
              state.update(DebounceState(m))
              // timeout is ms-grained: round UP so state never expires
              // before the µs-exact gap has truly passed
              state.setTimeoutTimestamp(Math.floorDiv(m + gapUs + 999L, 1000L))
            }
            out.iterator
          }
      }
  }

  /** Event-time sessionization: like [[sessionize]], but sessions close
    * when the WATERMARK (not the wall clock) passes the gap — state and
    * emission are driven purely by the data, which also makes it exactly
    * replayable. The canonical flatMapGroupsWithState +
    * EventTimeTimeout shape.
    */
  def sessionizeEventTime(events: Dataset[Event], gapMs: Long,
      watermark: String = "10 minutes"): Dataset[SessionSummary] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionSummary](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(
              SessionSummary(userId, s.nEvents, s.totalValue, s.startMs, s.lastMs))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var cur = state.getOption
            val out = scala.collection.mutable.ArrayBuffer[SessionSummary]()
            for (e <- sorted) {
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.lastMs <= gapMs =>
                  cur = Some(SessionState(s.nEvents + 1, s.totalValue + e.value,
                    s.startMs, t))
                case Some(s) =>
                  out += SessionSummary(userId, s.nEvents, s.totalValue,
                    s.startMs, s.lastMs)
                  cur = Some(SessionState(1, e.value, t, t))
                case None =>
                  cur = Some(SessionState(1, e.value, t, t))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // Close when the watermark passes the session's gap edge.
              state.setTimeoutTimestamp(s.lastMs + gapMs)
            }
            out.iterator
          }
      }
  }

  /** Episode-start row for [[episodeStarts]]. */
  final case class EpisodeStart(eventType: String, eventId: Long)

  /** Gap-episode detection via `transformWithState` (Spark 4's
    * arbitrary-state API): emit an event iff it arrives more than
    * `gapUs` after the PREVIOUS event of its (user, type) key — kept or
    * not, i.e. the lag-window semantics, so the batch twin is a plain
    * `lag()` comparison (alert-dedup / "new incident" detection).
    *
    * What the new API adds over flatMapGroupsWithState and why it's
    * the 100 TB shape:
    *  - typed per-key state handles (`ValueState[Long]`: one µs
    *    timestamp per active key, RocksDB-backed — state lives off-heap
    *    and spills to disk instead of sizing the executor heap);
    *  - first-class event-time TIMERS: each batch (re-)arms a timer at
    *    the key's gap edge, and when the WATERMARK passes it the state
    *    row is dropped. Expiry is provably lossless here: a later event
    *    at t sees watermark ≤ t, and state is only cleared once
    *    watermark > lastSeen + gap, so t − lastSeen > gap — the event
    *    starts a new episode with or without the state row. Total state
    *    is bounded by keys active within the gap horizon, not by
    *    stream lifetime — the property that keeps an unbounded ingest
    *    feed's state store flat.
    */
  class EpisodeProcessor(gapUs: Long) extends
      org.apache.spark.sql.streaming.StatefulProcessor[
        (Long, String), Event, EpisodeStart] {
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, TimeMode,
      TimerValues, TTLConfig, ValueState}

    @transient private var lastSeenUs: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      lastSeenUs = getHandle.getValueState[Long]("lastSeenUs",
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: (Long, String),
        rows: Iterator[Event], timers: TimerValues): Iterator[EpisodeStart] = {
      val sorted = rows.toArray.sortBy(e => (micros(e.ts), e.event_id))
      val out = scala.collection.mutable.ArrayBuffer[EpisodeStart]()
      var last = if (lastSeenUs.exists()) Some(lastSeenUs.get()) else None
      for (e <- sorted) {
        val t = micros(e.ts)
        if (last.forall(t - _ > gapUs)) out += EpisodeStart(key._2, e.event_id)
        last = Some(last.fold(t)(math.max(_, t)))
      }
      last.foreach { m =>
        lastSeenUs.update(m)
        // arm the eviction timer at the gap edge (event-time ms,
        // rounded UP so the µs-exact gap has truly passed when it fires)
        getHandle.registerTimer(Math.floorDiv(m + gapUs + 999L, 1000L))
      }
      out.iterator
    }

    override def handleExpiredTimer(key: (Long, String),
        timers: TimerValues, info: ExpiredTimerInfo): Iterator[EpisodeStart] = {
      // a stale timer from an earlier batch may fire before the CURRENT
      // gap edge — only clear once the horizon has really passed
      if (lastSeenUs.exists() &&
          info.getExpiryTimeInMs() * 1000L > lastSeenUs.get() + gapUs)
        lastSeenUs.clear()
      Iterator.empty
    }
  }

  def episodeStarts(events: Dataset[Event], gapUs: Long,
      watermark: String = "10 minutes"): Dataset[EpisodeStart] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(e => (e.user_id, e.event_type))
      .transformWithState(new EpisodeProcessor(gapUs),
        org.apache.spark.sql.streaming.TimeMode.EventTime(),
        OutputMode.Append())
  }

  /** Stream–stream interval join: purchases enriched with every click
    * by the same user in the preceding `windowSeconds` — the two-stream
    * attribution join. Both sides carry watermarks and the join
    * condition bounds click time to [purchase − window, purchase], so
    * Spark's state store evicts each side as the watermark passes:
    * state is bounded by (active users × window), never stream length.
    * Inner join (unmatched purchases drop): watermark-bounded OUTER
    * stream-stream joins emit nulls only on watermark advance, which a
    * test cannot drive deterministically without synthetic clock
    * control, and the batch twin (`q_range_join`) is the oracle-checked
    * truth for the semantics.
    */
  def streamStreamWindowJoin(purchases: DataFrame, clicks: DataFrame,
      windowSeconds: Long, watermark: String = "10 minutes"): DataFrame = {
    import org.apache.spark.sql.functions._
    val p = purchases.select(col("event_id").as("p_id"),
        col("user_id").as("p_user"), col("ts").as("p_ts"))
      .withWatermark("p_ts", watermark)
    val c = clicks.select(col("event_id").as("c_id"),
        col("user_id").as("c_user"), col("ts").as("c_ts"))
      .withWatermark("c_ts", watermark)
    p.join(c, expr(
      s"""p_user = c_user AND
          c_ts >= p_ts - INTERVAL $windowSeconds SECOND AND
          c_ts < p_ts"""))
  }

  /** Public: the state encoder's generated code must construct it.
    * `-1` = stage not reached (event times are epoch ms ≥ 0). */
  final case class FunnelProgress(userId: Long, stageReached: Int)

  /** Streaming N-stage funnel tracker — the per-key monotone state
    * machine (distinct from sessionization's gap state): per user,
    * stage i's time is the earliest `stages(i)` event STRICTLY AFTER
    * stage i−1's, the same rule as the batch `Relational.funnel`. Each
    * update emits the user's deepest stage reached (Update mode).
    *
    * Exactness contract (inherent to single-pass streaming state, and
    * the reason the batch twin is the oracle-checked truth): within a
    * micro-batch, events apply in event-time order, so any prefix whose
    * stage-enabling events arrive in watermark order matches the batch
    * funnel exactly. An out-of-order LATE stage-0 event still lowers
    * t0, but stage-1 events from EARLIER batches it would retroactively
    * enable were already discarded — streaming can only under-count
    * those, never over-count (every credited transition did satisfy the
    * strictly-after rule). State is stages.length longs per user —
    * watermark-independent and constant-size, so 10⁹ users is GBs
    * across a cluster's state stores.
    */
  def funnelStages(events: Dataset[Event],
      stages: Seq[String]): Dataset[FunnelProgress] = {
    import events.sparkSession.implicits._
    require(stages.nonEmpty)
    events.groupByKey(_.user_id)
      .mapGroupsWithState[Array[Long], FunnelProgress](
        GroupStateTimeout.NoTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[Array[Long]]) =>
          val t = state.getOption.getOrElse(Array.fill(stages.length)(-1L))
          for (e <- rows.toSeq.sortBy(e => micros(e.ts))) {
            val us = micros(e.ts)
            val i = stages.indexOf(e.event_type)
            if (i == 0) {
              if (t(0) == -1L || us < t(0)) t(0) = us
            } else if (i > 0 && t(i - 1) != -1L && us > t(i - 1)) {
              if (t(i) == -1L || us < t(i)) t(i) = us
            }
          }
          state.update(t)
          FunnelProgress(userId, t.lastIndexWhere(_ != -1L) + 1)
      }
  }

  final case class Attribution(userId: Long, purchaseUs: Long,
      clickUs: Long, cents: Long)

  /** Streaming LAST-TOUCH attribution — the ingestion-time twin of the
    * batch `q_attribution` window: per-user state is ONE long (the
    * latest click micros seen, the running max the batch window
    * computes), and each purchase emits its credited click and exact
    * integer cents (floor(value·100 + 0.5), the batch convention) in
    * Append mode — exactly once, in the micro-batch it arrives.
    * Within a batch, rows apply in (ts, event_id) order — the batch
    * window's ROWS frame order — so in-watermark-order replay is
    * provably equal to the batch result, which IS the oracle. State is
    * watermark-independent and constant-size: 8 bytes per user.
    */
  def attributeLastTouch(
      events: Dataset[Event]): Dataset[Attribution] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[Long, Attribution](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[Long]) =>
          var lastClick = state.getOption.getOrElse(-1L)
          val out = scala.collection.mutable.ArrayBuffer.empty[Attribution]
          for (e <- rows.toSeq.sortBy(e => (micros(e.ts), e.event_id))) {
            val us = micros(e.ts)
            if (e.event_type == "click") {
              if (us > lastClick) lastClick = us
            } else if (e.event_type == "purchase" && lastClick != -1L) {
              out += Attribution(userId, us, lastClick,
                math.floor(e.value * 100 + 0.5).toLong)
            }
          }
          state.update(lastClick)
          out.iterator
      }
  }

  final case class Latest(userId: Long, tsUs: Long, eventId: Long,
      cents: Long)

  /** Streaming CDC materialization — the ingestion-time twin of the
    * batch changelog compaction (q_changelog_compact / q_merge_upsert):
    * per-key state is the key's current LATEST row by (ts, event_id),
    * i.e. the row a CDC consumer would hold for the key, updated as
    * change events arrive and re-emitted in Update mode every
    * micro-batch the key changes in. The materialized table (last
    * emission per key) equals the batch argmax window, which IS the
    * oracle. State is constant-size (24 bytes per key), partitioned by
    * key across executors, watermark-independent. The within-batch
    * fold sees rows in ARRIVAL order — correctness does not depend on
    * it, because max-by-(ts, event_id) is commutative (spec-pinned:
    * in-order == reversed == shuffled). State is seeded from the
    * group's FIRST row, never a sentinel: a (-1,-1) dummy would be
    * emitted verbatim for a key whose events all carry pre-epoch
    * timestamps (r11 advisor finding).
    */
  def latestPerKey(events: Dataset[Event]): Dataset[Latest] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[Latest, Latest](GroupStateTimeout.NoTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[Latest]) =>
          def toLatest(e: Event): Latest =
            Latest(userId, micros(e.ts), e.event_id,
              math.floor(e.value * 100 + 0.5).toLong)
          // mapGroupsWithState only invokes the function for keys with
          // rows in the batch, so `rows` is non-empty here.
          var cur = state.getOption.getOrElse(toLatest(rows.next()))
          for (e <- rows) {
            val us = micros(e.ts)
            if (us > cur.tsUs || (us == cur.tsUs && e.event_id > cur.eventId))
              cur = toLatest(e)
          }
          state.update(cur)
          cur
      }
  }

  /** Streaming running per-key counters — the materialized-counter
    * pattern behind every live leaderboard / heavy-hitters dashboard:
    * a stateful streaming aggregation keyed (event_type, user_id)
    * holding (n, cents), re-emitted in Update mode whenever a key
    * changes. Both aggregates are COMMUTATIVE, so the final state is
    * provably arrival-order-insensitive (spec-pinned); state is
    * 16 bytes per live key, partitioned across executors, and the
    * serving-side top-k runs over the key-sized materialized view,
    * never the event stream. Works identically on batch frames
    * (Spark picks the stateful impl only for streams).
    */
  def runningCounts(events: DataFrame): DataFrame =
    events.groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("value") * 100 + lit(0.5)).cast("long")).as("cents"))

  /** Stream–static enrichment join: attach a dimension table to a live
    * event stream. The static side is broadcast-hinted — per micro-batch
    * Spark re-plans the join against the dimension's CURRENT snapshot
    * (so slowly-changing dims refresh on table update, the standard
    * production shape), and the stream side is never shuffled. An inner
    * join keeps the result append-mode compatible with any downstream
    * watermark aggregation.
    */
  def enrichWithDim(events: DataFrame, dim: DataFrame,
      eventKey: String, dimKey: String): DataFrame =
    events.join(broadcast(dim), col(eventKey) === col(dimKey), "inner")
      .drop(dimKey)

  /** Read the events parquet directory as a bounded stream (for tests
    * and replays): same schema, one file per trigger. */
  def readEventStream(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$sfDir")
      .withColumn("ts", timestamp_micros(expr("(ts - pmod(ts, 1000)) div 1000")))
  }
}
