package graft.streaming

import java.io.File

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Event-time-ordered file replay: feed the events table through a REAL
  * file-source micro-batch stream (one file per trigger, like a log
  * shipper landing segments) into a `foreachBatch`→parquet sink, then
  * read back the materialized table. This upgrades the stateful
  * streaming operators from spec-only evidence to catalog-grade: the
  * final parquet table — produced by watermarks, state stores,
  * checkpoints, and restart-safe sinks — is hash-compared against a
  * DuckDB oracle over the SAME input (`q_debounce_stream`,
  * `q_funnel_stream`).
  *
  * Slices are contiguous (ts, event_id) ranges written in ascending
  * order, so files ARRIVE in event-time order and the stream's
  * watermark — always one micro-batch behind — can never drop a row as
  * late. That makes the streaming result provably equal to the batch
  * semantics, which is exactly the property the oracle check enforces.
  * (The global sort in the slicer is harness-only scaffolding over the
  * bounded test table; a production replay reads naturally time-ordered
  * log segments.)
  *
  * Layouts and outputs are fingerprint-keyed in tmpdir and reused
  * across JVMs (Verify and Bench runs), marker-file-guarded against
  * partial writes; timestamps are instants throughout, so no session
  * timezone leaks into the key.
  */
object Replay {

  import EventStream.Event

  private def base = s"${System.getProperty("java.io.tmpdir")}/graft_replay"

  /** Bump when operator semantics change: cached replay outputs are
    * shared across JVMs, and a stale table from an older code version
    * must never satisfy a newer oracle. */
  private val Version = 3

  private def fingerprint(sfDir: String): String = {
    val f = new File(s"$sfDir/events.parquet")
    val key = s"$sfDir:${f.lastModified}:${f.length}"
    java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8")).take(6).map("%02x".format(_)).mkString
  }

  private def deleteRecursively(f: File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(deleteRecursively)
    f.delete()
  }

  /** Pin slice arrival order EXPLICITLY: FileStreamSource orders files
    * by modification time with an unstable tie-break, and on a
    * coarse-mtime filesystem two slices written within the same tick
    * could swap micro-batches — fatal for oracles that require
    * micro-batch c to be exactly slice c (q_late_data_stream's
    * event_id-mod rule, q_neardup_stream's ascending-id cap).
    * Sequential writes USUALLY produce ascending mtimes, but nothing
    * guarantees sub-tick separation, so every data file written for
    * slice i is restamped at `anchor + 2 s · slice` (coarser spacing
    * than any real filesystem's granularity — FAT's 2 s being the
    * historical worst case). The anchor is the GENERATION time, not a
    * fixed past epoch (ADVICE r13 #3): FileStreamSource's default
    * maxFileAge (7 days, relative to the newest file it has seen)
    * would silently drop slices stamped years in the past the moment
    * any current-mtime file landed beside them — now-anchored stamps
    * keep the whole slice set inside the age window of anything a
    * stray write could introduce. A failed setLastModified degrades to
    * a warning (natural ns-granularity write mtimes almost always
    * ascend already; mtime-immutable filesystems must not turn a
    * working replay into a hard failure). Returns the updated
    * seen-file set so the caller threads it across the loop. */
  private def stampSliceMtime(dir: String, slice: Int, anchor: Long,
      before: Set[String]): Set[String] = {
    val files = Option(new File(dir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && !f.getName.startsWith("_") &&
        !f.getName.startsWith("."))
    val fresh = files.filterNot(f => before(f.getName))
    var stampFailed = false
    fresh.foreach { f =>
      if (!f.setLastModified(anchor + slice * 2000L)) {
        stampFailed = true
        System.err.println(s"[replay] WARN: setLastModified failed for " +
          s"$f — slice order falls back to natural write mtimes")
      }
    }
    // The fallback is only SOUND if the natural mtimes actually pin the
    // order (ADVICE r14 #3): on an mtime-immutable filesystem where
    // writes also collide within the mtime granularity, arrival order
    // is silently unpinned and surfaces later as a replay-gate mismatch
    // far from this cause — verify ascending NOW and fail fast instead.
    // prevMax covers stamped AND natural earlier slices: a mid-run
    // stamp failure leaves earlier slices stamped into the near future,
    // which a natural-mtime newcomer would sort BEFORE — equally fatal,
    // equally caught here.
    if (stampFailed) {
      val prevMax = files.filter(f => before(f.getName))
        .map(_.lastModified).maxOption.getOrElse(Long.MinValue)
      val newMin = fresh.map(_.lastModified).minOption.getOrElse(Long.MaxValue)
      require(newMin > prevMax,
        s"slice $slice arrival order UNPINNED in $dir: setLastModified " +
          s"failed and natural mtimes do not strictly ascend across " +
          s"slices (prev max $prevMax >= new min $newMin); a replay on " +
          "this filesystem cannot guarantee micro-batch = slice")
    }
    files.map(_.getName).toSet
  }

  /** Generation anchor for [[stampSliceMtime]]: now, rounded down to
    * the 2 s stamp grid so stamps are stable within a generation. */
  private def stampAnchor(): Long =
    (System.currentTimeMillis() / 2000L) * 2000L

  /** Materialize the events table as `slices` single-file parquet
    * segments covering contiguous (ts, event_id) ranges, written in
    * ascending order (file mtimes = arrival order for the stream). */
  private def ensureSlices(spark: SparkSession, sfDir: String,
      slices: Int): String = synchronized {
    // Version-keyed like the outputs: the slice files bake in the ts
    // TYPE the reader produced (v2 dirs hold TIMESTAMP_NTZ from the
    // pre-cast reader, which watermarks reject), not just its values.
    val dir = s"$base/in_v${Version}_${fingerprint(sfDir)}_$slices"
    val ready = new File(s"$dir/_READY")
    if (!ready.exists()) {
      deleteRecursively(new File(dir))
      val src = graft.core.Tables.read(spark, sfDir, "events")
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
      val n = src.count()
      // ONE global sort, checkpointed; the per-slice writes then scan
      // the sorted frame instead of re-sorting 6 times (the r11 driver
      // charged ~6 redundant sorts to the alphabetically-first
      // streaming entry).
      val sliced = src.withColumn("__rn",
        row_number().over(Window.orderBy(col("ts"), col("event_id"))))
        .localCheckpoint(true)
      var seen = Set.empty[String]
      val anchor = stampAnchor()
      for (i <- 0 until slices) {
        sliced
          .filter(floor((col("__rn") - 1) * lit(slices) / lit(n)) === i)
          .drop("__rn").coalesce(1)
          .write.mode("append").parquet(dir)
        seen = stampSliceMtime(dir, i, anchor, seen)
      }
      new java.io.FileOutputStream(ready).close()
    }
    dir
  }

  /** Documents sliced into ascending doc_id ranges — the crawler-
    * segment analog of [[ensureSlices]]' time-ordered event log. The
    * id ordering is load-bearing for `q_neardup_stream`: the online
    * LSH index's first-K bucket cap equals the oracle's smallest-K
    * only when ids arrive ascending across micro-batches. */
  private def docFingerprint(sfDir: String): String = {
    val f = new File(s"$sfDir/documents.parquet")
    val key = s"$sfDir:${f.lastModified}:${f.length}"
    java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8")).take(6).map("%02x".format(_)).mkString
  }

  private def ensureDocSlices(spark: SparkSession, sfDir: String,
      slices: Int): String = synchronized {
    val dir = s"$base/docin_v${Version}_${docFingerprint(sfDir)}_$slices"
    val ready = new File(s"$dir/_READY")
    if (!ready.exists()) {
      deleteRecursively(new File(dir))
      val src = graft.core.Tables.read(spark, sfDir, "documents")
        .select(col("doc_id"), col("text"))
      val n = src.count()
      val sliced = src.withColumn("__rn",
        row_number().over(Window.orderBy(col("doc_id"))))
        .localCheckpoint(true)
      var seen = Set.empty[String]
      val anchor = stampAnchor()
      for (i <- 0 until slices) {
        sliced
          .filter(floor((col("__rn") - 1) * lit(slices) / lit(n)) === i)
          .drop("__rn").coalesce(1)
          .write.mode("append").parquet(dir)
        seen = stampSliceMtime(dir, i, anchor, seen)
      }
      new java.io.FileOutputStream(ready).close()
    }
    dir
  }

  /** Run `build` over the sliced file stream with Trigger.AvailableNow,
    * appending every micro-batch (tagged with its batch id) to a
    * parquet table; returns the table re-read. Keyed+skipped when a
    * completed replay already exists. */
  private def replayTable(spark: SparkSession, sfDir: String, slices: Int,
      outTag: String, outputMode: String)(
      build: DataFrame => DataFrame): DataFrame =
    replayStream(spark, ensureSlices(spark, sfDir, slices),
      sfDir, slices, outTag, outputMode)(build)

  /** Shuffle/state partition count for replay queries. Structured
    * streaming re-plans and commits state EVERY micro-batch, so a
    * stateful replay pays (partitions × batches) state-store
    * round-trips and checkpoint files regardless of data volume; at
    * the bench's 32-thread default the bounded test corpus spends its
    * wall time on that fixed overhead (r11: 13 replays = 90.5 s = 23%
    * of the driver bench, sessions 3–9× drift on unchanged code —
    * overhead, not operator cost). 8 keeps multi-partition state
    * semantics (key redistribution, cross-partition watermark min)
    * while cutting the per-batch file/commit count 4×. A production
    * stream sizes this to volume — state partitions are a per-query
    * deployment knob (baked into the checkpoint), not operator
    * semantics, which is exactly why the harness may pin it. */
  private val ReplayPartitions = "8"

  private def replayStream(spark: SparkSession, inDir: String,
      sfDir: String, slices: Int, outTag: String, outputMode: String)(
      build: DataFrame => DataFrame): DataFrame = synchronized {
    val outDir =
      s"$base/out_v${Version}_${outTag}_${fingerprint(sfDir)}_$slices"
    val done = new File(s"$outDir/_REPLAYED")
    if (!done.exists()) {
      deleteRecursively(new File(outDir))
      val ckpt = s"$outDir.ckpt"
      deleteRecursively(new File(ckpt))
      val schema = spark.read.parquet(inDir).schema
      val spKey = "spark.sql.shuffle.partitions"
      val prevSp = spark.conf.get(spKey)
      spark.conf.set(spKey, ReplayPartitions)
      try {
        val stream = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(inDir)
        val q = build(stream).writeStream
          .outputMode(outputMode)
          .foreachBatch { (b: DataFrame, id: Long) =>
            b.withColumn("__batch", lit(id))
              .write.mode("append").parquet(outDir)
            ()
          }
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .start()
        // 15 min: a 30x-derived corpus through the heaviest replay
        // (online LSH) fits with margin; a hang still fails loudly.
        require(q.awaitTermination(900000),
          "replay stream did not terminate")
      } finally spark.conf.set(spKey, prevSp)
      new java.io.FileOutputStream(done).close()
    }
    spark.read.parquet(outDir)
  }

  /** Kept events of the stateful µs-precise debounce, replayed through
    * the real stream (append mode: the table IS the kept set). */
  def debounceReplay(spark: SparkSession, sfDir: String,
      slices: Int = 6, gapSeconds: Long = 60): DataFrame = {
    import spark.implicits._
    replayTable(spark, sfDir, slices, s"debounce_$gapSeconds", "append") {
      df => EventStream.debounceEvents(df.as[Event], gapSeconds * 1000L).toDF()
    }
  }

  /** Watermark-finalized hourly counts replayed through the file
    * stream (append mode): the materialized table holds exactly the
    * windows the final watermark (max event time − delay) closed;
    * trailing windows stay open and unemitted, and the oracle
    * reproduces that cutoff from the same input. Count-only artifact —
    * the interactive analog's float sum and HLL columns are
    * engine-specific, the window/watermark/eviction machinery is what
    * this entry gates.
    */
  def hourlyReplay(spark: SparkSession, sfDir: String,
      slices: Int = 6): DataFrame =
    replayTable(spark, sfDir, slices, "hourly", "append") { df =>
      EventStream.hourlyCounts(df)
    }.select(col("hour"), col("event_type"), col("cnt"))
      .orderBy("hour", "event_type")

  /** Watermark-finalized session_window sessions replayed through the
    * file stream (append mode): the table holds exactly the sessions
    * whose window end (last event + gap) the final watermark
    * (max event time − delay) passed; trailing sessions stay open and
    * unemitted, and the oracle reproduces that cutoff from the same
    * input — the session analog of [[hourlyReplay]]. */
  def sessionReplay(spark: SparkSession, sfDir: String,
      slices: Int = 6, gapMinutes: Int = 30): DataFrame =
    replayTable(spark, sfDir, slices, s"session_$gapMinutes", "append") {
      df => EventStream.sessionWindows(df, gapMinutes)
    }.select(col("user_id"), col("s_start"), col("s_end"),
      col("n_events"))
      .orderBy("user_id", "s_start")

  /** STREAM-STATIC enrichment join replayed through the file stream:
    * each micro-batch of events joins the static customer dimension
    * (broadcast — the static side ships once per executor, the stream
    * side never shuffles), appending enriched rows; the caller rolls
    * the table up. This is the canonical streaming-ingestion enrich
    * shape: at 100 TB/day the dimension is the small side and event
    * rows must not shuffle for a lookup. */
  def enrichReplay(spark: SparkSession, sfDir: String,
      slices: Int = 6): DataFrame = {
    val dim = graft.core.Tables.read(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
    replayTable(spark, sfDir, slices, "enrich_mkt", "append") { df =>
      df.join(org.apache.spark.sql.functions.broadcast(dim),
        df("user_id") === dim("c_custkey"))
        .select(df("event_id"), df("user_id"), df("event_type"),
          dim("c_mktsegment"))
    }
  }

  /** STREAM-STREAM event-time interval join (click→purchase
    * attribution): both sides branch from the same replayed file
    * stream; each purchase joins every click of its user in the
    * preceding hour. The 2 h watermark delay exceeds the 1 h join
    * window, so Spark's state-cleanup threshold can never evict a
    * click a future purchase still needs — with in-order replay the
    * inner-join result is provably the batch interval join, which is
    * the oracle. State per side is watermark-bounded (≤ delay+window
    * of events), the join keys on user_id — the standard attribution
    * shape at any scale. */
  def intervalJoinReplay(spark: SparkSession, sfDir: String,
      slices: Int = 6): DataFrame =
    replayTable(spark, sfDir, slices, "attrib_join", "append") { df =>
      val purchases = df.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
          col("event_id").as("p_id"))
        .withWatermark("p_ts", "2 hours")
      val clicks = df.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
          col("event_id").as("c_id"))
        .withWatermark("c_ts", "2 hours")
      purchases.join(clicks,
        col("p_user") === col("c_user") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
          col("c_ts") <= col("p_ts"))
    }

  /** STREAM-STREAM LEFT OUTER interval join — [[intervalJoinReplay]]
    * plus the outer semantic that makes streaming joins genuinely
    * different from batch: a purchase with NO click in its preceding
    * hour is held in state and emitted null-extended only when the
    * watermark proves no future click can match (state eviction via
    * the trailing no-data batch), i.e. exactly the purchases with
    * p_ts < final watermark (max event time − 2 h). Purchases past
    * the cutoff stay open and unemitted — the oracle reproduces the
    * cutoff from max(ts), the hourly/session-replay convention.
    * Matched pairs emit immediately (inner semantics); state stays
    * watermark-bounded on both sides. */
  def leftOuterJoinReplay(spark: SparkSession, sfDir: String,
      slices: Int = 6): DataFrame =
    replayTable(spark, sfDir, slices, "attrib_louter", "append") { df =>
      val purchases = df.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
          col("event_id").as("p_id"))
        .withWatermark("p_ts", "2 hours")
      val clicks = df.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
          col("event_id").as("c_id"))
        .withWatermark("c_ts", "2 hours")
      purchases.join(clicks,
        col("p_user") === col("c_user") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
          col("c_ts") <= col("p_ts"),
        "left_outer")
    }

  /** Events sliced ROUND-ROBIN by event_id (NOT time-ordered): every
    * micro-batch spans the full time range, so after batch 0 the
    * watermark jumps near (max ts − delay) and batches 1..n−1 carry
    * genuinely LATE rows — the arrival pattern the time-ordered
    * [[ensureSlices]] deliberately avoids, exercised here so
    * late-data DROP semantics are themselves under the oracle gate. */
  private def ensureRoundRobinSlices(spark: SparkSession, sfDir: String,
      slices: Int): String = synchronized {
    val dir = s"$base/inrr_v${Version}_${fingerprint(sfDir)}_$slices"
    val ready = new File(s"$dir/_READY")
    if (!ready.exists()) {
      deleteRecursively(new File(dir))
      val src = graft.core.Tables.read(spark, sfDir, "events")
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
        .localCheckpoint(true)
      var seen = Set.empty[String]
      val anchor = stampAnchor()
      for (i <- 0 until slices) {
        src.filter(pmod(col("event_id"), lit(slices)) === i)
          .coalesce(1)
          .write.mode("append").parquet(dir)
        seen = stampSliceMtime(dir, i, anchor, seen)
      }
      new java.io.FileOutputStream(ready).close()
    }
    dir
  }

  /** Watermarked hourly counts over the OUT-OF-ORDER replay: Spark
    * drops a row whose hour-window was already finalized. Empirically
    * pinned mechanics (checkpoint-offset + slice-count forensics): the
    * late FILTER for batch c uses the LAGGED watermark W(c−1) = (max
    * event time over batches 0..c−2) − delay, because a batch's
    * watermark is fixed at planning time from the previous batch's
    * recorded stats — while EVICTION/emission at batch c's end uses
    * W(c). The final table holds the filter's survivors within the
    * windows the final watermark closed; both boundaries are
    * reproduced exactly by the oracle from the deterministic slice
    * rule (batch = event_id mod slices). */
  def lateDataReplay(spark: SparkSession, sfDir: String,
      slices: Int = 6): DataFrame =
    replayStream(spark, ensureRoundRobinSlices(spark, sfDir, slices),
      sfDir, slices, "late_hourly", "append") { df =>
      EventStream.hourlyCounts(df)
    }.select(col("hour"), col("event_type"), col("cnt"))
      .orderBy("hour", "event_type")

  /** Distinct (user_id, event_type) keys emitted by the streaming
    * keep-first dedup, replayed through the real stream (append mode:
    * the table IS the emitted key set — one row per key iff the state
    * store neither lost nor re-emitted a key across micro-batches,
    * checkpoints, and shuffles; the DuckDB oracle is SELECT DISTINCT).
    */
  def dedupReplay(spark: SparkSession, sfDir: String,
      slices: Int = 6): DataFrame =
    replayTable(spark, sfDir, slices, "dedup_user_type", "append") { df =>
      EventStream.firstPerKey(df, Seq("user_id", "event_type"))
    }.select(col("user_id"), col("event_type"))
      .orderBy("user_id", "event_type")

  /** Episode starts from the `transformWithState` gap detector,
    * replayed through the real stream (append mode: the table IS the
    * episode-start set). TWS requires the RocksDB state store — set for
    * this query's start and restored after (entries run sequentially;
    * the provider is captured per query at start). */
  def episodeReplay(spark: SparkSession, sfDir: String,
      slices: Int = 6, gapSeconds: Long = 120): DataFrame = {
    import spark.implicits._
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming.state" +
      ".RocksDBStateStoreProvider")
    try {
      replayTable(spark, sfDir, slices, s"episode_$gapSeconds", "append") {
        df => EventStream.episodeStarts(df.as[Event],
          gapSeconds * 1000000L).toDF()
      }
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** Final per-user funnel progress: last emission per user across the
    * update-mode replay (row_number over descending batch id). */
  def funnelReplay(spark: SparkSession, sfDir: String,
      stages: Seq[String], slices: Int = 6): DataFrame = {
    import spark.implicits._
    val raw = replayTable(spark, sfDir, slices,
      s"funnel_${stages.mkString("_")}", "update") { df =>
      EventStream.funnelStages(df.as[Event], stages).toDF()
    }
    raw.withColumn("__rk", row_number().over(
        Window.partitionBy(col("userId")).orderBy(col("__batch").desc)))
      .filter(col("__rk") === 1)
      .select(col("userId"), col("stageReached"))
  }

  /** Streaming CDC latest-value materialization replayed through the
    * file stream (update mode: a key re-emits whenever it changes).
    * The materialized view = each key's LAST emission across batches
    * (funnelReplay's readback convention). */
  def cdcReplay(spark: SparkSession, sfDir: String,
      slices: Int = 6): DataFrame = {
    import spark.implicits._
    val raw = replayTable(spark, sfDir, slices, "cdc_latest", "update") {
      df => EventStream.latestPerKey(df.as[Event]).toDF()
    }
    raw.withColumn("__rk", row_number().over(
        Window.partitionBy(col("userId")).orderBy(col("__batch").desc)))
      .filter(col("__rk") === 1)
      .select(col("userId"), col("tsUs"), col("eventId"), col("cents"))
  }

  /** Streaming running (event_type, user_id) counters replayed through
    * the file stream (update mode: a key re-emits whenever its counts
    * change). The materialized counter view = each key's LAST emission
    * (the cdc/funnel readback convention); the batch groupBy over the
    * same events IS the oracle because both aggregates commute. */
  def topkReplay(spark: SparkSession, sfDir: String,
      slices: Int = 6): DataFrame = {
    val raw = replayTable(spark, sfDir, slices, "running_counts",
      "update")(EventStream.runningCounts)
    raw.withColumn("__rk", row_number().over(
        Window.partitionBy(col("event_type"), col("user_id"))
          .orderBy(col("__batch").desc)))
      .filter(col("__rk") === 1)
      .select(col("event_type"), col("user_id"), col("n"), col("cents"))
  }

  /** Streaming last-touch attribution replayed through the file
    * stream (append mode: each purchase's credited click is emitted
    * exactly once, in its arrival micro-batch). The readback is the
    * raw emission table; the entry rolls it up per click-day. */
  def attributionReplay(spark: SparkSession, sfDir: String,
      slices: Int = 6): DataFrame = {
    import spark.implicits._
    replayTable(spark, sfDir, slices, "attribution", "append") { df =>
      EventStream.attributeLastTouch(df.as[Event]).toDF()
    }
  }

  /** STREAM-STATIC ANTI join decontamination: documents stream in
    * id-ordered segments against the static benchmark fingerprint set
    * (broadcast — fingerprints only, never benchmark text); a doc
    * passes iff its md5 is absent. The ingestion-time twin of the
    * batch `q_decontaminate`/pipeline stage: at scale the benchmark
    * set is per-executor state and clean docs flow through without a
    * shuffle. */
  def decontamReplay(spark: SparkSession, sfDir: String,
      slices: Int = 6): DataFrame = {
    val bench = graft.core.Tables.read(spark, sfDir, "documents")
      .filter(pmod(col("doc_id"), lit(101)) === 0)
      .select(md5(col("text")).as("__fp")).distinct()
    val inDir = ensureDocSlices(spark, sfDir, slices)
    replayStream(spark, inDir, sfDir, slices,
      s"decontam_${docFingerprint(sfDir)}", "append") { df =>
      df.join(org.apache.spark.sql.functions.broadcast(bench),
          md5(col("text")) === col("__fp"), "left_anti")
        .select(col("doc_id"))
    }.select(col("doc_id")).orderBy("doc_id")
  }

  /** Candidate near-dup pairs from the ONLINE LSH index
    * ([[DocStream.lshCandidates]]), replayed over id-ordered document
    * segments (append mode: each pair is emitted exactly once, when its
    * later doc joins a shared bucket). Readback rolls pair emissions up
    * to (id_a, id_b, n_bands) — the same artifact as the batch LSH
    * pipeline, hash-compared against DocStream.neardupStreamSql. */
  def neardupReplay(spark: SparkSession, sfDir: String,
      slices: Int = 6, cap: Int = 50): DataFrame = {
    import spark.implicits._
    val inDir = ensureDocSlices(spark, sfDir, slices)
    // outTag carries the DOCUMENTS fingerprint: replayStream's own
    // cache key fingerprints events.parquet, which this entry never
    // reads — a regenerated documents file must invalidate the output.
    replayStream(spark, inDir, sfDir, slices,
      s"neardup_${cap}_${docFingerprint(sfDir)}", "append") {
      df => DocStream.lshCandidates(
        DocStream.bandRows(df, "doc_id", "text").as[DocStream.BandRow],
        cap).toDF()
    }.groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_bands"))
      .orderBy("id_a", "id_b")
  }
}
