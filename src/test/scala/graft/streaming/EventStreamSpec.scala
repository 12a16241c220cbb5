package graft.streaming

import graft.streaming.EventStream.{Event, SessionSummary}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class EventStreamSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = {
    if (spark != null) spark.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
  }

  private def ts(min: Int): java.sql.Timestamp =
    new java.sql.Timestamp(1700000000000L + min * 60000L)

  test("watermarked hourly windowed aggregation over a memory stream") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val query = EventStream.hourlyCounts(mem.toDF(), watermark = "10 minutes")
      .writeStream.format("memory").queryName("hourly")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt1").toString)
      .outputMode(OutputMode.Update()).start()
    mem.addData(
      Event(1, ts(0), 10, "click", 1.0),
      Event(2, ts(5), 11, "click", 2.0),
      Event(3, ts(65), 10, "view", 5.0))
    query.processAllAvailable()
    val rows = spark.table("hourly").collect()
    assert(rows.length >= 2)
    val click = rows.find(_.getAs[String]("event_type") == "click").get
    assert(click.getAs[Long]("cnt") == 2)
    assert(click.getAs[Double]("total_value") == 3.0)
    query.stop()
  }

  test("batch and streaming hourlyCounts agree on the same input") {
    val s = spark
    import s.implicits._
    val batch = Seq(
      Event(1, ts(0), 10, "click", 1.0),
      Event(2, ts(5), 11, "click", 2.0),
      Event(3, ts(65), 10, "view", 5.0)).toDF()
    val out = EventStream.hourlyCounts(batch).collect()
    assert(out.length == 2)
    assert(out.map(_.getAs[Long]("cnt")).sum == 3)
  }

  test("streaming dedup drops repeated event ids") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val query = EventStream.dedupEvents(mem.toDF())
      .writeStream.format("memory").queryName("deduped")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt3").toString)
      .outputMode(OutputMode.Append()).start()
    mem.addData(
      Event(1, ts(0), 10, "click", 1.0),
      Event(1, ts(0), 10, "click", 1.0), // duplicate id
      Event(2, ts(1), 11, "view", 2.0))
    query.processAllAvailable()
    mem.addData(Event(2, ts(2), 11, "view", 2.0)) // dup across batches
    query.processAllAvailable()
    assert(spark.table("deduped").count() == 2)
    query.stop()
  }

  test("attributeLastTouch: batch-window tie semantics, cross-batch state, " +
      "identical under the RocksDB state store") {
    val s = spark
    import s.implicits._
    def us(min: Int): Long = EventStream.micros(ts(min))
    def run(tag: String): Seq[(Long, Long, Long, Long)] = {
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[Event]
      val query = EventStream.attributeLastTouch(mem.toDS()).toDF()
        .writeStream.format("memory").queryName(s"attr_$tag")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory(s"ckpt_attr_$tag").toString)
        .outputMode(OutputMode.Append()).start()
      mem.addData(
        Event(1, ts(0), 10, "click", 0.0),
        Event(2, ts(1), 10, "purchase", 2.5),  // credited to the ts(0) click
        Event(3, ts(2), 11, "purchase", 1.0))  // no prior click: unattributed
      query.processAllAvailable()
      mem.addData(
        // same-ts click with the SMALLER event_id precedes the purchase
        // in the batch window's (ts, event_id) ROWS frame — pinned here
        Event(4, ts(3), 10, "click", 0.0),
        Event(5, ts(3), 10, "purchase", 3.0),
        // cross-batch: state carries the ts(3) click into this batch
        Event(6, ts(4), 10, "purchase", 4.0))
      query.processAllAvailable()
      val rows = spark.table(s"attr_$tag").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(x => (x._1, x._2)).toSeq
      query.stop()
      rows
    }
    val expected = Seq(
      (10L, us(1), us(0), 250L),
      (10L, us(3), us(3), 300L),
      (10L, us(4), us(3), 400L))
    assert(run("hdfs") == expected)
    // Same pipeline, production state backend: at 100 TB the per-user
    // state lives in RocksDB, and the result must be byte-identical.
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming.state." +
      "RocksDBStateStoreProvider")
    try assert(run("rocks") == expected)
    finally saved match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("transformWithState episodes: lag semantics, state survives batches, eviction lossless") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming.state" +
      ".RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[Event]
      val query = EventStream
        .episodeStarts(mem.toDS(), gapUs = 5L * 60 * 1000000L,
          watermark = "0 seconds")
        .writeStream.format("memory").queryName("episodes")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("ckpt_tws").toString)
        .outputMode(OutputMode.Append()).start()
      // batch 1: burst within the 5 min gap -> one episode per key
      mem.addData(
        Event(1, ts(0), 10, "click", 1.0),
        Event(2, ts(1), 10, "click", 1.0), // 1 min after e1: suppressed
        Event(3, ts(0), 11, "view", 1.0))
      query.processAllAvailable()
      // batch 2: cross-batch suppression (state persisted), plus a
      // watermark-advancing event that expires (10, click)'s timer
      mem.addData(
        Event(4, ts(3), 11, "view", 1.0), // 3 min after e3: suppressed
        Event(5, ts(60), 12, "error", 1.0))
      query.processAllAvailable()
      // batch 3: (10, click) long after its (evicted) state -> episode
      mem.addData(Event(6, ts(62), 10, "click", 1.0))
      query.processAllAvailable()
      val got = spark.table("episodes").as[EventStream.EpisodeStart]
        .collect().map(_.eventId).toSet
      assert(got == Set(1L, 3L, 5L, 6L),
        s"episodes were ${got.toSeq.sorted}")
      query.stop()
    } finally spark.conf.unset(key)
  }

  test("streaming debounce keeps the burst's first event and gap-separated ones") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val query = EventStream.debounceEvents(mem.toDS(), gapMs = 60L * 60000L)
      .writeStream.format("memory").queryName("debounced")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt_db").toString)
      .outputMode(OutputMode.Append()).start()
    mem.addData(
      Event(1, ts(0), 10, "click", 1.0),   // keep (first)
      Event(2, ts(30), 10, "click", 1.0),  // 30 min after kept -> drop
      Event(3, ts(95), 10, "click", 1.0),  // 95 min after last KEPT -> keep
      Event(4, ts(120), 10, "click", 1.0), // 25 min after kept #3 -> drop
      Event(5, ts(40), 11, "click", 1.0))  // other user -> keep
    query.processAllAvailable()
    // cross-batch state: 50 min after kept #3 -> drop in a later batch.
    // (The batch lag-window form would differ here only if the PREVIOUS
    // ROW were dropped; 6 trails dropped #4 by 25 min, so both forms
    // drop it — the streaming form for the kept-frontier distance, the
    // batch form for the row distance.)
    mem.addData(Event(6, ts(145), 10, "click", 1.0))
    query.processAllAvailable()
    val kept = spark.table("debounced")
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L, 5L))
    query.stop()
  }

  test("stream-stream window join matches the batch interval predicate") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val pm = MemoryStream[Event]
    val cm = MemoryStream[Event]
    val query = EventStream.streamStreamWindowJoin(
        pm.toDF(), cm.toDF(), windowSeconds = 3600L)
      .writeStream.format("memory").queryName("ssjoin")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt_ss").toString)
      .outputMode(OutputMode.Append()).start()
    // clicks at -60, -59, -1 min (in window [-60, 0)); 0 excluded
    // (c_ts < p_ts strict); +5 excluded; other user isolated.
    cm.addData(
      Event(1, ts(0), 10, "click", 1.0),
      Event(2, ts(1), 10, "click", 1.0),
      Event(3, ts(59), 10, "click", 1.0),
      Event(4, ts(60), 10, "click", 1.0),  // == p_ts -> excluded
      Event(5, ts(65), 10, "click", 1.0),  // after -> excluded
      Event(6, ts(30), 11, "click", 1.0))  // other user
    pm.addData(Event(10, ts(60), 10, "purchase", 9.0))
    query.processAllAvailable()
    val got = spark.table("ssjoin")
      .select("p_id", "c_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((10L, 1L), (10L, 2L), (10L, 3L)))
    query.stop()
  }

  test("stream-static enrichment joins the dimension without losing rows") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((10L, "gold"), (11L, "bronze")).toDF("uid", "segment")
    val mem = MemoryStream[Event]
    val query = EventStream.enrichWithDim(mem.toDF(), dim, "user_id", "uid")
      .writeStream.format("memory").queryName("enriched")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt5").toString)
      .outputMode(OutputMode.Append()).start()
    mem.addData(
      Event(1, ts(0), 10, "click", 1.0),
      Event(2, ts(1), 11, "view", 2.0),
      Event(3, ts(2), 99, "view", 3.0)) // no dim row -> dropped (inner)
    query.processAllAvailable()
    val rows = spark.table("enriched")
      .select("event_id", "segment").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows == Map(1L -> "gold", 2L -> "bronze"))
    query.stop()
  }

  test("event-time sessionize closes sessions when the watermark passes") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val sessions = EventStream.sessionizeEventTime(mem.toDS(),
      gapMs = 10 * 60000L, watermark = "5 minutes")
    val query = sessions.writeStream.format("memory").queryName("et_sessions")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt4").toString)
      .outputMode(OutputMode.Append()).start()
    // User 10's session: two events. Then much later events from OTHER
    // users advance the watermark past 10:05 + gap -> session times out
    // and is emitted with no further user-10 input.
    mem.addData(
      Event(1, ts(0), 10, "click", 1.0),
      Event(2, ts(5), 10, "click", 2.0))
    query.processAllAvailable()
    mem.addData(Event(3, ts(60), 99, "view", 9.0))
    query.processAllAvailable()
    mem.addData(Event(4, ts(120), 98, "view", 9.0))
    query.processAllAvailable()
    val out = spark.table("et_sessions").as[SessionSummary].collect()
      .filter(_.userId == 10L)
    assert(out.length == 1, s"got ${out.toSeq}")
    assert(out(0).nEvents == 2 && out(0).totalValue == 3.0)
    query.stop()
  }

  test("sessionize groups events by gap per user") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    // No processing-time timeout in the test: with timeouts enabled the
    // query re-triggers on a wall-clock cadence, which
    // processAllAvailable cannot quiesce deterministically.
    val sessions = EventStream.sessionize(mem.toDS(), gapMs = 10 * 60000L,
      useTimeout = false)
    val query = sessions.writeStream.format("memory").queryName("sessions")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt2").toString)
      .outputMode(OutputMode.Append()).start()
    // User 10: two events 5 min apart (one session), then one 30 min
    // later (new session -> emits the first).
    mem.addData(
      Event(1, ts(0), 10, "click", 1.0),
      Event(2, ts(5), 10, "click", 2.0))
    query.processAllAvailable()
    mem.addData(Event(3, ts(35), 10, "view", 4.0))
    query.processAllAvailable()
    val out = spark.table("sessions").as[SessionSummary].collect()
    assert(out.length == 1)
    assert(out(0).userId == 10 && out(0).nEvents == 2)
    assert(out(0).totalValue == 3.0)
    assert(out(0).endMs - out(0).startMs == 5 * 60000L)
    query.stop()
  }

  test("streaming funnel matches the batch funnel on ordered arrivals") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stages = Seq("view", "click", "purchase")
    // user 10 completes all stages across two batches; user 11's click
    // precedes its view (stage 2 never fires); user 12 views only;
    // user 13's purchase skips the click stage.
    val batch1 = Seq(
      Event(1, ts(0), 10, "view", 0.0), Event(2, ts(1), 10, "click", 0.0),
      Event(3, ts(0), 11, "click", 0.0), Event(4, ts(2), 11, "view", 0.0),
      Event(5, ts(0), 12, "view", 0.0))
    val batch2 = Seq(
      Event(6, ts(3), 10, "purchase", 0.0),
      Event(7, ts(5), 13, "purchase", 0.0))
    val mem = MemoryStream[Event]
    val query = EventStream.funnelStages(mem.toDS(), stages)
      .writeStream.format("memory").queryName("funnel")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt3").toString)
      .outputMode(OutputMode.Update()).start()
    mem.addData(batch1: _*)
    query.processAllAvailable()
    mem.addData(batch2: _*)
    query.processAllAvailable()
    // Last update per user is the final stage depth.
    val finalStages = spark.table("funnel").collect()
      .map(r => (r.getLong(0), r.getInt(1)))
      .zipWithIndex.groupBy(_._1._1)
      .map { case (u, rs) => u -> rs.maxBy(_._2)._1._2 }
    assert(finalStages == Map(10L -> 3, 11L -> 1, 12L -> 1, 13L -> 0))
    query.stop()
    // Batch twin agrees: funnel counts derived from the same events.
    val allEvents = (batch1 ++ batch2).toDF()
    val b = graft.ops.Relational.funnel(allEvents, "user_id", "ts",
      "event_type", stages).head()
    assert(b.getAs[Long]("n_users") == 4L)
    assert(b.getAs[Long]("n_view") ==
      finalStages.values.count(_ >= 1).toLong)
    assert(b.getAs[Long]("n_view_click") ==
      finalStages.values.count(_ >= 2).toLong)
    assert(b.getAs[Long]("n_view_click_purchase") ==
      finalStages.values.count(_ >= 3).toLong)
  }

  test("latestPerKey CDC: running argmax is arrival-order-INSENSITIVE " +
      "(shuffled and reversed replays converge to the batch argmax); " +
      "ts ties resolve to the larger event_id") {
    val s = spark
    import s.implicits._
    // The CDC fold is a commutative max over (ts, event_id) — unlike
    // the order-sensitive replays, ANY batch split must converge to
    // the same materialized view. Events for 2 keys, with a ts tie.
    val events = Seq(
      Event(1, ts(0), 10, "update", 1.0),
      Event(2, ts(5), 10, "update", 2.0),
      Event(3, ts(5), 10, "update", 3.0),   // ts tie: id 3 beats id 2
      Event(4, ts(9), 10, "update", 4.005), // winner; cents rounds to 401
      Event(5, ts(1), 11, "update", 5.0),
      Event(6, ts(2), 11, "update", 6.0))
    val expected = Map(10L -> (4L, 401L), 11L -> (6L, 600L))
    def run(tag: String, batches: Seq[Seq[Event]]): Map[Long, (Long, Long)] = {
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[Event]
      val query = EventStream.latestPerKey(mem.toDS()).toDF()
        .writeStream.format("memory").queryName(s"cdc_$tag")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory(s"ckpt_cdc_$tag").toString)
        .outputMode(OutputMode.Update()).start()
      batches.zipWithIndex.foreach { case (b, _) =>
        mem.addData(b: _*); query.processAllAvailable()
      }
      // materialized view: per-key emissions are MONOTONE in
      // (tsUs, eventId) — state only moves forward — so the key's max
      // emission IS its final state, independent of sink row order.
      val rows = spark.table(s"cdc_$tag").collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      query.stop()
      rows.groupBy(_._1).map { case (k, rs) =>
        val best = rs.map(_._2).maxBy(t => (t._1, t._2))
        k -> (best._2, best._3)
      }
    }
    assert(run("inorder", Seq(events.take(3), events.drop(3))) == expected)
    assert(run("reversed", events.reverse.grouped(2).toSeq) == expected)
    assert(run("shuffled", Seq(Seq(events(3), events(5)),
      Seq(events(0), events(4), events(2)), Seq(events(1)))) == expected)
  }

  test("runningCounts heavy-hitters view is arrival-order-INSENSITIVE " +
      "(count and cents-sum commute): any batch split converges to the " +
      "batch groupBy") {
    val s = spark
    import s.implicits._
    val events = Seq(
      Event(1, ts(0), 10, "click", 1.0),
      Event(2, ts(1), 10, "click", 2.5),
      Event(3, ts(2), 10, "view", 3.0),
      Event(4, ts(3), 11, "click", 4.005), // cents rounds to 401
      Event(5, ts(4), 11, "click", 5.0),
      Event(6, ts(5), 10, "click", 6.0))
    // batch truth: (type, user) -> (n, cents)
    val expected = Map(
      ("click", 10L) -> (3L, 950L), ("view", 10L) -> (1L, 300L),
      ("click", 11L) -> (2L, 901L))
    def run(tag: String, batches: Seq[Seq[Event]]) = {
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[Event]
      val query = EventStream.runningCounts(mem.toDS().toDF())
        .writeStream.format("memory").queryName(s"rc_$tag")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory(s"ckpt_rc_$tag").toString)
        .outputMode(OutputMode.Update()).start()
      batches.foreach { b => mem.addData(b: _*); query.processAllAvailable() }
      // counters only grow, so a key's max (n, cents) emission IS its
      // final state regardless of sink row order.
      val rows = spark.table(s"rc_$tag").collect()
        .map(r => ((r.getString(0), r.getLong(1)), (r.getLong(2), r.getLong(3))))
      query.stop()
      rows.groupBy(_._1).map { case (k, rs) => k -> rs.map(_._2).max }
    }
    assert(run("inorder", Seq(events.take(3), events.drop(3))) == expected)
    assert(run("rev", events.reverse.grouped(2).toSeq) == expected)
    assert(run("shuf", Seq(Seq(events(5), events(3)),
      Seq(events(1), events(0), events(4)), Seq(events(2)))) == expected)
  }
}
