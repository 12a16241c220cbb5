package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Replay harness over the REAL driver fixture
  * (`/root/testdata/sf0.001/events.parquet`) — not synthetic frames.
  *
  * Exists because of the r7/r8 breakage: EventStreamSpec builds its own
  * LTZ MemoryStream frames, so when the driver regenerated the fixture
  * with a µs TIMESTAMP_NTZ `ts`, every watermark in the replay path
  * threw EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE in the bench while
  * `sbt test` stayed green for two rounds. This spec drives the same
  * parquet file the bench reads through the same `Replay` entrypoints,
  * so a physical-type change in the fixture fails HERE first.
  */
class ReplaySpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"
  private def fixtureExists =
    new java.io.File(s"$sfDir/events.parquet").exists()

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = {
    if (spark != null) spark.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
  }

  test("fixture events.ts surfaces as TIMESTAMP through Tables.read") {
    assume(fixtureExists)
    val t = graft.core.Tables.read(spark, sfDir, "events")
    assert(t.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    // The two consumers the NTZ fixture broke must both analyze:
    // epoch extraction and a streaming watermark.
    assert(t.select(unix_micros(col("ts"))).head.getLong(0) != 0L)
  }

  test("debounce replay over the real fixture matches batch semantics") {
    assume(fixtureExists)
    val kept = Replay.debounceReplay(spark, sfDir, slices = 4)
    val n = kept.count()
    val total = graft.core.Tables.read(spark, sfDir, "events").count()
    assert(n > 0 && n <= total)
    // Batch twin: keep a row iff gap to the previous event of the same
    // (user_id, event_type) is > 60 s — the stream's in-order replay
    // must reproduce it exactly.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id", "event_type").orderBy("ts")
    val batch = graft.core.Tables.read(spark, sfDir, "events")
      .withColumn("__prev", lag(col("ts"), 1).over(w))
      .filter(col("__prev").isNull ||
        unix_micros(col("ts")) - unix_micros(col("__prev")) > 60L * 1000000L)
    assert(n == batch.count())
  }

  test("hourly replay over the real fixture emits closed windows only") {
    assume(fixtureExists)
    val hourly = Replay.hourlyReplay(spark, sfDir, slices = 4)
    assert(hourly.count() > 0)
    assert(hourly.columns.toSeq == Seq("hour", "event_type", "cnt"))
  }

  test("episode replay over the real fixture analyzes and emits") {
    assume(fixtureExists)
    val episodes = Replay.episodeReplay(spark, sfDir, slices = 4)
    assert(episodes.count() > 0)
  }

  test("session replay emits only watermark-closed sessions") {
    assume(fixtureExists)
    val sessions = Replay.sessionReplay(spark, sfDir, slices = 4)
    val events = graft.core.Tables.read(spark, sfDir, "events")
    val mx = events.agg(max(col("ts"))).head.getTimestamp(0).getTime
    val closed = sessions.collect()
    assert(closed.nonEmpty)
    // every emitted session's window end (last event + gap) is at or
    // before the final watermark (max ts - 2h)
    closed.foreach { r =>
      val end = r.getTimestamp(2).getTime
      assert(end + 30 * 60 * 1000L <= mx - 2 * 3600 * 1000L,
        s"unclosed session emitted: $r")
    }
  }

  test("neardup replay: streamed pair set equals rank-capped batch banding") {
    assume(new java.io.File(s"$sfDir/documents.parquet").exists())
    val streamed = Replay.neardupReplay(spark, sfDir, slices = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // Batch formulation of the SAME cap semantics: rank ids per
    // (band, bucket), keep rn <= cap, pairs among kept.
    val banded = DocStream.bandRows(
      graft.core.Tables.read(spark, sfDir, "documents"), "doc_id", "text")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("band", "bk").orderBy("id")
    val bounded = banded.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 50).drop("rn")
    val batch = bounded.as("a")
      .join(bounded.as("b"),
        col("a.band") === col("b.band") && col("a.bk") === col("b.bk") &&
          col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("n_bands"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed.nonEmpty && streamed == batch,
      s"streamed=${streamed.size} batch=${batch.size}")
  }
}
