package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape assertions for the round-10 analytics entries: column
  * pruning must reach the parquet scan (a scan that decodes unused
  * columns is wrong at any scale), and the sliding-window plan must be
  * a single Expand + partial aggregate, not a self-union of scans.
  */
class PlanShapeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"

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

  private def scanSchemas(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val plan = df.queryExecution.executedPlan.toString
    "ReadSchema: struct<([^>]*)>".r.findAllMatchIn(plan)
      .map(_.group(1)).toSeq
  }

  test("gap fill prunes the events scan to (user_id, ts)") {
    val df = SparkEntry.queries("q_gap_fill")(spark, dir)
    val schemas = scanSchemas(df)
    assert(schemas.nonEmpty)
    schemas.foreach { s =>
      assert(!s.contains("props") && !s.contains("value") &&
        !s.contains("event_type"),
        s"events scan decodes unused columns: $s")
    }
  }

  test("cohort retention prunes the events scan to (user_id, ts)") {
    val schemas = scanSchemas(
      SparkEntry.queries("q_cohort_retention")(spark, dir))
    assert(schemas.nonEmpty)
    schemas.foreach(s => assert(!s.contains("props") && !s.contains("value"),
      s"unpruned scan: $s"))
  }

  test("sliding window plans one Expand over one scan, no self-union") {
    val df = SparkEntry.queries("q_sliding_window")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), s"expected Expand generator:\n$plan")
    assert(!plan.contains("Union"), "sliding window must not self-union")
    assert(scanSchemas(df).size == 1, "exactly one scan expected")
  }

  test("target encode prunes orders to (o_orderpriority, o_totalprice)") {
    val schemas = scanSchemas(
      SparkEntry.queries("q_target_encode")(spark, dir))
    assert(schemas.nonEmpty)
    schemas.foreach(s => assert(!s.contains("o_comment") &&
      !s.contains("o_clerk"), s"unpruned scan: $s"))
  }

  // q_fuzzy_join returns a driver-side census (LocalRelation), so its
  // join plan is not inspectable from the returned frame; the
  // distinct-probe shape is pinned by the 100x timing row in PLANS.md.
}
