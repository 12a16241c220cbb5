package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Independent in-JVM checks for the drift-detection entries: a
  * brute-force KS recomputation over the raw events (a second oracle
  * beside the driver's DuckDB one), the exact margin-sum identities of
  * the contingency deviations, the embed-drift overflow envelope, and
  * column pruning on the scans.
  */
class DriftSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("q_ks_drift matches a brute-force binned KS over collected events") {
    val row = SparkEntry.queries("q_ks_drift")(spark, dir).collect()
    assert(row.length == 1)
    val (nA, nB, ksNum, ksBin) = (row(0).getLong(0), row(0).getLong(1),
      row(0).getLong(2), row(0).getLong(3))

    val split = Timestamp.valueOf("2024-01-16 00:00:00")
    val raw = core.Tables.read(spark, dir, "events")
      .select("ts", "value").collect()
      .map(r => (r.getTimestamp(0).before(split),
        math.min(math.floor(r.getDouble(1) / 8.0), 63.0).toLong))
    val cA = raw.filter(_._1).groupBy(_._2).map { case (b, xs) => b -> xs.length.toLong }
    val cB = raw.filterNot(_._1).groupBy(_._2).map { case (b, xs) => b -> xs.length.toLong }
    val na = raw.count(_._1).toLong
    val nb = raw.length - na
    var (cumA, cumB, best, bestBin) = (0L, 0L, -1L, -1L)
    (0L to 63L).foreach { b =>
      cumA += cA.getOrElse(b, 0L); cumB += cB.getOrElse(b, 0L)
      val dev = math.abs(cumA * nb - cumB * na)
      if (dev > best) { best = dev; bestBin = b }
    }
    assert((nA, nB, ksNum, ksBin) === ((na, nb, best, bestBin)))
    assert(row(0).getDouble(4) === best.toDouble / (na * nb).toDouble)
  }

  test("q_cat_drift deviations sum to zero along every margin") {
    val rows = SparkEntry.queries("q_cat_drift")(spark, dir).collect()
    assert(rows.nonEmpty)
    val byType = rows.groupBy(_.getString(0))
      .view.mapValues(_.map(_.getLong(5)).sum)
    byType.foreach { case (t, s) => assert(s == 0L, s"row margin $t: $s") }
    val byPeriod = rows.groupBy(_.getLong(1))
      .view.mapValues(_.map(_.getLong(5)).sum)
    byPeriod.foreach { case (p, s) => assert(s == 0L, s"col margin $p: $s") }
    // obs must reconstruct both margins exactly.
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getLong(2)).sum == rs.head.getLong(3))
    }
  }

  test("q_embed_drift emits every dim once and stays inside its envelope") {
    val rows = SparkEntry.queries("q_embed_drift")(spark, dir).collect()
    assert(rows.map(_.getLong(0)).toSeq === (0L to 63L))
    rows.foreach { r =>
      val (qMax, na, nb, diff) =
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
      assert(math.abs(diff) <= 2L * qMax * na * nb,
        s"dim ${r.getLong(0)} outside envelope")
      // documented exactness envelope of the cross-multiplication
      assert(qMax * na * nb < (1L << 62))
    }
  }

  test("drift scans prune to the columns the statistics need") {
    def schemas(name: String): Seq[String] = {
      val plan = SparkEntry.queries(name)(spark, dir)
        .queryExecution.executedPlan.toString
      "ReadSchema: struct<([^>]*)>".r.findAllMatchIn(plan)
        .map(_.group(1)).toSeq
    }
    schemas("q_ks_drift").foreach(s =>
      assert(!s.contains("props") && !s.contains("user_id") &&
        !s.contains("event_id"), s"unpruned events scan: $s"))
    schemas("q_cat_drift").foreach(s =>
      assert(!s.contains("props") && !s.contains("value"),
        s"unpruned events scan: $s"))
    schemas("q_embed_drift").foreach(s =>
      assert(!s.contains("label"), s"unpruned embeddings scan: $s"))
  }
}
