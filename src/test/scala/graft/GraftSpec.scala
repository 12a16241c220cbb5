package graft

import graft.query.{Op, Pred}
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The facade, end to end on real testdata: train, estimate, evaluate. */
class GraftSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("facade: train two families, evaluate against exact truths") {
    val df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val g = Graft(spark, df, "lineitem",
      Seq("l_returnflag", "l_linestatus", "l_quantity", "l_discount"))
    val preds = Seq(Pred("l_quantity", Op.Leq, 24.0),
      Pred("l_returnflag", Op.Eq, "R"))
    val truth = g.oracle(preds)
    assert(truth > 0)
    assert(g.tableBits > 0)

    val made = g.trainMade(epochs = 6)
    val madeQ = Workload.qe(made.query(preds), truth)
    assert(madeQ < 1.5, s"made q-error $madeQ")

    val bn = g.bayesNet()
    val reports = g.evaluate(Seq(made, bn), numQueries = 20)
    assert(reports.length == 2)
    reports.foreach { r =>
      assert(r.count == 20)
      assert(r.p95 < 10.0, s"${r.name} p95=${r.p95}")
    }
    // Latency instrumentation recorded per query.
    assert(reports.forall(r => !r.meanMillis.isNaN && r.meanMillis > 0))
  }

  private object Workload {
    def qe(est: Long, truth: Long): Double =
      graft.workload.Workload.qError(est.toDouble, truth.toDouble)
  }
}
