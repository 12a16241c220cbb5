package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Chained-derivation invariant: deriving a derived dir must keep key
  * spaces disjoint. The original fixed stride collided on the second
  * derivation (copy 1's shift of the source's copy-0 keys landed on the
  * source's own copy-1 keys — 60k rows, 24k distinct ids at the 30×
  * audit); the stride is now computed past the source's max key.
  */
class ScaleDataSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("chained derivation keeps every shifted key column collision-free") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_scale_chain").toString
    ScaleData.derive(spark, "/root/testdata/sf0.001", s"$base/x2", 2)
    ScaleData.derive(spark, s"$base/x2", s"$base/x4", 2)
    val keyCols = Seq(
      "customer" -> "c_custkey", "orders" -> "o_orderkey",
      "lineitem" -> "l_orderkey", "events" -> "event_id",
      "documents" -> "doc_id", "embeddings" -> "vec_id")
    keyCols.foreach { case (t, k) =>
      val src = spark.read.parquet(s"/root/testdata/sf0.001/$t.parquet")
      val x4 = spark.read.parquet(s"$base/x4/$t.parquet")
      val n = x4.count()
      assert(n == 4 * src.count(), s"$t row count")
      // event_id/orderkey multiplicity: distinct factor must be exactly
      // 4× the source's (disjoint copies), not fewer (collisions).
      val dSrc = src.select(countDistinct(col(k))).head().getLong(0)
      val d = x4.select(countDistinct(col(k))).head().getLong(0)
      assert(d == 4 * dSrc,
        s"$t.$k: ${d} distinct after 2×2 derivation, want ${4 * dSrc}")
    }
  }
}
