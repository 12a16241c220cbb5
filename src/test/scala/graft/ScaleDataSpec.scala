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

  test("embedding decorrelation never aliases copies past the dimension " +
      "(the factor-100 Walsh bug)") {
    // Factor 66 > dim 64: the old Walsh sign family had only 64
    // distinct patterns, so copies 64/65 were byte-identical to copies
    // 0/1 and the planted-oracle embedding entries broke at the 100x
    // audit point. The splitmix64 masks must keep EVERY copy of a base
    // vector distinct, and cross-copy cosine far below the 0.9
    // near-dup threshold.
    val base = java.nio.file.Files
      .createTempDirectory("graft_scale_decor").toString
    ScaleData.derive(spark, "/root/testdata/sf0.001", s"$base/x66", 66)
    val emb = spark.read.parquet(s"$base/x66/embeddings.parquet")
    val nBase = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet").count()
    // every base vector's 66 copies are pairwise distinct byte-wise
    val distinctPerBase = emb
      .groupBy(pmod(col("vec_id"), lit(1000000000000L)).as("b"))
      .agg(countDistinct(col("embedding")).as("nd"))
      .agg(min(col("nd"))).head().getLong(0)
    assert(distinctPerBase == 66L,
      s"copies alias: min distinct embeddings per base = $distinctPerBase")
    // cross-copy cosine of one base vector's copies stays << 0.9
    val vecs = emb
      .filter(pmod(col("vec_id"), lit(1000000000000L)) ===
        emb.agg(min(pmod(col("vec_id"), lit(1000000000000L))))
          .head().getLong(0))
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    assert(vecs.length == 66)
    for (i <- vecs.indices; j <- (i + 1) until vecs.length) {
      val dot = vecs(i).zip(vecs(j)).map { case (a, b) => a * b }.sum
      val na = math.sqrt(vecs(i).map(x => x * x).sum)
      val nb = math.sqrt(vecs(j).map(x => x * x).sum)
      val cos = dot / (na * nb)
      assert(math.abs(cos) < 0.9, s"copies $i,$j cosine $cos")
    }
    assert(emb.count() == 66 * nBase)
  }
}
