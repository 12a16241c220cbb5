package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Large-star/small-star connected components: agreement with the
  * label-propagation implementation on mixed graphs, log-bounded round
  * count on a deliberately DEEP path graph (the shape where label
  * propagation needs diameter rounds), and degenerate inputs.
  */
class CCStarSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private def pairsDf(edges: Seq[(Long, Long)]) = {
    val s = spark
    import s.implicits._
    edges.toDF("id_a", "id_b")
  }

  test("star converges log-fast on a 64-node path where label " +
    "propagation would need diameter rounds") {
    val path = (0L until 63L).map(i => (i, i + 1))
    var rounds = 0
    val labels = Dedup.connectedComponentsStar(pairsDf(path), "id_a", "id_b",
        maxIter = 12, trace = (r, _, _) => rounds = math.max(rounds, r))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(labels.length == 64)
    assert(labels.forall(_._2 == 0L), "all 64 path nodes reach comp 0")
    assert(rounds <= 10, s"path-64 took $rounds rounds; expected O(log n)")
  }

  test("agrees with label propagation on a mixed clique/path/edge graph") {
    val edges = Seq(
      (1L, 2L), (2L, 3L), (1L, 3L),          // triangle
      (10L, 11L), (11L, 12L), (12L, 13L),    // path
      (20L, 21L),                            // single edge
      (30L, 31L), (31L, 30L),                // duplicate reversed edge
      (40L, 41L), (41L, 42L), (40L, 42L), (42L, 43L)) // clique + tail
    val star = Dedup.connectedComponentsStar(pairsDf(edges), "id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val prop = Dedup.connectedComponents(pairsDf(edges), "id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(star.toSeq === prop.toSeq)
    assert(star.filter(_._1 >= 40L).forall(_._2 == 40L))
  }

  test("degenerate inputs: empty graph and self-loops only") {
    assert(Dedup.connectedComponentsStar(
      pairsDf(Seq.empty), "id_a", "id_b").collect().isEmpty)
    assert(Dedup.connectedComponentsStar(
      pairsDf(Seq((5L, 5L))), "id_a", "id_b").collect().isEmpty)
  }
}
