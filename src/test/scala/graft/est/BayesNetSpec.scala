package graft.est

import graft.core.Dictionary
import graft.query.{Op, Pred}
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class BayesNetSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  // Chain-correlated data a -> b -> c: the Chow-Liu tree can represent
  // the joint exactly, so the BN estimate should track the truth.
  private lazy val (df, rows) = {
    val rng = new java.util.Random(11)
    val rs = Seq.fill(2000) {
      val a = rng.nextInt(4)
      val b = (a + (if (rng.nextDouble() < 0.8) 0 else rng.nextInt(3))) % 4
      val c = (b + (if (rng.nextDouble() < 0.8) 0 else rng.nextInt(4))) % 5
      Row(a, b, c)
    }
    val schema = StructType(Seq(
      StructField("a", IntegerType), StructField("b", IntegerType),
      StructField("c", IntegerType)))
    (spark.createDataFrame(spark.sparkContext.parallelize(rs, 2), schema), rs)
  }

  private lazy val meta = Dictionary.tableMeta(df, "t")
  private lazy val bn = BayesNet.fit(df, meta)

  test("BN joint distribution sums to 1") {
    var total = 0.0
    for (a <- 0 until 4; b <- 0 until 4; c <- 0 until 5)
      total += bn.jointProb(Array(a, b, c))
    assert(math.abs(total - 1.0) < 1e-9, s"sum=$total")
  }

  test("structure learning links the correlated chain") {
    // Every non-root node's parent must be a genuinely correlated column;
    // with a->b->c the tree edges must be exactly {a-b, b-c} (any rooting).
    val edges = bn.parent.zipWithIndex.collect {
      case (p, i) if p >= 0 => Set(p, i)
    }.toSet
    assert(edges == Set(Set(0, 1), Set(1, 2)), s"edges=$edges")
  }

  test("estimate matches exact BN marginalization") {
    val preds = Seq(Pred("a", Op.Leq, 1), Pred("c", Op.Geq, 2))
    val byBin = { // exact: sum joint over satisfying bin states
      var s = 0.0
      for (a <- 0 until 4; b <- 0 until 4; c <- 0 until 5
           if a <= 1 && c >= 2) s += bn.jointProb(Array(a, b, c))
      s
    }
    val est = new BayesNetEstimator(bn, numSamples = 4000).selectivity(preds)
    assert(math.abs(est - byBin) <= 0.05 * byBin + 0.005,
      s"est=$est exact=$byBin")
  }

  test("estimate tracks the true cardinality on tree-shaped data") {
    val preds = Seq(Pred("a", Op.Eq, 2), Pred("c", Op.Leq, 3))
    val truth = rows.count(r => r.getInt(0) == 2 && r.getInt(2) <= 3).toLong
    val est = new BayesNetEstimator(bn, numSamples = 4000).query(preds)
    val q = math.max(est.toDouble / truth, truth.toDouble / est)
    assert(q < 1.5, s"q-error $q (est=$est truth=$truth)")
  }

  test("impossible conjunction estimates zero") {
    val preds = Seq(Pred("b", Op.Eq, 3), Pred("b", Op.Eq, 0))
    assert(new BayesNetEstimator(bn, 500).query(preds) == 0L)
  }

  test("maxBins >= all domains leaves estimates unchanged") {
    val bnWide = BayesNet.fit(df, meta, maxBins = 10) // all doms <= 5
    val preds = Seq(Pred("a", Op.Leq, 1), Pred("c", Op.Geq, 2))
    val e1 = new BayesNetEstimator(bn, 2000, seed = 7).selectivity(preds)
    val e2 = new BayesNetEstimator(bnWide, 2000, seed = 7).selectivity(preds)
    assert(math.abs(e1 - e2) < 1e-12)
  }

  test("equal-freq rebinning keeps range estimates accurate on wide domains") {
    // A 200-value column correlated with a small one.
    val rng = new java.util.Random(3)
    val rs = Seq.fill(4000) {
      val w = rng.nextInt(200)
      Row(w, (w / 50 + (if (rng.nextDouble() < 0.2) 1 else 0)) % 4)
    }
    val schema = StructType(Seq(
      StructField("w", IntegerType), StructField("s", IntegerType)))
    val wide = spark.createDataFrame(
      spark.sparkContext.parallelize(rs, 2), schema)
    val wMeta = Dictionary.tableMeta(wide, "wide")
    val bnR = BayesNet.fit(wide, wMeta, maxBins = 16)
    assert(bnR.binMap != null && bnR.binMap(0) != null)
    assert(bnR.marginals(0).length <= 16)
    for ((lo, hi) <- Seq((0, 49), (50, 149), (120, 199))) {
      val preds = Seq(Pred("w", Op.Geq, lo), Pred("w", Op.Leq, hi))
      val truth = rs.count(r => r.getInt(0) >= lo && r.getInt(0) <= hi).toLong
      val est = new BayesNetEstimator(bnR, 2000).query(preds)
      val q = math.max(est.toDouble / truth, truth.toDouble / est)
      assert(q < 1.5, s"[$lo,$hi] est=$est truth=$truth q=$q")
    }
    // Correlated predicate across the rebinned and small columns.
    val preds = Seq(Pred("w", Op.Leq, 49), Pred("s", Op.Eq, 0))
    val truth = rs.count(r => r.getInt(0) <= 49 && r.getInt(1) == 0).toLong
    val est = new BayesNetEstimator(bnR, 4000).query(preds)
    val q = math.max(est.toDouble / truth, truth.toDouble / est)
    assert(q < 2.0, s"est=$est truth=$truth q=$q")
  }

  test("fitRebinned (fused single-pass metadata) equals tableMeta + fit") {
    def assertSame(x: BayesNet, y: BayesNet): Unit = {
      assert(x.parent.toSeq == y.parent.toSeq)
      assert(x.order.toSeq == y.order.toSeq)
      assert(x.meta.cardinality == y.meta.cardinality)
      x.meta.columns.zip(y.meta.columns).foreach { case (a, b) =>
        assert(a.name == b.name && a.hasNull == b.hasNull)
        assert(a.domain.toSeq == b.domain.toSeq, s"domain of ${a.name}")
      }
      x.marginals.zip(y.marginals).foreach { case (a, b) =>
        a.zip(b).foreach { case (p, q) => assert(math.abs(p - q) < 1e-12) }
      }
      (0 until x.nin).foreach { i =>
        assert(x.cpts(i).keySet == y.cpts(i).keySet, s"cpt keys col $i")
        x.cpts(i).foreach { case (k, a) =>
          a.zip(y.cpts(i)(k)).foreach { case (p, q) =>
            assert(math.abs(p - q) < 1e-12) }
        }
      }
      val bmX = Option(x.binMap).map(_.map(Option(_).map(_.toSeq)).toSeq)
      val bmY = Option(y.binMap).map(_.map(Option(_).map(_.toSeq)).toSeq)
      assert(bmX == bmY, "binMap")
    }
    // narrow (nothing rebinned) and wide (200-value column rebinned)
    assertSame(BayesNet.fitRebinned(df, "t", Seq("a", "b", "c"), 10),
      BayesNet.fit(df, meta, maxBins = 10))
    val rng = new java.util.Random(3)
    val rs = Seq.fill(4000) {
      val w = rng.nextInt(200)
      Row(w, (w / 50 + (if (rng.nextDouble() < 0.2) 1 else 0)) % 4)
    }
    val schema = StructType(Seq(
      StructField("w", IntegerType), StructField("s", IntegerType)))
    val wide = spark.createDataFrame(
      spark.sparkContext.parallelize(rs, 2), schema)
    val wMeta = Dictionary.tableMeta(wide, "wide")
    assertSame(BayesNet.fitRebinned(wide, "wide", Seq("w", "s"), 16),
      BayesNet.fit(wide, wMeta, maxBins = 16))
    // null handling: values with nulls land in bin 0 identically
    val rsN = rs.map(r => if (r.getInt(0) % 7 == 0) Row(null, r.get(1)) else r)
    val nl = spark.createDataFrame(spark.sparkContext.parallelize(rsN, 2),
      StructType(Seq(StructField("w", IntegerType, nullable = true),
        StructField("s", IntegerType))))
    val nMeta = Dictionary.tableMeta(nl, "nl")
    assertSame(BayesNet.fitRebinned(nl, "nl", Seq("w", "s"), 16),
      BayesNet.fit(nl, nMeta, maxBins = 16))
  }

  test("pairwise collect is cell-bounded in-engine for a 100k-domain column") {
    // Two wide columns (100k and 1k distinct values) whose full-resolution
    // pairwise count would be up to 10^8 rows; the in-engine cell map must
    // bound the collected pair aggregation to <= maxBins² per pair.
    val m = 100000
    val wide = spark.range(m).selectExpr(
      "CAST(id AS INT) AS u",
      "CAST(id % 1000 AS INT) AS v",
      "CAST(id % 4 AS INT) AS s")
    val wMeta = Dictionary.tableMeta(wide, "huge")
    val maxBins = 32
    val pass = BayesNet.rebinPass(wide, wMeta, maxBins)
    assert(pass.binMap(0) != null && pass.binMap(1) != null &&
      pass.binMap(2) == null)
    // 3 pairs: (u,v) <= 32², (u,s) <= 32*4, (v,s) <= 32*4.
    val collected = pass.pairsDf.count()
    pass.encCache.foreach(_.unpersist(false))
    assert(collected <= maxBins * maxBins + 2 * maxBins * 4,
      s"pairwise aggregation not cell-bounded: $collected rows")
    // And the full fit on the same data still estimates ranges sanely.
    val bnW = BayesNet.fit(wide, wMeta, maxBins = maxBins)
    val preds = Seq(Pred("u", Op.Leq, 24999))
    val est = new BayesNetEstimator(bnW, 2000).query(preds)
    val qe = math.max(est / 25000.0, 25000.0 / est)
    assert(qe < 1.3, s"est=$est truth=25000 q=$qe")
  }
}
