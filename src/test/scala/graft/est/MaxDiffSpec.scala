package graft.est

import graft.core.{ColumnMeta, TableMeta}
import graft.query.{Op, Pred}
import org.apache.spark.sql.types.IntegerType
import org.scalatest.funsuite.AnyFunSuite

class MaxDiffSpec extends AnyFunSuite {

  private def mkMeta(name: String, doms: Seq[Int], card: Long): TableMeta =
    TableMeta(name, card,
      doms.zipWithIndex.map { case (k, i) =>
        ColumnMeta(s"c$i", IntegerType,
          Array.tabulate(k)(identity).map(_.asInstanceOf[Any]), hasNull = false)
      })

  test("1-D histogram with enough buckets is near-exact") {
    val rng = new java.util.Random(7)
    // Skewed 1-D data over domain 20.
    val data = Array.fill(5000)(Array(math.min(19, (rng.nextGaussian().abs * 4).toInt)))
    val meta = mkMeta("t", Seq(20), data.length.toLong)
    val h = MaxDiffHistogram.build(meta, data, limit = 25)
    for (v <- Seq(0, 3, 7, 12)) {
      val truth = data.count(_(0) <= v)
      val est = h.query(Seq(Pred("c0", Op.Leq, v)))
      val q = math.max(est.toDouble / truth, truth.toDouble / est)
      assert(q < 1.5, s"v=$v est=$est truth=$truth q=$q")
    }
  }

  test("2-D estimate tracks truth within histogram error") {
    val rng = new java.util.Random(3)
    // Two clusters => strong correlation maxdiff should capture.
    val data = Array.fill(4000) {
      if (rng.nextBoolean()) Array(rng.nextInt(5), rng.nextInt(5))
      else Array(10 + rng.nextInt(5), 10 + rng.nextInt(5))
    }
    val meta = mkMeta("t", Seq(15, 15), data.length.toLong)
    val h = MaxDiffHistogram.build(meta, data, limit = 40)
    val preds = Seq(Pred("c0", Op.Leq, 4), Pred("c1", Op.Leq, 4))
    val truth = data.count(r => r(0) <= 4 && r(1) <= 4)
    val est = h.query(preds)
    val q = math.max(est.toDouble / truth, truth.toDouble / est)
    assert(q < 2.0, s"est=$est truth=$truth q=$q")
    // The cross-cluster region is (nearly) empty and should estimate low.
    val cross = h.query(Seq(Pred("c0", Op.Leq, 4), Pred("c1", Op.Geq, 10)))
    assert(cross < truth / 4, s"cross-cluster est=$cross should be small")
  }

  test("scale-up factor extrapolates from a sample") {
    val data = Array.tabulate(1000)(i => Array(i % 10))
    val meta = mkMeta("t", Seq(10), 100000L) // 100x the sample
    val h = MaxDiffHistogram.build(meta, data, limit = 15)
    val est = h.query(Seq(Pred("c0", Op.Eq, 3)))
    // truth at full scale would be ~10000
    assert(est > 5000 && est < 20000, s"est=$est")
  }

  test("empty-region query estimates ~zero") {
    val data = Array.fill(1000)(Array(2))
    val meta = mkMeta("t", Seq(10), 1000L)
    val h = MaxDiffHistogram.build(meta, data, limit = 5)
    assert(h.query(Seq(Pred("c0", Op.Geq, 5))) == 0L)
  }
}
