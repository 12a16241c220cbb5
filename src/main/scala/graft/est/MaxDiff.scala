package graft.est

import graft.core.TableMeta
import graft.query.{Op, Pred}

/** MaxDiff(V,A) n-dimensional histogram — port of reference
  * estimators.py:1000-1408. Partitions are recursively split at the
  * (partition, column) with the largest spread×count difference until
  * `limit` buckets exist; each bucket stores per-column uniform spreads
  * and a density; queries sum per-bucket fractions under the
  * uniform-spread assumption (estimators.py:1342-1374).
  *
  * Operates in bin space (every value dictionary-encoded), on a
  * bounded driver-side sample of the encoded table (the reference is
  * equally in-memory, estimators.py:1082-1086); the final estimate is
  * scaled by N/sampleN. The 100 TB build path would compute the
  * per-partition value counts as Spark aggregations and keep the greedy
  * split loop (metadata-sized) on the driver.
  */
final class MaxDiffHistogram private (
    val meta: TableMeta,
    partitions: Array[MaxDiffHistogram.Partition],
    scaleUp: Double) extends CardEst {

  def name: String = s"maxdiff_${partitions.length}"
  def numPartitions: Int = partitions.length

  import MaxDiffHistogram.bisectLeft
  import MaxDiffHistogram.bisectRight

  /** Bin-space predicate bounds per column: (op, binValue) list.
    * The histogram's partition-bound pruning speaks the reference's
    * scalar 5-op vocabulary (estimators.py:1278-1340); the r15
    * IN / IS NULL mask extensions are estimator-mask territory
    * (ProgressiveSampling / BayesNet) and are rejected here rather
    * than mis-pruned. */
  private def binPreds(preds: Seq[Pred]): Seq[(Int, Op, Int)] =
    preds.map { p =>
      require(p.op.isScalar,
        s"MaxDiffHistogram supports the scalar 5-op vocabulary; got " +
          s"${p.op.sym} on ${p.col} (use a mask-native estimator for it)")
      val cid = meta.nameToIndex(p.col)
      val cm = meta.columns(cid)
      // Range ops on a value absent from the domain: use the insertion
      // point in the sorted domain (bin of the next larger value).
      val bin = cm.valToBin(p.value) match {
        case -1 =>
          val dom = cm.nonNullDomain
          val ord = cm.ordering
          var lo = 0; var hi = dom.length
          while (lo < hi) {
            val mid = (lo + hi) >>> 1
            if (ord.lt(dom(mid), p.value)) lo = mid + 1 else hi = mid
          }
          lo + (if (cm.hasNull) 1 else 0) -
            (if (p.op == Op.Leq || p.op == Op.Gt) 1 else 0)
        case b => b
      }
      (cid, p.op, bin)
    }

  /** Whether partition `pt` can contain rows matching (op, v) on cid
    * (the column_bound_map pruning, estimators.py:1278-1340). */
  private def overlaps(pt: MaxDiffHistogram.Partition, cid: Int, op: Op,
      v: Int): Boolean = {
    val (lo, hi, loIncl) = pt.boundaries(cid)
    op match {
      case Op.Lt => lo < v
      case Op.Leq => lo < v || (lo == v && loIncl)
      case Op.Gt => hi > v
      case Op.Geq => hi >= v
      case Op.Eq => (lo < v || (lo == v && loIncl)) && hi >= v
      case other => throw new IllegalArgumentException(
        s"non-scalar op ${other.sym} reached overlaps (binPreds guards)")
    }
  }

  /** Per-partition estimate under uniform spread
    * (estimators.py:1342-1374). */
  private def partitionEstimate(pt: MaxDiffHistogram.Partition,
      bps: Seq[(Int, Op, Int)]): Double = {
    var covered = 1.0
    val observed = scala.collection.mutable.Set[Int]()
    for ((cid, op, v) <- bps) {
      observed += cid
      val spread = pt.uniformSpreads(cid)
      val c = op match {
        case Op.Lt => bisectLeft(spread, v)
        case Op.Leq => bisectRight(spread, v)
        case Op.Gt => spread.length - bisectRight(spread, v)
        case Op.Geq => spread.length - bisectLeft(spread, v)
        case Op.Eq => if (spread.contains(v.toDouble)) 1 else 0
        case other => throw new IllegalArgumentException(
          s"non-scalar op ${other.sym} reached partitionEstimate")
      }
      covered *= c
    }
    for (cid <- pt.uniformSpreads.indices if !observed.contains(cid))
      covered *= pt.uniformSpreads(cid).length
    covered * pt.density
  }

  def query(preds: Seq[Pred]): Long = {
    val bps = binPreds(preds)
    var total = 0.0
    for (pt <- partitions
         if bps.forall { case (cid, op, v) => overlaps(pt, cid, op, v) })
      total += partitionEstimate(pt, bps)
    math.max(0L, math.round(total * scaleUp))
  }
}

object MaxDiffHistogram {

  /** (low, high, lowInclusive) in bin space. */
  type Boundary = (Int, Int, Boolean)

  final class Partition(
      val boundaries: Array[Boundary],
      val rows: Array[Int]) extends Serializable {
    var uniformSpreads: Array[Array[Double]] = null
    var density: Double = 0.0
  }

  private[est] def bisectLeft(a: Array[Double], v: Double): Int = {
    var lo = 0; var hi = a.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (a(mid) < v) lo = mid + 1 else hi = mid
    }
    lo
  }
  private[est] def bisectRight(a: Array[Double], v: Double): Int = {
    var lo = 0; var hi = a.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (a(mid) <= v) lo = mid + 1 else hi = mid
    }
    lo
  }

  /** Build from a bin-encoded sample. `cardinality` is the full table's
    * row count (the estimate is scaled by cardinality/data.length).
    */
  def build(meta: TableMeta, data: Array[Array[Int]], limit: Int): MaxDiffHistogram = {
    require(data.nonEmpty)
    val ncols = meta.columns.length

    // Largest spread×count difference for (partition, col) plus the
    // split point (the value whose right-gap is largest)
    // (estimators.py:1052-1068, 1200-1224).
    def maxDiffOf(p: Partition, cid: Int): (Double, Int) = {
      val counts = scala.collection.mutable.Map[Int, Int]()
      p.rows.foreach { r => counts(data(r)(cid)) = counts.getOrElse(data(r)(cid), 0) + 1 }
      val keys = counts.keys.toArray.sorted
      if (keys.length < 2) return (0.0, keys.headOption.getOrElse(0))
      var best = 0.0
      var bestKey = keys(0)
      var i = 0
      while (i < keys.length - 1) {
        val d = (keys(i + 1) - keys(i)).toDouble * counts(keys(i))
        if (d > best) { best = d; bestKey = keys(i) }
        i += 1
      }
      (best, bestKey)
    }

    val initBoundaries = Array.tabulate(ncols)(c =>
      (0, meta.columns(c).distributionSize - 1, true): Boundary)
    var parts = List(new Partition(initBoundaries, Array.tabulate(data.length)(identity)))

    var done = false
    while (parts.length < limit && !done) {
      // Global max diff across all (partition, col).
      var best = 0.0; var bestP: Partition = null; var bestCid = -1; var bestKey = 0
      for (p <- parts; cid <- 0 until ncols) {
        val (d, k) = maxDiffOf(p, cid)
        if (d > best) { best = d; bestP = p; bestCid = cid; bestKey = k }
      }
      if (bestP == null || best == 0.0) done = true // maxdiff 0 (estimators.py:1103-1105)
      else {
        // Two-way split at bestKey: left keeps values <= bestKey
        // (upper-inclusive; generate_new_partitions, estimators.py:1226-1252).
        val (lo, hi, loIncl) = bestP.boundaries(bestCid)
        val leftRows = bestP.rows.filter(r => data(r)(bestCid) <= bestKey)
        val rightRows = bestP.rows.filter(r => data(r)(bestCid) > bestKey)
        val leftB = bestP.boundaries.clone()
        leftB(bestCid) = (lo, bestKey, loIncl)
        val rightB = bestP.boundaries.clone()
        rightB(bestCid) = (bestKey, hi, false)
        parts = new Partition(leftB, leftRows) ::
          new Partition(rightB, rightRows) :: parts.filterNot(_ eq bestP)
      }
    }

    // Condense: per-column uniform spreads + density
    // (estimators.py:1128-1170).
    for (p <- parts) {
      p.uniformSpreads = Array.tabulate(ncols) { cid =>
        val distinct = p.rows.map(r => data(r)(cid)).distinct.sorted
        if (distinct.length <= 1) distinct.map(_.toDouble)
        else {
          val (lo, hi, loIncl) = p.boundaries(cid)
          val n = distinct.length
          if (loIncl) {
            val step = (hi - lo).toDouble / (n - 1)
            Array.tabulate(n)(i =>
              if (i == n - 1) hi.toDouble else lo + i * step)
          } else {
            val step = (hi - lo).toDouble / n
            Array.tabulate(n)(i =>
              if (i == n - 1) hi.toDouble else lo + (i + 1) * step)
          }
        }
      }
      val totalDistinct = p.uniformSpreads.map(_.length.toDouble).product
      p.density =
        if (totalDistinct == 0 || p.rows.isEmpty) 0.0
        else p.rows.length / totalDistinct
    }
    val nonEmpty = parts.filter(_.rows.nonEmpty).toArray
    new MaxDiffHistogram(meta, nonEmpty,
      meta.cardinality.toDouble / data.length)
  }
}
