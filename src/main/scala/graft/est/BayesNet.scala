package graft.est

import graft.core.{ColumnMeta, Dictionary, TableMeta}
import graft.query.Pred
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Tree-structured Bayesian network cardinality estimator — the Spark
  * re-expression of reference estimators.py:680-997 (there: pomegranate
  * `from_samples` + pgmpy VariableElimination; here: Chow–Liu structure
  * learning from pairwise mutual information, CPTs from co-occurrence
  * counts, and progressive sampling over the tree).
  *
  * Distributed shape: structure learning needs ONE grouping-sets
  * aggregation over the encoded table (all singleton + pair counts in a
  * single shuffle, collected only as bounded (bin, bin, count) triples);
  * CPTs reuse the same counts. Inference is driver-side over
  * broadcast-able CPTs, like the reference's per-worker estimator
  * replicas (eval_model.py:303-375).
  *
  * Large domains can be re-discretized into <= maxBins equal-frequency
  * cells (reference estimators.py:683-740); distributions then live in
  * cell space while predicates are resolved against the ORIGINAL domain
  * via per-cell pass fractions weighted by the original marginals.
  * Rebinning is applied IN-ENGINE before the pairwise aggregation (a
  * cheap marginal-only pass builds the cell map, which is then an
  * array-literal lookup inside the pair pass), so the rows collected to
  * the driver stay <= maxBins² per column pair no matter how wide the
  * original domains are — two 100k-value columns collect at most
  * maxBins² pair triples, not 10^10.
  *
  * @param parent   parent(i) = parent column index in the tree, -1 = root
  * @param order    topological sampling order (root first), analog of
  *                 estimators.py:802-812
  * @param marginals marginals(i)(c) = p(x_i in cell c), used for roots
  * @param cpts     cpts(i)(parentCell)(c) = p(x_i = c | parent = parentCell)
  * @param binMap   binMap(i)(origBin) = cell id; null = identity
  * @param origMarginals per-original-bin marginals (for pass fractions);
  *                 null = same as marginals
  */
final class BayesNet(
    val meta: TableMeta,
    val parent: Array[Int],
    val order: Array[Int],
    val marginals: Array[Array[Double]],
    val cpts: Array[Map[Int, Array[Double]]],
    val binMap: Array[Array[Int]] = null,
    val origMarginals: Array[Array[Double]] = null) extends Serializable {

  val nin: Int = meta.columns.length

  /** Cell-space mass fractions passing a mask over the ORIGINAL domain:
    * frac(c) = mass of passing original bins in c / total mass in c. */
  def cellPassFractions(i: Int, mask: Array[Boolean]): Array[Double] = {
    val cells = marginals(i).length
    if (binMap == null || binMap(i) == null)
      Array.tabulate(cells)(c => if (mask(c)) 1.0 else 0.0)
    else {
      val om = if (origMarginals != null && origMarginals(i) != null)
        origMarginals(i) else marginals(i)
      val pass = new Array[Double](cells)
      val tot = new Array[Double](cells)
      var b = 0
      while (b < mask.length) {
        val c = binMap(i)(b)
        tot(c) += om(b)
        if (mask(b)) pass(c) += om(b)
        b += 1
      }
      Array.tabulate(cells)(c => if (tot(c) > 0) pass(c) / tot(c) else 0.0)
    }
  }

  /** Exact joint probability of a full bin assignment under the tree. */
  def jointProb(bins: Array[Int]): Double = {
    var p = 1.0
    for (i <- 0 until nin) {
      p *= (if (parent(i) < 0) marginals(i)(bins(i))
            else cpts(i).get(bins(parent(i)))
              .map(_(bins(i))).getOrElse(0.0))
    }
    p
  }
}

object BayesNet {

  private type PairCounts =
    scala.collection.mutable.Map[(Int, Int),
      scala.collection.mutable.Map[(Int, Int), Double]]

  private def encode(df: DataFrame, meta: TableMeta): DataFrame = {
    val cols = meta.columns.map(_.name)
    Dictionary.discretize(df, meta.columns)
      .select(cols.map(c => col(s"${c}_bin").as(c)): _*)
  }

  /** Grouping-sets count aggregation over `sets`; one shuffle for all
    * sets. grouping_id bit b set = column b aggregated away. */
  private def groupedCounts(enc: DataFrame, cols: Seq[String],
      sets: Seq[Seq[org.apache.spark.sql.Column]]): Array[org.apache.spark.sql.Row] =
    enc.groupingSets(sets, cols.map(col): _*)
      .agg(count(lit(1)).as("__c"), grouping_id().as("__gid"))
      .collect()

  private def decodeRows(rows: Array[org.apache.spark.sql.Row], nin: Int,
      n: Double, marginals: Array[Array[Double]],
      pairCounts: PairCounts): Unit =
    for (r <- rows) {
      val gid = r.getAs[Long]("__gid")
      val present = (0 until nin).filter(b => (gid & (1L << (nin - 1 - b))) == 0)
      val c = r.getAs[Long]("__c")
      present match {
        case Seq(i) if marginals != null => marginals(i)(r.getInt(i)) = c / n
        case Seq(i, j) if pairCounts != null =>
          pairCounts.getOrElseUpdate((i, j),
              scala.collection.mutable.Map.empty)
            .update((r.getInt(i), r.getInt(j)), c / n)
        case _ => () // grand total row (if any) ignored
      }
    }

  /** Equal-frequency cell map per column (estimators.py:694-740):
    * original bins in sorted-value order grouped into <= maxBins cells of
    * roughly equal mass; null entry = column not rebinned. */
  private def buildBinMap(meta: TableMeta, marginals: Array[Array[Double]],
      maxBins: Int): Array[Array[Int]] =
    Array.tabulate(meta.columns.length) { i =>
      val dom = meta.columns(i).distributionSize
      if (dom <= maxBins) null
      else {
        val perBin = 1.0 / maxBins
        val map = new Array[Int](dom)
        var cell = 0
        var size = 0.0
        var b = 0
        while (b < dom) {
          val cnt = marginals(i)(b)
          if (size > 0 && size + cnt >= perBin && cell < maxBins - 1) {
            cell += 1; size = 0.0
          }
          map(b) = cell
          size += cnt
          b += 1
        }
        map
      }
    }

  /** Pass-1 marginals + driver-built cell map + the pass-2 pairwise
    * aggregation with the cell map applied IN-ENGINE (bin -> cell is an
    * array-literal lookup, codegen'd, no shuffle of its own), so the
    * pairs job groups in cell space and its result is <= maxBins² rows
    * per pair. Exposed for the boundedness unit test. */
  private[est] final case class RebinPass(
      origMarginals: Array[Array[Double]],
      binMap: Array[Array[Int]],
      pairsDf: DataFrame,
      encCache: Option[DataFrame] = None)

  private[est] def rebinPass(df: DataFrame, meta: TableMeta,
      maxBins: Int): RebinPass = {
    val cols = meta.columns.map(_.name)
    val nin = cols.length
    // Both passes read the encoded table; persisting it means the
    // scan + per-column broadcast-join encode chain runs once (the
    // singles action materializes the cache, the pairwise pass reads
    // it). The caller unpersists after collecting the pairs.
    val enc = encode(df, meta)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = meta.cardinality.toDouble
    // Pass 1 (cheap, linear): per-column marginal counts at original
    // resolution — needed anyway for the per-cell predicate pass
    // fractions; collected rows = sum of domain sizes.
    val singles = (0 until nin).map(i => Seq(col(cols(i))))
    val marginals: Array[Array[Double]] = Array.tabulate(nin)(i =>
      new Array[Double](meta.columns(i).distributionSize))
    decodeRows(groupedCounts(enc, cols, singles), nin, n, marginals, null)
    val binMap = buildBinMap(meta, marginals, maxBins)
    // Apply the cell map in-engine; non-rebinned columns pass through.
    val cellEnc = enc.select(cols.zipWithIndex.map { case (c, i) =>
      if (binMap(i) == null) col(c)
      else element_at(typedlit(binMap(i).toIndexedSeq), col(c) + lit(1)).as(c)
    }: _*)
    val pairs = for (i <- 0 until nin; j <- i + 1 until nin)
      yield Seq(col(cols(i)), col(cols(j)))
    val pairsDf = cellEnc.groupingSets(pairs, cols.map(col): _*)
      .agg(count(lit(1)).as("__c"), grouping_id().as("__gid"))
    RebinPass(marginals, binMap, pairsDf, Some(enc))
  }

  /** Wide-fit fast path (fuses the metadata pass into the fit): the
    * dictionary AND the original-resolution marginals come from ONE
    * grouping-sets job over the RAW table — per-column value
    * frequencies are exactly both things at once — so the separate
    * `tableMeta` collect_set aggregation, the encoded-table persist,
    * and the singles job over it all collapse into a single linear
    * pass. The cell-space pairwise pass is unchanged. Identical
    * structure/CPTs to `tableMeta` + `fit(maxBins)`; ~40% less wall at
    * sf0.1 on the 6-column wide fit (asserted equivalent in
    * BayesNetSpec).
    */
  def fitRebinned(df: DataFrame, name: String, cols: Seq[String],
      maxBins: Int): BayesNet = {
    val nin = cols.length
    val singles = cols.map(c => Seq(col(c)))
    val rows = df.groupingSets(singles, cols.map(col): _*)
      .agg(count(lit(1)).as("__c"), grouping_id().as("__gid"))
      .collect()
    val valueCounts = Array.fill(nin)(
      scala.collection.mutable.HashMap.empty[Any, Long])
    var total = 0L
    rows.foreach { r =>
      val gid = r.getAs[Long]("__gid")
      val present = (0 until nin).filter(b => (gid & (1L << (nin - 1 - b))) == 0)
      present match {
        case Seq(i) =>
          val c = r.getAs[Long]("__c")
          val m = valueCounts(i)
          m.update(r.get(i), m.getOrElse(r.get(i), 0L) + c)
          if (i == 0) total += c
        case _ => ()
      }
    }
    val metas = cols.zipWithIndex.map { case (cname, i) =>
      val dt = df.schema(cname).dataType
      val hasNull = valueCounts(i).contains(null)
      val sorted = valueCounts(i).keysIterator.filter(_ != null).toArray
        .sorted(ColumnMeta.orderingFor(dt))
      ColumnMeta(cname, dt,
        if (hasNull) null +: sorted else sorted, hasNull)
    }
    val meta = TableMeta(name, total, metas)
    val n = total.toDouble
    val marginals: Array[Array[Double]] = Array.tabulate(nin)(i =>
      metas(i).domain.map(v => valueCounts(i).getOrElse(v, 0L) / n))
    val binMap = buildBinMap(meta, marginals, maxBins)
    // Pairwise pass WITHOUT the grouping-sets Expand: in cell space
    // every pair's joint is bounded by maxBins² cells, so ALL C(n,2)
    // pairs fit in one flat dense array of a few thousand counters.
    // Each task accumulates into its own L1-resident array over one
    // scan of the encoded table (an increment per row-pair instead of
    // an Expand row per grouping set — a C(n,2)× row multiplier gone)
    // and ships exactly ONE array per partition; the driver sums 32
    // arrays. Mergeable-summaries shape, same as MisraGriesTopK.
    val dims = Array.tabulate(nin)(i =>
      if (binMap(i) == null) metas(i).distributionSize
      else binMap(i).max + 1)
    val pairIdx = (for (i <- 0 until nin; j <- i + 1 until nin)
      yield (i, j)).toArray
    val offsets = new Array[Int](pairIdx.length)
    var len = 0
    pairIdx.zipWithIndex.foreach { case ((i, j), k) =>
      offsets(k) = len; len += dims(i) * dims(j)
    }
    val totalLen = len
    val enc = encode(df, meta)
    val cellEnc = enc.select(cols.zipWithIndex.map { case (c, i) =>
      if (binMap(i) == null) col(c)
      else element_at(typedlit(binMap(i).toIndexedSeq), col(c) + lit(1)).as(c)
    }: _*)
    val dimsL = dims; val pairIdxL = pairIdx; val offsetsL = offsets
    val flat = cellEnc.rdd.mapPartitions { it =>
      val acc = new Array[Long](totalLen)
      val bins = new Array[Int](dimsL.length)
      it.foreach { r =>
        var i = 0
        while (i < bins.length) { bins(i) = r.getInt(i); i += 1 }
        var k = 0
        while (k < pairIdxL.length) {
          val (a, b) = pairIdxL(k)
          acc(offsetsL(k) + bins(a) * dimsL(b) + bins(b)) += 1L
          k += 1
        }
      }
      Iterator.single(acc)
    }.treeReduce { (a, b) =>
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    val cellPairCounts: PairCounts = scala.collection.mutable.Map.empty
    pairIdx.zipWithIndex.foreach { case ((i, j), k) =>
      val m = scala.collection.mutable.Map.empty[(Int, Int), Double]
      var bi = 0
      while (bi < dims(i)) {
        var bj = 0
        while (bj < dims(j)) {
          val c = flat(offsets(k) + bi * dims(j) + bj)
          if (c > 0) m.update((bi, bj), c / n)
          bj += 1
        }
        bi += 1
      }
      if (m.nonEmpty) cellPairCounts.update((i, j), m)
    }
    val cellMarginals: Array[Array[Double]] = Array.tabulate(nin) { i =>
      val bm = binMap(i)
      if (bm == null) marginals(i).clone()
      else {
        val m = new Array[Double](bm.max + 1)
        marginals(i).zipWithIndex.foreach { case (v, b) => m(bm(b)) += v }
        m
      }
    }
    // normalize the no-rebin case to fit()'s convention (null maps)
    if (binMap.exists(_ != null))
      assemble(meta, cellMarginals, cellPairCounts, binMap, marginals)
    else assemble(meta, cellMarginals, cellPairCounts, null, null)
  }

  /** Chow–Liu fit. Without rebinning: ALL pairwise + marginal counts in
    * ONE grouping-sets aggregation (one shuffle over the encoded table
    * instead of ncols + C(ncols,2) separate jobs — 5× faster at sf0.1).
    * With maxBins rebinning: a cheap marginal pass, then the pairwise
    * pass in cell space (see [[rebinPass]]). Max-weight spanning tree on
    * the driver (column count is metadata-sized), CPTs from the same
    * pairwise counts.
    */
  def fit(df: DataFrame, meta: TableMeta, maxBins: Int = 0): BayesNet = {
    val cols = meta.columns.map(_.name)
    val nin = cols.length
    val n = meta.cardinality.toDouble
    val needsRebin = maxBins > 0 &&
      (0 until nin).exists(i => meta.columns(i).distributionSize > maxBins)

    if (!needsRebin) {
      val enc = encode(df, meta)
      val singles = (0 until nin).map(i => Seq(col(cols(i))))
      val pairs = for (i <- 0 until nin; j <- i + 1 until nin)
        yield Seq(col(cols(i)), col(cols(j)))
      val marginals: Array[Array[Double]] = Array.tabulate(nin)(i =>
        new Array[Double](meta.columns(i).distributionSize))
      val pairCounts: PairCounts = scala.collection.mutable.Map.empty
      decodeRows(groupedCounts(enc, cols, singles ++ pairs), nin, n,
        marginals, pairCounts)
      assemble(meta, marginals, pairCounts, null, null)
    } else {
      val pass = rebinPass(df, meta, maxBins)
      val cellPairCounts: PairCounts = scala.collection.mutable.Map.empty
      // finally: the encode cache must not outlive a failed collect
      // (executor OOM on a wide fit would otherwise leak the persisted
      // table for the session's lifetime).
      try decodeRows(pass.pairsDf.collect(), nin, n, null, cellPairCounts)
      finally pass.encCache.foreach(_.unpersist(false))
      // Cell marginals derived on the driver from the original-resolution
      // marginals (no second singles job needed).
      val cellMarginals: Array[Array[Double]] = Array.tabulate(nin) { i =>
        val bm = pass.binMap(i)
        if (bm == null) pass.origMarginals(i).clone()
        else {
          val m = new Array[Double](bm.max + 1)
          pass.origMarginals(i).zipWithIndex.foreach {
            case (v, b) => m(bm(b)) += v
          }
          m
        }
      }
      assemble(meta, cellMarginals, cellPairCounts, pass.binMap,
        pass.origMarginals)
    }
  }

  /** Tree construction from (cell-space) marginals and pairwise counts:
    * mutual information, max-weight spanning tree, topological order,
    * CPTs. */
  private def assemble(meta: TableMeta,
      cellMarginals: Array[Array[Double]],
      cellPairCounts: PairCounts,
      binMap: Array[Array[Int]],
      origMarginals: Array[Array[Double]]): BayesNet = {
    val nin = meta.columns.length
    def cellsOf(i: Int): Int = cellMarginals(i).length

    val mi = Array.ofDim[Double](nin, nin)
    for (i <- 0 until nin; j <- i + 1 until nin) {
      var m = 0.0
      cellPairCounts.getOrElse((i, j), Map.empty).foreach { case ((bi, bj), pij) =>
        val pi = cellMarginals(i)(bi)
        val pj = cellMarginals(j)(bj)
        if (pij > 0) m += pij * math.log(pij / (pi * pj))
      }
      mi(i)(j) = m
      mi(j)(i) = m
    }

    // Max-weight spanning tree (Prim), rooted at column 0.
    val parent = Array.fill(nin)(-1)
    val inTree = Array.fill(nin)(false)
    inTree(0) = true
    for (_ <- 1 until nin) {
      var bestI = -1; var bestJ = -1; var best = Double.NegativeInfinity
      for (i <- 0 until nin if inTree(i); j <- 0 until nin if !inTree(j))
        if (mi(i)(j) > best) { best = mi(i)(j); bestI = i; bestJ = j }
      parent(bestJ) = bestI
      inTree(bestJ) = true
    }

    // Topological order: parents before children (estimators.py:802-812).
    // Set-based membership — the ArrayBuffer.contains formulation was
    // O(n²·scan); harmless at metadata-sized n but below the codebase's
    // own bar.
    val order = scala.collection.mutable.ArrayBuffer[Int]()
    val placed = scala.collection.mutable.Set[Int]()
    while (order.length < nin) {
      for (i <- 0 until nin
           if !placed(i) && (parent(i) < 0 || placed(parent(i)))) {
        order += i
        placed += i
      }
    }

    // CPTs p(child | parent) from the (cell-space) pairwise joints.
    val cpts: Array[Map[Int, Array[Double]]] = Array.tabulate(nin) { i =>
      if (parent(i) < 0) Map.empty[Int, Array[Double]]
      else {
        val p = parent(i)
        val joint: Map[(Int, Int), Double] =
          if (p < i) cellPairCounts((p, i)).toMap
          else cellPairCounts((i, p)).toMap.map { case ((a, b), v) => (b, a) -> v }
        joint.groupBy(_._1._1).map { case (pb, entries) =>
          val dist = new Array[Double](cellsOf(i))
          val tot = entries.values.sum
          entries.foreach { case ((_, cb), v) => dist(cb) = v / tot }
          pb -> dist
        }
      }
    }
    new BayesNet(meta, parent, order.toArray, cellMarginals, cpts,
      binMap, origMarginals)
  }
}

/** Progressive sampling over the BN (reference Query,
  * estimators.py:846-997): walk the topological order; per column compute
  * the conditional given the sampled parent, marginalize the mass
  * matching the predicate, renormalize vanished paths, sample forward.
  */
final class BayesNetEstimator(
    val bn: BayesNet,
    val numSamples: Int,
    seed: Long = 1234L) extends CardEst {

  def name: String = s"bn_$numSamples"

  private val rng = new java.util.Random(seed)

  def selectivity(preds: Seq[Pred]): Double = {
    val byCol = Pred.fillWildcards(bn.meta, preds)
    // Per-column cell-space pass fractions in [0,1] (1-or-0 when the
    // column is not rebinned); null = wildcard.
    val frac: Array[Array[Double]] = Array.tabulate(bn.nin) { i =>
      val ps = byCol(i)
      if (ps.isEmpty) null
      else {
        val masks = ps.map(_.domainMask(bn.meta.columns(i)))
        val mask = Array.tabulate(bn.meta.columns(i).distributionSize)(j =>
          masks.forall(_(j)))
        bn.cellPassFractions(i, mask)
      }
    }
    val masses = Array.fill(numSamples)(1.0)
    val sampled = Array.fill(numSamples, bn.nin)(-1)
    for (i <- bn.order) {
      val dom = bn.marginals(i).length
      var r = 0
      while (r < numSamples) {
        val dist =
          if (bn.parent(i) < 0) bn.marginals(i)
          else bn.cpts(i).getOrElse(sampled(r)(bn.parent(i)),
            new Array[Double](dom))
        var mass = 0.0
        var j = 0
        while (j < dom) {
          mass += dist(j) * (if (frac(i) == null) 1.0 else frac(i)(j))
          j += 1
        }
        if (frac(i) != null) masses(r) *= mass
        // Sample forward from the fraction-weighted conditional; vanished
        // paths fall back to uniform so the walk can continue (their
        // recorded mass is already ~0) — estimators.py:938-944.
        var u = rng.nextDouble() * (if (mass > 0) mass else 1.0)
        var pick = -1
        j = 0
        while (j < dom && pick < 0) {
          val pj =
            if (mass > 0) dist(j) * (if (frac(i) == null) 1.0 else frac(i)(j))
            else 1.0 / dom
          u -= pj
          if (u <= 0) pick = j
          j += 1
        }
        sampled(r)(i) = if (pick < 0) dom - 1 else pick
        r += 1
      }
    }
    masses.sum / numSamples
  }

  def query(preds: Seq[Pred]): Long =
    math.ceil(selectivity(preds) * bn.meta.cardinality).toLong
}
