package graft

import graft.core.{Dictionary, TableMeta}
import graft.est._
import graft.nn.{Made, Trainer, Transformer}
import graft.query.Pred
import graft.workload.Workload
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The library facade: one object per modeled table, wiring the data
  * layer (dictionaries + encode), the estimator suite, and the
  * evaluation harness with sane defaults — the surface a user of the
  * reference lands on after switching.
  *
  * {{{
  *   val g = Graft(spark, df, "lineitem",
  *     Seq("l_returnflag", "l_quantity", "l_discount"))
  *   val truth  = g.oracle(preds)                   // exact
  *   val naru   = g.trainMade()                     // ResMADE + psample
  *   val est    = naru.query(preds)
  *   val report = g.evaluate(Seq(naru, g.bayesNet()), numQueries = 100)
  * }}}
  *
  * The training-data pipeline operators live beside this facade as
  * plain objects over DataFrames: `ops.Dedup` (exact / MinHash+LSH /
  * Jaccard / line-level / incremental), `ops.TextOps` (quality,
  * repetition, PII, NFC cleanup), `ops.Corpus` (splits, packing,
  * mixing), `ops.Similarity` (ANN), `ops.Relational` (as-of join,
  * top-k, debounce), `ops.Profile`, `ops.Bucketing` (layouts,
  * Z-order), `functions.MisraGriesTopK`, `sources.SynthSource`, and
  * `streaming.EventStream`.
  */
final class Graft private (
    val spark: SparkSession,
    val df: DataFrame,
    val name: String,
    val cols: Seq[String]) {

  private val projected = df.select(cols.map(org.apache.spark.sql.functions.col): _*)

  /** Dictionaries + cardinality, built once (one pass). */
  lazy val meta: TableMeta = Dictionary.tableMeta(projected, name, cols)

  /** Table entropy in bits (the training-quality yardstick). */
  lazy val tableBits: Double = Trainer.tableBits(projected, cols)

  // ---- exact / classical estimators ----

  def oracle(preds: Seq[Pred]): Long =
    Exact.oracle(df, preds).head().getLong(0)

  def heuristic(preds: Seq[Pred]): Long =
    Exact.heuristic(df, preds).head().getLong(0)

  def bayesNet(numSamples: Int = 1000, maxBins: Int = 64): BayesNetEstimator =
    new BayesNetEstimator(BayesNet.fit(projected, meta, maxBins), numSamples)

  def maxDiff(limit: Int = 200, numSamples: Int = 50000): MaxDiffHistogram = {
    val data = Trainer.collectEncoded(projected, meta.columns, numSamples,
      totalRows = meta.cardinality)
    MaxDiffHistogram.build(meta, data, limit)
  }

  // ---- learned estimators ----

  /** Train a ResMADE and wrap it in ProgressiveSampling (the recommended
    * default, README.md:69-77 analog). `inputEncoding`/`outputEncoding`
    * "embed"+"embed" ties wide-domain output heads to the input
    * embeddings (made.py:645-674); `fixedOrdering` trains a non-natural
    * autoregressive ordering. */
  def trainMade(hidden: Seq[Int] = Seq(64, 64), epochs: Int = 4,
      maxRows: Int = 200000, numSamples: Int = 1000,
      inputEncoding: String = "one_hot", outputEncoding: String = "one_hot",
      embedSize: Int = 16, fixedOrdering: Array[Int] = null,
      seed: Long = 11123L): ProgressiveSampling = {
    val data = Trainer.collectEncoded(projected, meta.columns, maxRows,
      totalRows = meta.cardinality)
    val model = new Made(cols.length, hidden,
      meta.columns.map(_.distributionSize).toArray,
      inputEncoding = inputEncoding, outputEncoding = outputEncoding,
      embedSize = embedSize, residual = true, doDirectIo = true,
      columnMasking = true, seed = seed, fixedOrdering = fixedOrdering)
    Trainer.train(model, data, epochs, batchSize = 1024,
      schedule = Trainer.ConstantLr(2e-3f), tableBits = tableBits)
    new ProgressiveSampling(model, meta, numSamples, shortcircuit = true)
  }

  /** Train one ResMADE per ordering and average their estimates — the
    * multi-ordering variance-reduction ensemble (estimators.py:409-418,
    * train_model.py:210-228). The sample budget is split across
    * orderings. Pass `null` in `orderings` for the natural order. */
  def trainMadeEnsemble(orderings: Seq[Array[Int]],
      hidden: Seq[Int] = Seq(64, 64), epochs: Int = 4,
      maxRows: Int = 200000, totalSamples: Int = 1000,
      seed: Long = 11123L): EnsembleProgressiveSampling = {
    require(orderings.nonEmpty)
    val data = Trainer.collectEncoded(projected, meta.columns, maxRows,
      totalRows = meta.cardinality)
    val samplers = orderings.zipWithIndex.map { case (ord, i) =>
      val model = new Made(cols.length, hidden,
        meta.columns.map(_.distributionSize).toArray,
        inputEncoding = "one_hot", residual = true, doDirectIo = true,
        columnMasking = true, seed = seed + i, fixedOrdering = ord)
      Trainer.train(model, data, epochs, batchSize = 1024,
        schedule = Trainer.ConstantLr(2e-3f), tableBits = tableBits)
      new ProgressiveSampling(model, meta,
        math.max(1, totalSamples / orderings.length), shortcircuit = true)
    }
    new EnsembleProgressiveSampling(samplers)
  }

  /** The cheap multi-ordering ensemble: ONE ResMADE cycling `orderings`
    * as masks per minibatch (made.py:277-311 update_masks), estimates
    * averaged over the orderings at query time (estimators.py:372-418).
    * 1× training and 1× parameters vs [[trainMadeEnsemble]]'s k×. */
  def trainMadeMultiMask(orderings: Seq[Array[Int]],
      hidden: Seq[Int] = Seq(64, 64), epochs: Int = 4,
      maxRows: Int = 200000, totalSamples: Int = 1000,
      seed: Long = 11123L): MultiMaskProgressiveSampling = {
    // Checked BEFORE training: a 1-ordering "ensemble" would train fully
    // and then fail MultiMaskProgressiveSampling's numMasks > 1 guard.
    require(orderings.length >= 2,
      "multi-mask needs >= 2 orderings; use trainMade(fixedOrdering=...) for one")
    val data = Trainer.collectEncoded(projected, meta.columns, maxRows,
      totalRows = meta.cardinality)
    val model = new Made(cols.length, hidden,
      meta.columns.map(_.distributionSize).toArray,
      inputEncoding = "one_hot", residual = true, doDirectIo = true,
      columnMasking = true, seed = seed,
      numMasks = orderings.length, orderings = orderings)
    Trainer.train(model, data, epochs, batchSize = 1024,
      schedule = Trainer.ConstantLr(2e-3f), tableBits = tableBits)
    new MultiMaskProgressiveSampling(model, meta, totalSamples,
      shortcircuit = true)
  }

  /** Train the Transformer family (transformer.py:267-598 analog);
    * `fixedOrdering` selects a non-natural autoregressive ordering. */
  def trainTransformer(dModel: Int = 16, numBlocks: Int = 2, epochs: Int = 2,
      maxRows: Int = 50000, numSamples: Int = 1000,
      fixedOrdering: Array[Int] = null,
      seed: Long = 11123L): ProgressiveSampling = {
    val data = Trainer.collectEncoded(projected, meta.columns, maxRows,
      totalRows = meta.cardinality)
    val model = new Transformer(cols.length,
      meta.columns.map(_.distributionSize).toArray,
      dModel = dModel, dFf = dModel * 2, numHeads = 2,
      numBlocks = numBlocks, columnMasking = true,
      fixedOrdering = fixedOrdering, seed = seed)
    Trainer.train(model, data, epochs, batchSize = 1024,
      schedule = Trainer.ConstantLr(5e-3f), tableBits = tableBits)
    new ProgressiveSampling(model, meta, numSamples, shortcircuit = true)
  }

  // ---- evaluation ----

  /** A seeded workload over the modeled columns (eval_model.py:175-217). */
  def workload(numQueries: Int, seed: Long = 1234L): Seq[Seq[Pred]] = {
    val anchors = Workload.anchorRows(df, cols, numQueries)
    Workload.generate(meta, cols, anchors, numQueries,
      minFilters = 2, maxFilters = math.min(4, cols.length), seed = seed)
  }

  /** Run estimators over a seeded workload against exact truths (ONE
    * scan for all truths); returns per-estimator q-error reports. */
  def evaluate(estimators: Seq[CardEst], numQueries: Int = 50,
      seed: Long = 1234L): Seq[Workload.Report] = {
    val qs = workload(numQueries, seed)
    val truths = Workload.trueCards(df, qs)
    estimators.map { e =>
      qs.zip(truths).foreach { case (q, t) => e.run(q, t) }
      e.report
    }
  }

  /** Enable approximate COUNT(*) answering through the Catalyst rule for
    * this table's scans (plans/GraftExtensions.scala). Works on any
    * session: if it was not built `.withExtensions(new GraftExtensions)`,
    * the rule is attached via `experimental.extraOptimizations` (the
    * rewrite is idempotent, so having both is harmless). */
  def enableApproxCount(pathToken: String, estimator: CardEst): Unit = {
    graft.plans.ApproxCountRule.attachIfMissing(spark)
    graft.plans.GraftRuntime.register(pathToken, cols.toSet, estimator.query)
    spark.conf.set(graft.plans.GraftRuntime.EnabledKey, "true")
  }
}

object Graft {
  def apply(spark: SparkSession, df: DataFrame, name: String,
      cols: Seq[String]): Graft = new Graft(spark, df, name, cols)
}
