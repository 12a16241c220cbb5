package graft.ops

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.feature.{HashingTF, IDF, MinHashLSH, RegexTokenizer}
import org.apache.spark.ml.linalg.SparseVector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MLlib-backed text-pipeline operators (the north star's named
  * "MLlib pipeline" surface): TF-IDF featurization via a fitted
  * `Pipeline(RegexTokenizer → HashingTF → IDF)` and MLlib `MinHashLSH`
  * dedup candidates over the hashed term sets — the library counterparts
  * of the hand-built ops in [[Dedup]]/[[TextOps]].
  *
  * Scale shape: tokenize/hash are map-side; IDF fit is one aggregation
  * over document frequencies; the LSH join shuffles only hash buckets.
  * Estimators (IDF, LSH hash functions) are fitted once and broadcast
  * inside the transform, exactly like the custom operators' vocabs.
  */
object MlPipeline {

  /** Fit TF-IDF over `textCol` and return the transformed frame with a
    * `features` sparse vector column. */
  def tfidf(df: DataFrame, textCol: String,
      numFeatures: Int = 1 << 14): DataFrame = {
    val pipeline = new Pipeline().setStages(Array(
      new RegexTokenizer().setInputCol(textCol).setOutputCol("__tokens")
        .setPattern("\\s+"),
      new HashingTF().setInputCol("__tokens").setOutputCol("__tf")
        .setNumFeatures(numFeatures),
      new IDF().setInputCol("__tf").setOutputCol("features")))
    pipeline.fit(df).transform(df).drop("__tokens", "__tf")
  }

  /** Per-doc TF-IDF summary (deterministic: hashing + idf are seedless
    * deterministic functions of the corpus). */
  def tfidfStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val featured = tfidf(df, textCol)
    val spark = df.sparkSession
    import spark.implicits._
    featured.select(col(idCol).cast("long"), col("features"))
      .as[(Long, org.apache.spark.ml.linalg.Vector)]
      .map { case (id, v) =>
        val sv = v.asInstanceOf[SparseVector]
        val norm = math.sqrt(sv.values.map(x => x * x).sum)
        (id, sv.indices.length.toLong,
          math.round(norm * 1e6) / 1e6)
      }
      .toDF(idCol, "n_terms", "l2_norm")
      .orderBy(idCol)
  }

  /** Model-based quality filter (the GPT-3/CCNet-style classifier step:
    * score documents with a trained model instead of fixed thresholds):
    * logistic regression over the [[TextOps.qualityScores]] signals,
    * trained on weak labels from the Gopher threshold filter, then
    * applied corpus-wide. The returned frame carries the signals, the
    * weak label, the model probability, and the model keep/drop.
    *
    * Scale shape: featurization is the map-side quality-scores scan; the
    * LR fit is a handful of treeAggregate passes over (bounded-dim)
    * feature rows; scoring is one broadcast-coefficients map. In a real
    * pipeline the labels come from a curated sample (wiki-vs-crawl);
    * the weak-label wiring here keeps the operator self-contained while
    * exercising the identical fit/score plumbing.
    */
  def qualityClassifier(df: DataFrame, idCol: String,
      textCol: String, materialize: Boolean = false): DataFrame = {
    val signals = TextOps.qualityScores(col(textCol))
      .map { case (n, c) => c.as(n) }
    val featured = df.select(col(idCol) +: signals: _*)
      .na.fill(0.0)
      .withColumn("weak_label",
        when(col("n_tokens") >= 30 && col("stopword_ratio") > 0 &&
          col("dup_token_frac") < 0.6, 1.0).otherwise(0.0))
    val assembler = new org.apache.spark.ml.feature.VectorAssembler()
      .setInputCols(Array("n_tokens", "mean_word_len", "punct_ratio",
        "alpha_ratio", "stopword_ratio", "dup_token_frac"))
      .setOutputCol("__features")
    val lr = new org.apache.spark.ml.classification.LogisticRegression()
      .setFeaturesCol("__features").setLabelCol("weak_label")
      .setMaxIter(10).setRegParam(0.01)
    // Persist across the LBFGS iterations: every iteration is a
    // treeAggregate pass over this frame, and recomputing the regex
    // quality signals per pass dominated the fit (7.5 s -> ~2 s).
    val prepared = assembler.transform(featured)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // GRAFT_TRACE: stage attribution for the first-consumer-pays cost
    // (the q_qerror_report convention) — featurize vs fit vs consumers.
    val trace = sys.env.contains("GRAFT_TRACE")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      if (trace) println(f"[classifier] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    timed("featurize+persist")(prepared.count())
    // The fit input is coalesced: every LBFGS iteration is a
    // treeAggregate JOB over this frame, so its cost floor is
    // (partitions × iterations) task overhead — measured 3.5 s for 10
    // iterations over 5,000 cached rows at 32 partitions, pure
    // scheduling. 8 partitions bounds that floor; the coalesce reads
    // the already-persisted blocks, and `prepared` itself keeps full
    // parallelism for the corpus-wide scoring pass below. (At 100 TB
    // the same principle holds harder: fit on a bounded, bounded-
    // partition sample; score everything.)
    val model = timed("lbfgs fit")(lr.fit(prepared.coalesce(8)))
    // Score with plain column arithmetic from the fitted coefficients,
    // NOT model.transform: the model's ScalaUDF closure drags the whole
    // LogisticRegressionModel into the task — including trainingSummary,
    // which references the SparkSession. That serializes only while the
    // session's lazily-created observationManager is still null; after
    // any Observation has run on the session (q_observe_metrics in the
    // bench), the task fails "Task not serializable". The margin below
    // reproduces MLlib's scoring exactly (BLAS dot in index order, then
    // + intercept; p = sigmoid(margin); predict 1 iff p > 0.5 at the
    // default threshold) as codegen'd expressions — also the right
    // shape for the corpus-wide pass at scale (no black-box UDF).
    val coef = model.coefficients.toArray
    val featNames = assembler.getInputCols
    val dotProd = featNames.zip(coef)
      .map { case (c, w) => col(c) * lit(w) }
      .reduce(_ + _)
    val pKeep = lit(1.0) / (lit(1.0) + exp(-(dotProd + lit(model.intercept))))
    val out = prepared
      .withColumn("p_keep", pKeep)
      .select(col(idCol), col("weak_label"),
        round(col("p_keep"), 4).as("p_keep"),
        when(col("p_keep") > 0.5, 1.0).otherwise(0.0).as("model_keep"))
      .orderBy(idCol)
    // Lazy path: `prepared` stays persisted under the returned frame
    // (the result remains recomputable after executor loss — an eager
    // localCheckpoint would truncate lineage onto non-replicated
    // executor-local blocks), released only via block age-out.
    // `materialize = true` instead persists the (id + 3 scalars)
    // scored table, computes it eagerly, and frees the corpus-wide
    // `prepared` feature blocks immediately — the shape a shared
    // score cache wants: only the skinny consumer-facing frame holds
    // executor storage after the first consumer (VERDICT r12 ask #2).
    if (!materialize) out
    else {
      val res = out.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      timed("score+persist")(res.count())
      prepared.unpersist()
      res
    }
  }

  /** MLlib MinHashLSH near-dup candidates over binarized term vectors —
    * the library twin of [[Dedup.minhashCandidates]]. Returns
    * (id_a, id_b, jaccard_dist) pairs under the distance threshold.
    */
  def minhashLshCandidates(df: DataFrame, idCol: String, textCol: String,
      numHashTables: Int = 8, maxJaccardDist: Double = 0.6,
      numFeatures: Int = 1 << 14): DataFrame = {
    val hashed = new Pipeline().setStages(Array(
      new RegexTokenizer().setInputCol(textCol).setOutputCol("__tokens")
        .setPattern("\\s+"),
      new HashingTF().setInputCol("__tokens").setOutputCol("features")
        .setNumFeatures(numFeatures).setBinary(true)))
      .fit(df).transform(df)
      .select(col(idCol).as("id"), col("features"))
    val lsh = new MinHashLSH().setInputCol("features").setOutputCol("__hashes")
      .setNumHashTables(numHashTables).setSeed(42L)
    val model = lsh.fit(hashed)
    model.approxSimilarityJoin(hashed, hashed, maxJaccardDist, "jaccard_dist")
      .select(col("datasetA.id").as("id_a"), col("datasetB.id").as("id_b"),
        col("jaccard_dist"))
      .filter(col("id_a") < col("id_b"))
      .orderBy("id_a", "id_b")
  }

  /** Bucket-CAPPED MLlib MinHashLSH candidates — the scale-safe variant
    * of [[minhashLshCandidates]]. `approxSimilarityJoin` has no bucket
    * cap: one boilerplate hash bucket with B members materializes B²
    * join rows, the exact failure mode [[Dedup.minhashCandidates]]'
    * `maxBucketSize` exists to prevent. This path keeps the MLlib
    * estimator interop (the SAME fitted `MinHashLSHModel` produces the
    * hash values, same seed, same keyDistance semantics) but builds the
    * candidate join itself: explode the model's per-table hashes to
    * (table, hash) bucket keys, drop buckets over `maxBucketSize` with
    * a count-window over the one bucket shuffle (both self-join sides
    * then share the exchange via ReuseExchange), self-join within
    * surviving buckets, and score pairs with the exact Jaccard distance
    * MLlib's `keyDistance` defines (1 − |a∩b|/|a∪b| over active term
    * indices). Identical output to the uncapped path whenever no bucket
    * exceeds the cap (spec-pinned); at 100 TB the cap is what makes the
    * join's output LINEAR in corpus size instead of quadratic in the
    * hottest bucket.
    */
  def minhashLshCandidatesCapped(df: DataFrame, idCol: String,
      textCol: String, numHashTables: Int = 8, maxJaccardDist: Double = 0.6,
      numFeatures: Int = 1 << 14, maxBucketSize: Int = 64): DataFrame = {
    import org.apache.spark.ml.functions.vector_to_array
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    import spark.implicits._
    val hashed = new Pipeline().setStages(Array(
      new RegexTokenizer().setInputCol(textCol).setOutputCol("__tokens")
        .setPattern("\\s+"),
      new HashingTF().setInputCol("__tokens").setOutputCol("features")
        .setNumFeatures(numFeatures).setBinary(true)))
      .fit(df).transform(df)
      .select(col(idCol).as("id"), col("features"))
    val lsh = new MinHashLSH().setInputCol("features").setOutputCol("__hashes")
      .setNumHashTables(numHashTables).setSeed(42L)
    val withHashes = lsh.fit(hashed).transform(hashed)
    val buckets = withHashes
      .select(col("id"), posexplode(col("__hashes")).as(Seq("t", "h")))
      .select(col("id"), col("t"),
        element_at(vector_to_array(col("h")), 1).as("hv"))
    val bounded = buckets
      .withColumn("__bsz", count(lit(1)).over(Window.partitionBy("t", "hv")))
      .filter(col("__bsz") <= maxBucketSize)
      .drop("__bsz")
    val pairs = bounded.as("a").join(bounded.as("b"),
        col("a.t") === col("b.t") && col("a.hv") === col("b.hv") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    val feats = withHashes.select(col("id"), col("features"))
    pairs
      .join(feats.select(col("id").as("id_a"), col("features").as("__fa")),
        "id_a")
      .join(feats.select(col("id").as("id_b"), col("features").as("__fb")),
        "id_b")
      .map { r =>
        val a = r.getAs[SparseVector]("__fa").indices
        val b = r.getAs[SparseVector]("__fb").indices
        val inter = a.intersect(b).length.toDouble
        val union = a.length + b.length - inter
        (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
          if (union == 0.0) 1.0 else 1.0 - inter / union)
      }
      .toDF("id_a", "id_b", "jaccard_dist")
      // strict <, matching approxSimilarityJoin's threshold filter
      .filter(col("jaccard_dist") < maxJaccardDist)
      .orderBy("id_a", "id_b")
  }
}
