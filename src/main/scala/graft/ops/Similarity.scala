package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Similarity search over an embedding column (`array<float>`):
  * brute-force cosine top-k as the exact baseline, and a random-hyperplane
  * LSH bucketed variant as the 100 TB scale path.
  *
  * Scale shape: brute-force is one scan + a k-row top-k (TakeOrderedAndProject
  * — no global sort materialization); LSH prunes the scan to the query's
  * hash bucket(s), shuffling only (bucket, id, vec) for candidate buckets.
  *
  * DuckDB-verifiability: the cosine is emitted as an explicit
  * left-associated arithmetic chain over exact-decimal literals of the
  * query vector, with all math in double — the same expression text
  * produces bit-identical results in both engines, so the top-k rows
  * hash-match.
  */
object Similarity {

  /** Exact decimal literal of a float widened to double (every binary
    * double has a finite decimal form; `toString` of the float would
    * re-parse to a *different* double). */
  def exactLit(f: Float): String =
    new java.math.BigDecimal(f.toDouble).toPlainString

  /** Cosine similarity of `embCol` (1-indexed via element_at) against a
    * literal query vector, as a Spark Column: explicit left-assoc chains.
    */
  def cosineCol(embCol: String, query: Array[Float]): Column = {
    val dot = query.zipWithIndex.map { case (q, i) =>
      element_at(col(embCol), i + 1).cast("double") * lit(q.toDouble)
    }.reduceLeft(_ + _)
    val normB = sqrt(query.indices.map { i =>
      element_at(col(embCol), i + 1).cast("double") *
        element_at(col(embCol), i + 1).cast("double")
    }.reduceLeft(_ + _))
    val normQ = math.sqrt(query.map(q => q.toDouble * q.toDouble).sum)
    dot / (normB * lit(normQ))
  }

  /** The same expression as SQL text (DuckDB arrays are also 1-indexed). */
  def cosineSql(embCol: String, query: Array[Float]): String = {
    val dot = query.zipWithIndex.map { case (q, i) =>
      s"(CAST($embCol[${i + 1}] AS DOUBLE) * ${exactLit(q)})"
    }.mkString(" + ")
    val normB = query.indices.map { i =>
      s"(CAST($embCol[${i + 1}] AS DOUBLE) * CAST($embCol[${i + 1}] AS DOUBLE))"
    }.mkString(" + ")
    val normQ = new java.math.BigDecimal(
      math.sqrt(query.map(q => q.toDouble * q.toDouble).sum)).toPlainString
    s"(($dot) / (sqrt($normB) * $normQ))"
  }

  /** Brute-force cosine top-k: scan + TakeOrderedAndProject (the k-row
    * limit keeps the sort partial and the result driver-sized).
    */
  def bruteForceTopK(df: DataFrame, idCol: String, embCol: String,
      query: Array[Float], k: Int): DataFrame =
    df.select(col(idCol), cosineCol(embCol, query).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)

  def bruteForceTopKSql(table: String, idCol: String, embCol: String,
      query: Array[Float], k: Int): String =
    s"SELECT $idCol, ${cosineSql(embCol, query)} AS sim FROM $table " +
      s"ORDER BY sim DESC, $idCol LIMIT $k"

  /** Oracle-stable top-k artifact: (rank, id) only. The raw cosine double
    * is reproducible across engines only to ±1 ulp (ops can fuse/round
    * differently), so the checked artifact is the ranked id list — ulp
    * noise cannot flip it unless two distinct vectors' cosines collide
    * within 1 ulp. */
  def bruteForceTopKIds(df: DataFrame, idCol: String, embCol: String,
      query: Array[Float], k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    bruteForceTopK(df, idCol, embCol, query, k)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("sim").desc, col(idCol))))
      .select(col("rank"), col(idCol))
      .orderBy("rank")
  }

  def bruteForceTopKIdsSql(table: String, idCol: String, embCol: String,
      query: Array[Float], k: Int): String =
    s"SELECT CAST(row_number() OVER (ORDER BY sim DESC, $idCol) AS INTEGER) " +
      s"AS rank, $idCol FROM " +
      s"(${bruteForceTopKSql(table, idCol, embCol, query, k)}) ORDER BY rank"

  /** Deterministic random hyperplanes for sign-LSH, seeded. */
  def hyperplanes(dim: Int, numBits: Int, seed: Long): Array[Array[Float]] = {
    val rng = new java.util.Random(seed)
    Array.fill(numBits)(Array.fill(dim)(rng.nextGaussian().toFloat))
  }

  /** LSH-bucketed approximate top-k: candidates = rows in the query's
    * bucket or any bucket at Hamming distance 1 (multi-probe), then exact
    * cosine within candidates. At 100 TB this reads ~ (1+bits)/2^bits of
    * the data instead of all of it (with bucket-pruned storage it's an
    * actual partition-prune; here a scan-side candidate filter).
    *
    * The bucket test runs in mapPartitions over broadcast planes — the
    * documented exception class ([[nearDupPairs]], [[quantizeInt8]]):
    * the unrolled numBits×dim literal expression tree (512 multiply-adds
    * at the 8×64 defaults, on top of the candidate cosine in the same
    * stage) blew Janino's 64 KB method limit and knocked the whole plan
    * out of whole-stage codegen. The surviving expression work — the
    * candidate cosine + TakeOrdered — stays codegen'd.
    */
  def lshTopK(df: DataFrame, idCol: String, embCol: String,
      query: Array[Float], k: Int, numBits: Int = 8,
      seed: Long = 42L): DataFrame = {
    val planes = hyperplanes(query.length, numBits, seed)
    def bucketOf(v: Array[Float]): Long =
      planes.zipWithIndex.map { case (p, b) =>
        val dot = p.zip(v).map { case (w, x) => w.toDouble * x.toDouble }.sum
        if (dot > 0) 1L << b else 0L
      }.foldLeft(0L)(_ | _)
    val qBucket = bucketOf(query)
    val probes = (qBucket +: Array.tabulate(numBits)(
      b => qBucket ^ (1L << b))).toSet
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast((planes, probes))
    val base = df.select(col(idCol).cast("long"), col(embCol))
    val candRows = base.rdd.mapPartitions { it =>
      val (pl, pr) = bc.value
      it.filter { r =>
        val v = r.getSeq[Float](1)
        var code = 0L
        var j = 0
        while (j < pl.length) {
          var dot = 0.0
          var i = 0
          while (i < v.length) { dot += pl(j)(i).toDouble * v(i); i += 1 }
          if (dot > 0) code |= 1L << j
          j += 1
        }
        pr.contains(code)
      }
    }
    spark.createDataFrame(candRows, base.schema)
      .select(col(base.columns.head).as(idCol),
        cosineCol(embCol, query).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  /** IVF (inverted-file) coarse quantizer: Lloyd's k-means on a bounded
    * driver-side sample (seeded, deterministic), centroids broadcast as
    * literal expression trees. At 100 TB the cells become the partition/
    * bucket layout and a query reads only `nProbe`/`k` of the data.
    */
  def kmeansCentroids(df: DataFrame, embCol: String, k: Int, iters: Int = 10,
      sampleRows: Int = 10000, seed: Long = 42L,
      idCol: String = "vec_id"): Array[Array[Float]] = {
    // Pinned sample: limit() over an unordered frame is not stable
    // across partition layouts/AQE, which would silently break the
    // "deterministic seeded" contract downstream results rely on —
    // order by id first, like annRecall's query batch.
    val sample = df.select(col(embCol), col(idCol))
      .orderBy(col(idCol)).limit(sampleRows).collect()
      .map(_.getSeq[Float](0).toArray)
    require(sample.nonEmpty)
    val dim = sample(0).length
    val rng = new java.util.Random(seed)
    var centroids = Array.fill(k)(sample(rng.nextInt(sample.length)).clone())
    for (_ <- 0 until iters) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Int](k)
      for (v <- sample) {
        val c = nearestCentroid(v, centroids)
        counts(c) += 1
        var i = 0
        while (i < dim) { sums(c)(i) += v(i); i += 1 }
      }
      centroids = Array.tabulate(k) { c =>
        if (counts(c) == 0) sample(rng.nextInt(sample.length)).clone()
        else sums(c).map(s => (s / counts(c)).toFloat)
      }
    }
    centroids
  }

  private def nearestCentroid(v: Array[Float], cs: Array[Array[Float]]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < cs.length) {
      var d = 0.0
      var i = 0
      while (i < v.length) {
        val diff = v(i) - cs(c)(i)
        d += diff * diff
        i += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** Cell id of the embedding column: argmin over centroids of squared
    * L2 distance, as a codegen'd expression (no UDF). The k distance
    * expressions are materialized ONCE in an array and the argmin is
    * `array_position(dists, array_min(dists))` — a when-chain argmin
    * duplicates each k·dim-term distance ~k² times and was measured 20×
    * slower. Ties break to the lowest cell id (first occurrence), the
    * same rule as the driver-side assignment in [[kmeansCentroids]].
    */
  def ivfCellCol(embCol: String, centroids: Array[Array[Float]]): Column = {
    val dists = array(centroids.map { ctr =>
      ctr.zipWithIndex.map { case (w, i) =>
        val d = element_at(col(embCol), i + 1).cast("double") - lit(w.toDouble)
        d * d
      }.reduceLeft(_ + _)
    }: _*)
    (array_position(dists, array_min(dists)) - 1).cast("int")
  }

  /** IVF approximate top-k: probe the `nProbe` cells nearest to the
    * query, exact cosine within the probed cells.
    *
    * Cell assignment runs in `mapPartitions` with broadcast centroids —
    * the expression-tree formulation ([[ivfCellCol]]) builds a
    * k·dim-term tree whose Catalyst analysis alone costs seconds per
    * query; a JVM argmin over a broadcast float matrix is the right tool
    * (same pattern a production IVF index uses). The surviving
    * candidates are reranked by the exact codegen'd cosine.
    */
  def ivfTopK(df: DataFrame, idCol: String, embCol: String,
      query: Array[Float], k: Int, centroids: Array[Array[Float]],
      nProbe: Int = 2): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val spark = df.sparkSession
    val byDist = centroids.zipWithIndex.sortBy { case (c, _) =>
      c.zip(query).map { case (a, b) => (a - b).toDouble * (a - b) }.sum
    }
    val probeCells = byDist.take(nProbe).map(_._2).toSet
    val bcCentroids = spark.sparkContext.broadcast(centroids)
    val candidates = df.select(col(idCol).cast("long"), col(embCol))
      .rdd.mapPartitions { rows =>
        val cs = bcCentroids.value
        rows.filter { r =>
          val v = r.getSeq[Float](1)
          var best = 0
          var bestD = Double.MaxValue
          var c = 0
          while (c < cs.length) {
            var d = 0.0
            var i = 0
            while (i < cs(c).length) {
              val diff = v(i) - cs(c)(i)
              d += diff * diff
              i += 1
            }
            if (d < bestD) { bestD = d; best = c }
            c += 1
          }
          probeCells.contains(best)
        }.map(r => Row(r.getLong(0), r.getSeq[Float](1)))
      }
    val schema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField(embCol, ArrayType(FloatType), nullable = false)))
    spark.createDataFrame(candidates, schema)
      .select(col(idCol), cosineCol(embCol, query).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  /** Embedding-cosine near-duplicate pairs via banded sign-LSH: a pair
    * is a candidate if it collides in ANY of `numBands` independent
    * `numBits`-bit codes; candidates are deduped, then scored with the
    * exact cosine and filtered by `threshold`. The self-join is
    * per-(band, bucket), so the candidate set is bucket-bounded rather
    * than n².
    *
    * Parameter sizing (the 100 TB story): per-band collision probability
    * of a pair at angle θ is (1 − θ/π)^numBits, OR'd across bands:
    * recall = 1 − (1 − p^numBits)^numBands. Exact duplicates collide in
    * every band with probability 1 regardless of sizing. `numBits` must
    * grow with corpus size — choose numBits ≈ log2(n / targetBucketSize)
    * so mean bucket occupancy stays O(targetBucketSize), and buy recall
    * back with more bands (cost is linear in bands, quadratic in bucket
    * occupancy). A fixed-width code over a growing corpus silently
    * saturates every bucket past `maxBucketSize` (the skew cap) and
    * drops coverage — the round-4 configuration (one 8-bit code) had
    * exactly that defect.
    */
  def nearDupPairs(df: DataFrame, idCol: String, embCol: String,
      threshold: Double, numBits: Int = 12, numBands: Int = 4,
      seed: Long = 42L, maxBucketSize: Int = 10000): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val spark = df.sparkSession
    val dim = df.select(size(col(embCol))).head().getInt(0)
    val bandPlanes = Array.tabulate(numBands)(b =>
      hyperplanes(dim, numBits, seed + b))
    // One row per (vector, band). Band codes are computed in
    // mapPartitions over broadcast planes, NOT as a literal expression
    // tree: numBands·numBits·dim literal terms (3k+ at the defaults)
    // cost seconds of Catalyst analysis alone and blow past the
    // whole-stage-codegen method limit — the same ceiling the IVF cell
    // assignment hit (measured 34 s -> 0.7 s there; see PLANS.md).
    val bcPlanes = spark.sparkContext.broadcast(bandPlanes)
    val codeRows = df.select(col(idCol).cast("long"), col(embCol))
      .rdd.mapPartitions { it =>
        val planes = bcPlanes.value
        it.flatMap { row =>
          val id = row.getLong(0)
          val v = row.getSeq[Float](1)
          val vArr = new Array[Float](v.length)
          var i = 0
          while (i < vArr.length) { vArr(i) = v(i); i += 1 }
          (0 until planes.length).iterator.map { b =>
            val ps = planes(b)
            var code = 0L
            var j = 0
            while (j < ps.length) {
              var dot = 0.0
              var k = 0
              while (k < vArr.length) { dot += ps(j)(k).toDouble * vArr(k); k += 1 }
              if (dot > 0) code |= 1L << j
              j += 1
            }
            // Skinny (id, band, code) rows ONLY — carrying the vector
            // here would ship numBands copies of every embedding
            // through the window shuffle and both self-join sides;
            // embeddings are attached once, after candidate dedup.
            Row(id, b, code)
          }
        }
      }
    val codeSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("band", IntegerType, nullable = false),
      StructField("bucket", LongType, nullable = false)))
    val withB = spark.createDataFrame(codeRows, codeSchema)
    // Bucket-size cap as a WINDOW over the one (band, bucket) shuffle —
    // a separate count-aggregation branch plus join would make three
    // consumers of the (uncached) code computation; with the window
    // both self-join sides share one exchange subtree, which Spark's
    // ReuseExchange collapses so the band codes are computed once.
    val bounded = withB
      .withColumn("__bsz", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("band", "bucket")))
      .filter(col("__bsz") <= maxBucketSize)
      .drop("__bsz")
    val l = bounded.select(col("band"), col("bucket"), col("id").as("id_a"))
    val r = bounded.select(col("band"), col("bucket"), col("id").as("id_b"))
    // Dedup candidates across bands BEFORE the exact cosine — a pair
    // colliding in k bands must be scored once, not k times — then
    // attach each side's embedding with one join against the original
    // table: the (bucket-capped, tiny) candidate set broadcasts, so
    // each embedding is read and moved once instead of numBands times.
    val candidates = l.join(r, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .join(df.select(col(idCol).cast("long").as("id_a"),
        col(embCol).as("ea")), Seq("id_a"))
      .join(df.select(col(idCol).cast("long").as("id_b"),
        col(embCol).as("eb")), Seq("id_b"))
    // Candidate cosine in a mapPartitions loop, not
    // aggregate()/zip_with() lambdas: on a near-orthogonal 10× corpus
    // the 12-bit buckets still emit ~200k collision candidates, and
    // interpreted per-element lambdas made their scoring the entry's
    // dominant cost (same measured HOF-interpreter tax as
    // quantizeInt8, see PLANS.md). The loop accumulates in the
    // identical left-assoc IEEE order, so the 6-decimal-rounded oracle
    // values are unchanged.
    val scoredRows = candidates
      .select(col("id_a"), col("id_b"), col("ea"), col("eb"))
      .rdd.mapPartitions { it =>
        it.map { r =>
          val ea = r.getSeq[Float](2)
          val eb = r.getSeq[Float](3)
          var dot = 0.0; var na = 0.0; var nb = 0.0
          var i = 0
          while (i < ea.length) {
            val a = ea(i).toDouble; val b = eb(i).toDouble
            dot += a * b; na += a * a; nb += b * b
            i += 1
          }
          Row(r.getLong(0), r.getLong(1),
            dot / (math.sqrt(na) * math.sqrt(nb)))
        }
      }
    spark.createDataFrame(scoredRows, StructType(Seq(
      StructField("id_a", LongType, nullable = false),
      StructField("id_b", LongType, nullable = false),
      StructField("cosine", DoubleType, nullable = false))))
      .filter(col("cosine") >= threshold)
      .orderBy("id_a", "id_b")
  }

  /** ANN quality harness: recall@k of the sign-LSH multi-probe and IVF
    * paths against the brute-force ground truth, over a batch of
    * `numQueries` query vectors drawn deterministically from the data
    * (lowest ids). This is the measurement a production ANN deployment
    * tunes against — recall traded off against the candidate fraction
    * scanned — surfaced as a first-class operator so the trade-off is a
    * queryable number, not a code comment.
    *
    * Shape: ONE JVM pass over the table (broadcast planes, centroids,
    * and the metadata-sized query batch) emits per-(query, row) cosine
    * plus each path's candidate flag; ground truth and both candidate
    * sets then run through the two-phase bounded top-k. Everything
    * after the scan is k·numQueries-bounded, and the summary is
    * computed eagerly so the scored table's cache can be dropped before
    * returning (q_sketches precedent: the result is driver-sized by
    * construction).
    */
  def annRecall(df: DataFrame, idCol: String, embCol: String,
      k: Int = 10, numQueries: Int = 8, numBits: Int = 8,
      ivfCells: Int = 16, nProbe: Int = 2, seed: Long = 42L,
      plantDups: Int = 0): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val spark = df.sparkSession
    val base = df.select(col(idCol).cast("long"), col(embCol))
    val qRows = base.orderBy(col(idCol)).limit(numQueries).collect()
    val qs = qRows.map(_.getSeq[Float](1).toArray)
    require(qs.nonEmpty, "annRecall needs at least one query vector")
    val dim = qs(0).length
    val planes = hyperplanes(dim, numBits, seed)
    val centroids = kmeansCentroids(df, embCol, ivfCells, seed = seed,
      idCol = idCol)
    def bucketOf(v: Array[Float]): Long =
      planes.zipWithIndex.map { case (p, b) =>
        var dot = 0.0
        var i = 0
        while (i < v.length) { dot += p(i).toDouble * v(i); i += 1 }
        if (dot > 0) 1L << b else 0L
      }.foldLeft(0L)(_ | _)
    val lshProbes: Array[Set[Long]] = qs.map { q =>
      val b = bucketOf(q)
      (b +: Array.tabulate(numBits)(i => b ^ (1L << i))).toSet
    }
    val ivfProbes: Array[Set[Int]] = qs.map { q =>
      centroids.zipWithIndex.sortBy { case (c, _) =>
        c.zip(q).map { case (a, x) => (a - x).toDouble * (a - x) }.sum
      }.take(nProbe).map(_._2).toSet
    }
    val qNorms = qs.map(q => math.sqrt(q.map(x => x.toDouble * x).sum))
    val bc = spark.sparkContext.broadcast(
      (qs, planes, centroids, lshProbes, ivfProbes, qNorms))
    // plantDups > 0 (the *bounds* gate): after query selection, plant
    // that many EXACT duplicates of every query at negative ids
    // (collision-free against any non-negative id space, the
    // annPlantedTopk convention). An exact dup shares the query's LSH
    // bucket and nearest IVF cell BY CONSTRUCTION and ties at the top
    // cosine, so with plantDups >= k every path's recall@k is provably
    // 1.0 — a deterministic boolean contract on the machinery, where a
    // threshold on this near-orthogonal corpus would be data-noise.
    val corpus =
      if (plantDups == 0) base
      else base.unionByName(spark.createDataFrame(
        spark.sparkContext.parallelize(
          qRows.toSeq.zipWithIndex.flatMap { case (r, qi) =>
            (0 until plantDups).map(j =>
              Row(-(qi.toLong * plantDups + j + 1L), r.get(1)))
          }, 1),
        StructType(base.schema.fields.map(f => f.copy(nullable = f.nullable)))))
    val scored = corpus
      .rdd.mapPartitions { rows =>
        val (qv, pl, cs, lp, ip, qn) = bc.value
        rows.flatMap { r =>
          val id = r.getLong(0)
          val v = r.getSeq[Float](1).toArray
          var bucket = 0L
          var j = 0
          while (j < pl.length) {
            var dot = 0.0
            var i = 0
            while (i < v.length) { dot += pl(j)(i).toDouble * v(i); i += 1 }
            if (dot > 0) bucket |= 1L << j
            j += 1
          }
          val cell = nearestCentroid(v, cs)
          var vn = 0.0
          var i = 0
          while (i < v.length) { vn += v(i).toDouble * v(i); i += 1 }
          val vnorm = math.sqrt(vn)
          qv.indices.iterator.map { qi =>
            var dot = 0.0
            var x = 0
            while (x < v.length) { dot += qv(qi)(x).toDouble * v(x); x += 1 }
            Row(qi, id, dot / (vnorm * qn(qi)),
              lp(qi).contains(bucket), ip(qi).contains(cell))
          }
        }
      }
    val schema = StructType(Seq(
      StructField("qid", IntegerType, nullable = false),
      StructField("id", LongType, nullable = false),
      StructField("sim", DoubleType, nullable = false),
      StructField("lsh_hit", BooleanType, nullable = false),
      StructField("ivf_hit", BooleanType, nullable = false)))
    val all = spark.createDataFrame(scored, schema)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // finally: all three per-invocation resources (scored cache, truth
    // cache, the planes/centroids/query broadcast) are session-lived
    // otherwise — repeated invocations would accumulate storage memory.
    val truth = Relational.topKPerGroup(all, "qid", "sim", Seq("id"), k)
      .select(col("qid"), col("id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      def recallOf(cand: DataFrame, name: String): Row = {
        val approx = Relational.topKPerGroup(cand, "qid", "sim", Seq("id"), k)
          .select(col("qid"), col("id"), lit(1).as("__hit"))
        val r = truth.join(approx, Seq("qid", "id"), "left")
          .groupBy(col("qid"))
          .agg((sum(coalesce(col("__hit"), lit(0))) / lit(k.toDouble))
            .as("recall"))
          .agg(count(lit(1)).as("n_queries"),
            avg(col("recall")).as("mean_recall"),
            min(col("recall")).as("min_recall"))
          .head()
        Row(name, r.getLong(0), r.getDouble(1), r.getDouble(2))
      }
      val rows = Seq(recallOf(all, "brute"),
        recallOf(all.filter(col("lsh_hit")), "lsh"),
        recallOf(all.filter(col("ivf_hit")), "ivf"))
      val outSchema = StructType(Seq(
        StructField("method", StringType, nullable = false),
        StructField("n_queries", LongType, nullable = false),
        StructField("mean_recall", DoubleType, nullable = false),
        StructField("min_recall", DoubleType, nullable = false)))
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), outSchema)
    } finally {
      truth.unpersist(false)
      all.unpersist(false)
      bc.destroy()
    }
  }

  /** Planted-ground-truth ANN gate: the first `numQueries` vectors (by
    * id) become queries, each gets an exact duplicate planted at id
    * `-(qid+1)` (collision-free against any non-negative id space at
    * any scale factor), and every path — brute-force, sign-LSH with
    * Hamming-1 probing, IVF with nProbe cells — must return the
    * planted duplicate as top-1 (self excluded). An exact duplicate
    * lands in the query's own LSH bucket (identical hyperplane signs)
    * and its own nearest IVF cell by construction, and cosine 1.0
    * strictly dominates the near-orthogonal corpus, so the result is
    * DETERMINISTIC: the bucketing / probing / top-k machinery becomes
    * an oracle-checkable contract (the q_embed_neardup planted-truth
    * precedent) where recall thresholds on synthetic near-orthogonal
    * data would be meaningless (see annRecall's scaladoc).
    *
    * One pass over corpus+planted scoring all queries (broadcast
    * planes/centroids/queries), one partial-agg `max_by` shuffle of
    * (qid, id, sim, hit-flags) — no per-query jobs.
    */
  def annPlantedTopk(df: DataFrame, idCol: String, embCol: String,
      numQueries: Int = 8, numBits: Int = 8, ivfCells: Int = 16,
      nProbe: Int = 2, seed: Long = 42L): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val spark = df.sparkSession
    val base = df.select(col(idCol).cast("long"), col(embCol))
    val qRows = base.orderBy(col(idCol)).limit(numQueries).collect()
    require(qRows.nonEmpty, "annPlantedTopk needs at least one query")
    val qIds = qRows.map(_.getLong(0))
    val qs = qRows.map(_.getSeq[Float](1).toArray)
    val dim = qs(0).length
    val planes = hyperplanes(dim, numBits, seed)
    val centroids = kmeansCentroids(df, embCol, ivfCells, seed = seed,
      idCol = idCol)
    def bucketOf(v: Array[Float]): Long =
      planes.zipWithIndex.map { case (p, b) =>
        var dot = 0.0
        var i = 0
        while (i < v.length) { dot += p(i).toDouble * v(i); i += 1 }
        if (dot > 0) 1L << b else 0L
      }.foldLeft(0L)(_ | _)
    val lshProbes: Array[Set[Long]] = qs.map { q =>
      val b = bucketOf(q)
      (b +: Array.tabulate(numBits)(i => b ^ (1L << i))).toSet
    }
    val ivfProbes: Array[Set[Int]] = qs.map { q =>
      centroids.zipWithIndex.sortBy { case (c, _) =>
        c.zip(q).map { case (a, x) => (a - x).toDouble * (a - x) }.sum
      }.take(nProbe).map(_._2).toSet
    }
    val qNorms = qs.map(q => math.sqrt(q.map(x => x.toDouble * x).sum))
    val plantedSchema = StructType(base.schema.fields.map(f =>
      f.copy(nullable = f.nullable)))
    val planted = spark.createDataFrame(
      spark.sparkContext.parallelize(
        qRows.toSeq.map(r => Row(-(r.getLong(0) + 1L), r.get(1))), 1),
      plantedSchema)
    val corpus = base.unionByName(planted)
    val bc = spark.sparkContext.broadcast(
      (qs, qIds, planes, centroids, lshProbes, ivfProbes, qNorms))
    val scored = corpus.rdd.mapPartitions { rows =>
      val (qv, qid, pl, cs, lp, ip, qn) = bc.value
      rows.flatMap { r =>
        val id = r.getLong(0)
        val v = r.getSeq[Float](1).toArray
        var bucket = 0L
        var j = 0
        while (j < pl.length) {
          var dot = 0.0
          var i = 0
          while (i < v.length) { dot += pl(j)(i).toDouble * v(i); i += 1 }
          if (dot > 0) bucket |= 1L << j
          j += 1
        }
        val cell = nearestCentroid(v, cs)
        var vn = 0.0
        var i = 0
        while (i < v.length) { vn += v(i).toDouble * v(i); i += 1 }
        val vnorm = math.sqrt(vn)
        qv.indices.iterator
          .filter(qi => id != qid(qi)) // self never competes
          .map { qi =>
            var dot = 0.0
            var x = 0
            while (x < v.length) { dot += qv(qi)(x).toDouble * v(x); x += 1 }
            Row(qid(qi), id, dot / (vnorm * qn(qi)),
              lp(qi).contains(bucket), ip(qi).contains(cell))
          }
      }
    }
    val schema = StructType(Seq(
      StructField("query_id", LongType, nullable = false),
      StructField("id", LongType, nullable = false),
      StructField("sim", DoubleType, nullable = false),
      StructField("lsh_hit", BooleanType, nullable = false),
      StructField("ivf_hit", BooleanType, nullable = false)))
    // NOTE: the returned DataFrame is lazy — the broadcast must stay
    // alive until the caller executes it, so it is session-lived here
    // (small: queries + planes + centroids).
    spark.createDataFrame(scored, schema)
      .groupBy(col("query_id"))
      .agg(
        max_by(col("id"), col("sim")).as("brute_top1"),
        max_by(when(col("lsh_hit"), col("id")),
          when(col("lsh_hit"), col("sim"))).as("lsh_top1"),
        max_by(when(col("ivf_hit"), col("id")),
          when(col("ivf_hit"), col("sim"))).as("ivf_top1"))
      .orderBy("query_id")
  }

  /** Quantized ANN search — the int8 scale path end-to-end: rank the
    * corpus by the INTEGER dot product of int8 codes (the cheap wide
    * scan a 100 TB deployment runs over the 4×-smaller quantized
    * corpus), keep the top rerankFactor·k, then rerank only those by
    * exact float cosine. The artifact is (rank, id) like
    * [[bruteForceTopKIds]]; the integer prefilter scores are exact in
    * both engines (products of ≤127-magnitude ints, summed — no float
    * rounding), so candidate selection is deterministic, and the
    * rerank reuses the proven ±1-ulp-safe ranked-id convention. */
  def int8TopKIds(df: DataFrame, idCol: String, embCol: String,
      query: Array[Float], k: Int, rerankFactor: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val qScale =
      math.max(query.map(q => math.abs(q.toDouble)).max, 1e-30) / 127.0
    val qInt = query.map(q => math.floor(q.toDouble / qScale + 0.5).toLong)
    // Integer-dot scores in the same tight per-partition loop as
    // [[quantizeInt8]] (same measured HOF-interpretation rationale);
    // the k·rerankFactor TakeOrdered and the 30-row cosine rerank stay
    // declarative.
    val spark = df.sparkSession
    val scored = df.select(col(idCol).cast("long"), col(embCol))
      .rdd.mapPartitions { it =>
        it.map { r =>
          val emb = r.getSeq[Float](1)
          var maxAbs = 0.0
          var i = 0
          while (i < emb.length) {
            val a = math.abs(emb(i).toDouble); if (a > maxAbs) maxAbs = a
            i += 1
          }
          val scale = math.max(maxAbs, 1e-30) / 127.0
          var idot = 0L
          i = 0
          while (i < emb.length && i < qInt.length) {
            idot += qInt(i) *
              math.floor(emb(i).toDouble / scale + 0.5).toLong
            i += 1
          }
          Row(r.getLong(0), emb, idot)
        }
      }
    spark.createDataFrame(scored, StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField(embCol, ArrayType(FloatType), nullable = false),
      StructField("idot", LongType, nullable = false))))
      .orderBy(col("idot").desc, col(idCol)).limit(k * rerankFactor)
      .select(col(idCol), cosineCol(embCol, query).as("sim"))
      .withColumn("rank", row_number().over(
        Window.orderBy(col("sim").desc, col(idCol))))
      .filter(col("rank") <= k)
      .select(col("rank"), col(idCol))
      .orderBy("rank")
  }

  /** DuckDB twin of [[int8TopKIds]]: identical per-vector scale, the
    * same integer dot (floor terms are integer-valued doubles — exact),
    * same tie-breaks, same rerank. */
  def int8TopKIdsSql(table: String, idCol: String, embCol: String,
      query: Array[Float], k: Int, rerankFactor: Int = 3): String = {
    val qScale =
      math.max(query.map(q => math.abs(q.toDouble)).max, 1e-30) / 127.0
    val qInt = query.map(q => math.floor(q.toDouble / qScale + 0.5).toLong)
    val idot = qInt.zipWithIndex.map { case (qi, i) =>
      s"($qi * floor(CAST($embCol[${i + 1}] AS DOUBLE) / scale + 0.5))"
    }.mkString(" + ")
    s"""WITH s AS (
  SELECT $idCol, $embCol,
    greatest(list_max(list_transform($embCol,
      y -> abs(CAST(y AS DOUBLE)))), 1e-30) / 127.0 AS scale
  FROM $table
), c AS (
  SELECT $idCol, $embCol, CAST($idot AS BIGINT) AS idot
  FROM s ORDER BY idot DESC, $idCol LIMIT ${k * rerankFactor}
)
SELECT CAST(row_number() OVER (ORDER BY sim DESC, $idCol) AS INTEGER)
  AS rank, $idCol
FROM (SELECT $idCol, ${cosineSql(embCol, query)} AS sim FROM c)
QUALIFY rank <= $k ORDER BY rank"""
  }

  /** Symmetric per-vector int8 quantization — the standard 4× memory /
    * bandwidth lever for ANN at scale (a 100 TB float corpus becomes
    * 25 TB of int8 + one float scale per vector; int8 dot products
    * then rerank against the float originals only for the top
    * candidates). scale = max|x|/127 so the extreme element maps to
    * ±127 exactly; q_i = floor(x_i/scale + 0.5), written as the
    * explicit floor(+0.5) form because Spark's round() half-up and
    * DuckDB's round() half-away-from-zero disagree on negative .5
    * boundaries — floor(+0.5) is bit-identical on both engines for
    * the exact same double operands (float→double widening is exact,
    * and / on identical doubles is IEEE-deterministic). Zero vectors
    * quantize to all-zero via the 1e-30 scale guard. Fully
    * codegen'd: transform/aggregate higher-order functions, map-side
    * only, no shuffle. */
  /** Shared per-vector quantization core: one pass for the max-abs
    * scale, one for the codes — the exact double arithmetic the DuckDB
    * twin runs (float→double widening is exact; floor(x/scale + 0.5)
    * is IEEE-deterministic on identical operands). */
  private def quantizeVec(emb: Seq[Float]): (Double, Array[Byte]) = {
    val n = emb.length
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      val a = math.abs(emb(i).toDouble); if (a > maxAbs) maxAbs = a
      i += 1
    }
    val scale = math.max(maxAbs, 1e-30) / 127.0
    val codes = new Array[Byte](n)
    i = 0
    while (i < n) {
      codes(i) = math.floor(emb(i).toDouble / scale + 0.5).toByte
      i += 1
    }
    (scale, codes)
  }

  /** mapPartitions, not transform()/aggregate() lambdas: Spark's
    * higher-order array functions evaluate INTERPRETED, per element —
    * the declarative form measured 9.0 s for 20k×64-dim at the 10×
    * audit point vs well under a second for this loop (the same
    * documented exception class as the IVF/LSH scorers). At 100 TB
    * that per-row CPU tax is the whole cost of this map-side op. */
  def quantizeInt8(df: DataFrame, idCol: String, embCol: String): DataFrame = {
    val spark = df.sparkSession
    val rdd = df.select(col(idCol).cast("long"), col(embCol))
      .rdd.mapPartitions { it =>
        it.map { r =>
          val (scale, codes) = quantizeVec(r.getSeq[Float](1))
          Row(r.getLong(0), scale, codes)
        }
      }
    spark.createDataFrame(rdd, StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("q_scale", DoubleType, nullable = false),
      StructField("q_vec", ArrayType(ByteType, containsNull = false),
        nullable = false))))
  }

  /** Engine-portable checksum projection of [[quantizeInt8]] (the
    * oracle-gated surface: per-vector dimension count and the
    * sum/min/max of the quantized codes — any off-by-one in a single
    * element breaks q_sum). Computed in the same single-pass loop.
    * (Zero-length vectors would emit 0/0/0 here while the SQL twin
    * drops them — the generator guarantees fixed 64-dim vectors,
    * asserted by q_embed_stats.) */
  def quantizeChecksums(df: DataFrame, idCol: String,
      embCol: String): DataFrame = {
    val spark = df.sparkSession
    val rdd = df.select(col(idCol).cast("long"), col(embCol))
      .rdd.mapPartitions { it =>
        it.map { r =>
          val (_, codes) = quantizeVec(r.getSeq[Float](1))
          var s = 0L; var mn = 0L; var mx = 0L
          var i = 0
          while (i < codes.length) {
            val c = codes(i).toLong
            s += c
            if (i == 0 || c < mn) mn = c
            if (i == 0 || c > mx) mx = c
            i += 1
          }
          Row(r.getLong(0), codes.length.toLong, s, mn, mx)
        }
      }
    spark.createDataFrame(rdd, StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("n_dims", LongType, nullable = false),
      StructField("q_sum", LongType, nullable = false),
      StructField("q_min", LongType, nullable = false),
      StructField("q_max", LongType, nullable = false))))
      .orderBy(idCol)
  }

  /** DuckDB twin of [[quantizeChecksums]] — same floor(+0.5) form over
    * the same double operands. */
  def quantizeChecksumsSql(table: String, idCol: String,
      embCol: String): String =
    s"""WITH x AS (
  SELECT $idCol, CAST(u.x AS DOUBLE) AS x
  FROM $table, LATERAL (SELECT unnest($embCol) AS x) u
), m AS (
  SELECT $idCol, greatest(max(abs(x)), 1e-30) / 127.0 AS scale
  FROM x GROUP BY $idCol
)
SELECT x.$idCol, CAST(count(*) AS BIGINT) AS n_dims,
  CAST(sum(floor(x / scale + 0.5)) AS BIGINT) AS q_sum,
  CAST(min(floor(x / scale + 0.5)) AS BIGINT) AS q_min,
  CAST(max(floor(x / scale + 0.5)) AS BIGINT) AS q_max
FROM x JOIN m ON x.$idCol = m.$idCol
GROUP BY x.$idCol ORDER BY x.$idCol"""

  /** Upper-triangle Gram matrix G[i][j] = Σ_rows q_i·q_j over the
    * int8-quantized embeddings ([[quantizeInt8]]) — the distributed
    * half of large-scale PCA/covariance: each partition folds its rows
    * into ONE dim·(dim+1)/2 Long accumulator, then a dim²-bounded
    * shuffle merges the partials. The eigensolve on the resulting
    * dim×dim matrix is driver-side, dim-bounded work by construction.
    * Quantizing first makes the artifact integer-EXACT cross-engine
    * (a float Gram would be reduction-order-dependent). Overflow
    * envelope: |q| ≤ 127 so each partial adds ≤ 127² = 16129 per row —
    * Long holds ~5.7e14 rows per cell, require()d loud below. Output
    * indices are 1-based to match SQL list indexing. */
  def gramUpperTriangle(df: DataFrame, idCol: String,
      embCol: String): DataFrame = {
    val spark = df.sparkSession
    val q = quantizeInt8(df, idCol, embCol)
    val rdd = q.select(col("q_vec")).rdd.mapPartitions { it =>
      var acc: Array[Long] = null
      var dim = 0
      var rows = 0L
      it.foreach { r =>
        val v = r.getSeq[Byte](0)
        if (acc == null) { dim = v.length; acc = new Array[Long](dim * (dim + 1) / 2) }
        require(v.length == dim, s"ragged embedding: ${v.length} != $dim")
        rows += 1
        var k = 0
        var i = 0
        while (i < dim) {
          val vi = v(i).toLong
          var j = i
          while (j < dim) {
            acc(k) += vi * v(j).toLong
            k += 1; j += 1
          }
          i += 1
        }
      }
      require(rows < 5e14.toLong, "gram partial overflow envelope")
      if (acc == null) Iterator.empty
      else {
        var k = -1
        for (i <- 0 until dim; j <- i until dim) yield { k += 1
          Row(i + 1, j + 1, acc(k)) }
      }.iterator
    }
    val partials = spark.createDataFrame(rdd, StructType(Seq(
      StructField("di", IntegerType, nullable = false),
      StructField("dj", IntegerType, nullable = false),
      StructField("g", LongType, nullable = false))))
    partials.groupBy(col("di"), col("dj"))
      .agg(sum(col("g")).as("g"))
      .orderBy("di", "dj")
  }

  /** DuckDB twin of [[gramUpperTriangle]]: same quantization formula,
    * Gram via an indexed self-join on the row id (1-based list
    * indexing matches the Spark output's 1-based dims). */
  def gramUpperTriangleSql(table: String, idCol: String,
      embCol: String): String =
    s"""WITH x AS (
  SELECT $idCol, u.i, CAST($embCol[u.i] AS DOUBLE) AS x
  FROM $table,
    LATERAL (SELECT unnest(generate_series(1, len($embCol))) AS i) u
), m AS (
  SELECT $idCol, greatest(max(abs(x)), 1e-30) / 127.0 AS scale
  FROM x GROUP BY $idCol
), q AS (
  SELECT x.$idCol, x.i, CAST(floor(x / scale + 0.5) AS BIGINT) AS qv
  FROM x JOIN m ON x.$idCol = m.$idCol
)
SELECT CAST(a.i AS INTEGER) AS di, CAST(b.i AS INTEGER) AS dj,
  CAST(sum(a.qv * b.qv) AS BIGINT) AS g
FROM q a JOIN q b ON a.$idCol = b.$idCol AND a.i <= b.i
GROUP BY 1, 2 ORDER BY 1, 2"""
}
