package graft.ops

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Unit-level checks of the dedup/text/similarity operators on known
  * inputs (the catalog entries check them against DuckDB end-to-end;
  * these pin the operator semantics directly).
  */
class OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private def docsDf(rows: (Long, String)*) = {
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2)), 2), schema)
  }

  test("shingles: distinct word n-grams in order-independent set form") {
    val df = docsDf((1L, "a b c b c d"))
    val sh = df.select(Dedup.shingles(col("text"), 3).as("s"))
      .head().getSeq[String](0).toSet
    assert(sh == Set("a b c", "b c b", "c b c", "b c d"))
  }

  test("exactKeepFirst keeps the smallest id per identical text") {
    val df = docsDf((3L, "same text"), (1L, "same text"), (2L, "other"))
    val kept = Dedup.exactKeepFirst(df, "doc_id", "text")
      .collect().map(_.getLong(0)).toSeq
    assert(kept == Seq(1L, 2L))
  }

  test("minhash est_jaccard is high for near-identical docs, low for disjoint") {
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val nearDup = (1 to 38).map(i => s"tok$i").mkString(" ") + " x y"
    val other = (100 to 140).map(i => s"tok$i").mkString(" ")
    val df = docsDf((1L, base), (2L, nearDup), (3L, other))
    val pairs = Dedup.minhashCandidates(df, "doc_id", "text",
      n = 3, bands = 16, rowsPerBand = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val dupPair = pairs.find(p => p._1 == 1L && p._2 == 2L)
    assert(dupPair.isDefined, s"near-dup pair not found in ${pairs.toSeq}")
    assert(dupPair.get._3 > 0.5)
    assert(!pairs.exists(p => p._2 == 3L || p._1 == 3L),
      "disjoint doc should not collide")
  }

  test("portable minhash LSH: near-dups collide, disjoint docs don't, " +
      "over-cap buckets drop") {
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val nearDup = (1 to 38).map(i => s"tok$i").mkString(" ") + " x y"
    val other = (100 to 140).map(i => s"tok$i").mkString(" ")
    val df = docsDf((1L, base), (2L, nearDup), (3L, other))
    val exploded = Dedup.explodeShingles(df, "doc_id", "text", 3)
    val pairs = Dedup.minhashLshPortable(exploded)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 >= 1L),
      s"near-dup pair missing in ${pairs.toSeq}")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      "disjoint doc must not collide")
    // cap = 1: every ≥2-member bucket is over-cap and dropped ⇒ no pairs.
    assert(Dedup.minhashLshPortable(exploded, maxBucketSize = 1).count() == 0)
  }

  test("tfidfExact: df / total_tf / smoothed-idf arithmetic on a known corpus") {
    // 3 docs: 'a' in all (df=3), 'b' in two (df=2, tf 1+2), 'c' once.
    val df = docsDf((1L, "a b"), (2L, "a b b"), (3L, "a c"))
    val out = TextOps.tfidfExact(df, "doc_id", "text")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out("a") == ((3L, 3L, 0.0)))  // idf = ln(4/4) = 0
    val idfB = math.log(4.0 / 3.0)
    assert(out("b")._1 == 2L && out("b")._2 == 3L)
    assert(math.abs(out("b")._3 - math.round(2 * idfB * 1e6) / 1e6) < 1e-9)
    assert(out("c") == ((1L, 1L, math.round(math.log(2.0) * 1e6) / 1e6)))
  }

  test("saltedDistinctAgg equals the plain aggregation for any bucket count") {
    val schema = StructType(Seq(StructField("k", StringType),
      StructField("d", LongType), StructField("v", DoubleType)))
    val rows = (1 to 200).map(i =>
      Row(if (i % 10 == 0) "cold" else "hot", (i % 37).toLong, (i % 5).toDouble))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), schema)
    val expected = df.groupBy("k")
      .agg(countDistinct("d").as("n_distinct"), sum("v").as("sum_val"),
        count(lit(1)).as("cnt"))
      .orderBy("k").collect().toSeq
    for (b <- Seq(1, 7, 64)) {
      val got = Relational.saltedDistinctAgg(df, "k", "d", "v", buckets = b)
        .collect().toSeq
      assert(got == expected, s"buckets=$b")
    }
  }

  test("bucketed range join equals the naive range predicate incl. boundaries") {
    val schema = StructType(Seq(StructField("user_id", LongType),
      StructField("event_id", LongType), StructField("event_type", StringType),
      StructField("ts", TimestampType)))
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 12:00:00")
    def at(sec: Long) = new java.sql.Timestamp(t0.getTime + sec * 1000)
    // clicks at −3600 (in: >= lts−1h), −3599, −1, 0 (out: < lts), +10 (out)
    // across a cell boundary; second user isolated; purchase with no clicks.
    val rows = Seq(
      Row(1L, 10L, "purchase", at(0)),
      Row(1L, 1L, "click", at(-3600)), Row(1L, 2L, "click", at(-3599)),
      Row(1L, 3L, "click", at(-1)), Row(1L, 4L, "click", at(0)),
      Row(1L, 5L, "click", at(10)),
      Row(2L, 20L, "purchase", at(500)), Row(2L, 6L, "click", at(-3000)),
      Row(3L, 30L, "purchase", at(100)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 3), schema)
    val got = Relational.rangeJoinBucketed(df, "user_id", "ts",
        "purchase", "click", "event_type", "event_id", 3600L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // user 1: clicks at −3600, −3599, −1 in-window (0 and +10 excluded);
    // user 2: −3000 is within [500−3600, 500) and lands a cell earlier
    // than the purchase; user 3: zero matches kept via the left join.
    assert(got == Seq((1L, 1L, 3L), (2L, 1L, 1L), (3L, 1L, 0L)))
  }

  test("simhash is identical for identical docs, differs for disjoint docs") {
    val df = docsDf((1L, "alpha beta gamma delta"),
      (8L, "alpha beta gamma delta"), (15L, "zeta eta theta iota"))
    val fp = Dedup.simhash64(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) == fp(8L))
    assert(fp(1L) != fp(15L))
  }

  test("language ID picks the marker-dominant language") {
    val df = docsDf(
      (1L, "the cat and the dog of a house is in the garden"),
      (2L, "der Hund und die Katze ist nicht ein Tier"),
      (3L, "xyzzy qwerty plugh"))
    val out = df.select(col("doc_id"),
      TextOps.langId(TextOps.langScores(col("text"))).as("lang"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "en")
    assert(out(2L) == "de")
    assert(out(3L) == "unknown")
  }

  test("ngram Jaccard: exact intersection/union arithmetic") {
    // doc1: shingles {a b c, b c d}; doc2: {a b c, b c x}
    val df = docsDf((1L, "a b c d"), (2L, "a b c x"))
    val rows = Dedup.ngramJaccardPairs(df, "doc_id", "text", 3, 0.0)
      .collect()
    assert(rows.length == 1)
    val r = rows(0)
    assert(r.getAs[Long]("inter") == 1L)
    assert(r.getAs[Long]("union_sz") == 3L)
    assert(math.abs(r.getAs[Double]("jaccard") - 1.0 / 3) < 1e-12)
  }

  test("checkpoint filename round-trips through the metric parser") {
    import graft.nn.{Made, Trainer}
    val model = new Made(2, Seq(4), Array(3, 4), inputEncoding = "one_hot")
    val path = Trainer.checkpointPath("/tmp/gmdl_test", "lineitem", model,
      modelBits = 13.123, dataBits = 12.337, epochs = 12, seed = 11123L)
    val info = Trainer.parseCheckpointName(path)
    assert(info.isDefined, path)
    assert(info.get.dataset.endsWith("lineitem"))
    assert(math.abs(info.get.modelBits - 13.123) < 1e-9)
    assert(math.abs(info.get.dataBits - 12.337) < 1e-9)
    assert(info.get.epochs == 12 && info.get.seed == 11123L)
    // findBest picks the lowest model_bits.
    Trainer.save(model, path)
    val worse = Trainer.checkpointPath("/tmp/gmdl_test", "lineitem", model,
      modelBits = 14.5, dataBits = 12.337, epochs = 5, seed = 1L)
    Trainer.save(model, worse)
    val best = Trainer.findBest("/tmp/gmdl_test", info.get.dataset)
    assert(best.isDefined && math.abs(best.get.modelBits - 13.123) < 1e-9)
  }

  test("IVF with all cells probed equals brute force; fewer probes prune") {
    val rng = new java.util.Random(4)
    val vecs = (0L until 60L).map { i =>
      val center = if (i % 2 == 0) 1f else -1f
      (i, Array.fill(8)(center + rng.nextGaussian().toFloat * 0.1f))
    }
    val schema = StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(
        vecs.map(v => Row(v._1, v._2.toSeq)), 2), schema)
    val q = Array.fill(8)(1f)
    val cs = Similarity.kmeansCentroids(df, "embedding", k = 2, sampleRows = 60)
    val brute = Similarity.bruteForceTopK(df, "vec_id", "embedding", q, 5)
      .collect().map(_.getLong(0)).toSeq
    val ivfAll = Similarity.ivfTopK(df, "vec_id", "embedding", q, 5, cs,
      nProbe = 2).collect().map(_.getLong(0)).toSeq
    assert(ivfAll == brute)
    // Probing only the nearest cell must return the near cluster (even ids).
    val ivf1 = Similarity.ivfTopK(df, "vec_id", "embedding", q, 5, cs,
      nProbe = 1).collect().map(_.getLong(0)).toSeq
    assert(ivf1.forall(_ % 2 == 0), s"far-cluster ids leaked: $ivf1")
    // The expression-tree cell assignment agrees with the JVM argmin.
    val exprCells = df.select(col("vec_id"),
      Similarity.ivfCellCol("embedding", cs).as("cell"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    for ((id, v) <- vecs) {
      var best = 0; var bestD = Double.MaxValue
      for (c <- cs.indices) {
        val d = cs(c).zip(v).map { case (a, b) => (a - b).toDouble * (a - b) }.sum
        if (d < bestD) { bestD = d; best = c }
      }
      assert(exprCells(id) == best, s"cell mismatch for vec $id")
    }
  }

  test("winnowing fingerprints are deterministic and locality-preserving") {
    val base = (1 to 60).map(i => s"word$i").mkString(" ")
    val edited = base + " tail edit only"
    val other = (200 to 260).map(i => s"w$i").mkString(" ")
    val df = docsDf((1L, base), (2L, base), (3L, edited), (4L, other))
    val fp = TextOps.winnowingFingerprints(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert(fp(1L) == fp(2L), "identical docs must fingerprint identically")
    // A tail edit preserves most fingerprints (locality).
    val shared = fp(1L).intersect(fp(3L)).size.toDouble / fp(1L).size
    assert(shared > 0.8, s"tail edit kept only ${shared * 100}%")
    // Disjoint content shares (nearly) nothing.
    assert(fp(1L).intersect(fp(4L)).size <= fp(1L).size / 10)
    assert(fp(1L).nonEmpty)
  }

  test("winnowing fingerprints are shift-invariant under prefix insertion") {
    // A prefix edit shifts every shared k-gram to a different byte
    // offset; the rolling hash must assign the same value to the same
    // k-gram regardless of position, so most fingerprints survive.
    val base = (1 to 60).map(i => s"word$i").mkString(" ")
    val shifted = "inserted prefix " + base
    val df = docsDf((1L, base), (2L, shifted))
    val fp = TextOps.winnowingFingerprints(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    val shared = fp(1L).intersect(fp(2L)).size.toDouble / fp(1L).size
    assert(shared > 0.8, s"prefix insertion kept only ${shared * 100}%")
  }

  test("MLlib TF-IDF pipeline: rarer terms score higher, stats are stable") {
    val df = docsDf(
      (1L, "common common rare1"), (2L, "common common rare2"),
      (3L, "common common common"))
    val stats = MlPipeline.tfidfStats(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // Docs 1 and 2 contain a unique term each -> higher-norm features
    // than doc 3 (all common terms, idf ~ 0 contribution dominated).
    assert(stats(1L)._1 == 2 && stats(2L)._1 == 2) // {common, rareX}
    assert(stats(3L)._1 == 1)
    assert(stats(1L)._2 > stats(3L)._2)
  }

  test("MLlib MinHashLSH finds the same near-dup pair as the custom MinHash") {
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val nearDup = (1 to 38).map(i => s"tok$i").mkString(" ") + " x y"
    val other = (100 to 140).map(i => s"tok$i").mkString(" ")
    val df = docsDf((1L, base), (2L, nearDup), (3L, other))
    val pairs = MlPipeline.minhashLshCandidates(df, "doc_id", "text",
      maxJaccardDist = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((1L, 2L)), s"pairs=${pairs.toSeq}")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("capped MLlib LSH == uncapped when no bucket is hot; " +
      "hot buckets are excised under a tight cap") {
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val nearDup = (1 to 38).map(i => s"tok$i").mkString(" ") + " x y"
    val other = (100 to 140).map(i => s"tok$i").mkString(" ")
    val df = docsDf((1L, base), (2L, nearDup), (3L, other))
    def key(r: Row) = (r.getLong(0), r.getLong(1),
      math.round(r.getDouble(2) * 1e9))
    val uncapped = MlPipeline.minhashLshCandidates(df, "doc_id", "text",
      maxJaccardDist = 0.5).collect().map(key).toSet
    val capped = MlPipeline.minhashLshCandidatesCapped(df, "doc_id", "text",
      maxJaccardDist = 0.5, maxBucketSize = 64).collect().map(key).toSet
    assert(capped == uncapped, s"capped=$capped uncapped=$uncapped")
    // A boilerplate clique (identical text → every pair shares every
    // bucket) above the cap: the hot buckets are dropped, so the clique
    // contributes NO pairs while the distinct near-dup pair survives.
    val boiler = (100L to 110L).map(i => (i, "the same boilerplate page"))
    val mixed = docsDf((boiler :+ ((1L, base)) :+ ((2L, nearDup))): _*)
    val cappedHot = MlPipeline.minhashLshCandidatesCapped(mixed, "doc_id",
        "text", maxJaccardDist = 0.5, maxBucketSize = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(cappedHot.contains((1L, 2L)), s"got ${cappedHot.toSeq}")
    assert(!cappedHot.exists(p => p._1 >= 100L),
      s"hot-bucket clique must be excised: ${cappedHot.toSeq}")
  }

  test("connectedComponents labels chains and cliques with the min id") {
    // Components: a 6-node chain (multi-round propagation), a triangle,
    // and an isolated edge.
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L))
    val schema = StructType(Seq(StructField("id_a", LongType),
      StructField("id_b", LongType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(edges.map(e => Row(e._1, e._2)), 2),
      schema)
    val comps = Dedup.connectedComponents(df, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 6L).forall(comps(_) == 1L), s"chain: $comps")
    assert(Seq(10L, 11L, 12L).forall(comps(_) == 10L), s"triangle: $comps")
    assert(comps(20L) == 20L && comps(21L) == 20L, s"edge: $comps")
    assert(comps.size == 11)
  }

  test("connectedComponents of an empty pair list is empty") {
    val schema = StructType(Seq(StructField("id_a", LongType),
      StructField("id_b", LongType)))
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], schema)
    assert(Dedup.connectedComponents(empty, "id_a", "id_b").count() == 0L)
  }

  test("stratifiedSample keeps the per-stratum systematic slice") {
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("src", StringType)))
    val rows = (0L until 90L).map(i => Row(i, s"s${i % 3}"))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    // s0 ids are 0,3,6,... (stride 3) — moduli coprime to 3 slice evenly.
    val kept = Corpus.stratifiedSample(df, "src", "id",
        Map("s0" -> 1, "s1" -> 2), defaultModulus = 5)
      .groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("s0") == 30, s"$kept") // keep all
    assert(kept("s1") == 15, s"$kept") // every 2nd (ids 1,4,..,88: 15 even)
    assert(kept("s2") == 6, s"$kept")  // ids 2,5,..,89 with id%5==0: 6
  }

  test("packSequences greedy first-fit on a single range partition") {
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("n_tokens", IntegerType)))
    val rows = Seq((1L, 60), (2L, 30), (3L, 20), (4L, 90), (5L, 150),
      (6L, 10)).map(r => Row(r._1, r._2))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2),
      schema)
    val packs = Corpus.packSequences(df, "doc_id", "n_tokens",
        maxTokens = 100, partitions = 1)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq
    // Greedy in id order: [1(60),2(30)]=90; 3(20) overflows -> [3,4]=110?
    // no: 3(20)+4(90)=110 > 100, so [3(20)] closes when 4 arrives ->
    // packs: (1: 60+30=90), (3: 20), (4: 90), (5: truncated 100), (6: 10).
    assert(packs == Seq((1L, 2, 90), (3L, 1, 20), (4L, 1, 90),
      (5L, 1, 100), (6L, 1, 10)), s"packs=$packs")
  }

  test("banded nearDupPairs: exact dups always recalled, noisy dups mostly") {
    // 300 near-orthogonal base vectors; plant 10 exact dups and 30 noisy
    // dups (relative noise 0.1 -> cosine ~0.995). Exact dups collide in
    // every band by construction (recall 1.0 regardless of sizing); the
    // banded-OR recall for cosine~0.995 at 12 bits x 4 bands is ~0.99,
    // so a 0.8 floor over 30 planted pairs is far from flaky (seeded,
    // fully deterministic).
    val rng = new java.util.Random(77)
    val base = (0L until 300L).map(i =>
      (i, Array.fill(64)(rng.nextGaussian().toFloat)))
    val exactDups = base.take(10).map { case (i, v) => (i + 1000L, v.clone()) }
    val noisyDups = base.slice(10, 40).map { case (i, v) =>
      (i + 2000L, v.map(x => x + rng.nextGaussian().toFloat * 0.1f))
    }
    val schema = StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(
        (base ++ exactDups ++ noisyDups).map(v => Row(v._1, v._2.toSeq)), 4),
      schema)
    val got = Similarity.nearDupPairs(df, "vec_id", "embedding",
      threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.forall(_._3 >= 0.9))
    val gotPairs = got.map(p => (p._1, p._2)).toSet
    // Exact duplicates must ALL be found.
    for (i <- 0L until 10L)
      assert(gotPairs.contains((i, i + 1000L)), s"exact dup $i lost")
    // Noisy dup recall across the OR'd bands.
    val noisyFound = (10L until 40L).count(i => gotPairs.contains((i, i + 2000L)))
    assert(noisyFound >= 24, s"noisy recall $noisyFound/30 below 0.8 floor")
    // No false positives: every reported pair is planted (the base set
    // is near-orthogonal, nothing else clears 0.9).
    val planted = (0L until 10L).map(i => (i, i + 1000L)).toSet ++
      (10L until 40L).map(i => (i, i + 2000L)).toSet
    assert(gotPairs.subsetOf(planted), s"unexpected pairs: ${gotPairs -- planted}")
  }

  test("capped collect_set: exact at the cap, NULL above it, merge-safe") {
    graft.functions.CappedCollectSetLong.ensureRegistered(spark)
    val schema = StructType(Seq(StructField("k", StringType),
      StructField("id", LongType)))
    // "hot" has 5 distinct ids, "ok" exactly 3, "small" 1; duplicates
    // must not count toward the cap. 4 partitions force partial-buffer
    // merges through serialize/deserialize.
    val rows = (0L until 5L).map(i => Row("hot", i)) ++
      Seq(Row("ok", 1L), Row("ok", 2L), Row("ok", 3L), Row("ok", 2L),
        Row("small", 9L), Row("small", 9L))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), schema)
    val out = df.groupBy("k")
      .agg(expr("graft_capped_collect_set(id, 3)").as("ids"))
      .collect().map(r => r.getString(0) ->
        Option(r.getSeq[Long](1)).map(_.toSeq)).toMap
    assert(out("hot").isEmpty, s"over-cap group must be NULL: $out")
    assert(out("ok").contains(Seq(1L, 2L, 3L)), s"$out")
    assert(out("small").contains(Seq(9L)), s"$out")
  }

  test("decontaminate flags docs overlapping the benchmark by >= minHits n-grams") {
    val bench = docsDf((100L, "alpha beta gamma delta epsilon zeta eta"))
    // doc 1 shares 5 distinct 3-grams with the benchmark; doc 2 shares
    // 2 (below threshold); doc 3 none.
    val corpus = docsDf(
      (1L, "alpha beta gamma delta epsilon zeta"), // 4-gram overlap run
      (2L, "x alpha beta gamma y"),
      (3L, "one two three four five"))
    val out = Dedup.decontaminate(corpus, "doc_id", "text", bench, "text",
        n = 3, minHits = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc 1 shingles: {a b g, b g d, g d e, d e z} -> 4 hits.
    assert(out == Map(1L -> 4L), s"got $out")
    // Lower threshold also catches doc 2 (1 shared shingle: "alpha beta gamma").
    val loose = Dedup.decontaminate(corpus, "doc_id", "text", bench, "text",
        n = 3, minHits = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(loose == Map(1L -> 4L, 2L -> 1L), s"got $loose")
  }

  test("stratifiedSample SQL twin agrees with pmod on NEGATIVE keys") {
    // Spark pmod is always non-negative; SQL % keeps the dividend's
    // sign. The emitted twin must be pmod-equivalent, so evaluating the
    // same WHERE text in Spark SQL (whose % also keeps the sign) over
    // negative keys must select exactly the operator's rows.
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("src", StringType)))
    val rows = (-40L until 40L).map(i => Row(i, s"s${math.floorMod(i, 2)}"))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    df.createOrReplaceTempView("strat_neg")
    val moduli = Map("s0" -> 3, "s1" -> 7)
    val viaOp = Corpus.stratifiedSample(df, "src", "id", moduli,
        defaultModulus = 5)
      .collect().map(_.getLong(0)).toSet
    val viaSql = spark.sql("SELECT id FROM strat_neg WHERE " +
        Corpus.stratifiedSampleWhereSql("src", "id", moduli,
          defaultModulus = 5))
      .collect().map(_.getLong(0)).toSet
    assert(viaOp == viaSql, s"op=$viaOp sql=$viaSql")
    assert(viaOp.exists(_ < 0), "test must exercise negative keys")
  }

  test("packSequencesByRange: range resets, truncation, partition-invariance") {
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("n_tokens", IntegerType)))
    // Ranges of width 4: {0..3}, {4..7}, {8..11}. Doc 5 overflows alone;
    // doc 9 is truncated to the budget.
    val rows = Seq((0L, 50), (1L, 40), (2L, 20), (3L, 10),
      (5L, 90), (6L, 30), (7L, 30),
      (8L, 10), (9L, 500), (10L, 10)).map(r => Row(r._1, r._2))
    def run(parts: Int) = {
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, parts), schema)
      Corpus.packSequencesByRange(df, "doc_id", "n_tokens",
          maxTokens = 100, rangeWidth = 4L)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq
    }
    val expected = Seq(
      (0L, 2, 90),   // 50+40; 20 would overflow
      (2L, 2, 30),   // 20+10
      (5L, 1, 90),   // new range opens a fresh pack
      (6L, 2, 60),   // 30+30
      (8L, 1, 10),   // 10; 9 (truncated to 100) overflows
      (9L, 1, 100),  // truncated into its own pack
      (10L, 1, 10))
    assert(run(1) == expected, s"parts=1: ${run(1)}")
    // Identical for any input layout — the grouping is a pure function
    // of the ids, unlike repartitionByRange's sampled boundaries.
    assert(run(3) == expected)
    assert(run(5) == expected)
  }

  test("lineDedup drops corpus-frequent lines, keeps order, drops empty docs") {
    // "boiler" appears in 3 docs (> maxDf 2) -> removed everywhere;
    // doc 4 is all-boilerplate -> disappears.
    val df = docsDf(
      (1L, "boiler\nalpha\nbeta"),
      (2L, "gamma\nboiler"),
      (3L, "delta\nboiler\nepsilon"),
      (4L, "boiler"),
      // Within-doc repetition must NOT count toward the df cap: "echo"
      // has document frequency 1, so all three copies survive.
      (5L, "echo\necho\necho"))
    val out = Dedup.lineDedup(df, "doc_id", "text", maxDf = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    assert(out.map(t => (t._1, t._2)).toSeq ==
      Seq((1L, 2), (2L, 1), (3L, 2), (5L, 3)))
    // Reassembly preserves original line order.
    def fp(s: String) = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    assert(out(0)._3 == fp("alpha\nbeta"))
    assert(out(2)._3 == fp("delta\nepsilon"))
  }

  test("incrementalDedup keeps only batch-novel texts, first id wins") {
    val corpus = docsDf((1L, "seen before"), (2L, "also seen"))
    val batch = docsDf(
      (10L, "seen before"),   // exists in corpus -> dropped
      (11L, "brand new"),
      (13L, "brand new"),     // within-batch dup -> 11 kept
      (12L, "also new"))
    val kept = Dedup.incrementalDedup(batch, corpus, "doc_id", "text")
      .collect().map(_.getLong(0)).toSeq
    assert(kept == Seq(11L, 12L))
  }

  test("repetitionSignals: hand-computed top-2-gram and dup-5-gram fractions") {
    // 12 tokens; 2-grams: "u1 u2","u2 u3","u3 u4","u4 u5" twice each,
    // "u5 u6","u6 u7","u7 u1" once -> 11 grams of 5 chars; top = 2*5.
    // 5-grams: 8 positions, only "u1 u2 u3 u4 u5" repeats (c=2, l=14)
    // -> dup chars 28 of 112.
    val df = docsDf(
      (1L, "u1 u2 u3 u4 u5 u6 u7 u1 u2 u3 u4 u5"),
      (2L, "w1 w2 w3"),  // no 5-gram: dup5 null; all 2-grams distinct
      (3L, ""))          // blank -> excluded entirely
    val out = TextOps.repetitionSignals(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0),
        Option(r.get(1)).map(_.asInstanceOf[Double]),
        Option(r.get(2)).map(_.asInstanceOf[Double])))
    assert(out.length == 2)
    assert(out(0) == ((1L, Some(10.0 / 55), Some(28.0 / 112))))
    assert(out(1)._1 == 2L)
    assert(out(1)._2 == Some(5.0 / 10))  // "w1 w2","w2 w3": top 5 of 10
    assert(out(1)._3 == None)            // no 5-grams at all
  }

  test("writeShards: concatenated shards reproduce the deterministic shuffle") {
    val df = docsDf((0L until 500L).map(i => (i, s"doc $i")): _*)
    val dir = java.nio.file.Files.createTempDirectory("graft_shards_t").toString
    val manifest = Corpus.writeShards(df.select("doc_id"), "doc_id", 8, dir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getString(2),
        r.getString(3)))
    assert(manifest.map(_._2).sum == 500)
    // shard hash-ranges are contiguous and non-overlapping in order
    manifest.sliding(2).foreach {
      case Array((_, _, _, lastA), (_, _, firstB, _)) =>
        assert(lastA <= firstB)
      case _ =>
    }
    // reading back in (shard, shuffle_key) order == the global shuffle
    val back = spark.read.parquet(dir)
      .orderBy("shard", "shuffle_key", "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    val expected = Corpus.deterministicShuffle(df.select("doc_id"), "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(back == expected)
  }

  test("tokenBudgetMix: two-level prefix sum equals the naive window") {
    val schema = StructType(Seq(StructField("source", StringType),
      StructField("doc_id", LongType), StructField("n_tokens", LongType)))
    val rows = (0 until 300).map(i =>
      Row(s"s${i % 3}", i.toLong, (i * 7 % 40 + 1).toLong))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), schema)
    val got = Corpus.tokenBudgetMix(df, "source", "doc_id", "n_tokens",
        budgets = Map("s0" -> 500L), defaultBudget = 300L)
      .select("source", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    // naive single-window reference on the same session
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("source"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    val expected = df
      .withColumn("run", sum(col("n_tokens")).over(w))
      .filter(col("run") <= when(col("source") === "s0", 500L).otherwise(300L))
      .select("source", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == expected)
    assert(got.nonEmpty && got.size < 300) // the budget actually cuts
  }

  test("quality classifier separates clean text from junk") {
    val clean = "the quick brown fox jumps over the lazy dog and runs " +
      "to the house of a friend in the garden where it is safe from " +
      "rain and wind while birds sing softly above the quiet green field"
    val junk = "$$$ 111 !!! ### @@@ %%% ^^^ &&& *** ((( ))) ___"
    val df = docsDf((0 until 40).map { i =>
      (i.toLong, if (i % 2 == 0) clean + s" extra$i" else junk + s" $i")
    }: _*)
    val out = MlPipeline.qualityClassifier(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(3)))
    // weak labels: clean docs pass every Gopher threshold, junk fails
    assert(out.forall { case (id, weak, _) => weak == (1 - id % 2).toDouble })
    // and the fitted model reproduces the separation
    val agree = out.count { case (_, w, m) => w == m }
    assert(agree >= 38, s"model agreed on only $agree/40")
  }

  test("quality classifier survives prior Observation session state") {
    // Regression for the r7/r8 full-bench-only "Task not serializable":
    // an Observation lazily instantiates the session's (non-serializable)
    // observationManager; scoring via model.transform then dragged
    // model.trainingSummary -> SparkSession into the task closure. The
    // classifier must not capture the model object, so it must keep
    // working after an Observation has run on the same session.
    val obs = new org.apache.spark.sql.Observation("opsspec_obs")
    val probe = docsDf((0L, "warm up the observation manager"))
    probe.observe(obs, count(lit(1)).as("n"))
      .write.format("noop").mode("overwrite").save()
    assert(obs.get("n").asInstanceOf[Long] == 1L)
    val clean = "the quick brown fox jumps over the lazy dog and runs " +
      "to the house of a friend in the garden where it is safe"
    val junk = "$$$ 111 !!! ### @@@ %%% ^^^ &&& *** ((( ))) ___"
    val df = docsDf((0 until 20).map { i =>
      (i.toLong, if (i % 2 == 0) clean + s" extra$i" else junk + s" $i")
    }: _*)
    val out = MlPipeline.qualityClassifier(df, "doc_id", "text").collect()
    assert(out.length == 20)
  }

  test("latestByKey keeps the max-(order) row per key, partial-aggregated") {
    val schema = StructType(Seq(StructField("k", LongType),
      StructField("o1", LongType), StructField("o2", LongType),
      StructField("v", StringType)))
    val rows = Seq(
      Row(1L, 10L, 1L, "a"), Row(1L, 10L, 2L, "b"), Row(1L, 9L, 99L, "c"),
      Row(2L, 5L, 1L, "d"),
      Row(3L, 7L, 7L, "e"), Row(3L, 7L, 6L, "f"))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 3),
      schema)
    val got = Relational.latestByKey(df, "k", Seq("o1", "o2"),
        Seq("o1", "o2", "v"))
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    // key 1: (10,2) beats (10,1) and (9,99); key 3: (7,7) beats (7,6)
    assert(got == Map(1L -> "b", 2L -> "d", 3L -> "e"))
    val plan = Relational.latestByKey(df, "k", Seq("o1", "o2"),
      Seq("v")).queryExecution.executedPlan.toString
    assert(plan.contains("partial_max_by") || plan.contains("HashAggregate"),
      plan)
  }

  test("saltedJoin equals the plain join and widens the shuffle key") {
    val big = spark.range(2000).select(
      (when(col("id") % 10 === 0, 1L).otherwise(col("id") % 50)).as("k"),
      col("id"))
    val dim = spark.range(50).select(col("id").as("k"),
      concat(lit("d"), col("id")).as("attr"))
    val plainRows = big.join(dim, "k")
      .select("k", "id", "attr").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val salted = Relational.saltedJoin(big, dim, "k", col("id"), buckets = 8)
    val saltedRows = salted.select("k", "id", "attr").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(saltedRows == plainRows)
    // the join runs on the widened (k, __salt) key: the salt reaches
    // the physical join keys, spreading a hot k over 8 reducers
    val plan = salted.queryExecution.executedPlan.toString
    assert(plan.contains("__salt"), plan)
  }

  test("misra-gries guarantee holds across partition layouts") {
    graft.functions.MisraGriesTopK.ensureRegistered(spark)
    // 3 heavy terms (600/300/150 of N=1300) + 250 distinct tail terms.
    val stream = new scala.util.Random(42).shuffle(
      (Seq.fill(600)("hot1") ++ Seq.fill(300)("hot2") ++
        Seq.fill(150)("hot3") ++
        (0 until 250).map(i => s"tail$i")).toList)
    val n = stream.length
    val k = 16
    for (parts <- Seq(1, 3, 8)) {
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(stream.map(Tuple1(_)), parts)
          .map(t => org.apache.spark.sql.Row(t._1)),
        StructType(Seq(StructField("tok", StringType))))
      val got = df
        .agg(expr(s"${graft.functions.MisraGriesTopK.name}(tok, $k)")
          .as("hh"))
        .select(explode(col("hh")).as("h"))
        .select(col("h.term"), col("h.est"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val bound = n.toDouble / (k + 1)
      // every term with true count > N/(k+1) must be present
      for ((t, c) <- exact if c > bound)
        assert(got.contains(t), s"parts=$parts: heavy term $t missing")
      // estimates only undercount, by at most N/(k+1)
      for ((t, e) <- got) {
        assert(e <= exact(t), s"parts=$parts: $t overcounted $e > ${exact(t)}")
        assert(exact(t) - e <= bound,
          s"parts=$parts: $t undercounted by ${exact(t) - e} > $bound")
      }
      assert(got.size <= k)
    }
  }

  test("profile: null/distinct counts and numeric-only min/max") {
    val schema = StructType(Seq(StructField("k", LongType),
      StructField("s", StringType), StructField("v", DoubleType)))
    val rows = Seq(
      Row(1L, "a", 2.0), Row(2L, "a", null), Row(3L, null, -1.5),
      Row(4L, "b", 2.0))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2),
      schema)
    val out = Profile.profile(df, Seq("k", "s", "v"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          Option(r.get(4)), Option(r.get(5))))).toMap
    assert(out("k") == ((4L, 0L, 4L, Some(1.0), Some(4.0))))
    assert(out("s") == ((4L, 1L, 2L, None, None)))  // strings: no min/max
    assert(out("v") == ((4L, 1L, 2L, Some(-1.5), Some(2.0))))
  }

  test("debounce: keeps first and gap-separated events, flags bursts") {
    val schema = StructType(Seq(StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("event_id", LongType), StructField("ts", TimestampType)))
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    def at(sec: Long) = new java.sql.Timestamp(t0.getTime + sec * 1000)
    val rows = Seq(
      Row(1L, "click", 1L, at(0)),    // first -> keep
      Row(1L, "click", 2L, at(30)),   // 30s after prev -> drop
      Row(1L, "click", 3L, at(95)),   // 65s after PREV ROW (not prev kept) -> keep
      Row(1L, "view", 4L, at(10)),    // other type: independent -> keep
      Row(2L, "click", 5L, at(20)))   // other user -> keep
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val kept = Relational.debounce(df, Seq("user_id", "event_type"),
        "ts", "event_id", gapSeconds = 60)
      .collect().map(r => r.getLong(2) -> r.getBoolean(4)).toMap
    assert(kept == Map(1L -> true, 2L -> false, 3L -> true,
      4L -> true, 5L -> true))
  }

  test("zorder2 interleave round-trips: de-interleaving recovers (x, y)") {
    def deinterleave(z: Long): (Long, Long) = {
      var x = 0L; var y = 0L
      var i = 0
      while (i < 16) {
        x |= ((z >> (2 * i)) & 1L) << i
        y |= ((z >> (2 * i + 1)) & 1L) << i
        i += 1
      }
      (x, y)
    }
    val pairs = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (12345L, 54321L), (40000L, 7L))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(pairs.map(p => Row(p._1, p._2)), 2),
      StructType(Seq(StructField("x", LongType), StructField("y", LongType))))
    val out = df.select(col("x"), col("y"),
        Bucketing.zorder2(col("x"), col("y")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    out.foreach { case (x, y, z) =>
      assert(deinterleave(z) == ((x, y)), s"z=$z")
    }
    // interleaving is monotone in each dimension when the other is fixed
    val zs = (0L until 100L).map(x =>
      df.sparkSession.range(1).select(
        Bucketing.zorder2(lit(x), lit(7L))).head().getLong(0))
    assert(zs == zs.sorted)
  }

  test("bounded top-k equals the window formulation across partition layouts") {
    graft.functions.BoundedTopK.ensureRegistered(spark)
    // Scores with heavy ties (only 5 distinct values over 400 rows) so
    // the (score DESC, id ASC) tie-break is actually exercised, plus a
    // skewed group (group 0 holds half the rows).
    val rows = (0L until 400L).map { i =>
      val g = if (i % 2 == 0) 0L else 1L + i % 3
      Row(g, (i * 7 % 5).toDouble, i)
    }
    val schema = StructType(Seq(StructField("g", LongType),
      StructField("score", DoubleType), StructField("id", LongType)))
    val expected = rows.groupBy(_.getLong(0)).flatMap { case (g, rs) =>
      rs.map(r => (r.getDouble(1), r.getLong(2)))
        .sortBy { case (s, i) => (-s, i) }.take(3)
        .zipWithIndex.map { case ((s, i), rk) => (g, rk + 1, i, s) }
    }.toSet
    for (parts <- Seq(1, 2, 7)) {
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, parts), schema)
      val got = df.groupBy(col("g"))
        .agg(expr(s"${graft.functions.BoundedTopK.name}(score, id, 3)")
          .as("top"))
        .select(col("g"), posexplode(col("top")))
        .select(col("g"), (col("pos") + 1).as("rank"),
          col("col.id"), col("col.score"))
        .collect()
        .map(r => (r.getLong(0), r.getInt(1) + 0, r.getLong(2),
          r.getDouble(3)))
        .toSet
      assert(got == expected, s"parts=$parts")
    }
  }

  test("bounded top-k plan partial-aggregates; buffer survives serde") {
    graft.functions.BoundedTopK.ensureRegistered(spark)
    val df = spark.range(1000).select((col("id") % 10).as("g"),
      (col("id") % 97).cast("double").as("score"), col("id"))
    val agged = df.groupBy(col("g"))
      .agg(expr(s"${graft.functions.BoundedTopK.name}(score, id, 5)"))
    val plan = agged.queryExecution.executedPlan.toString
    // partial + final ObjectHashAggregate: only k-entry summaries cross
    // the exchange, and no sort of the input ever runs
    assert("ObjectHashAggregate".r.findAllIn(plan).length >= 2, plan)
    assert(!plan.contains("Sort "), plan)

    val agg = graft.functions.BoundedTopK(
      org.apache.spark.sql.catalyst.expressions.Literal(1.0),
      org.apache.spark.sql.catalyst.expressions.Literal(1L), k = 3)
    val buf = agg.createAggregationBuffer()
    Seq((2.0, 5L), (2.0, 3L), (7.5, 9L), (1.0, 1L), (8.0, 2L))
      .foreach { case (s, i) => buf.offer(s, i) }
    val back = agg.deserialize(agg.serialize(buf))
    // same kept set after round-trip: (8.0,2), (7.5,9), (2.0,3)
    val kept = (0 until back.size).map(j => (back.scores(j), back.ids(j))).toSet
    assert(kept == Set((8.0, 2L), (7.5, 9L), (2.0, 3L)))
  }

  test("misra-gries buffers survive serialize/deserialize round-trip") {
    val agg = graft.functions.MisraGriesTopK(
      org.apache.spark.sql.catalyst.expressions.Literal("x"), k = 4)
    val buf = agg.createAggregationBuffer()
    buf.put("alpha", 5L); buf.put("beta", 2L); buf.put("", 1L)
    val back = agg.deserialize(agg.serialize(buf))
    assert(back == buf)
  }

  test("zorder2 layout: file stats prune a y-slice that a linear x-sort cannot") {
    // 20k rows, two 10-bit dimensions, 16 files per layout. A file is
    // "touched" by a predicate iff its [min,max] stats overlap — the
    // same math parquet row-group / data-skipping readers run.
    val df = spark.range(20000).select(
      (col("id") * 48271 % 1024).as("x"),
      (col("id") * 16807 % 1024).as("y"))
    def fileRanges(data: org.apache.spark.sql.DataFrame,
        sortCol: org.apache.spark.sql.Column) = {
      val dir = java.nio.file.Files
        .createTempDirectory("graft_zorder_test").toString
      data.repartitionByRange(16, sortCol).sortWithinPartitions(sortCol)
        .write.mode("overwrite").parquet(dir)
      spark.read.parquet(dir)
        .groupBy(input_file_name())
        .agg(min("y").as("ylo"), max("y").as("yhi"))
        .collect().map(r => (r.getLong(1), r.getLong(2)))
    }
    val linear = fileRanges(df, col("x"))
    val zed = fileRanges(
      df.withColumn("z", Bucketing.zorder2(col("x"), col("y"), bits = 10)),
      col("z"))
    assert(linear.length == 16 && zed.length == 16)
    def touched(rs: Array[(Long, Long)], lo: Long, hi: Long) =
      rs.count(r => r._1 <= hi && r._2 >= lo)
    // y in [256, 319]: x-sorted files each span ~all of y -> no skipping;
    // z-sorted files are spatial tiles -> most files' y-range misses.
    assert(touched(linear, 256, 319) >= 15,
      s"x-sort unexpectedly pruned: ${linear.toSeq}")
    assert(touched(zed, 256, 319) <= 8,
      s"z-order pruned too little: ${zed.toSeq}")
  }

  test("cleanText: NFC composes, strips controls, collapses whitespace") {
    graft.functions.NfcNormalize.ensureRegistered(spark)
    // decomposed e+combining-acute and A+combining-ring, a BEL, runs of
    // spaces -> precomposed single chars, control gone, single spaces.
    val df = docsDf((1L, "cafe\u0301  A\u030Arhus \u0007 x"))
    val got = df.select(TextOps.cleanText(col("text"))).head().getString(0)
    assert(got == "caf\u00e9 \u00c5rhus x")
    assert(got.length == 12)
    // already-NFC input passes through unchanged (the fast path)
    val same = df.select(TextOps.cleanText(lit("plain ascii")))
      .head().getString(0)
    assert(same == "plain ascii")
  }

  test("piiScrub redacts emails/IPs before the digit-run rule") {
    val df = docsDf((1L, "mail a.user+x@test-host.org from 10.0.0.1 port 8080 ok"))
    val got = df.select(TextOps.piiScrub(col("text"))).head().getString(0)
    assert(got == "mail <EMAIL> from <IP> port <NUM> ok")
    val counts = df.select(
      TextOps.piiCounts(col("text")).map { case (n, c) => c.as(n) }: _*)
      .head()
    assert(counts.getInt(0) == 1) // email
    assert(counts.getInt(1) == 1) // ipv4
    // digit runs counted on the ORIGINAL text: 10, 0.0.1's "0"s are
    // single digits (<2), 8080 -> one run; "10" from the IP counts too.
    assert(counts.getInt(2) == 2)
  }

  test("hashSplit is exhaustive, deterministic, and repartition-stable") {
    val df = docsDf((0L to 199L).map(i => (i, s"t$i")): _*)
    val a = Corpus.hashSplit(col("doc_id"))
    val got = df.select(col("doc_id"), a.as("split")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.values.toSet.subsetOf(Set("train", "val", "test")))
    // ~12/16 train on a uniform hash; loose bounds, deterministic data.
    val nTrain = got.values.count(_ == "train")
    assert(nTrain > 120 && nTrain < 180, s"train=$nTrain")
    val again = df.repartition(7).select(col("doc_id"), a.as("split"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(again == got)
  }

  test("deterministicShuffle is a stable total order under any layout") {
    val df = docsDf((0L to 99L).map(i => (i, s"t$i")): _*)
    val a = Corpus.deterministicShuffle(df, "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    val b = Corpus.deterministicShuffle(df.repartition(9), "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(a == b)
    assert(a.sorted == (0L to 99L))
    assert(a != (0L to 99L).toSeq, "hash order should differ from id order")
  }

  test("two-phase topKPerGroup matches the plain window for any layout") {
    import org.apache.spark.sql.expressions.Window
    // Deterministic data with heavy ties: value = i % 5 forces the
    // tie-break path; group = i % 3.
    val schema = StructType(Seq(StructField("g", StringType),
      StructField("v", LongType), StructField("id", LongType)))
    val rows = (0L until 200L).map(i => Row(s"g${i % 3}", i % 5, i))
    def run(parts: Int) = {
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, parts), schema)
      Relational.topKPerGroup(df, "g", "v", Seq("id"), k = 4)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    }
    val df1 = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
    val w = Window.partitionBy("g").orderBy(col("v").desc, col("id").asc)
    val expected = df1.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 4).drop("rn")
      .orderBy(col("g"), col("v").desc, col("id"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(run(1) == expected)
    assert(run(7) == expected, "result must not depend on partitioning")
  }

  test("cosine top-k column agrees with a driver-side dot product") {
    val vecs = Seq(
      (0L, Array(1f, 0f, 0f)), (1L, Array(0.9f, 0.1f, 0f)),
      (2L, Array(0f, 1f, 0f)), (3L, Array(0f, 0f, 1f)))
    val schema = StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(
        vecs.map(v => Row(v._1, v._2.toSeq)), 2), schema)
    val q = Array(1f, 0f, 0f)
    val top = Similarity.bruteForceTopK(df, "vec_id", "embedding", q, 2)
      .collect().map(_.getLong(0)).toSeq
    assert(top == Seq(0L, 1L))
  }

  test("bucketed join: no shuffle exchange, same result as the plain join") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val dir = java.nio.file.Files
        .createTempDirectory("graft_bucket_test").toString
      val a = spark.range(0, 1000)
        .select(col("id").as("k"), (col("id") % 7).as("v"))
      val b = spark.range(0, 100)
        .select(col("id").as("k2"), (col("id") % 3).as("w"))
      val ta = Bucketing.bucketedTable(spark, "t_bucket_a", a, "k", 4, dir)
      val tb = Bucketing.bucketedTable(spark, "t_bucket_b", b, "k2", 4, dir)
      val j = ta.join(tb, ta("k") === tb("k2"))
      val exchanges = j.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(exchanges.isEmpty,
        s"bucketed join must not shuffle:\n${j.queryExecution.executedPlan}")
      val plain = a.join(b, a("k") === b("k2"))
      val plainExchanges = plain.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(plainExchanges.nonEmpty,
        "control: the un-bucketed join should shuffle under these confs")
      assert(j.count() == plain.count())
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.enabled")
      spark.sql("DROP TABLE IF EXISTS t_bucket_a")
      spark.sql("DROP TABLE IF EXISTS t_bucket_b")
    }
  }

  test("partitioned scan: the partition filter prunes directories") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val dir = java.nio.file.Files
        .createTempDirectory("graft_part_test").toString + "/t"
      spark.range(0, 100)
        .select(col("id"), (col("id") % 5).as("p"))
        .write.partitionBy("p").parquet(dir)
      val pruned = spark.read.parquet(dir).filter(col("p") === 2)
      val scans = pruned.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
      assert(scans.nonEmpty && scans.head.partitionFilters.nonEmpty,
        s"partition filter must reach the scan:\n${pruned.queryExecution}")
      // Directory skip, not row filter: only 1-of-5 partitions' files read.
      val allFiles = spark.read.parquet(dir)
        .select(input_file_name()).distinct().count()
      val readFiles = pruned.select(input_file_name()).distinct().count()
      assert(readFiles < allFiles && pruned.count() == 20)
    } finally spark.conf.unset("spark.sql.adaptive.enabled")
  }

  test("dynamic partition pruning: runtime dim keys prune fact directories") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val dir = java.nio.file.Files
        .createTempDirectory("graft_dpp_test").toString + "/fact"
      spark.range(0, 1000)
        .select(col("id"), (col("id") % 10).as("p"))
        .write.partitionBy("p").parquet(dir)
      val fact = spark.read.parquet(dir)
      // the date-dim shape: join keys only knowable at runtime, behind
      // a selective non-join-key predicate
      val dim = spark.range(0, 10).toDF("k")
        .withColumn("tag", col("k") % 3).filter(col("tag") === 1)
      val joined = fact.join(dim, col("p") === col("k"))
      // execute THIS queryExecution (count() would build its own plan
      // and leave these metrics untouched)
      assert(joined.collect().length == 300) // p in {1, 4, 7}
      val scans = joined.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec
            if f.partitionFilters.nonEmpty => f
      }
      assert(scans.nonEmpty, "no partition filters on the fact scan:\n" +
        joined.queryExecution.executedPlan)
      val dpp = scans.head.partitionFilters.exists(_.exists {
        case _: org.apache.spark.sql.catalyst.expressions
            .DynamicPruningExpression => true
        case _ => false
      })
      assert(dpp, "partition filter is not dynamic:\n" +
        scans.head.partitionFilters.mkString("; "))
      // the scan metrics record the actual skip: partitions read after
      // runtime pruning < partition directories on disk
      val dirsOnDisk = new java.io.File(dir).listFiles()
        .count(f => f.isDirectory && f.getName.startsWith("p="))
      val m = scans.head.metrics
      assert(dirsOnDisk == 10 && m("numPartitions").value == 3,
        s"expected 3-of-10 directory skip: " +
          s"read=${m("numPartitions").value} of $dirsOnDisk")
    } finally spark.conf.unset("spark.sql.adaptive.enabled")
  }

  test("annRecall: brute row is exactly 1.0, approx rows are in (0, 1]") {
    // 4 well-separated clusters of 10: IVF with 4 cells/2 probes and
    // 6-bit LSH multi-probe both recover most neighbors; brute is the
    // self-check that the harness's truth join is sound.
    val rng = new java.util.Random(7)
    val base = Array(
      Array.fill(16)(0f).updated(0, 10f), Array.fill(16)(0f).updated(4, 10f),
      Array.fill(16)(0f).updated(8, 10f), Array.fill(16)(0f).updated(12, 10f))
    val vecs = (0 until 40).map { i =>
      val v = base(i % 4).clone()
      (i.toLong, v.map(x => x + rng.nextGaussian().toFloat * 0.1f).toSeq)
    }
    val schema = StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(vecs.map(v => Row(v._1, v._2)), 3),
      schema)
    val rows = Similarity.annRecall(df, "vec_id", "embedding", k = 5,
      numQueries = 4, numBits = 6, ivfCells = 4, nProbe = 2)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(rows.keySet == Set("brute", "lsh", "ivf"))
    assert(rows("brute") == ((4L, 1.0, 1.0)))
    Seq("lsh", "ivf").foreach { m =>
      val (n, mean, mn) = rows(m)
      assert(n == 4L)
      assert(mean > 0.0 && mean <= 1.0, s"$m mean=$mean")
      assert(mn >= 0.0 && mn <= mean, s"$m min=$mn")
    }
  }

  test("temperatureMix: smallest group keeps all, head keeps ~sqrt share") {
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("lang", StringType)))
    // 400 'en' docs vs 25 'fr': rate_en = sqrt(25/400) = 0.25 exactly.
    val rows = (0L until 400L).map(i => Row(i, "en")) ++
      (1000L until 1025L).map(i => Row(i, "fr"))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 3), schema)
    val r = Corpus.temperatureMix(df, "lang", "doc_id")
      .collect().map(x => x.getString(0) ->
        (x.getAs[Long]("n_orig"), x.getAs[Long]("thresh"),
          x.getAs[Long]("n_kept"))).toMap
    assert(r("fr") == ((25L, 1000000L, 25L)), "smallest group keeps all")
    val (nOrig, thresh, nKept) = r("en")
    assert(nOrig == 400L && thresh == 250000L)
    // md5 thresholding is uniform: kept fraction within ±40% of the rate.
    assert(nKept > 60 && nKept < 140, s"en kept $nKept of 400 at rate 0.25")
  }

  test("AQE splits a skewed join partition (skew=true in the final plan)") {
    // 10 shuffle partitions, not the suite's 2: with 2, the hot
    // partition IS the median and can never exceed factor × median.
    Seq("spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64k",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64k",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.shuffle.partitions" -> "10",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
      .foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      import org.apache.spark.sql.functions.{col, lit, concat}
      // 50k rows of key 0 (one hot reducer) vs 5k spread over 50 keys.
      val left = spark.range(0, 55000).select(
        when(col("id") < 50000, lit(0L)).otherwise(col("id") % 50).as("k"),
        // Incompressible payload: shuffle skew sizing is on COMPRESSED
        // bytes, and a constant string compresses to nothing.
        concat(md5(col("id").cast("string")),
          md5((col("id") + 1).cast("string")),
          md5((col("id") + 2).cast("string"))).as("payload"))
      val right = spark.range(0, 50).select(col("id").as("k"),
        col("id").as("w"))
      val j = left.join(right, "k")
      // Execute j ITSELF (count() builds a separate query execution and
      // the adaptive plan only finalizes on the executed one).
      assert(j.collect().length == 55000)
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE should mark the skewed side:\n$plan")
    } finally {
      Seq("spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.adaptive.coalescePartitions.enabled",
        "spark.sql.autoBroadcastJoinThreshold")
        .foreach(spark.conf.unset)
      spark.conf.set("spark.sql.shuffle.partitions", "2")
    }
  }

  test("minhashAccuracy: identical docs estimate jaccard 1.0 with zero error") {
    val df = docsDf((1L, "a b c d e f"), (2L, "a b c d e f"),
      (3L, "x y z w v u"))
    val exploded = Dedup.explodeShingles(df, "doc_id", "text", 3)
    val exact = Dedup.ngramJaccardPairsFromShingles(exploded, 0.5, 100)
    val r = Dedup.minhashAccuracy(exploded, exact, numHashes = 8).head()
    assert(r.getAs[Long]("n_pairs") == 1L)
    assert(r.getAs[Double]("mean_abs_err") == 0.0)
    assert(r.getAs[Double]("max_abs_err") == 0.0)
  }

  test("prefix-filtered jaccard join equals the posting-list pipeline " +
      "at every threshold (r20 array-verification rewrite)") {
    // Randomized small-vocab corpus: overlapping docs at all jaccard
    // levels, plus exact dups and a disjoint doc. The two pipelines
    // are independent physical strategies over the same definition;
    // their (id_a, id_b, inter, union_sz, jaccard) rows must be
    // identical — the PPJoin prefix theorem is lossless and the r20
    // array_intersect verification must count exactly.
    val rnd = new scala.util.Random(20260817L)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa")
    val docs = (1L to 40L).map { i =>
      val n = 6 + rnd.nextInt(10)
      val words = Seq.fill(n)(vocab(rnd.nextInt(vocab.size)))
      (i, words.mkString(" "))
    } :+ (41L, "alpha beta gamma delta eps zeta") :+
      (42L, "alpha beta gamma delta eps zeta") // exact dup pair
    val df = docsDf(docs: _*)
    val exploded = Dedup.explodeShingles(df, "doc_id", "text", 2)
    for (t <- Seq(0.3, 0.5, 0.8, 1.0); cap <- Seq(5, 100)) {
      val exact = Dedup.ngramJaccardPairsFromShingles(exploded, t, cap)
        .collect().toSeq
      val prefix = Dedup.ngramJaccardPairsPrefix(exploded, t, cap)
        .collect().toSeq
      assert(prefix == exact,
        s"prefix vs posting-list mismatch at t=$t cap=$cap:\n" +
          s"prefix=$prefix\nexact=$exact")
    }
  }

  test("funnel: each stage requires a strictly-later event than the last") {
    val schema = StructType(Seq(StructField("user_id", LongType),
      StructField("ts", LongType), StructField("event_type", StringType)))
    val events = Seq(
      (1L, 1L, "view"), (1L, 2L, "click"), (1L, 3L, "purchase"),
      (2L, 1L, "click"), (2L, 2L, "view"), // click BEFORE the view: no stage 2
      (3L, 1L, "view"), (3L, 1L, "click"), // same ts, not strictly after
      (4L, 5L, "purchase"), // no view at all
      (5L, 1L, "view"), (5L, 3L, "click"), (5L, 2L, "purchase"))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(
        events.map(e => Row(e._1, e._2, e._3)), 3), schema)
    val r = Relational.funnel(df, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase")).head()
    assert(r.getAs[Long]("n_users") == 5L)
    assert(r.getAs[Long]("n_view") == 4L)
    assert(r.getAs[Long]("n_view_click") == 2L)
    assert(r.getAs[Long]("n_view_click_purchase") == 1L)
  }

  test("Incremental: merged batch states equal a full recompute, any split, any order") {
    val schema = StructType(Seq(StructField("k", StringType),
      StructField("v", DoubleType)))
    val rnd = new scala.util.Random(7)
    val rows = Seq.tabulate(300)(_ =>
      Row(s"k${rnd.nextInt(5)}", rnd.nextInt(100).toDouble))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), schema)
    val keys = Seq("k")
    val full = Incremental.report(
      Incremental.aggState(df, keys, "v"), keys).collect().toSeq
    // three arbitrary batches (one may even be key-incomplete or empty)
    val parts = (0 until 3).map(i =>
      df.filter(pmod(xxhash64(col("k"), col("v")), lit(3)) === i))
    val states = parts.map(p => Incremental.aggState(p, keys, "v"))
    val merged = Incremental.report(
      Incremental.merge(states, keys), keys).collect().toSeq
    val mergedRev = Incremental.report(
      Incremental.merge(states.reverse, keys), keys).collect().toSeq
    assert(merged == full)
    assert(mergedRev == full)
  }

  private def eventsDf(rows: (Long, String, String, Long)*) = {
    // (user_id, ts string, state, event_id)
    val schema = StructType(Seq(StructField("user_id", LongType),
      StructField("ts_s", StringType), StructField("event_type", StringType),
      StructField("event_id", LongType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map(r => Row(r._1, r._2, r._3, r._4)), 2), schema)
      .withColumn("ts", to_timestamp(col("ts_s")))
      .drop("ts_s")
  }

  test("scd2: repeats open no version, versions close at the next change") {
    val df = eventsDf(
      (1L, "2024-01-01 00:00:00", "a", 1L),
      (1L, "2024-01-01 00:10:00", "a", 2L), // repeat: no new version
      (1L, "2024-01-01 00:20:00", "b", 3L),
      (1L, "2024-01-01 00:30:00", "a", 4L), // back to a: NEW version
      (2L, "2024-01-01 01:00:00", "x", 5L))
    val out = Relational.scd2(df, "user_id", "event_type", "ts", "event_id")
      .orderBy("user_id", "valid_from").collect()
    assert(out.length == 4)
    val u1 = out.filter(_.getLong(0) == 1L)
    assert(u1.map(_.getString(1)).toSeq == Seq("a", "b", "a"))
    // version i closes exactly where version i+1 opens
    assert(u1(0).getAs[java.sql.Timestamp]("valid_to") ==
      u1(1).getAs[java.sql.Timestamp]("valid_from"))
    assert(u1(1).getAs[java.sql.Timestamp]("valid_to") ==
      u1(2).getAs[java.sql.Timestamp]("valid_from"))
    // only the last version per key is open/current
    assert(u1.map(_.getAs[Int]("is_current")).toSeq == Seq(0, 0, 1))
    assert(out.filter(_.getLong(0) == 2L).head.getAs[Int]("is_current") == 1)
  }

  test("weightedSample: deterministic across layouts, k rows, weight-biased") {
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("w", LongType)))
    // 50 light rows (w=10) + 10 heavy rows (w=10000)
    val rows = (1L to 50L).map(Row(_, 10L)) ++
      (101L to 110L).map(Row(_, 10000L))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 3), schema)
    val a = Corpus.weightedSample(df, "id", "w", k = 10, seed = 42L)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    val b = Corpus.weightedSample(df.repartition(7), "id", "w",
      k = 10, seed = 42L)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(a == b, "sample must not depend on partition layout")
    assert(a.length == 10)
    // priorities sorted descending, all in (0, 1)
    assert(a.map(_._2).toSeq == a.map(_._2).sorted.reverse)
    assert(a.forall(p => p._2 > 0.0 && p._2 < 1.0))
    // the 10 heavy rows have u^(1/10000) ~ 1; all should dominate the
    // light rows' u^(1/10) with overwhelming margin
    assert(a.count(_._1 >= 101L) == 10,
      s"heavy-weight rows should fill the sample, got $a")
  }

  test("zipfFit recovers slope -1 exactly on a harmonic corpus") {
    // term i occurs 60/i times for i=1..6 : log10(cnt) =
    // log10(60) - log10(rank), an EXACT line with slope -1.
    val counts = Seq(60, 30, 20, 15, 12, 10)
    val text = counts.zipWithIndex.flatMap { case (c, i) =>
      Seq.fill(c)(s"t$i")
    }.mkString(" ")
    val r = TextOps.zipfFit(docsDf((1L, text)), "text", topN = 6).head()
    assert(r.getLong(0) == 6L)
    assert(math.abs(r.getDouble(1) - (-1.0)) < 1e-6,
      s"slope ${r.getDouble(1)}")
    assert(math.abs(r.getDouble(2) - math.log10(60.0)) < 1e-6,
      s"intercept ${r.getDouble(2)}")
  }

  test("quantizeInt8: codes in [-127,127], extreme maps to ±127, roundtrip within scale/2") {
    val schema = StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val vecs: Seq[(Long, Seq[Float])] = Seq(
      (1L, Seq(0.5f, -1.0f, 0.25f, 0.0f)), // extreme is negative
      (2L, Seq(2.0f, 1.0f, -0.5f, 1.99f)), // extreme is positive
      (3L, Seq(0.0f, 0.0f, 0.0f, 0.0f))) // zero vector
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(
        vecs.map(v => Row(v._1, v._2)), 2), schema)
    val out = Similarity.quantizeInt8(df, "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getDouble(1),
        r.getSeq[Byte](2))).sortBy(_._1)
    out.zip(vecs).foreach { case ((_, scale, q), (_, orig)) =>
      assert(q.length == orig.length)
      assert(q.forall(c => c >= -127 && c <= 127), s"codes $q")
      q.zip(orig).foreach { case (c, x) =>
        assert(math.abs(c * scale - x) <= scale / 2 + 1e-12,
          s"roundtrip |$c*$scale - $x| > scale/2")
      }
    }
    assert(out(0)._3.min == -127, "negative extreme must map to -127")
    assert(out(1)._3.max == 127, "positive extreme must map to 127")
    assert(out(2)._3.forall(_ == 0), "zero vector quantizes to zeros")
  }

  test("gramUpperTriangle: matches the hand-computed integer Gram on known codes") {
    val schema = StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    // Max-abs 127 in every vector → scale = 1.0, codes == inputs, so
    // the expected Gram is computable by hand in exact integers.
    val vecs: Seq[(Long, Seq[Float])] = Seq(
      (1L, Seq(127f, 0f, -127f)),
      (2L, Seq(127f, 127f, 0f)),
      (3L, Seq(0f, -127f, 127f)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(
        vecs.map(v => Row(v._1, v._2)), 2), schema)
    val g = Similarity.gramUpperTriangle(df, "vec_id", "embedding")
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    val q = vecs.map(_._2.map(_.toLong))
    val want = (for (i <- 0 until 3; j <- i until 3) yield
      (i + 1, j + 1) -> q.map(v => v(i) * v(j)).sum).toMap
    assert(g == want, s"gram $g != $want")
    // upper triangle only: dim*(dim+1)/2 cells, 1-based, i <= j
    assert(g.keySet.forall { case (i, j) => i >= 1 && i <= j && j <= 3 })
    assert(g.size == 6)
  }

  test("pipeline_e2e: every drop reason fires; only clean docs reach the manifest") {
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_pipe").toString
    val good1 = "the " + (1 to 39).map(i => s"t$i").mkString(" ")
    val bench = "the " + (1 to 39).map(i => s"b$i").mkString(" ")
    val nostop = (1 to 40).map(i => s"x$i").mkString(" ")
    val repet = "the " + Seq.fill(39)("w").mkString(" ")
    val good7 = "the " + (1 to 39).map(i => s"d$i").mkString(" ")
    Seq(
      (1L, good1, "en"), // survives
      (2L, good1, "en"), // exact duplicate → dedup drop
      (101L, bench, "en"), // benchmark member → decontam drop (self)
      (3L, bench, "en"), // copy of a benchmark text → decontam drop
      (4L, "the s1 s2", "en"), // < 30 tokens → quality drop
      (5L, nostop, "en"), // zero stopwords → quality drop
      (6L, repet, "en"), // dup_token_frac 0.95 → quality drop
      (7L, good7, "de")) // survives, second language
      .toDF("doc_id", "text", "lang")
      .withColumn("source", lit("unit"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.Queries.queries("q_pipeline_e2e")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // expected split per the frozen hash-split definition
    def split(id: Long): String = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.head
      if (h < 'c') "train" else if (h < 'e') "val" else "test"
    }
    assert(out.toSet == Set(
      (split(1L), "en", 1L, 40L), (split(7L), "de", 1L, 40L)),
      s"got ${out.toSeq}")
  }

  test("int8TopKIds: planted exact duplicate of the query ranks first") {
    val rng = new java.util.Random(7L)
    val dim = 16
    val query = Array.fill(dim)(rng.nextGaussian().toFloat)
    val schema = StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val rows = (1L to 200L).map { i =>
      Row(i, Array.fill(dim)(rng.nextGaussian().toFloat).toSeq)
    } :+ Row(0L, query.toSeq) // the planted duplicate
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 3), schema)
    val top = Similarity.int8TopKIds(df, "vec_id", "embedding", query, 5)
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(top.length == 5)
    assert(top.head == (1, 0L),
      s"planted duplicate must survive the int8 prefilter and rank 1: " +
        s"${top.toSeq}")
  }

  test("video container round-trip: real PNG frames behind length " +
      "prefixes; decode recovers exact closed-form per-frame pixels " +
      "and frame order; layout-independent") {
    val ids = docsDf((1L, "x"), (2L, "y"))
    val assets = Multimodal.videoAssets(ids, "doc_id", edge = 4,
      nFrames = 3)
    // container structure: payload is a sequence of PNG frames each
    // starting with the PNG magic right after its 4-byte length
    val payload = assets.filter(org.apache.spark.sql.functions
        .col("asset_id") === 1L)
      .collect().head.getAs[Array[Byte]]("content")
    val len0 = java.nio.ByteBuffer.wrap(payload, 0, 4).getInt
    assert(payload.slice(4, 8).toSeq ==
      Seq[Byte](0x89.toByte, 'P', 'N', 'G'), "first frame is not PNG")
    assert(java.nio.ByteBuffer.wrap(payload, 4 + len0, 4).getInt > 0,
      "second frame's length prefix missing")
    def closed(id: Long, off: Int, fSel: Int => Boolean): Long =
      (for (f <- 0 until 3; x <- 0 until 4; y <- 0 until 4 if fSel(f))
        yield ((id % 1000003L) * 31 + x * 7 + y * 13 + f * 3 +
          off) % 256).sum
    val got = Multimodal.decodeVideoStats(assets).collect()
      .map(r => r.getLong(0) ->
        (r.getInt(1), r.getLong(4), r.getLong(5), r.getLong(7))).toMap
    for (id <- Seq(1L, 2L)) {
      val (nf, rs, gs, lastR) = got(id)
      assert(nf == 3)
      assert(rs == closed(id, 0, _ => true), s"r_sum mismatch for $id")
      assert(gs == closed(id, 85, _ => true), s"g_sum mismatch for $id")
      assert(lastR == closed(id, 0, _ == 2),
        s"last-frame pin mismatch for $id (frame order broken?)")
    }
    // repartitioning must not change any value (pure per-row map)
    val again = Multimodal.decodeVideoStats(
      Multimodal.videoAssets(ids.repartition(5), "doc_id", edge = 4,
        nFrames = 3)).collect()
      .map(r => r.getLong(0) ->
        (r.getInt(1), r.getLong(4), r.getLong(5), r.getLong(7))).toMap
    assert(again == got)
  }

  test("frameSample: every stride-th full frame, byte-exact, partial dropped") {
    // 10 bytes at frameBytes=3 → frames 012|345|678, byte 9 dropped;
    // stride=2 keeps frames 0 and 2.
    val text = "0123456789" // ASCII: byte i is 0x30+i
    val out = Multimodal.frameSample(
        Multimodal.fromText(docsDf((7L, text)), "doc_id", "text"),
        frameBytes = 3, stride = 2)
      .orderBy("frame_idx")
      .collect().map(r => (r.getInt(1), r.getString(2))).toSeq
    assert(out == Seq((0, "303132"), (2, "363738")), s"got $out")
    // an asset shorter than one frame emits nothing
    val empty = Multimodal.frameSample(
      Multimodal.fromText(docsDf((8L, "ab")), "doc_id", "text"),
      frameBytes = 3, stride = 1)
    assert(empty.count() == 0L)
  }

  test("spanDedup: global-first wins, covered tokens excised, short docs untouched") {
    // n=3. Doc 1 holds the first occurrence of "a b c" (pos 0) and a
    // WITHIN-doc repeat at pos 3 (tokens 3-5 excised: any-repeat
    // criterion, not just cross-doc). Doc 2 repeats it cross-doc →
    // tokens 0-2 excised, its unique tail survives. Doc 3 is shorter
    // than n → no spans, fully kept. Doc 4 duplicates doc 2's tail
    // span but has the LARGER id → loses, fully excised, disappears.
    val df = docsDf(
      (1L, "a b c a b c x"),
      (2L, "a b c q r s"),
      (3L, "t u"),
      (4L, "q r s"))
    val out = Dedup.spanDedup(df, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc 1: "a b c a b c x": spans at 0..4; span(3)="a b c" repeat →
    // excise 3,4,5. But spans 1 ("b c a") and 2 ("c a b") are unique,
    // span 4 ("b c x") unique — only occurrence-level repeats excise.
    assert(out == Map(1L -> 4L, 2L -> 3L, 3L -> 2L),
      s"got $out")
  }

  test("spanDupStats: cross-doc criterion only, exact occurrence counts") {
    // "a b c" appears in docs 1 and 2 (cross-doc dup); doc 1 also has a
    // within-doc-only repeated span "x y z" (twice in doc 1, nowhere
    // else) — spanDupStats must NOT count it (cross-doc criterion).
    val df = docsDf(
      (1L, "a b c k x y z m x y z"),
      (2L, "a b c p q"))
    val rows = Dedup.spanDupStats(df, "doc_id", "text", n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val byId = rows.map(r => r._1 -> ((r._2, r._3))).toMap
    assert(byId(1L)._1 == 9L && byId(2L)._1 == 3L)
    assert(byId(1L)._2 == 1L, s"only the cross-doc span counts: $rows")
    assert(byId(2L)._2 == 1L)
  }

  test("adaptiveQualityFilter: order-statistic threshold, null scores never pass") {
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType), StructField("lang", LongType)))
    // lang 1: stopword ratios 0, 1/3, 1/2, 1 over 4 docs plus one
    // empty-text doc (null ratio). n=5 → p=0.25 picks the
    // floor(0.25*4)=1st 0-indexed order stat with NULLS FIRST = the
    // ratio-0 doc → thr=0.0 → every non-null doc passes.
    val rows = Seq(
      Row(1L, "x y z", 1L),              // 0/3
      Row(2L, "the x y", 1L),            // 1/3
      Row(3L, "the x the y", 1L),        // 2/4
      Row(4L, "the the", 1L),            // 2/2
      Row(5L, "", 1L),                   // null
      Row(6L, "the a", 2L), Row(7L, "q r s t", 2L)) // lang 2: 1.0, 0.0
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val out = TextOps.adaptiveQualityFilter(df, "doc_id", "text", "lang",
        p = 0.25)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L) == ((5L, 4L, 0.0)), s"got ${out(1L)}")
    // lang 2: n=2, floor(0.25*1)=0th stat = ratio 0.0 → both pass
    assert(out(2L) == ((2L, 2L, 0.0)), s"got ${out(2L)}")
  }

  test("adaptiveQualityFilterApprox: kept-set divergence within sketch bound " +
      "on the real corpus (sf0.01), bounds gate all-green") {
    val df = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val exact = TextOps.adaptiveQualityFilter(df, "doc_id", "text", "lang",
        p = 0.1)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    val approx = TextOps.adaptiveQualityFilterApprox(df, "doc_id", "text",
        "lang", p = 0.1, accuracy = 10000)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(exact.keySet == approx.keySet)
    exact.foreach { case (lang, (n, keptE)) =>
      val (nA, keptA) = approx(lang)
      assert(nA == n)
      // rank guarantee transported through the filter: tol·n + slack
      val tol = 1.0 / 10000 + 2.0 / n
      assert(math.abs(keptA - keptE) <= math.ceil(tol * n) + 2,
        s"$lang: exact kept $keptE vs approx $keptA of $n")
    }
    val bounds = TextOps.adaptiveQualityFilterBounds(df, "doc_id", "text",
        "lang", p = 0.1, accuracy = 10000).collect()
    assert(bounds.length == exact.size)
    bounds.foreach { r =>
      assert(r.getBoolean(3), s"ok_rank false for ${r.getString(0)}")
      assert(r.getBoolean(4), s"ok_drift false for ${r.getString(0)}")
    }
  }

  test("adaptiveQualityFilterApprox null semantics PINNED: the sketch drops " +
      "null scores while the exact path ranks them first") {
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType), StructField("lang", LongType)))
    // 5 non-null stopword ratios {0, .25, .5, .75, 1} (4-token texts
    // with k 'the's) plus 3 token-less docs whose ratio is NULL.
    val nonNull = Seq(
      Row(1L, "x y z w", 1L),           // 0
      Row(2L, "the x y z", 1L),         // 0.25
      Row(3L, "the the x y", 1L),       // 0.5
      Row(4L, "the the the x", 1L),     // 0.75
      Row(5L, "the the the the", 1L))   // 1.0
    val nulls = Seq(Row(6L, "", 1L), Row(7L, " ", 1L), Row(8L, "", 1L))
    def run(f: => org.apache.spark.sql.DataFrame) =
      f.collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3))).head
    def df(rows: Seq[Row]) = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    // EXACT path, nulls present: n=8, rank floor(.5*7)+1 = 4; the 3
    // nulls rank FIRST, so the 4th is the SMALLEST non-null value →
    // thr 0.0 and every non-null doc passes. The null docs count in
    // n_docs but can never pass `>=`.
    val (nE, keptE, thrE) = run(
      TextOps.adaptiveQualityFilter(df(nonNull ++ nulls),
        "doc_id", "text", "lang", p = 0.5))
    assert((nE, keptE, thrE) == ((8L, 5L, 0.0)),
      s"exact-with-nulls: got ($nE, $keptE, $thrE)")
    // APPROX path, nulls present: percentile_approx IGNORES nulls, so
    // the threshold is the median of the 5 non-null values (0.5) —
    // shifted from the exact path's 0.0 by exactly the null-count rank
    // offset. This is the divergence the production path accepts.
    val (nA, keptA, thrA) = run(
      TextOps.adaptiveQualityFilterApprox(df(nonNull ++ nulls),
        "doc_id", "text", "lang", p = 0.5))
    assert((nA, keptA, thrA) == ((8L, 3L, 0.5)),
      s"approx-with-nulls: got ($nA, $keptA, $thrA)")
    // And the approx threshold is IDENTICAL with the null docs removed
    // — the sketch never saw them.
    val (_, _, thrA2) = run(
      TextOps.adaptiveQualityFilterApprox(df(nonNull),
        "doc_id", "text", "lang", p = 0.5))
    assert(thrA2 == thrA, s"null docs moved the sketch: $thrA2 vs $thrA")
    // On an all-non-null corpus the two paths agree exactly (the
    // sf0.01-corpus test above covers the statistical bracket; this
    // pins the small-n equality).
    val (_, keptX, thrX) = run(
      TextOps.adaptiveQualityFilter(df(nonNull),
        "doc_id", "text", "lang", p = 0.5))
    assert(thrX == thrA2 && keptX == 3L,
      s"no-null paths diverged: exact ($keptX, $thrX) vs approx $thrA2")
  }

  test("bpeMerges learns the frequency-ordered pairs; same-symbol runs " +
      "follow the regex-greedy every-other convention") {
    // "abab" x3 + "ab" x2: pair counts round 1 — (a,b) 8, (b,a) 3 →
    // learn (a,b). Round 2 symbols: "ab ab" / "ab" → (ab,ab) 3 wins.
    val df = docsDf((1L, "abab abab abab ab ab"))
    val out = TextOps.bpeMerges(df, "text", k = 2)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4))).toSeq
    // compression curve: 16 initial symbols -> 8 after (a,b) -> 5
    assert(out == Seq((1, "a", "b", 8L, 8L), (2, "ab", "ab", 3L, 5L)),
      s"got $out")
    // Same-symbol run: "aaaa" has 3 adjacent (a,a); the merge applies
    // every-other (scan resumes after each match) → "aa aa", so round 2
    // sees (aa,aa), not (aa,a).
    val df2 = docsDf((1L, "aaaa aaaa"))
    val out2 = TextOps.bpeMerges(df2, "text", k = 2)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(out2 == Seq((1, "a", "a", 6L, 4L), (2, "aa", "aa", 2L, 2L)),
      s"got $out2")
  }

  test("sessionize: exact-gap event merges (inclusive end); over-gap splits") {
    val schema = StructType(Seq(StructField("user_id", LongType),
      StructField("ts", TimestampType)))
    def t(sec: Int) = java.sql.Timestamp.from(
      java.time.Instant.parse("2024-01-01T00:00:00Z").plusSeconds(sec.toLong))
    val gapS = 30 * 60
    val rows = Seq(
      Row(1L, t(0)), Row(1L, t(gapS)),     // exactly the gap → MERGES
      Row(1L, t(2 * gapS + 1)),            // gap + 1 s later → NEW session
      Row(2L, t(0)), Row(2L, t(0))         // duplicate ts → one session of 2
    )
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val out = Relational.sessionize(df, "user_id", "ts", gapMinutes = 30)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSeq
    assert(out == Seq((1L, 2L), (1L, 1L), (2L, 2L)), s"got $out")
  }

  test("lloyds: converges to exact cluster means from displaced init; " +
    "assign recovers the planted grouping; empty cell keeps its centroid") {
    // Two well-separated 2-D clusters with symmetric offsets, so the
    // true means are exactly (0,0) and (10,10) — closed-form targets
    // the distributed sums must hit bit-for-bit in double arithmetic.
    val schema = StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val rows = Seq(
      Row(0L, Seq(-1f, 0f)), Row(1L, Seq(1f, 0f)),
      Row(2L, Seq(0f, -1f)), Row(3L, Seq(0f, 1f)),
      Row(4L, Seq(9f, 10f)), Row(5L, Seq(11f, 10f)),
      Row(6L, Seq(10f, 9f)), Row(7L, Seq(10f, 11f)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 3), schema)
    val init = Array(Array(1.0, 1.0), Array(9.0, 9.0))
    val m = Clustering.lloyds(df, "embedding", init, maxIters = 5)
    assert(m.converged, s"did not converge in ${m.iters} iters")
    assert(m.centroids(0).toSeq == Seq(0.0, 0.0) &&
      m.centroids(1).toSeq == Seq(10.0, 10.0),
      s"centroids ${m.centroids.map(_.toSeq).toSeq}")
    val got = Clustering.assign(df, "vec_id", "embedding", m.centroids)
      .collect().map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    assert(got == Seq(0L -> 0, 1L -> 0, 2L -> 0, 3L -> 0,
      4L -> 1, 5L -> 1, 6L -> 1, 7L -> 1), s"got $got")
    // An init centroid far from every point owns nothing and must stay
    // put (deterministic empty-cell rule), while the others converge.
    val init3 = Array(Array(1.0, 1.0), Array(9.0, 9.0), Array(-100.0, -100.0))
    val m3 = Clustering.lloyds(df, "embedding", init3, maxIters = 5)
    assert(m3.converged && m3.centroids(2).toSeq == Seq(-100.0, -100.0),
      s"empty cell moved: ${m3.centroids(2).toSeq}")
  }

  test("tableDiff classifies added/removed/changed-per-column/unchanged " +
      "in one pass, null-safe on compared columns") {
    val s = spark
    import s.implicits._
    // key 1: unchanged; 2: status changed; 3: cents changed; 4: both;
    // 5: removed; 6: added; 7: null -> value counts as changed;
    // 8: null == null counts as unchanged.
    val left = Seq(
      (1L, "A", 10L), (2L, "A", 10L), (3L, "A", 10L), (4L, "A", 10L),
      (5L, "A", 10L), (7L, null.asInstanceOf[String], 10L),
      (8L, null.asInstanceOf[String], 10L))
      .toDF("k", "status", "cents")
    val right = Seq(
      (1L, "A", 10L), (2L, "X", 10L), (3L, "A", 11L), (4L, "X", 11L),
      (6L, "N", 10L), (7L, "A", 10L),
      (8L, null.asInstanceOf[String], 10L))
      .toDF("k", "status", "cents")
    val got = Relational.tableDiff(left, right, "k", Seq("status", "cents"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("added" -> 1L, "removed" -> 1L,
      "changed_any" -> 4L, "unchanged" -> 2L,
      "null_key_left" -> 0L, "null_key_right" -> 0L,
      "changed_status" -> 3L, "changed_cents" -> 2L), s"got $got")
  }

  test("tableDiff conserves row counts under null KEYS: null-key rows " +
      "land in explicit null_key_* buckets, never silently in none") {
    val s = spark
    import s.implicits._
    val left = Seq(
      (java.lang.Long.valueOf(1L), "A"),
      (null.asInstanceOf[java.lang.Long], "A"),
      (null.asInstanceOf[java.lang.Long], "B"))
      .toDF("k", "status")
    val right = Seq(
      (java.lang.Long.valueOf(1L), "A"),
      (java.lang.Long.valueOf(2L), "N"),
      (null.asInstanceOf[java.lang.Long], "C"))
      .toDF("k", "status")
    val got = Relational.tableDiff(left, right, "k", Seq("status"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("added" -> 1L, "removed" -> 0L,
      "changed_any" -> 0L, "unchanged" -> 1L,
      "null_key_left" -> 2L, "null_key_right" -> 1L,
      "changed_status" -> 0L), s"got $got")
    // Conservation: every input row of both sides is in exactly one
    // bucket (changed_per-column overlaps changed_any by design).
    assert(got("added") + got("removed") + got("null_key_left") +
      got("null_key_right") +
      2 * (got("changed_any") + got("unchanged")) == 3 + 3)
  }

  test("rendezvous hashing: growing 8 shards to 9 moves keys ONLY to " +
      "the new shard, at ~1/9 of the corpus — the property mod-hash lacks") {
    def assign(nShards: Int) = {
      val shards = spark.range(0, nShards)
        .select(col("id").cast("int").as("shard"))
      spark.range(0, 2000).select(col("id").as("doc_id"))
        .crossJoin(broadcast(shards))
        .select(col("doc_id"), col("shard"),
          md5(concat(col("doc_id").cast("string"), lit(":"),
            col("shard").cast("string"))).as("h"))
        .groupBy(col("doc_id"))
        .agg(expr("max_by(shard, h)").as("shard"))
    }
    val a8 = assign(8).withColumnRenamed("shard", "s8")
    val a9 = assign(9).withColumnRenamed("shard", "s9")
    val j = a8.join(a9, "doc_id").select(col("s8"), col("s9")).collect()
    val moved = j.count(r => r.getInt(0) != r.getInt(1))
    assert(j.forall(r => r.getInt(0) == r.getInt(1) || r.getInt(1) == 8),
      "a key moved to an OLD shard — rendezvous minimality violated")
    assert(moved > 2000 / 9 / 2 && moved < 2000 / 9 * 2,
      s"moved $moved of 2000, expected ~${2000 / 9}")
  }

  test("power iteration recovers the dominant axis of a planted Gram") {
    val sess = spark
    import sess.implicits._
    // 200 vectors hugging axis 2 of 4 dims: the Gram's top eigenvector
    // is e2, so |v3| must be maximal at dim 2 after 3 integer rounds.
    val vecs = (0 until 200).map { i =>
      (i.toLong, Array(0.05f * (i % 3), 1.0f + 0.001f * i,
        0.03f * (i % 5), 0.01f * (i % 7)))
    }.toDF("vec_id", "embedding")
    val gU = Similarity.gramUpperTriangle(vecs, "vec_id", "embedding")
    val g = gU.unionByName(gU.filter(col("di") =!= col("dj"))
      .select(col("dj").as("di"), col("di").as("dj"), col("g")))
    def mv(v: org.apache.spark.sql.DataFrame) =
      g.join(v, col("dj") === col("j")).groupBy(col("di"))
        .agg(sum(col("g") * col("vj")).as("y"))
    def norm(y: org.apache.spark.sql.DataFrame) =
      y.crossJoin(broadcast(y.agg(max(abs(col("y"))).as("mx"))))
        .select(col("di").as("j"),
          when(col("y") < 0, -expr("(-y) div greatest(mx div 10000, 1)"))
            .otherwise(expr("y div greatest(mx div 10000, 1)")).as("vj"))
    val v0 = g.select(col("di").as("j")).distinct()
      .withColumn("vj", lit(10000L))
    val v3 = norm(mv(norm(mv(norm(mv(v0))))))
      .collect().map(r => r.getInt(0) -> math.abs(r.getLong(1))).toMap
    assert(v3(2) == v3.values.max,
      s"dominant dim should be 2, got $v3")
    assert(v3(2) >= 4 * v3(1) && v3(2) >= 4 * v3(3),
      s"axis 2 should dominate clearly, got $v3")
  }

  test("ngramContainmentPairs: asymmetric — the short doc is contained " +
      "in the long host, never the reverse; Jaccard would miss it") {
    // guest: 6 tokens → 4 distinct 3-shingles, all inside host.
    // host: much longer, so J = 4/|union| < 0.5 but C(guest→host) = 1.
    val guest = "q w e r t y"
    val host = "a b c d e f g h " + guest + " i j k l m n o p"
    val df = docsDf((1L, guest), (2L, host))
    val got = Dedup.ngramContainmentPairs(
        Dedup.explodeShingles(df, "doc_id", "text", 3),
        tauPct = 70, maxShingleDf = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 2L, 4L)), s"got ${got.toSeq}")
    // Symmetric check: the host is NOT contained in the guest.
    assert(!got.exists(_._1 == 2L))
  }

  test("sortedNeighborhoodCensus: neighbors within the window are " +
      "compared, edit-gate flags the near-identical pair only") {
    // Three docs in one block ('hello '-prefixed): a≈b (1 edit on a
    // 11-char key → 9% ≤ 20% passes), c far (fails); d in another
    // block is never compared against them.
    val df = docsDf(
      (1L, "hello world"), (2L, "hello worle"),
      (3L, "hello zzzzzzzzzzzzzzzzzz"), (4L, "other block"))
    val got = Dedup.sortedNeighborhoodCensus(df, "doc_id", "text",
      blockLen = 6, keyLen = 128, win = 2, maxEditPct = 20).head()
    val (blocks, cands, dups) =
      (got.getLong(0), got.getLong(1), got.getLong(2))
    // block "hello ": sorted (1, 2, 3) → pairs (1,2),(2,3),(1,3);
    // block "other ": single doc, no pairs.
    assert(blocks == 1L, s"blocks=$blocks") // only blocks WITH pairs count
    assert(cands == 3L, s"cands=$cands")
    assert(dups == 1L, s"dups=$dups")
  }
}
