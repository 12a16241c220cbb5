package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Last-consumer lifecycle for the shared (session, dir)
  * materializations (VERDICT r12 ask #2): before `releaseShared`,
  * every cache in Queries persisted executor storage at first
  * consumption and freed it only via ContextCleaner GC — latent
  * pressure at 251 entries in one JVM, leaked executor storage on a
  * multi-tenant cluster. These tests pin the new contract: after a
  * multi-consumer run plus its releases, the block manager holds ZERO
  * graft-owned persisted RDDs, and a released resource is rebuilt
  * (not resurrected) by a later consumer.
  */
class CacheLifecycleSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = {
    if (spark != null) spark.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
  }

  private def persistedCount(): Int =
    spark.sparkContext.getPersistentRDDs.size

  test("two-consumer shingle/pair run releases to zero persisted RDDs") {
    assert(persistedCount() === 0, "test assumes a clean block manager")
    // Two consumers of the shingle→pair chain: the pair report (returns
    // the cached pair frame) and decontaminate (reads shingles twice).
    SparkEntry.queries("q_ngram_jaccard")(spark, dir).count()
    SparkEntry.queries("q_decontaminate")(spark, dir).count()
    assert(persistedCount() > 0,
      "expected shared shingle/pair materializations to be persisted")
    Queries.releaseShared("dedup_pairs", spark, dir)
    Queries.releaseShared("pair_stats", spark, dir)
    Queries.releaseShared("doc_shingles", spark, dir)
    assert(persistedCount() === 0,
      "released shingle/pair caches must leave zero persisted RDDs")
  }

  test("classifier release frees both the scores and the feature frame") {
    assert(persistedCount() === 0)
    // materialize = true in the cache builder means the corpus-wide
    // feature frame is freed at build time; only the skinny scored
    // table may hold storage here.
    SparkEntry.queries("q_quality_classifier")(spark, dir).count()
    assert(persistedCount() === 1,
      "exactly the scored table should be persisted (the feature " +
        s"frame is freed at materialization), saw ${persistedCount()}")
    Queries.releaseShared("classifier_scores", spark, dir)
    assert(persistedCount() === 0)
  }

  test("released resource is rebuilt by a later consumer, not resurrected") {
    assert(persistedCount() === 0)
    val before = SparkEntry.queries("q_ngram_jaccard")(spark, dir).count()
    Queries.releaseShared("dedup_pairs", spark, dir)
    Queries.releaseShared("doc_shingles", spark, dir)
    // A post-release consumer must re-materialize and still answer.
    val after = SparkEntry.queries("q_ngram_jaccard")(spark, dir).count()
    assert(after === before)
    Queries.releaseAllShared(spark, dir)
    assert(persistedCount() === 0)
  }

  test("releaseAllShared covers every declared resource and is idempotent") {
    Queries.sharedConsumers.keys.foreach { r =>
      // Must not throw for absent resources (nothing consumed here).
      Queries.releaseShared(r, spark, dir)
      Queries.releaseShared(r, spark, dir)
    }
    intercept[IllegalArgumentException] {
      Queries.releaseShared("no_such_resource", spark, dir)
    }
  }

  test("every sharedConsumers entry names real catalog entries") {
    val known = SparkEntry.queries.keySet
    Queries.sharedConsumers.foreach { case (res, consumers) =>
      val missing = consumers -- known
      assert(missing.isEmpty,
        s"resource $res lists unknown entries: ${missing.mkString(", ")}")
    }
  }

  /** RDDs currently holding block-manager storage (mem or disk) — the
    * same signal Bench's storage_end_mb proof reads. */
  @scala.annotation.nowarn("cat=deprecation")
  private def storedRddCount(): Int =
    spark.sparkContext.getRDDStorageInfo
      .count(i => i.memSize + i.diskSize > 0)

  /** ContextCleaner frees localCheckpoint blocks asynchronously after
    * their Datasets become unreachable — bounded GC-retry, mirroring
    * the r14 Bench end-of-roster proof. */
  private def gcSettle(maxTries: Int = 25): Int = {
    var n = storedRddCount()
    var i = 0
    while (n > 0 && i < maxTries) {
      System.gc(); Thread.sleep(200); n = storedRddCount(); i += 1
    }
    n
  }

  test("containment build frees its pairStats; release leaves zero " +
    "(the r13 storage_end residual's named owner)") {
    Queries.releaseAllShared(spark, dir)
    assert(gcSettle() === 0, "test assumes a clean block manager")
    SparkEntry.queries("q_containment")(spark, dir).count()
    // materialize = true must leave exactly the REGISTERED frames:
    // the shingle table, the shared pair-stats table (r20: a
    // lifecycle-managed resource feeding both pair builds, no longer
    // an untracked intermediate), and the tiny containment result —
    // nothing unregistered (pre-r14 the pairStats intermediate
    // survived unpersist-less as untracked executor blocks on every
    // invocation, ADVICE r13 #1).
    assert(persistedCount() === 3,
      "expected exactly {doc_shingles, pair_stats, containment_pairs} " +
        s"persisted, saw ${persistedCount()}")
    Queries.releaseShared("containment_pairs", spark, dir)
    Queries.releaseShared("pair_stats", spark, dir)
    Queries.releaseShared("doc_shingles", spark, dir)
    assert(persistedCount() === 0,
      "released containment caches must leave zero persisted RDDs")
  }

  test("Iterate consumer leaves zero stored blocks once released " +
    "(k-core: localCheckpoint rounds + cooc caches)") {
    Queries.releaseAllShared(spark, dir)
    assert(gcSettle() === 0, "test assumes a clean block manager")
    SparkEntry.queries("q_kcore_peel")(spark, dir).count()
    Queries.releaseShared("cooc_edges", spark, dir)
    Queries.releaseShared("cooc_baskets", spark, dir)
    // The per-round localCheckpoint RDDs are owned by round-local
    // Datasets: nothing in the catalog may keep them reachable after
    // the entry's action returns, so a bounded GC-retry must converge
    // to ZERO stored blocks (the end-of-roster contract the bench
    // artifact now proves with the same loop).
    val left = gcSettle()
    assert(left === 0,
      s"$left RDDs still hold storage after release+GC — an Iterate " +
        "round (or the cooc chain) is being kept reachable")
  }

  test("one-shot pair pipeline leaves zero CacheManager entries " +
    "(q_dedup_keep_best_eq: the r14 bench's 12.19 MB named residual)") {
    Queries.releaseAllShared(spark, dir)
    assert(gcSettle() === 0, "test assumes a clean block manager")
    SparkEntry.queries("q_dedup_keep_best_eq")(spark, dir).count()
    Queries.releaseAllShared(spark, dir)
    // The entry runs ngramJaccardPairsFromShingles(materialize=false)
    // on its own planted corpus. Pre-r14 that path persist()ed its
    // pairStats intermediate with no unpersist handle: the
    // CacheManager held the plan (a strong reference no GC can clear),
    // so the bounded GC-retry below could NEVER converge and every
    // roster run ended with a stable ~12 MB residual. The
    // localCheckpoint path frees via the ContextCleaner once the
    // entry's result is unreachable — the same proof loop the bench's
    // end-of-roster contract runs.
    val left = gcSettle()
    assert(left === 0,
      s"$left RDDs still hold storage after GC — the one-shot pair " +
        "pipeline is pinning blocks beyond its result's lifetime")
    // Once storage is zero the cleaner has also deregistered the RDDs
    // (unpersistRDD removes them from the persistent map); a brief
    // retry covers the removal happening just after the last size
    // probe.
    var tries = 0
    while (persistedCount() > 0 && tries < 25) {
      System.gc(); Thread.sleep(200); tries += 1
    }
    assert(persistedCount() === 0,
      "materialize=false pair pipeline must leave zero registered " +
        "persistent RDDs (a CacheManager entry would outlive all handles)")
  }

  test("sharedBuildOrder covers exactly the declared resources and " +
    "ensureShared/isSharedBuilt round-trip") {
    assert(Queries.sharedBuildOrder.toSet === Queries.sharedConsumers.keySet,
      "build order and consumer registry must name the same resources")
    assert(Queries.sharedBuildOrder.size ===
      Queries.sharedBuildOrder.distinct.size)
    // Upstream-before-downstream pins (the transitive chains).
    def idx(r: String) = Queries.sharedBuildOrder.indexOf(r)
    assert(idx("doc_shingles") < idx("pair_stats"))
    assert(idx("pair_stats") < idx("dedup_pairs"))
    assert(idx("pair_stats") < idx("containment_pairs"))
    assert(idx("doc_shingles") < idx("dedup_pairs"))
    assert(idx("dedup_pairs") < idx("dedup_cc"))
    assert(idx("doc_shingles") < idx("containment_pairs"))
    assert(idx("cooc_baskets") < idx("cooc_edges"))
    // sharedPrereqs (ADVICE r14 #5): every declared prerequisite is a
    // known resource, sits upstream in the build order, and its
    // consumer set contains the downstream's (the transitivity the
    // release schedule relies on).
    Queries.sharedPrereqs.foreach { case (r, pres) =>
      assert(Queries.sharedConsumers.contains(r), s"unknown resource $r")
      pres.foreach { p =>
        assert(Queries.sharedConsumers.contains(p), s"unknown prereq $p")
        assert(idx(p) < idx(r), s"$p must build before $r")
        assert(Queries.sharedConsumers(r).subsetOf(Queries.sharedConsumers(p)),
          s"consumers($r) must be ⊆ consumers($p) for safe release timing")
      }
    }
    // Round-trip on a cheap resource.
    Queries.releaseShared("doc_spans", spark, dir)
    assert(!Queries.isSharedBuilt("doc_spans", spark, dir))
    Queries.ensureShared("doc_spans", spark, dir)
    assert(Queries.isSharedBuilt("doc_spans", spark, dir))
    assert(persistedCount() > 0, "ensureShared must materialize eagerly")
    Queries.releaseShared("doc_spans", spark, dir)
    assert(!Queries.isSharedBuilt("doc_spans", spark, dir))
    assert(persistedCount() === 0)
    intercept[IllegalArgumentException] {
      Queries.ensureShared("no_such_resource", spark, dir)
    }
    // `_build_<resource>` roster lines must never shadow a real entry.
    assert(!SparkEntry.queries.keySet.exists(_.startsWith("_build_")))
  }
}
