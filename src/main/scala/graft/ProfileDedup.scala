package graft

import graft.ops.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only micro-profiler for the corpus dedup family (not part of the
  * driver contract). Times the shared n-gram Jaccard pair pipeline and
  * cluster formation in isolation; `GRAFT_CC_TRACE=1` additionally
  * prints per-round convergence of connectedComponents. */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes",
        (4 * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val docs = graft.core.Tables.read(spark, sfDir, "documents")
      .repartition(spark.sparkContext.defaultParallelism)
    time("docs.count")(docs.count())
    // Cumulative-prefix phase profile of the PPJoin pipeline (r20):
    // each phase re-derives from the scan, so phase N's time includes
    // N-1 — read the DELTAS.
    if (sys.env.contains("GRAFT_PROFILE_PREFIX")) {
      import org.apache.spark.sql.expressions.Window
      val threshold = 0.5
      val exploded = Dedup.explodeShingles(docs, "doc_id", "text", 3)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("p1 exploded (persist)")(exploded.count())
      if (sys.env.get("GRAFT_PROFILE_PREFIX").contains("3")) {
        val dfreq3 = exploded.groupBy("shingle")
          .agg(count(lit(1)).as("df")).filter(col("df") <= 100)
        val capped3 = exploded.join(dfreq3, "shingle")
        val sets3 = capped3.groupBy(col("id"))
          .agg(sort_array(collect_list(struct(col("df"), col("shingle"))))
            .as("ds"))
          .select(col("id"),
            transform(col("ds"), x => x("shingle")).as("sh"),
            size(col("ds")).cast("long").as("m"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        time("n1 sets (persist)")(sets3.count())
        val prefix3 = sets3.select(col("id"), col("m"),
          explode(slice(col("sh"), lit(1),
            (col("m") - ceil(col("m") * lit(threshold)).cast("long") + 1)
              .cast("int"))).as("shingle"))
        time("n2 prefix")(noop(prefix3))
        val cand3 = prefix3.as("a").join(prefix3.as("b"),
            col("a.shingle") === col("b.shingle") && col("a.id") < col("b.id"))
          .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
            col("a.m").as("na"), col("b.m").as("nb"))
          .distinct()
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        time("n3 cand (persist)")(cand3.count())
        val ver3 = cand3
          .join(sets3.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
          .join(sets3.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
          .select(col("id_a"), col("id_b"),
            size(array_intersect(col("sh_a"), col("sh_b"))).cast("long")
              .as("inter"), col("na"), col("nb"))
        time("n4 verify")(noop(ver3))
        sets3.unpersist(); cand3.unpersist()
      }
      // r21 dictionary-encoded shape, phase deltas via persists.
      if (sys.env.get("GRAFT_PROFILE_PREFIX").contains("4")) {
        val threshold4 = 0.5
        val dfreq4 = exploded.groupBy("shingle")
          .agg(count(lit(1)).as("df")).filter(col("df") <= 100)
        val dict4 = dfreq4
          .repartitionByRange(col("df"), col("shingle"))
          .sortWithinPartitions("df", "shingle")
          .withColumn("sid", monotonically_increasing_id())
          .localCheckpoint(false)
        time("d1 dict (checkpoint)")(dict4.count())
        val capped4 = exploded.join(dict4, "shingle")
          .select(col("id"), col("sid"), col("df"))
        val sets4 = capped4.groupBy(col("id"))
          .agg(sort_array(collect_list(struct(col("df"), col("sid"))))
            .as("ds"))
          .select(col("id"),
            transform(col("ds"), x => x("sid")).as("sh"),
            size(col("ds")).cast("long").as("m"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        time("d2 sets (persist)")(sets4.count())
        val prefix4 = sets4.select(col("id"), col("m"),
          explode(slice(col("sh"), lit(1),
            (col("m") - ceil(col("m") * lit(threshold4)).cast("long") + 1)
              .cast("int"))).as("sid"))
        time("d3 prefix")(noop(prefix4))
        val cand4 = prefix4.as("a").join(prefix4.as("b"),
            col("a.sid") === col("b.sid") && col("a.id") < col("b.id"))
          .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
            col("a.m").as("na"), col("b.m").as("nb"))
          .distinct()
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        time("d4 cand (persist)")(cand4.count())
        val ver4 = cand4
          .join(sets4.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
          .join(sets4.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
          .select(col("id_a"), col("id_b"),
            size(array_intersect(col("sh_a"), col("sh_b"))).cast("long")
              .as("inter"), col("na"), col("nb"))
        time("d5 verify")(noop(ver4))
        sets4.unpersist(); cand4.unpersist()
      }
      val dfreq = exploded.groupBy("shingle")
        .agg(count(lit(1)).as("df")).filter(col("df") <= 100)
      time("p2 dfreq")(noop(dfreq))
      val capped = exploded.join(dfreq, "shingle")
      time("p3 capped")(noop(capped))
      val wRank = Window.partitionBy("id").orderBy(col("df"), col("shingle"))
      val wSize = Window.partitionBy("id")
      val prefix = capped
        .withColumn("rk", row_number().over(wRank))
        .withColumn("m", count(lit(1)).over(wSize))
        .filter(col("rk") <=
          col("m") - ceil(col("m") * lit(threshold)).cast("long") + 1)
        .select(col("id"), col("shingle"), col("m"))
      time("p4 prefix")(noop(prefix))
      val cand = prefix.as("a").join(prefix.as("b"),
          col("a.shingle") === col("b.shingle") && col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
          col("a.m").as("na"), col("b.m").as("nb"))
        .distinct()
      time("p5 cand")(noop(cand))
      println("  cand rows=" + cand.count())
      if (sys.env.get("GRAFT_PROFILE_PREFIX").contains("2")) {
        println("  exploded rows=" + exploded.count())
        println("  dfreq rows=" + dfreq.count())
        println("  capped rows=" + capped.count())
        println("  prefix rows=" + prefix.count())
        val shA = capped.select(col("id").as("id_a"), col("shingle"))
        println("  candXshA rows=" + cand.join(shA, "id_a").count())
      }
      time("p6 full prefix pipeline")(noop(
        Dedup.ngramJaccardPairsPrefix(exploded, threshold, 100)))
      time("p6 full prefix AGAIN")(noop(
        Dedup.ngramJaccardPairsPrefix(exploded, threshold, 100)))
    }
    if (sys.env.contains("GRAFT_PROFILE_PAIRS")) {
      val exploded = Dedup.explodeShingles(docs, "doc_id", "text", 3)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      exploded.count()
      graft.functions.CappedCollectSetLong.ensureRegistered(spark)
      val byShingle = exploded.groupBy("shingle")
        .agg(expr(s"${graft.functions.CappedCollectSetLong.name}(id, 100)")
          .as("ids"))
        .filter(col("ids").isNotNull)
      time("q1 byShingle")(noop(byShingle))
      val distinctLists = byShingle.groupBy("ids")
        .agg(count(lit(1)).as("w"))
      time("q2 distinctLists")(noop(distinctLists))
      val pairArr = concat(
        transform(col("ids"), a => struct(a.as("id_a"), a.as("id_b"))),
        flatten(transform(col("ids"), (a, i) =>
          transform(slice(col("ids"), i + 2, size(col("ids"))), b =>
            struct(a.as("id_a"), b.as("id_b"))))))
      val pairStats = distinctLists.select(col("w"), explode(pairArr).as("p"))
        .groupBy(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))
        .agg(sum(col("w")).as("cnt"))
      time("q3 pairStats")(noop(pairStats))
      println("  pairStats rows=" + pairStats.count())
      time("q4 full from shingles (no materialize)")(noop(
        Dedup.ngramJaccardPairsFromShingles(exploded, 0.5, 100)))
      exploded.unpersist()
    }
    val pairs = time("pairs pipeline")(
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5,
        maxShingleDf = 100, materialize = true))
    println("  pairs=" + pairs.count())
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    val comps = time("components")(
      Dedup.connectedComponents(pairs.select("id_a", "id_b"), "id_a", "id_b")
        .count())
    Thread.sleep(500) // let the listener bus drain
    spark.sparkContext.removeSparkListener(listener)
    println("  comps=" + comps + " jobs=" + jobs.get())
    var lastT = System.nanoTime()
    val starComps = time("components (star)")(
      Dedup.connectedComponentsStar(pairs.select("id_a", "id_b"),
        "id_a", "id_b",
        trace = (r, fp, c) => {
          val now = System.nanoTime()
          println(f"[scratch]   star round $r%2d ${(now - lastT) / 1e9}%8.2f s" +
            s" fp=$fp converged=$c")
          lastT = now
        })
        .count())
    println("  starComps=" + starComps)
    spark.stop()
  }
}
