package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: derive a larger benchmark dataset by replicating an
  * existing sf directory `factor`× with DISJOINT key spaces (each copy's
  * keys are shifted by copy·stride), so joins keep their multiplicity
  * and dedup operators see realistic exact-duplicate skew (copies share
  * text/embedding payloads — which is precisely what a crawl corpus
  * looks like, and what the pipeline's skew caps must absorb).
  *
  * Usage: runMain graft.ScaleData <srcSfDir> <outDir> <factor>
  * Dimension tables (region, nation) are copied unchanged; every other
  * table shifts its entity keys consistently (l_orderkey ↔ o_orderkey,
  * o_custkey ↔ c_custkey, …) so referential joins still resolve.
  */
object ScaleData {

  // Base stride for deriving from driver-generated dirs. CHAINED
  // derivation (deriving from an already-derived dir, e.g. 10× → 30×)
  // needs a larger stride — copy 1's shift of the source's copy-0 keys
  // would land exactly on the source's own copy-1 keys and collide
  // (caught by the 30× audit: 60k embedding rows, 24k distinct ids).
  // main() therefore computes the stride from the source dir's actual
  // max key; this constant is the floor that keeps single-derivation
  // dirs bit-identical to the ones every prior audit used.
  private val baseStride = 1000000000000L // > any testdata key
  private var stride = baseStride

  /** Key columns to shift, per table. */
  private val shiftCols: Map[String, Seq[String]] = Map(
    "customer" -> Seq("c_custkey"),
    "supplier" -> Seq("s_suppkey"),
    "part" -> Seq("p_partkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "events" -> Seq("event_id", "user_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"))

  def replicate(df: DataFrame, keys: Seq[String], factor: Int,
      perCopy: (DataFrame, Int) => DataFrame = (d, _) => d): DataFrame = {
    val copies = (0 until factor).map { c =>
      keys.foldLeft(perCopy(df, c)) { (d, k) =>
        d.withColumn(k, col(k) + lit(c * stride))
      }
    }
    copies.reduce(_ unionByName _)
  }

  /** Embedding copies > 0 are DECORRELATED by alternate-sign flips
    * (parity keyed by copy number): shared text payloads are wanted for
    * dedup realism, but byte-identical vectors would violate
    * q_embed_neardup's planted-ground-truth contract (the oracle lists
    * the planted pairs as the ONLY cosine ≥ 0.9 pairs — a 3× dir full
    * of exact vector copies makes every replica a real near-dup). Sign
    * flips are IEEE-exact: norms, dimensions, and value distributions
    * are untouched, so every other embeddings entry is unaffected.
    */
  /** splitmix64 finalizer — the per-copy sign-mask generator. */
  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private def decorrelate(df: DataFrame, c: Int): DataFrame =
    if (c == 0) df
    else {
      // Sign pattern per copy: flip element i iff bit (i mod 64) of a
      // per-copy splitmix64 mask is set. The earlier Walsh pattern
      // (parity of popcount(i & c)) has only `dim` distinct functions
      // in `dim` dimensions, so factors past 64 aliased (copy 64's
      // pattern == copy 0's — byte-identical vectors, caught by the
      // round-11 100x oracle audit: q_embed_neardup found the
      // cross-copy "real" dups its planted oracle doesn't list).
      // splitmix masks give 2^64 patterns; any two distinct copies
      // differ in ~32 of 64 signs, so cross-copy cosine concentrates
      // near 0 — far under every near-dup threshold. ±1.0f multiply
      // is an IEEE-exact sign flip: norms, dimensions, and value
      // distributions are untouched, so every other embeddings entry
      // is unaffected.
      val m = { val w = mix64(c.toLong); if (w == 0L) -1L else w }
      val signs = Array.tabulate(64)(i =>
        if (((m >>> (i % 64)) & 1L) == 0L) 1.0f else -1.0f)
      df.withColumn("embedding",
        transform(col("embedding"), (x, i) =>
          x * element_at(typedlit(signs), (pmod(i, lit(64)) + 1)
            .cast("int"))))
    }

  def main(args: Array[String]): Unit = {
    val Array(src, out, factorS) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    derive(spark, src, out, factorS.toInt)
    spark.stop()
  }

  /** The whole derivation, session-injected (testable without the
    * main's session lifecycle). */
  def derive(spark: SparkSession, src: String, out: String,
      factor: Int): Unit = {
    new java.io.File(out).mkdirs()
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    // Stride past the source dir's largest shifted key (rounded up to a
    // power of 10), so chained derivations keep key spaces disjoint and
    // every key column across tables shifts by the SAME stride
    // (referential joins must stay aligned).
    val maxKey = shiftCols.toSeq.flatMap { case (t, keys) =>
      val df = graft.core.Tables.read(spark, src, t)
      val top = if (keys.size == 1) max(col(keys.head))
        else greatest(keys.map(k => max(col(k))): _*)
      df.agg(top.cast("long")).head() match {
        case r if r.isNullAt(0) => None
        case r => Some(r.getLong(0))
      }
    }.max
    stride = baseStride
    while (stride <= maxKey) stride *= 10
    println(s"[scale] stride=$stride (source max key $maxKey)")
    tables.foreach { t =>
      // events.ts is written as a plain µs TIMESTAMP (not the driver's
      // TIMESTAMP(NANOS)): Tables.read passes non-long ts through, and
      // DuckDB reads µs timestamps natively — so timestamp oracles also
      // hold on derived dirs.
      val df = graft.core.Tables.read(spark, src, t)
      val outDf = shiftCols.get(t) match {
        case Some(keys) if t == "embeddings" =>
          replicate(df, keys, factor, decorrelate)
        case Some(keys) => replicate(df, keys, factor)
        case None => df
      }
      // One file per table mirrors the driver-generated layout (DuckDB
      // oracle runs on derived dirs read "<dir>/<t>.parquet" as a
      // single file), but with 16 MB row groups: parquet byte-range
      // splits only yield rows at row-group starts, so the default
      // 128 MB groups turn a single-file 1000× documents table into
      // ~5 effective scan tasks regardless of maxPartitionBytes — the
      // 1000× audit's whale-task finding. Small groups keep the
      // single-file layout AND full scan parallelism.
      outDf.coalesce(1).write.mode("overwrite")
        .option("parquet.block.size", (16L * 1024 * 1024).toString)
        .parquet(s"$out/__tmp_$t")
      val dir = new java.io.File(s"$out/__tmp_$t")
      val part = dir.listFiles().find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$out/$t.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      dir.listFiles().foreach(_.delete()); dir.delete()
      println(s"[scale] $t -> $out/$t.parquet")
    }
  }
}
