package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level Bloom data-skipping index — the point-lookup side of the
  * layout toolbox. Bucketing/partitioning/Z-order (ops/Bucketing.scala)
  * prune by range or key-prefix; this prunes arbitrary point lookups
  * ("find one document among billions") down to O(1) files.
  *
  * Build: ONE pass over the table tagged with `input_file_name()`
  * emits K bit positions per row; a per-file groupBy collects the
  * distinct positions into an M-bit filter. The aggregation buffer is
  * bounded by M (collect_set of ≤ M ints), never data-sized, and the
  * sidecar is #files rows of (file, sorted positions) — ~M/8 bytes a
  * file at 100 TB, a broadcast-able lookup table.
  *
  * Probe: a key's K positions prune the file list to those whose
  * filter contains ALL of them. The true file ALWAYS survives (Bloom
  * filters have no false negatives — that is the oracle-checkable
  * contract: a pruned lookup must return exactly what a full scan
  * returns); false-positive extra files are a measured tuning cost
  * (IndexSpec), not a correctness risk.
  *
  * This is the parquet row-group Bloom idea lifted to FILE granularity,
  * where pruning happens before any footer is opened — on a 1000-
  * executor cluster the driver drops files from the scan's file index,
  * so a point lookup schedules a handful of tasks instead of one per
  * file.
  */
object SkippingIndex {

  /** Bits per file filter / hash count: sized for ~10k distinct keys
    * per file at a few % false-positive rate; both are build-time
    * parameters of the sidecar, not of the data.
    */
  val M = 4096
  val K = 3

  private def positions(key: Column): Seq[Column] =
    (0 until K).map(i => pmod(xxhash64(lit(i), key), lit(M)).cast("int"))

  /** Build the sidecar over a multi-file layout: (file, bits). */
  def build(df: DataFrame, keyCol: String): DataFrame =
    df.select(input_file_name().as("file"),
        explode(array(positions(col(keyCol)): _*)).as("pos"))
      .groupBy(col("file"))
      .agg(sort_array(collect_set(col("pos"))).as("bits"))

  /** Candidate files for a batch of keys: every file whose filter
    * holds all K positions of at least one key. The keys×index product
    * is (few keys) × (#files sidecar rows) — both index-sized; the
    * real data is never touched.
    */
  def candidateFiles(spark: SparkSession, index: DataFrame,
      keys: Seq[Long]): Seq[String] = {
    import spark.implicits._
    val keyPos = keys.toDF("k")
      .select(array(positions(col("k")): _*).as("ps"))
    keyPos.join(broadcast(index),
        forall(col("ps"), p => array_contains(col("bits"), p)))
      .select(col("file")).distinct()
      .collect().map(_.getString(0)).toSeq.sorted
  }

  /** Point lookup through the index: prune the file list, scan only
    * survivors, filter exactly. Returns the same rows a full scan
    * would — the Bloom no-false-negative contract makes that an
    * equality, which is what the oracle gate checks.
    */
  def lookup(spark: SparkSession, layoutDir: String, index: DataFrame,
      keyCol: String, keys: Seq[Long],
      projection: Seq[Column]): DataFrame = {
    val files = candidateFiles(spark, index, keys)
    val src =
      if (files.isEmpty)
        // every file Bloom-excluded: schema-only read (footer, no rows)
        spark.read.parquet(layoutDir).filter(lit(false))
      else
        spark.read.parquet(files: _*).filter(col(keyCol).isin(keys: _*))
    src.select(projection: _*)
  }

  /** Materialize a multi-file hash layout of `table` under tmpdir
    * (keyed by the source file's fingerprint, the Bucketing.dirTag
    * convention) — the many-file shape a real table has, which the
    * single-file-per-table local testdata lacks.
    */
  def materializeLayout(spark: SparkSession, sfDir: String,
      table: String, keyCol: String, numFiles: Int = 16): String = {
    val f = new java.io.File(s"$sfDir/$table.parquet")
    val key = s"$sfDir:$table:${f.lastModified}:${f.length}:$numFiles"
    val tag = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8")).take(6).map("%02x".format(_)).mkString
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_skip_$tag"
    if (!new java.io.File(dir, "_SUCCESS").exists) {
      graft.core.Tables.read(spark, sfDir, table)
        .repartition(numFiles, col(keyCol))
        .write.mode("overwrite").parquet(dir)
    }
    dir
  }
}
