package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-management operators for training-data pipelines: balanced
  * source mixes and sequence packing. These go beyond the reference's
  * own surface (it models single tables) — they are the operations a
  * 100 TB pretraining-data pipeline runs between dedup and tokenization.
  */
object Corpus {

  /** Deterministic stratified (per-stratum) downsampling: keep the rows
    * whose key is 0 mod the stratum's modulus — the balanced-mix step of
    * a training pipeline (e.g. downweight a crawl source 10:1, keep
    * books 1:1). A systematic key-slice instead of seeded RNG sampling,
    * so the result is engine-reproducible and stable across runs.
    * Map-side only (a filter; no shuffle): at 100 TB this costs one
    * scan, and with key-partitioned storage it prunes files.
    */
  def stratifiedSample(df: DataFrame, stratumCol: String, keyCol: String,
      moduli: Map[String, Int], defaultModulus: Int = 1): DataFrame = {
    val m = moduli.foldLeft(lit(defaultModulus)) { case (acc, (k, v)) =>
      when(col(stratumCol) === k, lit(v)).otherwise(acc)
    }
    df.filter(pmod(col(keyCol), m) === 0)
  }

  /** The WHERE clause twin of [[stratifiedSample]] for SQL oracles. */
  def stratifiedSampleWhereSql(stratum: String, key: String,
      moduli: Map[String, Int], defaultModulus: Int = 1): String = {
    val cases = moduli.toSeq.sortBy(_._1).map { case (k, v) =>
      s"WHEN $stratum = '$k' THEN $v"
    }.mkString(" ")
    s"$key % (CASE $cases ELSE $defaultModulus END) = 0"
  }

  /** Greedy sequence packing: concatenate docs (in id order) into packs
    * of at most `maxTokens` tokens — the step that turns a deduped
    * corpus into fixed-budget training sequences. Docs longer than
    * `maxTokens` are truncated into their own pack. Returns one row per
    * pack: (pack_id = first doc id, n_docs, n_tokens).
    *
    * Distributed shape: range-repartition by id + per-partition sort,
    * then a single `mapPartitions` pass — packing is embarrassingly
    * parallel per id range and nothing but (id, n_tokens) pairs move in
    * the one range shuffle. Pack boundaries are a pure function of the
    * data within each id range (each partition opens a fresh pack), so
    * the output is deterministic for a fixed partition count.
    */
  def packSequences(df: DataFrame, idCol: String, nTokensCol: String,
      maxTokens: Int, partitions: Int = 8): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val sorted = df
      .select(col(idCol).cast("long").as("id"),
        col(nTokensCol).cast("int").as("n"))
      .repartitionByRange(partitions, col("id"))
      .sortWithinPartitions("id")
    sorted.as[(Long, Int)].mapPartitions(it => packGreedy(it, maxTokens))
      .toDF("pack_id", "n_docs", "n_tokens").orderBy("pack_id")
  }

  /** The pure greedy first-fit kernel over (id, nTokens) in input order:
    * one (packId = first doc id, nDocs, nTokens) row per pack; docs over
    * the budget are truncated into their own pack. Property-tested
    * directly (budget, conservation, greedy maximality). */
  private[graft] def packGreedy(rows: Iterator[(Long, Int)],
      maxTokens: Int): Iterator[(Long, Int, Int)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Int)]
    var cur: (Long, Int, Int) = null
    rows.foreach { case (id, n) =>
      val nn = math.min(n, maxTokens)
      if (cur == null || cur._3 + nn > maxTokens) {
        if (cur != null) out += cur
        cur = (id, 1, nn)
      } else cur = (cur._1, cur._2 + 1, cur._3 + nn)
    }
    if (cur != null) out += cur
    out.iterator
  }
}
