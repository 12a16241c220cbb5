package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate-view maintenance: keep a materialized per-key
  * aggregate current under appends by merging MERGEABLE partial states
  * with the delta batch's partials, never re-scanning the base data.
  *
  * At 100 TB this is the difference between an O(|delta|) nightly job
  * and an O(|corpus|) one: the state table is keys-sized, the delta
  * pass is batch-sized, and the merge shuffles only state rows. The
  * states are the classic algebraic decomposition (count, sum, min,
  * max — each mergeable by a commutative/associative combine; avg is
  * derived at read time from sum/count), the same shape Spark's own
  * partial aggregation uses inside a single query — lifted here across
  * job boundaries, which is what a warehouse's incremental
  * materialized view does.
  *
  * Correctness contract (oracle-gated via q_incremental_agg):
  * merge(state(base), state(delta)) must equal state(base ∪ delta)
  * exactly — checked value-by-value against a full recompute on the
  * whole input by an independent engine.
  */
object Incremental {

  private val stateCols = Seq("cnt", "sum_v", "min_v", "max_v")

  /** One partial-aggregation pass: per-key mergeable state of
    * `valueCol`. This is the only data-sized scan in the lifecycle —
    * run once over the base, then once per delta batch.
    */
  def aggState(df: DataFrame, keyCols: Seq[String],
      valueCol: String): DataFrame =
    df.groupBy(keyCols.map(col): _*).agg(
      count(lit(1)).as("cnt"),
      sum(col(valueCol)).as("sum_v"),
      min(col(valueCol)).as("min_v"),
      max(col(valueCol)).as("max_v"))

  /** Merge any number of state tables into one: a union of state-sized
    * inputs and ONE shuffle on the keys — count/sum re-add, min/max
    * re-min/max. No base-data scan.
    */
  def merge(states: Seq[DataFrame], keyCols: Seq[String]): DataFrame =
    states.reduce(_ unionByName _)
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("cnt")).as("cnt"),
        sum(col("sum_v")).as("sum_v"),
        min(col("min_v")).as("min_v"),
        max(col("max_v")).as("max_v"))

  /** Read-time view over a state table: the maintained aggregates plus
    * derived avg (sum/count — a single division, so the value is
    * bit-identical to what a full recompute's avg would produce on
    * integral-valued doubles).
    */
  def report(state: DataFrame, keyCols: Seq[String]): DataFrame =
    state.select(keyCols.map(col) ++ stateCols.map(col)
      :+ (col("sum_v") / col("cnt")).as("avg_v"): _*)
      .orderBy(keyCols.map(col): _*)

  /** The full-recompute oracle: what the maintained view must equal. */
  def reportSql(table: String, keyCols: Seq[String],
      valueCol: String, where: String = ""): String = {
    val keys = keyCols.mkString(", ")
    s"SELECT $keys, CAST(count(*) AS BIGINT) AS cnt, " +
      s"sum($valueCol) AS sum_v, min($valueCol) AS min_v, " +
      s"max($valueCol) AS max_v, " +
      s"sum($valueCol) / count(*) AS avg_v " +
      s"FROM $table $where GROUP BY $keys ORDER BY $keys"
  }
}
