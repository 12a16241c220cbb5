package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational analytics operators that need more than a declarative
  * one-liner to be scale-safe.
  */
object Relational {

  /** Exact top-k rows per group, safe for LOW-cardinality (or skewed)
    * group keys where the plain `row_number() OVER (PARTITION BY g)`
    * window would sort data-sized partitions (3 groups over a fact
    * table = 3 executor-crushing sorts).
    *
    * Phase 1 prunes each INPUT partition to its local top-k per group
    * with a bounded heap (`mapPartitions`, zero shuffle, memory =
    * groups·k rows per partition); phase 2 runs the rank window on the
    * pruned union, whose per-group size is ≤ k·numInputPartitions
    * instead of data-sized. Semantics are identical to the plain window
    * because a row in the global top-k is necessarily in its input
    * partition's local top-k.
    *
    * Ordering: `orderCol` DESC, then `tieCols` ASC as the unique
    * tie-break. All ordering fields must be non-null Comparables
    * (numerics, strings, timestamps); the group key may be any
    * non-null type.
    */
  def topKPerGroup(df: DataFrame, groupCol: String, orderCol: String,
      tieCols: Seq[String], k: Int): DataFrame = {
    require(k > 0)
    val cols = Seq(groupCol, orderCol) ++ tieCols
    val proj = df.select(cols.map(col): _*)
    val nFields = cols.length
    // Rank order: orderCol desc, ties asc. Reversed (worst-first) it is
    // the heap order, so the heap head is always the eviction victim.
    val rankOrd: Ordering[Row] = new Ordering[Row] {
      private def cmp(a: Any, b: Any): Int =
        a.asInstanceOf[Comparable[Any]].compareTo(b)
      override def compare(x: Row, y: Row): Int = {
        var c = -cmp(x.get(1), y.get(1))
        var i = 2
        while (c == 0 && i < nFields) { c = cmp(x.get(i), y.get(i)); i += 1 }
        c
      }
    }
    val pruned = proj.mapPartitions { rows =>
      val heaps = scala.collection.mutable.Map
        .empty[Any, scala.collection.mutable.PriorityQueue[Row]]
      rows.foreach { r =>
        val h = heaps.getOrElseUpdate(r.get(0),
          scala.collection.mutable.PriorityQueue.empty[Row](rankOrd))
        h.enqueue(r)
        if (h.size > k) h.dequeue()
      }
      heaps.valuesIterator.flatMap(_.iterator)
    }(Encoders.row(proj.schema))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(orderCol).desc +: tieCols.map(col(_).asc): _*)
    pruned.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
      .orderBy(col(groupCol) +: (col(orderCol).desc +:
        tieCols.map(col(_).asc)): _*)
  }

  /** Skew-salted distinct-count aggregation: `count(DISTINCT d)`, `sum`,
    * and `count(*)` per group key, computed as TWO cascaded partial
    * aggregations instead of one.
    *
    * The plain `groupBy(key).agg(countDistinct(d))` plan shuffles every
    * (key, d) pair to the one reducer owning `key` — with a handful of
    * hot keys over a fact table that is a single-task straggler (partial
    * map-side aggregation cannot help a distinct). Stage 1 here groups by
    * (key, salt) where salt = hash(d) % buckets: each distinct `d` value
    * lands in exactly one salt bucket, so per-bucket distinct counts are
    * disjoint and stage 2's plain sum over the `buckets`-bounded rows is
    * exact — not an approximation. Additive aggregates (sum/count)
    * cascade trivially. This is the generic two-stage skew pattern:
    * AQE's skew handling covers joins, not single-key aggregation
    * hotspots, so the salt must be in the plan.
    */
  def saltedDistinctAgg(df: DataFrame, keyCol: String, distinctCol: String,
      sumCol: String, buckets: Int = 64): DataFrame =
    df.groupBy(col(keyCol),
        pmod(hash(col(distinctCol)), lit(buckets)).as("__salt"))
      .agg(countDistinct(col(distinctCol)).as("__nd"),
        sum(col(sumCol)).as("__sum"),
        count(lit(1)).as("__cnt"))
      .groupBy(col(keyCol))
      .agg(sum(col("__nd")).as(s"n_distinct"),
        sum(col("__sum")).as(s"sum_val"),
        sum(col("__cnt")).as("cnt"))
      .orderBy(keyCol)

  /** DuckDB twin of [[saltedDistinctAgg]] — the UNsalted declarative
    * form, because the salting is a physical rewrite with identical
    * semantics (that equality is exactly what the oracle checks). */
  def saltedDistinctAggSql(table: String, key: String, distinct: String,
      sumCol: String): String =
    s"SELECT $key, count(DISTINCT $distinct) AS n_distinct, " +
      s"sum($sumCol) AS sum_val, count(*) AS cnt " +
      s"FROM $table GROUP BY $key ORDER BY $key"
}
