package graft.est

import graft.query.Pred
import graft.workload.Workload

/** The estimator extension seam (reference CardEst base,
  * estimators.py:29-90): `query` plus timing + error accumulation and
  * quantile reporting. New estimators plug in by implementing `query`
  * ("Other estimators can be appended as well", eval_model.py:587).
  */
trait CardEst extends Serializable {
  def name: String
  def query(preds: Seq[Pred]): Long

  /** Answer a SQL text directly: the [[graft.query.SqlFront]] parse
    * (Catalyst's own SQL parser → the 5-op Pred vocabulary) composed
    * with [[query]] — the convenience a user switching from the
    * reference's hand-authored Python query lists actually wants.
    * `table` (when given) pins which table the SQL must target; a
    * mismatch is an error, not a silently-wrong estimate. */
  def querySql(spark: org.apache.spark.sql.SparkSession, sql: String,
      table: Option[String] = None): Long = {
    val (t, preds) = graft.query.SqlFront.parse(spark, sql)
    table.foreach(exp => require(t == exp,
      s"estimator $name is bound to table $exp but the SQL targets $t"))
    query(preds)
  }

  /** COUNT over a bounded union of conjunctions by inclusion–exclusion
    * (r17): |⋃Dᵢ| = Σ_{∅≠S}(−1)^(|S|+1)·query(⋀_{i∈S}Dᵢ), where a
    * conjunction of disjuncts is pred-list concatenation (the mask
    * architecture ANDs multiple preds per column). The identity is
    * set-theoretic, so exact estimators stay exact; learned ones
    * inherit per-term fidelity (a negative total clamps to 0). ≤
    * 2^8−1 = 255 terms.
    *
    * Positive and negative I–E terms accumulate SEPARATELY in BigInt
    * (r19, ADVICE r18): terms arrive in subset-enumeration order, so a
    * running signed Long sum could overflow on an intermediate prefix
    * even when the final total is representable — the rearrangement
    * makes every representable total answer. A final total outside
    * Long still THROWS ArithmeticException rather than wrapping
    * (ADVICE r17): external callers outside the optimizer's
    * probed/try-catch paths must be prepared to catch it or accept the
    * loud failure. */
  def queryDnf(disjuncts: Seq[Seq[Pred]]): Long = {
    require(disjuncts.nonEmpty && disjuncts.size <= 8,
      s"queryDnf takes 1..8 disjuncts, got ${disjuncts.size}")
    if (disjuncts.size == 1) query(disjuncts.head)
    else {
      val k = disjuncts.size
      var pos = BigInt(0)
      var neg = BigInt(0)
      var s = 1
      while (s < (1 << k)) {
        val conj = (0 until k).filter(i => (s & (1 << i)) != 0)
          .flatMap(disjuncts)
        val term = BigInt(query(conj))
        if (java.lang.Integer.bitCount(s) % 2 == 1) pos += term
        else neg += term
        s += 1
      }
      val acc = pos - neg
      if (!acc.isValidLong)
        throw new ArithmeticException(
          s"queryDnf inclusion-exclusion total $acc exceeds Long")
      math.max(acc.toLong, 0L)
    }
  }

  /** [[querySql]] for texts whose WHERE carries a bounded cross-column
    * OR: [[graft.query.SqlFront.parseDnf]] composed with
    * [[queryDnf]]. */
  def querySqlDnf(spark: org.apache.spark.sql.SparkSession, sql: String,
      table: Option[String] = None): Long = {
    val (t, dnf) = graft.query.SqlFront.parseDnf(spark, sql)
    table.foreach(exp => require(t == exp,
      s"estimator $name is bound to table $exp but the SQL targets $t"))
    queryDnf(dnf)
  }

  private val errors = scala.collection.mutable.ArrayBuffer[Double]()
  private val estCards = scala.collection.mutable.ArrayBuffer[Long]()
  private val durationsMs = scala.collection.mutable.ArrayBuffer[Double]()

  /** Run one query against a known truth, recording error + latency
    * (OnStart/OnEnd + AddError, estimators.py:55-67). */
  def run(preds: Seq[Pred], truth: Long): Long = {
    val t0 = System.nanoTime()
    val est = query(preds)
    durationsMs += (System.nanoTime() - t0) / 1e6
    estCards += est
    errors += Workload.qError(est.toDouble, truth.toDouble)
    est
  }

  /** Merge stats from a worker replica (estimators.py:72-83). */
  def merge(other: CardEst): Unit = {
    errors ++= other.errors
    estCards ++= other.estCards
    durationsMs ++= other.durationsMs
  }

  def recordedErrors: Seq[Double] = errors.toSeq

  /** max/99th/95th/median q-error + mean ms (estimators.py:85-90). */
  def report: Workload.Report =
    Workload.report(name, errors.toSeq,
      if (durationsMs.isEmpty) Double.NaN
      else durationsMs.sum / durationsMs.length)
}

/** The autoregressive-model extension seam (reference README.md:45 +
  * duck-typed calls at estimators.py:177-354): any model exposing this
  * surface can drive ProgressiveSampling.
  */
trait ArModel extends Serializable {
  def nin: Int
  /** Per-column domain sizes. */
  def inputBins: Array[Int]
  /** ordering(naturalIdx) = position in the autoregressive order. */
  def ordering: Array[Int]
  /** Whether wildcard ([MASK]) encodings are available. */
  def columnMasking: Boolean
  /** Width of the flat encoded-input buffer. */
  def totalInputSize: Int
  /** Encode one column's values (null = wildcard [MASK]) into `out`. */
  def encodeColumn(naturalIdx: Int, values: Array[Int], out: Array[Float],
      batch: Int): Unit
  /** Forward from an encoded buffer to flat logits. */
  def forwardEncoded(inp: Array[Float], batch: Int): Array[Float]
  /** Slice/project the logits of `log p(x_idx | ...)`. */
  def logitsForCol(idx: Int, logits: Array[Float], batch: Int): Array[Float]
}
