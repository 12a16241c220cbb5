package graft.query

import graft.core.Dictionary
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Pins the domain-mask compilation of every [[Op]] against Spark's own
  * filter semantics: for each predicate, the rows whose value falls in a
  * mask-true domain slot must be EXACTLY the rows `Pred.toColumn` keeps.
  * The null-slot ops are the r15 additions — the null-at-bin-0
  * convention (reference common.py:74-80) makes IS NULL the position-0
  * mask and IS NOT NULL its complement, while every value comparison
  * stays false at position 0 ("null never qualifies", common.py:11-24).
  */
class PredMaskSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = {
    if (spark != null) spark.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
  }

  /** Count rows the mask admits by joining value→bin and summing
    * mask(bin) — the estimator-side reading of the predicate. */
  private def maskCount(values: Seq[java.lang.Double],
      meta: graft.core.ColumnMeta, p: Pred): Long = {
    val mask = p.domainMask(meta)
    values.count { v =>
      val bin = meta.valToBin(v)
      bin >= 0 && mask(bin)
    }.toLong
  }

  test("every op's domain mask agrees with Spark's filter, nulls present") {
    val s = spark
    import s.implicits._
    val values: Seq[java.lang.Double] =
      Seq[java.lang.Double](1.0, 2.0, null, 3.0, 2.0, null, 5.0, 1.0)
    val df = values.toDF("v")
    val meta = Dictionary.columnMeta(df, "v")
    assert(meta.hasNull && meta.domain(0) == null)

    val preds = Seq(
      Pred("v", Op.Eq, 2.0),
      Pred("v", Op.Lt, 3.0),
      Pred("v", Op.Gt, 1.0),
      Pred("v", Op.Leq, 2.0),
      Pred("v", Op.Geq, 3.0),
      Pred("v", Op.In, Seq(1.0, 5.0)),
      Pred("v", Op.In, Seq(1.0, 99.0)), // absent member: partial match
      // r16: complement masks — Spark's !isin keeps three-valued logic
      // (null NOT IN → unknown → dropped), and the mask's false null
      // slot must agree with it
      Pred("v", Op.NotIn, Seq(1.0, 5.0)),
      Pred("v", Op.NotIn, Seq(1.0, 99.0)),
      Pred("v", Op.IsNull, null),
      Pred("v", Op.NotNull, null))
    for (p <- preds) {
      val sparkCount = df.filter(p.toColumn).count()
      assert(maskCount(values, meta, p) == sparkCount,
        s"mask vs Spark disagree for ${p.toSql}")
    }
    // the null-slot invariants, stated directly
    assert(!Pred("v", Op.Eq, 2.0).domainMask(meta)(0))
    assert(!Pred("v", Op.In, Seq(1.0, 2.0)).domainMask(meta)(0))
    // NOT IN is the complement EXCEPT at the null slot: both the IN
    // mask and its negation are false at position 0
    assert(!Pred("v", Op.NotIn, Seq(1.0, 2.0)).domainMask(meta)(0))
    val inM = Pred("v", Op.In, Seq(1.0, 2.0)).domainMask(meta)
    val notInM = Pred("v", Op.NotIn, Seq(1.0, 2.0)).domainMask(meta)
    assert(inM.indices.drop(1).forall(i => inM(i) != notInM(i)))
    assert(Pred("v", Op.IsNull, null).domainMask(meta).toSeq ==
      (true +: Seq.fill(meta.distributionSize - 1)(false)))
    assert(Pred("v", Op.NotNull, null).domainMask(meta).toSeq ==
      (false +: Seq.fill(meta.distributionSize - 1)(true)))
  }

  test("cross-type numeric literals coerce in the mask (Long vs Double)") {
    val s = spark
    import s.implicits._
    val df = Seq(1.0, 2.0, 2.5, 3.0).toDF("v")
    val meta = Dictionary.columnMeta(df, "v")
    // an integral literal (as SqlFront produces for `v IN (2, 3)`)
    // against a Double domain must match exactly like Spark's cast does
    val in = Pred("v", Op.In, Seq(2L, 3L))
    assert(df.filter(in.toColumn).count() == 2L)
    assert(in.domainMask(meta).count(identity) == 2)
    val le = Pred("v", Op.Leq, 2L)
    assert(df.filter(le.toColumn).count() == 2L)
    assert(le.domainMask(meta).count(identity) == 2)
  }

  test("IN SQL text round-trips through DuckDB-compatible literals") {
    assert(Pred("f", Op.In, Seq("R", "A")).toSql == "f IN ('R', 'A')")
    // NB Seq(1L, 2.5) would widen to Seq[Double] at the Scala level;
    // SqlFront builds Seq[Any], so mirror that here.
    assert(Pred("v", Op.In, Seq[Any](1L, 2.5)).toSql == "v IN (1, 2.5)")
    assert(Pred("v", Op.IsNull, null).toSql == "v IS NULL")
    assert(Pred("v", Op.NotNull, null).toSql == "v IS NOT NULL")
  }

  test("class-mismatched non-numeric literals are incomparable, not a CCE") {
    val s = spark
    import s.implicits._
    val df = Seq("R", "A", "N").toDF("f")
    val meta = Dictionary.columnMeta(df, "f")
    // An integer among string IN literals (`f IN ('R', 5)`) can never
    // match a domain value — the mask slot stays false (r16, ADVICE
    // r15: the previous fallback threw ClassCastException deep in mask
    // evaluation instead of the documented incomparable behavior).
    assert(Pred.domainCompare(meta, "R", 5).isEmpty)
    assert(Pred("f", Op.In, Seq[Any]("R", 5)).domainMask(meta).toSeq ==
      Seq(false, false, true))
    // A scalar comparison against a mismatched literal: all-false mask.
    assert(Pred("f", Op.Leq, 5).domainMask(meta).forall(!_))
  }

  test("PrefixLike mask agrees with Spark's filter; null slot false (r17)") {
    val s = spark
    import s.implicits._
    val values = Seq[String]("apple", "apricot", null, "banana", "apple")
    val df = values.toDF("t")
    val meta = Dictionary.columnMeta(df, "t")
    assert(meta.hasNull && meta.domain(0) == null)
    for (prefix <- Seq("ap", "apple", "b", "z", "")) {
      val p = Pred("t", Op.PrefixLike, prefix)
      val mask = p.domainMask(meta)
      val maskN = values.count { v =>
        val bin = meta.valToBin(v); bin >= 0 && mask(bin)
      }.toLong
      assert(maskN == df.filter(p.toColumn).count(),
        s"mask vs Spark disagree for ${p.toSql}")
      assert(!mask(0), s"null slot must stay false for ${p.toSql}")
    }
    // the empty prefix (`LIKE '%'`) is exactly the IS NOT NULL mask
    assert(Pred("t", Op.PrefixLike, "").domainMask(meta).toSeq ==
      Pred("t", Op.NotNull, null).domainMask(meta).toSeq)
    // SQL text round-trip: metacharacters in the PREFIX are literal —
    // the printer escapes them and adds the ESCAPE clause
    assert(Pred("t", Op.PrefixLike, "a%b_").toSql ==
      "t LIKE 'a\\%b\\_%' ESCAPE '\\'")
    assert(Pred("t", Op.PrefixLike, "ap").toSql == "t LIKE 'ap%'")
    // non-string domains are incomparable → all-false mask (the
    // domainCompare None convention)
    val dmeta = Dictionary.columnMeta(
      Seq(1.0, 2.0).toDF("v"), "v")
    assert(Pred("v", Op.PrefixLike, "1").domainMask(dmeta).forall(!_))
  }

  test("MaxDiff rejects non-scalar ops instead of mis-pruning") {
    val s = spark
    import s.implicits._
    val df = Seq((1.0, 1.0), (2.0, 2.0), (3.0, 1.0)).toDF("a", "b")
    val meta = Dictionary.tableMeta(df, "t", Seq("a", "b"))
    val enc = Dictionary.encodedMatrix(df, meta.columns)
      .collect().map(_.getSeq[Int](0).toArray)
    val h = graft.est.MaxDiffHistogram.build(meta, enc, limit = 4)
    val e = intercept[IllegalArgumentException] {
      h.query(Seq(Pred("a", Op.In, Seq(1.0))))
    }
    assert(e.getMessage.contains("scalar"))
  }
}
