package graft.query

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** [[SqlFront]] parses with Catalyst's own SQL parser and walks the
  * unresolved plan — these tests pin the mapping into the 5-op
  * [[Pred]] vocabulary (literal typing, operand-order flips, BETWEEN
  * desugaring) and the rejection of everything outside it.
  */
class SqlFrontSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = {
    if (spark != null) spark.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
  }

  test("W1-shaped count query parses to table + typed conjuncts") {
    val (t, ps) = SqlFront.parse(spark,
      """SELECT count(*) FROM lineitem
         WHERE l_quantity <= 1.0 AND l_discount <= 0.0
           AND l_returnflag = 'R'""")
    assert(t == "lineitem")
    assert(ps == Seq(
      Pred("l_quantity", Op.Leq, 1.0),
      Pred("l_discount", Op.Leq, 0.0),
      Pred("l_returnflag", Op.Eq, "R")))
    // Decimal literals arrive as Double (Spark parses 1.0 as
    // DECIMAL(2,1)); strings as plain String.
    assert(ps.head.value.isInstanceOf[Double])
  }

  test("integral literals widen to Long; literal-first operands flip") {
    val (_, ps) = SqlFront.parse(spark,
      "SELECT count(*) FROM orders WHERE 5 < o_orderkey AND o_custkey >= 7")
    assert(ps == Seq(
      Pred("o_orderkey", Op.Gt, 5L),
      Pred("o_custkey", Op.Geq, 7L)))
    assert(ps.head.value.isInstanceOf[java.lang.Long])
  }

  test("BETWEEN desugars into the two bound conjuncts") {
    val (_, ps) = SqlFront.parse(spark,
      "SELECT count(*) FROM events WHERE value BETWEEN 2 AND 9")
    assert(ps == Seq(
      Pred("value", Op.Geq, 2L), Pred("value", Op.Leq, 9L)))
  }

  test("timestamp literals map to java.sql.Timestamp on the Pred.ts grid") {
    val (_, ps) = SqlFront.parse(spark,
      "SELECT count(*) FROM events WHERE ts >= TIMESTAMP '2024-01-02 03:04:05'")
    assert(ps == Seq(
      Pred("ts", Op.Geq, Pred.ts("2024-01-02 03:04:05"))))
  }

  test("no WHERE parses as the wildcard (empty conjunct list)") {
    val (t, ps) = SqlFront.parse(spark, "SELECT count(*) FROM region")
    assert(t == "region" && ps.isEmpty)
  }

  test("IN lists parse to Op.In preserving literal order and types") {
    val (_, ps) = SqlFront.parse(spark,
      "SELECT count(*) FROM lineitem WHERE l_returnflag IN ('R', 'A')")
    assert(ps == Seq(Pred("l_returnflag", Op.In, Seq("R", "A"))))
    // mixed-type list: integral widens to Long, decimal to Double,
    // order preserved left-to-right
    val (_, ps2) = SqlFront.parse(spark,
      "SELECT count(*) FROM events WHERE value IN (2.5, 1, 9)")
    assert(ps2 == Seq(Pred("value", Op.In, Seq(2.5, 1L, 9L))))
  }

  test("single-column OR of equalities folds into one IN mask") {
    val (_, ps) = SqlFront.parse(spark,
      "SELECT count(*) FROM t WHERE f = 'R' OR f = 'A' OR f = 'N'")
    assert(ps == Seq(Pred("f", Op.In, Seq("R", "A", "N"))))
    // OR of an IN and an equality on the same column unions too
    val (_, ps2) = SqlFront.parse(spark,
      "SELECT count(*) FROM t WHERE f IN ('R', 'A') OR 'N' = f")
    assert(ps2 == Seq(Pred("f", Op.In, Seq("R", "A", "N"))))
  }

  test("IS NULL / IS NOT NULL parse to the null-slot ops") {
    val (_, ps) = SqlFront.parse(spark,
      "SELECT count(*) FROM events WHERE value IS NULL AND user_id >= 3")
    assert(ps == Seq(
      Pred("value", Op.IsNull, null), Pred("user_id", Op.Geq, 3L)))
    val (_, ps2) = SqlFront.parse(spark,
      "SELECT count(*) FROM events WHERE value IS NOT NULL")
    assert(ps2 == Seq(Pred("value", Op.NotNull, null)))
  }

  test("NOT IN parses to Op.NotIn (r16 — the complement mask)") {
    val (_, ps) = SqlFront.parse(spark,
      "SELECT count(*) FROM lineitem WHERE l_returnflag NOT IN ('R', 'A')")
    assert(ps == Seq(Pred("l_returnflag", Op.NotIn, Seq("R", "A"))))
    val (_, ps2) = SqlFront.parse(spark,
      "SELECT count(*) FROM events WHERE value NOT IN (2.5, 1, 9)")
    assert(ps2 == Seq(Pred("value", Op.NotIn, Seq(2.5, 1L, 9L))))
  }

  test("!= and <> fold to the single-literal complement mask (r16)") {
    val (_, ps) = SqlFront.parse(spark,
      "SELECT count(*) FROM lineitem WHERE l_returnflag != 'R'")
    assert(ps == Seq(Pred("l_returnflag", Op.NotIn, Seq("R"))))
    // <> is the same parse (Not(EqualTo)); literal-first flips too
    val (_, ps2) = SqlFront.parse(spark,
      "SELECT count(*) FROM events WHERE 2.5 <> value AND user_id >= 3")
    assert(ps2 == Seq(
      Pred("value", Op.NotIn, Seq(2.5)), Pred("user_id", Op.Geq, 3L)))
  }

  test("LIKE prefix patterns parse to Op.PrefixLike; others reject (r17)") {
    val (_, ps) = SqlFront.parse(spark,
      "SELECT count(*) FROM customer WHERE c_mktsegment LIKE 'BUILD%'")
    assert(ps == Seq(Pred("c_mktsegment", Op.PrefixLike, "BUILD")))
    // multi-word prefixes and conjunction with other ops
    val (_, ps2) = SqlFront.parse(spark, "SELECT count(*) FROM nation " +
      "WHERE n_name LIKE 'UNITED K%' AND n_regionkey >= 1")
    assert(ps2 == Seq(Pred("n_name", Op.PrefixLike, "UNITED K"),
      Pred("n_regionkey", Op.Geq, 1L)))
    // `LIKE '%'` is the empty prefix — semantically IS NOT NULL
    val (_, ps3) = SqlFront.parse(spark,
      "SELECT count(*) FROM nation WHERE n_name LIKE '%'")
    assert(ps3 == Seq(Pred("n_name", Op.PrefixLike, "")))
    // valid escape sequences UNESCAPE to a literal prefix (r18,
    // VERDICT r17 #9): the SQL text 'UNITED\\%%' reaches the parser as
    // pattern UNITED\%% — an escaped % then the trailing wildcard, so
    // the literal prefix is UNITED%; escaped _ and escaped \ likewise
    val (_, ps4) = SqlFront.parse(spark,
      "SELECT count(*) FROM nation WHERE n_name LIKE 'UNITED\\\\%%'")
    assert(ps4 == Seq(Pred("n_name", Op.PrefixLike, "UNITED%")))
    val (_, ps5) = SqlFront.parse(spark,
      "SELECT count(*) FROM nation WHERE n_name LIKE 'A\\\\_B\\\\\\\\C%'")
    assert(ps5 == Seq(Pred("n_name", Op.PrefixLike, "A_B\\C")))
    // non-prefix shapes fall through by NAME, never mis-estimated:
    // suffix, infix wildcard, underscore
    def bad(pat: String): String =
      intercept[IllegalArgumentException](SqlFront.parse(spark,
        s"SELECT count(*) FROM nation WHERE n_name LIKE '$pat'"))
        .getMessage
    assert(bad("%KINGDOM").contains("prefix LIKE"))
    assert(bad("UN%TED%").contains("prefix LIKE"))
    assert(bad("UNITED_%").contains("prefix LIKE"))
    // direct unit pins on the unescaper's fall-throughs: a dangling
    // trailing escape and an escape sequence Spark itself rejects
    assert(SqlFront.likePrefix("AB\\", '\\').isEmpty)
    assert(SqlFront.likePrefix("A\\B%", '\\').isEmpty)
    assert(SqlFront.likePrefix("AB\\%C%", '\\').contains("AB%C"))
    assert(SqlFront.likePrefix("AB%", '\\').contains("AB"))
    assert(SqlFront.likePrefix("AB", '\\').isEmpty)
  }

  test("queryDnf surfaces Long overflow instead of wrapping (r18, ADVICE r17)") {
    val big = new graft.est.CardEst {
      def name = "big"
      // singles near-max, empty intersection: the TOTAL (2·(max/2+1))
      // exceeds Long — must throw, never wrap
      def query(preds: Seq[Pred]): Long =
        if (preds.size > 1) 0L else Long.MaxValue / 2 + 1
    }
    intercept[ArithmeticException](big.queryDnf(
      Seq(Seq(Pred("a", Op.Eq, 1L)), Seq(Pred("b", Op.Eq, 2L)))))
    // r19 (ADVICE r18): an INTERMEDIATE prefix overflow with a
    // representable total answers instead of spuriously throwing —
    // positive and negative terms accumulate separately in BigInt.
    // Here pos = 2·(max/2+1) (> Long) but total = max/2+1 fits.
    val rep = new graft.est.CardEst {
      def name = "rep"
      def query(preds: Seq[Pred]): Long = Long.MaxValue / 2 + 1
    }
    assert(rep.queryDnf(
      Seq(Seq(Pred("a", Op.Eq, 1L)), Seq(Pred("b", Op.Eq, 2L)))) ==
      Long.MaxValue / 2 + 1)
    // in-range sums still answer (exact I-E identity)
    val small = new graft.est.CardEst {
      def name = "small"
      def query(preds: Seq[Pred]): Long = preds.size match {
        case 1 => 10L
        case _ => 3L // the intersection term
      }
    }
    assert(small.queryDnf(
      Seq(Seq(Pred("a", Op.Eq, 1L)), Seq(Pred("b", Op.Eq, 2L)))) == 17L)
  }

  test("parseDnf: bounded cross-column OR; single-column OR still folds (r17)") {
    val (_, dnf) = SqlFront.parseDnf(spark,
      "SELECT count(*) FROM events WHERE value <= 3.0 OR user_id = 7")
    assert(dnf == Seq(Seq(Pred("value", Op.Leq, 3.0)),
      Seq(Pred("user_id", Op.Eq, 7L))))
    // And distributes over Or: the shared conjunct reaches BOTH
    val (_, dnf2) = SqlFront.parseDnf(spark, "SELECT count(*) FROM t " +
      "WHERE (a = 1 OR b = 2) AND c >= 5")
    assert(dnf2 == Seq(
      Seq(Pred("a", Op.Eq, 1L), Pred("c", Op.Geq, 5L)),
      Seq(Pred("b", Op.Eq, 2L), Pred("c", Op.Geq, 5L))))
    // single-column OR of equalities folds to ONE In-mask disjunct
    val (_, dnf3) = SqlFront.parseDnf(spark,
      "SELECT count(*) FROM t WHERE a = 1 OR a = 2")
    assert(dnf3 == Seq(Seq(Pred("a", Op.In, Seq(1L, 2L)))))
    // BETWEEN desugars inside a disjunct
    val (_, dnf4) = SqlFront.parseDnf(spark, "SELECT count(*) FROM t " +
      "WHERE a BETWEEN 1 AND 3 OR b = 9")
    assert(dnf4 == Seq(
      Seq(Pred("a", Op.Geq, 1L), Pred("a", Op.Leq, 3L)),
      Seq(Pred("b", Op.Eq, 9L))))
    // no WHERE = one empty disjunct; parse/parseDnf agree on conjunctions
    assert(SqlFront.parseDnf(spark, "SELECT count(*) FROM t")._2 ==
      Seq(Nil))
    // past the 8-disjunct cap: reject by name, never mis-expand
    val e = intercept[IllegalArgumentException](SqlFront.parseDnf(spark,
      "SELECT count(*) FROM t WHERE (a=1 OR b=2) AND (c=3 OR d=4) " +
        "AND (e=5 OR f=6) AND (g=7 OR h=8)"))
    assert(e.getMessage.contains("disjuncts"))
  }

  test("rejects cross-column OR, functions, joins, GROUP BY, HAVING") {
    def bad(sql: String): String =
      intercept[IllegalArgumentException](SqlFront.parse(spark, sql))
        .getMessage
    assert(bad("SELECT count(*) FROM t WHERE a = 1 OR b = 2")
      .contains("vocabulary"))
    assert(bad("SELECT count(*) FROM t WHERE abs(a) = 1")
      .contains("vocabulary"))
    assert(bad("SELECT count(*) FROM a JOIN b ON a.x = b.x")
      .contains("one table"))
    assert(bad("SELECT c, count(*) FROM t GROUP BY c")
      .contains("GROUP BY"))
    // HAVING parses to UnresolvedHaving (not a Filter) — before the
    // node whitelist its predicate was silently DROPPED; now the node
    // class is named in the rejection.
    assert(bad("SELECT count(*) FROM t HAVING count(*) > 1")
      .contains("UnresolvedHaving"))
  }

  test("CardEst.querySql answers SQL text and pins the bound table") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "R"), (2L, "N"), (3L, "R")).toDF("k", "f")
    val est = new graft.est.CardEst {
      def name = "exact_local"
      def query(preds: Seq[Pred]): Long =
        if (preds.isEmpty) df.count() else df.filter(Pred.conj(preds)).count()
    }
    assert(est.querySql(spark,
      "SELECT count(*) FROM docs WHERE f = 'R'") == 2L)
    assert(est.querySql(spark, "SELECT count(*) FROM docs",
      table = Some("docs")) == 3L)
    val e = intercept[IllegalArgumentException] {
      est.querySql(spark, "SELECT count(*) FROM other_table",
        table = Some("docs"))
    }
    assert(e.getMessage.contains("bound to table"))
  }

  test("parsed preds reproduce spark.sql's own answer end-to-end") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 1.0, "R"), (2L, 0.5, "N"), (3L, 2.0, "R"),
      (4L, 0.0, "R")).toDF("k", "q", "f")
    df.createOrReplaceTempView("t_sqlfront")
    val sql = "SELECT count(*) AS n FROM t_sqlfront WHERE q <= 1.0 AND f = 'R'"
    val direct = spark.sql(sql).head().getLong(0)
    val (_, ps) = SqlFront.parse(spark, sql)
    val viaPreds = df.filter(Pred.conj(ps)).count()
    assert(viaPreds == direct && direct == 2L)
  }
}
