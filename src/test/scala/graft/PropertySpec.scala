package graft

import graft.core.ColumnMeta
import graft.nn.Made
import graft.query.{Op, Pred}
import graft.workload.Workload
import org.apache.spark.sql.types.{DoubleType, StringType}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck properties over the pure kernel functions (SURVEY §5's
  * property-test plan): q-error laws, domain-mask equivalence, SQL
  * literal escaping, UTF-8 collation laws, categorical sampling range.
  * (Raw ScalaCheck generators with deterministic seeds; the
  * scalatestplus bridge isn't in the offline dependency cache.)
  */
class PropertySpec extends AnyFunSuite {

  /** Deterministic generator sampling: n cases seeded 0..n-1. */
  private def samples[A](g: Gen[A], n: Int = 200): Seq[A] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private def forAll[A](g: Gen[A], n: Int = 200)(f: A => Unit): Unit = {
    val cases = samples(g, n)
    assert(cases.size > n / 2, s"generator produced only ${cases.size} cases")
    cases.foreach(f)
  }

  test("qError is >= 1 and symmetric for positive cardinalities") {
    forAll(Gen.zip(Gen.choose(1L, 1000000L), Gen.choose(1L, 1000000L))) {
      case (a, b) =>
        val e = Workload.qError(a.toDouble, b.toDouble)
        assert(e >= 1.0)
        assert(math.abs(e - Workload.qError(b.toDouble, a.toDouble)) < 1e-12)
        if (a == b) assert(e == 1.0)
    }
  }

  test("domainMask agrees with scalar op evaluation on arbitrary domains") {
    val domGen = Gen.nonEmptyListOf(Gen.choose(-1e6, 1e6)).map(_.distinct.sorted)
    forAll(Gen.zip(domGen, Gen.oneOf(Op.all), Gen.choose(-1e6, 1e6))) {
      case (dom, op, v) if dom.nonEmpty =>
        val meta = ColumnMeta("c", DoubleType,
          dom.map(_.asInstanceOf[Any]).toArray, hasNull = false)
        val mask = Pred("c", op, v).domainMask(meta)
        dom.zipWithIndex.foreach { case (d, i) =>
          assert(mask(i) == op.eval(Ordering.Double.TotalOrdering)(d, v),
            s"$d $op $v")
        }
      case _ => ()
    }
  }

  test("null slot never qualifies under any predicate") {
    forAll(Gen.zip(Gen.oneOf(Op.all), Gen.choose(-100.0, 100.0))) {
      case (op, v) =>
        val meta = ColumnMeta("c", DoubleType,
          Array(null, 1.0.asInstanceOf[Any], 2.0.asInstanceOf[Any]),
          hasNull = true)
        assert(!Pred("c", op, v).domainMask(meta)(0))
    }
  }

  test("sqlLiteral escapes arbitrary strings safely") {
    forAll(Gen.asciiPrintableStr) { (s: String) =>
      val lit = Pred.sqlLiteral(s)
      assert(lit.startsWith("'") && lit.endsWith("'"))
      // Interior single quotes must all be doubled: stripping the outer
      // quotes and collapsing '' back yields the original.
      val inner = lit.substring(1, lit.length - 1)
      assert(inner.replace("''", "'") == s)
    }
  }

  test("UTF-8 collation is a lawful total order consistent with byte compare") {
    val ord = ColumnMeta.orderingFor(StringType)
    // Strings mixing ASCII, BMP, and supplementary-plane code points —
    // the regime where UTF-16 order and UTF-8 byte order disagree.
    val cpGen = Gen.oneOf(
      Gen.choose('a'.toInt, 'z'.toInt),
      Gen.choose(0xC0, 0x2FFF),
      Gen.choose(0x10000, 0x1FFFF))
    val strGen = Gen.listOf(cpGen)
      .map(_.map(Character.toChars(_).mkString).mkString)
    forAll(Gen.listOfN(3, strGen)) { (xs: List[String]) =>
      if (xs.length == 3) {
        val Seq(a, b, c) = xs.toSeq
        // antisymmetry + transitivity spot-checks
        assert(math.signum(ord.compare(a, b)) == -math.signum(ord.compare(b, a)))
        if (ord.compare(a, b) <= 0 && ord.compare(b, c) <= 0)
          assert(ord.compare(a, c) <= 0)
        // agreement with unsigned byte-wise order
        val bytesOrd = java.util.Arrays.compareUnsigned(
          a.getBytes("UTF-8"), b.getBytes("UTF-8"))
        assert(math.signum(ord.compare(a, b)) == math.signum(bytesOrd.toDouble))
      }
    }
  }

  test("sampleCategorical always lands in range") {
    val rng = new java.util.Random(1)
    forAll(Gen.zip(Gen.choose(1, 20), Gen.choose(0L, 100000L))) {
      case (w, seed) =>
        val lrng = new java.util.Random(seed)
        val logits = Array.fill(w)((lrng.nextGaussian() * 3).toFloat)
        val pick = Made.sampleCategorical(logits, 0, w, rng)
        assert(pick >= 0 && pick < w)
    }
  }

  test("greedy packing: budget, conservation, and maximality laws") {
    val gen = Gen.zip(
      Gen.choose(1, 300),            // maxTokens
      Gen.listOfN(40, Gen.choose(0, 500))) // token counts in id order
    forAll(gen, n = 100) { case (maxTokens, toks) =>
      val docs = toks.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val packs = graft.ops.Corpus.packGreedy(docs.iterator, maxTokens).toSeq
      // Conservation: every doc lands in exactly one pack; truncated
      // token mass accounted exactly.
      assert(packs.map(_._2).sum == docs.size)
      assert(packs.map(_._3.toLong).sum ==
        toks.map(t => math.min(t, maxTokens).toLong).sum)
      // Budget: no pack exceeds maxTokens.
      assert(packs.forall(_._3 <= maxTokens), s"budget: $packs")
      // Structure + greedy maximality: packs partition the docs in
      // order; each pack starts at its pack_id and could not have
      // absorbed the next pack's first doc.
      var idx = 0
      packs.zipWithIndex.foreach { case ((packId, nDocs, nTok), pi) =>
        assert(docs(idx)._1 == packId, s"pack $pi start")
        val slice = docs.slice(idx, idx + nDocs)
        assert(slice.map(d => math.min(d._2, maxTokens)).sum == nTok)
        idx += nDocs
        if (idx < docs.size)
          assert(nTok + math.min(docs(idx)._2, maxTokens) > maxTokens,
            s"pack $pi not maximal")
      }
      assert(idx == docs.size)
    }
  }
}
