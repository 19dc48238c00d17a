package graft.lake

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Superset-safety property for the file-skip evaluator: `keeps` may
  * only return false when NO row of the file can satisfy the conjunct.
  * For any file bounds [lo, hi], any value x inside them, and any
  * conjunct x actually satisfies, keeps(lo, hi, conjunct) MUST be true —
  * a violation is a silently-wrong query (a skipped file held a match),
  * the one failure mode pruning can never have. Covers the comparison
  * ops and the round-8 IN-list op, longs and strings. */
class BoundsPruningPropertySpec extends AnyFunSuite {

  private def run(p: Prop, name: String): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(r.passed, s"$name: $r")
  }

  test("a conjunct satisfied by an in-bounds long can never skip the file") {
    val gen = for {
      a <- Gen.choose(-1000L, 1000L)
      b <- Gen.choose(-1000L, 1000L)
      x <- Gen.choose(math.min(a, b), math.max(a, b))
      op <- Gen.oneOf("=", ">", ">=", "<", "<=")
      v <- Gen.choose(-1200L, 1200L)
    } yield (math.min(a, b), math.max(a, b), x, op, v)
    run(Prop.forAll(gen) { case (lo, hi, x, op, v) =>
      val satisfied = op match {
        case "=" => x == v
        case ">" => x > v
        case ">=" => x >= v
        case "<" => x < v
        case "<=" => x <= v
      }
      !satisfied ||
        BoundsPruning.keeps(Some(Long.box(lo)), Some(Long.box(hi)), op,
          Long.box(v))
    }, "long comparisons")
  }

  test("an IN list containing an in-bounds value can never skip the file") {
    val gen = for {
      a <- Gen.choose(-1000L, 1000L)
      b <- Gen.choose(-1000L, 1000L)
      x <- Gen.choose(math.min(a, b), math.max(a, b))
      others <- Gen.listOf(Gen.choose(-1200L, 1200L))
      shuffledPos <- Gen.choose(0, others.length)
    } yield (math.min(a, b), math.max(a, b), x, others, shuffledPos)
    run(Prop.forAll(gen) { case (lo, hi, x, others, pos) =>
      val (pre, post) = others.splitAt(pos)
      val all = pre ++ (x :: post)
      val vs: Seq[Any] = all.map(Long.box)
      // both representations: the generic linear probe and the
      // extraction-time binary-searchable pack
      BoundsPruning.keeps(Some(Long.box(lo)), Some(Long.box(hi)), "in", vs) &&
        BoundsPruning.keeps(Some(Long.box(lo)), Some(Long.box(hi)), "in",
          BoundsPruning.SortedLongKeys(all.toArray.sorted))
    }, "long IN lists")

    // and the complement: a list with NO value in bounds must skip
    val genMiss = for {
      lo <- Gen.choose(0L, 1000L)
      hi <- Gen.choose(lo, 1000L)
      vs <- Gen.nonEmptyListOf(Gen.oneOf(
        Gen.choose(-2000L, lo - 1), Gen.choose(hi + 1, 3000L)))
    } yield (lo, hi, vs)
    run(Prop.forAll(genMiss) { case (lo, hi, vs) =>
      !BoundsPruning.keeps(Some(Long.box(lo)), Some(Long.box(hi)), "in",
        vs.map(Long.box): Seq[Any]) &&
        !BoundsPruning.keeps(Some(Long.box(lo)), Some(Long.box(hi)), "in",
          BoundsPruning.SortedLongKeys(vs.toArray.sorted))
    }, "long IN misses")
  }

  test("string bounds: satisfied conjuncts and hit IN lists keep the file") {
    val genStr = Gen.listOfN(3, Gen.alphaLowerChar).map(_.mkString)
    val gen = for {
      a <- genStr; b <- genStr; x <- genStr
      op <- Gen.oneOf("=", ">", ">=", "<", "<=", "in")
      v <- genStr
    } yield (Seq(a, b, x).sorted, op, v)
    run(Prop.forAll(gen) { case (sorted, op, v) =>
      val (lo, x, hi) = (sorted(0), sorted(1), sorted(2))
      val satisfied = op match {
        case "=" => x == v
        case ">" => x > v
        case ">=" => x >= v
        case "<" => x < v
        case "<=" => x <= v
        case "in" => true // v list below contains x
      }
      val arg: Any = if (op == "in") Seq[Any](v, x) else v
      !satisfied || BoundsPruning.keeps(Some(lo), Some(hi), op, arg)
    }, "string conjuncts")
  }

  test("missing bounds or incomparable values always keep the file") {
    assert(BoundsPruning.keeps(None, None, "=", Long.box(5L)))
    assert(BoundsPruning.keeps(None, Some(Long.box(10L)), "in",
      Seq[Any](Long.box(3L))))
    // a string probe against long bounds is incomparable → keep
    assert(BoundsPruning.keeps(Some(Long.box(0L)), Some(Long.box(10L)),
      "in", Seq[Any]("x")))
    // unknown op → keep
    assert(BoundsPruning.keeps(Some(Long.box(0L)), Some(Long.box(1L)),
      "like", "x%"))
  }
}
