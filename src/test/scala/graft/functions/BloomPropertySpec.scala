package graft.functions

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.expressions.BloomRuntime

/** The Bloom kernel's two load-bearing guarantees on ARBITRARY keys and
  * partitionings: (1) a built filter NEVER reports a member absent —
  * false negatives break the decontamination superset contract
  * silently; (2) merging per-partition filters in any order/shape gives
  * the same bit array as a single-pass build — the TypedImperativeAggregate
  * relies on OR-merge associativity/commutativity for streaming and
  * partial aggregation. */
class BloomPropertySpec extends AnyFunSuite {

  private val params = SCTest.Parameters.default.withMinSuccessfulTests(200)

  private def build(keys: Seq[Long], bytes: Int): Array[Byte] = {
    val bits = new Array[Byte](bytes)
    keys.foreach(BloomRuntime.setBits(bits, _, 7))
    bits
  }

  test("no false negatives for arbitrary keys and filter sizes") {
    val gen = for {
      nBytes <- Gen.oneOf(8, 64, 1024, 4096)
      keys <- Gen.listOf(Gen.chooseNum(Long.MinValue, Long.MaxValue))
    } yield (nBytes, keys)
    val p = Prop.forAll(gen) { case (nBytes, keys) =>
      val bits = build(keys, nBytes)
      keys.forall(BloomRuntime.mightContain(bits, _, 7))
    }
    assert(SCTest.check(params, p).passed)
  }

  test("partitioned OR-merge == single-pass build, any split, any order") {
    val gen = for {
      keys <- Gen.listOf(Gen.chooseNum(Long.MinValue, Long.MaxValue))
      nParts <- Gen.choose(1, 8)
      assign <- Gen.listOfN(keys.length, Gen.choose(0, nParts - 1))
      shuffle <- Gen.choose(0, 5)
    } yield (keys, nParts, assign, shuffle)
    val p = Prop.forAll(gen) { case (keys, nParts, assign, shuffleSeed) =>
      val whole = build(keys, 256)
      val parts = keys.zip(assign).groupBy(_._2).values.toList
        .map(g => build(g.map(_._1), 256))
      // merge in a seed-dependent order
      val ordered =
        if (shuffleSeed % 2 == 0) parts else parts.reverse
      val merged = ordered.foldLeft(new Array[Byte](256)) { (acc, p2) =>
        var i = 0
        while (i < acc.length) { acc(i) = (acc(i) | p2(i)).toByte; i += 1 }
        acc
      }
      java.util.Arrays.equals(whole, merged)
    }
    assert(SCTest.check(params, p).passed)
  }

  test("discrimination: a correctly-sized filter rejects most non-members") {
    // The absence direction must actually FIRE — an all-bits-set (or
    // always-true) implementation satisfies no-false-negatives trivially
    // but fails here: with <=64 members in a 4096-bit filter
    // (64 bits/key), at most ~2% of 500 disjoint-range probes may
    // false-positive.
    val gen = for {
      members <- Gen.listOf(Gen.chooseNum(0L, Long.MaxValue / 2))
        .map(_.take(64))
      probes <- Gen.listOfN(500, Gen.chooseNum(Long.MinValue, -1L))
    } yield (members, probes)
    val p = Prop.forAll(gen) { case (members, probes) =>
      val bits = build(members, 512)
      probes.count(BloomRuntime.mightContain(bits, _, 7)) <= 10
    }
    assert(SCTest.check(params, p).passed)
  }
}
