package graft.functions

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DoubleType}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.expressions.NearestCentroid

/** The fused kernel must agree with the row_number()-window semantics
  * it replaced on ARBITRARY inputs: winner = max cosine under Spark's
  * double ordering (NaN greatest — the all-zero-vector case), ties to
  * the LOWEST cid, and the returned cosine bit-equal to the reference
  * left-fold. A divergence is a silent cluster-assignment drift — the
  * exact bug class the bitwise NearestCentroidSpec pins on fixture
  * data; this pins it on adversarial values (zeros, sign mixes,
  * magnitude spreads). */
class NearestCentroidPropertySpec extends AnyFunSuite {

  private def refCosine(x: Array[Double], c: Array[Double]): Double = {
    var dot = 0.0; var nx = 0.0; var nc = 0.0; var i = 0
    while (i < x.length) {
      dot += x(i) * c(i); nx += x(i) * x(i); nc += c(i) * c(i); i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(nc))
  }

  test("fused argmax == (cos desc NaN-greatest, cid asc) reference") {
    val value = Gen.oneOf(Gen.const(0.0), Gen.choose(-1.0, 1.0),
      Gen.choose(-1e6, 1e6), Gen.choose(-1e-6, 1e-6))
    val gen = for {
      d <- Gen.choose(1, 8)
      k <- Gen.choose(1, 20)
      cents <- Gen.listOfN(k, Gen.listOfN(d, value))
      cids <- Gen.listOfN(k, Gen.choose(-100L, 100L))
      v <- Gen.listOfN(d, value)
    } yield (cids, cents.map(_.toArray), v.toArray)
    val p = Prop.forAll(gen) { case (cids, cents, v) =>
      val expr = NearestCentroid(
        Literal.create(v, ArrayType(DoubleType)),
        cids, cents.map(_.toIndexedSeq))
      val row = expr.compute(new GenericArrayData(v))
      val (gotCid, gotCos) = (row.getLong(0), row.getDouble(1))
      // reference: stable max under (Double.compare desc, cid asc) —
      // exactly Spark's window ordering semantics
      val best = cids.zip(cents).map { case (cid, c) =>
        (cid, refCosine(v, c))
      }.reduceLeft { (a, b) =>
        val cmp = java.lang.Double.compare(b._2, a._2)
        if (cmp > 0 || (cmp == 0 && b._1 < a._1)) b else a
      }
      gotCid == best._1 &&
        java.lang.Double.doubleToLongBits(gotCos) ==
          java.lang.Double.doubleToLongBits(best._2)
    }
    val r = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(500), p)
    assert(r.passed, s"fused-vs-reference: $r")
  }
}
