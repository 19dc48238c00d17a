package graft.lake

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSuite

/** Property test (SURVEY.md §5 / FIXTURES.md §3): for ANY sequence of
  * I/U/D batches, the mirror equals a row-store replay of the same ops —
  * the generalization of what sanity.sql checks once. */
class CdcPropertySpec extends SparkSuite {
  import spark.implicits._

  sealed trait Op { def pk: Int }
  case class Ins(pk: Int, v: String) extends Op
  case class Upd(pk: Int, v: String) extends Op
  case class Del(pk: Int) extends Op

  private val genOp: Gen[Op] = for {
    pk <- Gen.choose(0, 15)
    v <- Gen.alphaStr.map(_.take(4))
    op <- Gen.oneOf(Ins(pk, v), Upd(pk, v), Del(pk))
  } yield op

  private val genBatches: Gen[List[List[Op]]] =
    Gen.chooseNum(1, 4).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(1, 6).flatMap(k => Gen.listOfN(k, genOp))))

  private def replay(batches: List[List[Op]]): Map[Int, String] =
    batches.flatten.foldLeft(Map.empty[Int, String]) {
      case (st, Ins(k, v)) => st + (k -> v)
      case (st, Upd(k, v)) => st + (k -> v) // upsert, as CDC apply does
      case (st, Del(k)) => st - k
    }

  test("mirror == row-store replay for random op sequences") {
    var i = 0
    val prop = Prop.forAll(genBatches) { batches =>
      i += 1
      val lake = new Mooncake(tmpDir(s"cdc-prop"))
      val name = s"p$i"
      lake.createTable(spark, name,
        Seq((0, "init")).toDF("a", "b"), Seq("a"))
      var version = 1L
      batches.foreach { ops =>
        version += 1
        val rows = ops.zipWithIndex.map {
          case (Ins(k, v), seq) => (k, v, "I", seq.toLong)
          case (Upd(k, v), seq) => (k, v, "U", seq.toLong)
          case (Del(k), seq) => (k, null: String, "D", seq.toLong)
        }
        lake.applyChanges(spark, name,
          rows.toDF("a", "b", "__op", "__seq"), version)
      }
      val got = lake.read(spark, name, atLeastVersion = Some(version))
        .as[(Int, String)].collect().toMap
      val want = replay(List(List(Ins(0, "init"))) ++ batches)
      got == want
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(result.passed, result.status.toString)
  }

  test("tableChanges(v, v+1) is exactly the delta between version states") {
    var i = 0
    val prop = Prop.forAll(genBatches) { batches =>
      i += 1
      val lake = new Mooncake(tmpDir("cdc-diff-prop"))
      val name = s"d$i"
      lake.createTable(spark, name,
        Seq((0, "init")).toDF("a", "b"), Seq("a"))
      var version = 1L
      batches.foreach { ops =>
        version += 1
        val rows = ops.zipWithIndex.map {
          case (Ins(k, v), seq) => (k, v, "I", seq.toLong)
          case (Upd(k, v), seq) => (k, v, "U", seq.toLong)
          case (Del(k), seq) => (k, null: String, "D", seq.toLong)
        }
        lake.applyChanges(spark, name,
          rows.toDF("a", "b", "__op", "__seq"), version)
      }
      (1L until version).forall { v =>
        val before = lake.readVersion(spark, name, v)
          .as[(Int, String)].collect().toSet
        val after = lake.readVersion(spark, name, v + 1)
          .as[(Int, String)].collect().toSet
        val diff = lake.tableChanges(spark, name, v, v + 1)
          .as[(Int, String, String)].collect()
        val ins = diff.filter(_._3 == "insert").map(r => (r._1, r._2)).toSet
        val del = diff.filter(_._3 == "delete").map(r => (r._1, r._2)).toSet
        // pk is unique per state, so set algebra is exact here:
        // applying the diff to the old state must give the new state,
        // and the diff must not fabricate rows absent from either side
        (before -- del ++ ins) == after &&
          del.subsetOf(before) && ins.subsetOf(after)
      }
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(result.passed, result.status.toString)
  }
}
