package graft.lake

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSuite

/** Model-based properties for the round-11 history surfaces:
  *
  *  - Delta RESTORE: for ANY interleaving of appends, DV deletes and
  *    restores-to-a-random-prior-version, the table reads as the
  *    in-memory model, every recorded version still time-travels to
  *    its own snapshot, and restore targeting's content contract holds
  *    (restore(v) ⇒ content == model(v)).
  *  - Iceberg refs: for ANY interleaving of main appends, branch
  *    appends and fast-forwards, main and the branch each read as
  *    their own model; fast-forward succeeds exactly when main has not
  *    moved since the branch forked (the ancestor gate), and a refused
  *    fast-forward changes nothing.
  */
class RefsRestorePropertySpec extends SparkSuite {
  import spark.implicits._

  // --- Delta restore ---------------------------------------------------------

  private sealed trait DOp
  private case class DAppend(rows: List[(Long, Long)]) extends DOp
  private case class DDelete(mod: Long) extends DOp // delete k % mod == 0
  private case class DRestore(pick: Int) extends DOp // index into history

  private val genDOp: Gen[DOp] = Gen.frequency(
    5 -> (for {
      n <- Gen.chooseNum(1, 4)
      rows <- Gen.listOfN(n, for {
        k <- Gen.choose(0L, 40L)
        v <- Gen.choose(0L, 9L)
      } yield (k, v))
    } yield DAppend(rows)),
    3 -> Gen.choose(2L, 5L).map(DDelete(_)),
    2 -> Gen.choose(0, 1000).map(DRestore(_)))

  test("delta: append/DV-delete/restore sequences read as the model; " +
      "all recorded versions still travel") {
    var i = 0
    val prop = Prop.forAll(Gen.chooseNum(2, 6).flatMap(n =>
      Gen.listOfN(n, genDOp))) { ops =>
      i += 1
      val dir = tmpDir(s"refs-restore-d-$i")
      // seed so version 0 always exists
      var history = Vector.empty[(Long, List[(Long, Long)])]
      var content = List((100L, 0L))
      var head = DeltaCompat.write(content.toDF("k", "v"), dir)
      history :+= (head, content)
      ops.foreach {
        case DAppend(rows) =>
          head = DeltaCompat.write(rows.toDF("k", "v"), dir)
          content = content ++ rows
          history :+= (head, content)
        case DDelete(mod) =>
          val before = content
          content = content.filterNot(_._1 % mod == 0)
          val v = DeltaCompat.delete(spark, dir,
            org.apache.spark.sql.functions.col("k") % mod === 0)
          if (content != before) { head = v; history :+= (head, content) }
        case DRestore(pick) =>
          val (tv, tc) = history(pick % history.size)
          val v = DeltaCompat.restore(spark, dir, tv)
          // no-op is decided by FILE-SET equality engine-side; equal
          // content with different files (append then delete it all)
          // legitimately commits. The invariant is one-directional:
          // no commit ⇒ content already equal; commit ⇒ content = target
          if (v != head) { head = v; content = tc; history :+= (head, content) }
          else assert(tc.sorted == content.sorted,
            "restore declined to commit but content differs")
      }
      val got = DeltaCompat.read(spark, dir)
        .as[(Long, Long)].collect().sorted.toList
      val travelOk = history.forall { case (v, c) =>
        DeltaCompat.read(spark, dir, Some(v))
          .as[(Long, Long)].collect().sorted.toList == c.sorted
      }
      got == content.sorted && travelOk
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(result.passed, s"property failed: ${result.status}")
  }

  // --- Iceberg refs ----------------------------------------------------------

  private sealed trait IOp
  private case class IMain(rows: List[(Long, Long)]) extends IOp
  private case class IBranch(rows: List[(Long, Long)]) extends IOp
  private case object IFork extends IOp
  private case object IFf extends IOp

  private val genRows: Gen[List[(Long, Long)]] = for {
    n <- Gen.chooseNum(1, 3)
    rows <- Gen.listOfN(n, for {
      k <- Gen.choose(0L, 40L)
      v <- Gen.choose(0L, 9L)
    } yield (k, v))
  } yield rows

  private val genIOp: Gen[IOp] = Gen.frequency(
    4 -> genRows.map(IMain(_)),
    4 -> genRows.map(IBranch(_)),
    1 -> Gen.const(IFork),
    2 -> Gen.const(IFf))

  test("iceberg: main/branch appends + fast-forwards read as their " +
      "models; the ancestor gate is exact") {
    var i = 0
    val prop = Prop.forAll(Gen.chooseNum(3, 7).flatMap(n =>
      Gen.listOfN(n, genIOp))) { ops =>
      i += 1
      val dir = tmpDir(s"refs-restore-i-$i")
      var main = List((100L, 0L))
      IcebergCompat.write(main.toDF("k", "v"), dir)
      var branch = Option.empty[List[(Long, Long)]]
      var forked = false // a branch named "b" exists
      var mainMoved = false // main advanced since fork/last ff
      ops.foreach {
        case IMain(rows) =>
          IcebergCompat.write(rows.toDF("k", "v"), dir)
          main = main ++ rows
          mainMoved = true
        case IBranch(rows) if forked =>
          IcebergCompat.write(rows.toDF("k", "v"), dir, ref = "b")
          branch = branch.map(_ ++ rows)
        case IBranch(_) => // no branch yet: must refuse
          intercept[NoSuchElementException] {
            IcebergCompat.write(List((0L, 0L)).toDF("k", "v"), dir,
              ref = "b")
          }
        case IFork if !forked =>
          IcebergCompat.createBranch(dir, "b")
          branch = Some(main)
          forked = true
          mainMoved = false
        case IFork => // exists: must refuse
          intercept[IllegalArgumentException] {
            IcebergCompat.createBranch(dir, "b")
          }
        case IFf if forked && !mainMoved =>
          IcebergCompat.fastForward(dir, "b")
          main = branch.get
        case IFf if forked =>
          // diverged: the gate must refuse and change nothing — unless
          // the branch took no commits since the fork, in which case
          // main's head IS... no: main moved ⇒ main is no ancestor of
          // the stale branch head, ALWAYS refuse
          intercept[IllegalStateException] {
            IcebergCompat.fastForward(dir, "b")
          }
        case IFf => // no branch
          intercept[NoSuchElementException] {
            IcebergCompat.fastForward(dir, "b")
          }
      }
      val gotMain = IcebergCompat.read(spark, dir)
        .as[(Long, Long)].collect().sorted.toList
      val branchOk = branch.forall { b =>
        IcebergCompat.readRef(spark, dir, "b")
          .as[(Long, Long)].collect().sorted.toList == b.sorted
      }
      gotMain == main.sorted && branchOk
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(result.passed, s"property failed: ${result.status}")
  }
}
