package graft.lake

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSuite

/** Property: for ANY sequence of append/overwrite commits, reading the
  * Delta log equals an in-memory replay of the same batches — and every
  * intermediate version stays readable (time travel is total). */
class DeltaPropertySpec extends SparkSuite {
  import spark.implicits._

  private case class Commit(overwrite: Boolean, rows: List[(Long, String)])

  private val genCommit: Gen[Commit] = for {
    ow <- Gen.prob(0.3)
    n <- Gen.chooseNum(1, 5)
    rows <- Gen.listOfN(n, for {
      k <- Gen.choose(0L, 50L)
      v <- Gen.alphaStr.map(_.take(3))
    } yield (k, v))
  } yield Commit(ow, rows)

  private def replay(commits: List[Commit]): List[(Long, String)] =
    commits.foldLeft(List.empty[(Long, String)]) { (st, c) =>
      if (c.overwrite) c.rows else st ++ c.rows
    }

  test("delta log read == replay for random append/overwrite sequences") {
    var i = 0
    val prop = Prop.forAll(Gen.chooseNum(1, 4).flatMap(n =>
      Gen.listOfN(n, genCommit))) { commits =>
      i += 1
      val dir = tmpDir(s"delta-prop-$i")
      commits.zipWithIndex.foreach { case (c, idx) =>
        val v = DeltaCompat.write(c.rows.toDF("k", "v"), dir,
          mode = if (c.overwrite) "overwrite" else "append")
        assert(v == idx.toLong)
      }
      val got = DeltaCompat.read(spark, dir)
        .as[(Long, String)].collect().sorted.toList
      val want = replay(commits).sorted
      // Every intermediate version also reads back as its own replay.
      val travelOk = commits.indices.forall { upTo =>
        DeltaCompat.read(spark, dir, Some(upTo.toLong))
          .as[(Long, String)].collect().sorted.toList ==
          replay(commits.take(upTo + 1)).sorted
      }
      got == want && travelOk
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(result.passed, s"property failed: ${result.status}")
  }

  /** Property: for ANY interleaving of appends and predicate deletes,
    * reading the table equals the in-memory model (append = add rows,
    * delete = drop matching LIVE rows). Exercises DV write, bitmap
    * merge on repeated deletes of the same files, and the codegen'd
    * scan-side application. */
  test("delta DV deletes == model for random append/delete sequences") {
    sealed trait Op
    case class Append(rows: List[(Long, String)]) extends Op
    case class Delete(mod: Long, rem: Long) extends Op

    val genOp: Gen[Op] = Gen.frequency(
      2 -> (for {
        n <- Gen.chooseNum(2, 6)
        rows <- Gen.listOfN(n, for {
          k <- Gen.choose(0L, 60L)
          v <- Gen.alphaStr.map(_.take(3))
        } yield (k, v))
      } yield Append(rows)),
      3 -> (for {
        mod <- Gen.choose(2L, 7L)
        rem <- Gen.choose(0L, 6L)
      } yield Delete(mod, rem.min(mod - 1))))

    var i = 0
    val prop = Prop.forAll(Gen.chooseNum(2, 5).flatMap(n =>
      Gen.listOfN(n, genOp))) { ops0 =>
      // start with an append so deletes have something to chew on
      val ops = Append(List((1L, "a"), (2L, "b"), (3L, "c"))) :: ops0
      i += 1
      val dir = tmpDir(s"delta-dvprop-$i")
      import org.apache.spark.sql.functions.col
      val model = ops.foldLeft(List.empty[(Long, String)]) { (st, op) =>
        op match {
          case Append(rows) =>
            DeltaCompat.write(rows.toDF("k", "v"), dir)
            st ++ rows
          case Delete(mod, rem) =>
            DeltaCompat.delete(spark, dir, col("k") % mod === rem)
            st.filterNot { case (k, _) => k % mod == rem }
        }
      }
      val got = DeltaCompat.read(spark, dir)
        .as[(Long, String)].collect().sorted.toList
      got == model.sorted
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(result.passed, s"property failed: ${result.status}")
  }

  /** Property: for ANY sequence of merge batches (distinct keys per
    * batch, each row upsert-or-delete), the table equals the obvious
    * key→value map replay. Exercises touched-file discovery, the
    * full-outer join legs, file-level rewrite, delete flags, and
    * no-op batches — the upsert semantics end to end. */
  test("delta merge == keyed-map replay for random upsert/delete batches") {
    case class Batch(rows: List[(Long, String, Boolean)]) // (k, v, del)

    val genBatch: Gen[Batch] = for {
      n <- Gen.chooseNum(1, 6)
      rows <- Gen.listOfN(n, for {
        k <- Gen.choose(0L, 30L)
        v <- Gen.alphaStr.map(_.take(3))
        del <- Gen.prob(0.3)
      } yield (k, v, del))
    } yield Batch(rows.distinctBy(_._1)) // duplicate source keys refused

    var i = 0
    val prop = Prop.forAll(Gen.chooseNum(1, 4).flatMap(n =>
      Gen.listOfN(n, genBatch))) { batches =>
      i += 1
      val dir = tmpDir(s"delta-mergeprop-$i")
      import org.apache.spark.sql.functions.col
      DeltaCompat.write(
        List((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"), dir)
      val model = batches.foldLeft(
        scala.collection.immutable.Map(1L -> "a", 2L -> "b", 3L -> "c")) {
        (st, b) =>
          DeltaCompat.merge(spark, dir,
            b.rows.toDF("k", "v", "del"), Seq("k"),
            deleteWhen = Some(col("del")))
          b.rows.foldLeft(st) { case (m, (k, v, del)) =>
            if (del) m - k else m + (k -> v)
          }
      }
      val got = DeltaCompat.read(spark, dir)
        .as[(Long, String)].collect().sorted.toList
      got == model.toList.sorted
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(result.passed, s"property failed: ${result.status}")
  }
}
