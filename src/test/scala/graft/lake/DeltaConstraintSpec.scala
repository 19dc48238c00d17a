package graft.lake

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** CHECK constraints: add validates existing data, writes enforce
  * (TRUE-or-NULL passes, FALSE refuses atomically), the config key
  * survives a checkpoint fold, drop re-opens the gate, and merge —
  * which routes through the same write path — is enforced too. */
class DeltaConstraintSpec extends SparkSuite {
  import spark.implicits._

  private def kv(df: org.apache.spark.sql.DataFrame): Seq[(Long, Int)] =
    df.as[(Long, Int)].collect().sortBy(_._1).toSeq

  test("add + enforce: bad batch refuses by name, commits nothing") {
    val dir = tmpDir("delta-check")
    DeltaCompat.write(Seq((1L, 10), (2L, 20)).toDF("k", "v"), dir)
    val ver = DeltaCompat.addConstraint(spark, dir, "v_pos", "v > 0")
    assert(DeltaCompat.constraints(spark, dir) === Map("v_pos" -> "v > 0"))
    // good batch passes
    DeltaCompat.write(Seq((3L, 30)).toDF("k", "v"), dir)
    // bad batch refuses, names the constraint, and commits NOTHING
    val before = DeltaCompat.versions(dir).max
    val e = intercept[IllegalArgumentException] {
      DeltaCompat.write(Seq((4L, -5)).toDF("k", "v"), dir)
    }
    assert(e.getMessage.contains("v_pos") && e.getMessage.contains("v > 0"))
    assert(DeltaCompat.versions(dir).max === before, "no partial commit")
    assert(kv(DeltaCompat.read(spark, dir)) ===
      Seq(1L -> 10, 2L -> 20, 3L -> 30))
    assert(ver > 0)
  }

  test("NULL evaluates as pass (SQL CHECK semantics)") {
    val dir = tmpDir("delta-check-null")
    DeltaCompat.write(Seq((1L, Some(10))).toDF("k", "v"), dir)
    DeltaCompat.addConstraint(spark, dir, "v_pos", "v > 0")
    // a NULL v makes the predicate NULL — must be accepted
    DeltaCompat.write(Seq((2L, None: Option[Int])).toDF("k", "v"), dir)
    assert(DeltaCompat.read(spark, dir).count() === 2)
  }

  test("add refuses when existing rows violate; nothing committed") {
    val dir = tmpDir("delta-check-existing")
    DeltaCompat.write(Seq((1L, -1)).toDF("k", "v"), dir)
    val before = DeltaCompat.versions(dir).max
    val e = intercept[IllegalArgumentException] {
      DeltaCompat.addConstraint(spark, dir, "v_pos", "v > 0")
    }
    assert(e.getMessage.contains("existing rows"))
    assert(DeltaCompat.versions(dir).max === before)
    assert(DeltaCompat.constraints(spark, dir).isEmpty)
  }

  test("constraint survives a checkpoint fold; drop re-opens the gate") {
    val dir = tmpDir("delta-check-cp")
    DeltaCompat.write(Seq((1L, 10)).toDF("k", "v"), dir)
    DeltaCompat.addConstraint(spark, dir, "v_pos", "v > 0")
    DeltaCompat.write(Seq((2L, 20)).toDF("k", "v"), dir)
    DeltaCompat.checkpoint(spark, dir)
    // enforcement must come from the CHECKPOINTED config now
    intercept[IllegalArgumentException] {
      DeltaCompat.write(Seq((3L, -3)).toDF("k", "v"), dir)
    }
    DeltaCompat.dropConstraint(spark, dir, "v_pos")
    DeltaCompat.write(Seq((3L, -3)).toDF("k", "v"), dir)
    assert(kv(DeltaCompat.read(spark, dir)) ===
      Seq(1L -> 10, 2L -> 20, 3L -> -3))
    // duplicate add / missing drop refuse loudly
    DeltaCompat.addConstraint(spark, dir, "k_pos", "k > 0")
    intercept[IllegalArgumentException] {
      DeltaCompat.addConstraint(spark, dir, "k_pos", "k > 1")
    }
    intercept[IllegalArgumentException] {
      DeltaCompat.dropConstraint(spark, dir, "nope")
    }
  }

  test("evolveSchema refuses rename/drop of a constraint-referenced column") {
    val dir = tmpDir("delta-check-evolve")
    DeltaCompat.write(Seq((1L, 10)).toDF("k", "v"), dir,
      columnMapping = "name")
    DeltaCompat.addConstraint(spark, dir, "v_pos", "v > 0")
    // renaming or dropping 'v' would brick every later write (the
    // surviving constraint names a column that no longer exists)
    intercept[IllegalArgumentException] {
      DeltaCompat.evolveSchema(spark, dir, renames = Map("v" -> "w"))
    }
    intercept[IllegalArgumentException] {
      DeltaCompat.evolveSchema(spark, dir, drops = Seq("v"))
    }
    // untouched columns still evolve freely
    DeltaCompat.evolveSchema(spark, dir, renames = Map("k" -> "kk"))
    // and after dropping the constraint the column is free again
    DeltaCompat.dropConstraint(spark, dir, "v_pos")
    DeltaCompat.evolveSchema(spark, dir, renames = Map("v" -> "w"))
    assert(DeltaCompat.read(spark, dir).columns.toSeq === Seq("kk", "w"))
  }

  test("merge enforces constraints on the written result") {
    val dir = tmpDir("delta-check-merge")
    DeltaCompat.write(Seq((1L, 10), (2L, 20)).toDF("k", "v"), dir)
    DeltaCompat.addConstraint(spark, dir, "v_pos", "v > 0")
    // an update that would drive v negative must refuse
    intercept[IllegalArgumentException] {
      DeltaCompat.merge(spark, dir,
        Seq((2L, -99)).toDF("k", "v"), Seq("k"))
    }
    assert(kv(DeltaCompat.read(spark, dir)) === Seq(1L -> 10, 2L -> 20))
    // a clean merge still lands
    DeltaCompat.merge(spark, dir, Seq((2L, 99)).toDF("k", "v"), Seq("k"))
    assert(kv(DeltaCompat.read(spark, dir)) === Seq(1L -> 10, 2L -> 99))
  }
}
