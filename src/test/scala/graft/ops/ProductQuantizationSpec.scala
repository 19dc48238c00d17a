package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Product quantization: deterministic codebooks, valid codes, and
  * planted-cluster retrieval through the ADC scorer. */
class ProductQuantizationSpec extends SparkSuite {

  import spark.implicits._

  /** 3 planted clusters of 30 vectors (anchor + small deterministic
    * noise), dim 16. Cluster of vec v = vec_id / 30. */
  private def planted() = {
    def mix(a: Long): Double = {
      var x = a
      x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
      x ^= x >>> 33
      ((x & 0xffff) / 65535.0 - 0.5) * 0.1
    }
    val anchors = Array.tabulate(3, 16)((c, i) =>
      math.sin(c * 7.0 + i).toDouble)
    (0L until 90L).map { id =>
      val c = (id / 30).toInt
      (id, (0 until 16).map(i => anchors(c)(i) + mix(id * 31 + i)).toArray)
    }.toDF("vec_id", "embedding")
  }

  test("training is deterministic; codes are valid and repeatable") {
    val df = planted()
    val m1 = ProductQuantization.train(df, "embedding", m = 4, ksub = 8)
    val m2 = ProductQuantization.train(df, "embedding", m = 4, ksub = 8)
    assert(m1.books.flatten.flatten.toSeq == m2.books.flatten.flatten.toSeq)
    assert(m1.m == 4 && m1.dsub == 4)
    val codes = ProductQuantization.encode(df, "embedding", m1)
      .select("codes").as[Seq[Int]].collect()
    assert(codes.forall(c => c.length == 4 && c.forall(k => k >= 0 && k < 8)))
    // identical input vectors encode identically
    val dup = ProductQuantization.encode(
      df.filter($"vec_id" === 0).unionAll(df.filter($"vec_id" === 0)),
      "embedding", m1).select("codes").as[Seq[Int]].collect()
    assert(dup(0) == dup(1))
  }

  test("ADC retrieval stays inside the planted cluster") {
    val df = planted()
    val model = ProductQuantization.train(df, "embedding", m = 4, ksub = 8)
    val enc = ProductQuantization.encode(df, "embedding", model)
    // each cluster's first vector queries the code index; its ADC top-5
    // (excluding itself) must come from its own cluster
    for (qid <- Seq(0L, 30L, 60L)) {
      val qv = df.filter($"vec_id" === qid)
        .select($"embedding").as[Seq[Double]].head()
      val top = enc.filter($"vec_id" =!= qid)
        .withColumn("d", ProductQuantization.adc(
          array(qv.map(lit): _*), col("codes"), model))
        .orderBy($"d", $"vec_id").limit(5)
        .select("vec_id").as[Long].collect()
      assert(top.forall(_ / 30 == qid / 30),
        s"query $qid leaked outside its cluster: ${top.mkString(",")}")
    }
  }

  test("dimension must split evenly into subspaces") {
    val df = planted()
    intercept[IllegalArgumentException] {
      ProductQuantization.train(df, "embedding", m = 5, ksub = 4)
    }
  }
}
