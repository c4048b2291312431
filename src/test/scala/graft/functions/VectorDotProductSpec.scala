package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class VectorDotProductSpec extends SparkSpec {

  private def withFn[T](f: => T): T = { VectorDotProduct.register(spark); f }

  test("vec_dot equals the aggregate/zip_with formulation bit-for-bit") {
    withFn {
      val spark2 = spark
      import spark2.implicits._
      val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .limit(200)
        .select(col("embedding").as("qv"),
          expr("reverse(embedding)").as("cv"))
      val cmp = df.select(
        expr("vec_dot(qv, cv)").as("fast"),
        expr("aggregate(zip_with(qv, cv, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), " +
          "0D, (a, v) -> a + v)").as("slow"))
      assert(cmp.filter(col("fast") =!= col("slow")).count() === 0L)
    }
  }

  test("vec_dot: interpreted eval matches codegen and handles nulls/lengths") {
    withFn {
      val spark2 = spark
      import spark2.implicits._
      val df = Seq(
        (Some(Seq(1.0f, 2.0f, 3.0f)), Some(Seq(4.0f, 5.0f, 6.0f))),
        (Some(Seq(1.0f, 2.0f)), Some(Seq(3.0f))), // unequal lengths → min
        (None, Some(Seq(1.0f))), // null in → null out
        (Some(Seq.empty[Float]), Some(Seq.empty[Float])))
        .toDF("qv", "cv")
      val rows = df.select(expr("vec_dot(qv, cv)").as("d")).collect()
      assert(rows(0).getDouble(0) === 32.0)
      assert(rows(1).getDouble(0) === 3.0)
      assert(rows(2).isNullAt(0))
      assert(rows(3).getDouble(0) === 0.0)
    }
  }

  test("GraftExtensions installs vec_dot via spark.sql.extensions") {
    val s2 = spark.newSession()
    new graft.GraftExtensions().apply(
      new org.apache.spark.sql.SparkSessionExtensions) // constructs cleanly
    // builder-config path can't be re-tested on a live JVM session;
    // the per-session registration is the supported in-process route
    VectorDotProduct.register(s2)
    assert(s2.sql("SELECT vec_dot(array(CAST(1 AS FLOAT)), array(CAST(2 AS FLOAT)))")
      .collect().head.getDouble(0) === 2.0)
  }
}
