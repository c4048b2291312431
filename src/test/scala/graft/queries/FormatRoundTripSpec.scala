package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Source/sink format breadth: the same relation written and re-read
  * through every bundled columnar/text format must round-trip values
  * exactly (with the documented text-format caveats handled by
  * explicit schemas and timestamp formats, never by inference).
  */
class FormatRoundTripSpec extends SparkSpec {

  test("lineitem sample round-trips through ORC, CSV, and JSON exactly") {
    val src = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .orderBy(col("l_orderkey"), col("l_suppkey"), col("l_quantity"))
      .limit(1000)
      .cache()
    val schema = src.schema
    val expect = src.collect().map(_.toSeq.toVector).toSet
    def back(df: org.apache.spark.sql.DataFrame): Set[Vector[Any]] =
      df.select(src.columns.map(col).toIndexedSeq: _*)
        .collect().map(_.toSeq.toVector).toSet

    val orc = "target/fmt_rt/lineitem_orc"
    src.write.mode("overwrite").orc(orc)
    assert(back(spark.read.orc(orc)) === expect)

    // text formats: schema supplied explicitly (inference would widen
    // or re-type), microsecond timestamps written and parsed with the
    // same pattern so no precision is silently dropped
    val tsFmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    val csv = "target/fmt_rt/lineitem_csv"
    src.write.mode("overwrite")
      .option("header", "true").option("timestampFormat", tsFmt)
      .csv(csv)
    assert(back(spark.read.schema(schema)
      .option("header", "true").option("timestampFormat", tsFmt)
      .csv(csv)) === expect)

    val json = "target/fmt_rt/lineitem_json"
    src.write.mode("overwrite").option("timestampFormat", tsFmt).json(json)
    assert(back(spark.read.schema(schema)
      .option("timestampFormat", tsFmt).json(json)) === expect)

    src.unpersist(blocking = true)
  }
}
