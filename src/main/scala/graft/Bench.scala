package graft
import org.apache.spark.sql.SparkSession

/** Benchmark harness. One JSON line on stdout:
  *
  * {{{
  * {"metric":"total_warm_median","value":<sum of warm medians>,
  *  "unit":"sec","queries":{name: warm_median_sec, ...},
  *  "cold":{name: cold_sec, ...},"cold_total":N,
  *  "errors":{name: "Class: msg", ...},"reps":R,"sf":dir}
  * }}}
  *
  * Each query runs `SPARK_GRAFT_BENCH_REPS` times (default 3): the
  * first execution is recorded as `cold` (codegen + JIT + any
  * query-internal cache build), the median of the remaining runs as
  * the per-query number in `queries`. The headline `value` is the sum
  * of warm medians — single cold executions were shown to swing 2×
  * run-to-run on identical code (119.2 s vs 65.9 s across driver
  * rounds), so cold wall-time measures the box, not the engine.
  *
  * `spark.catalog.clearCache()` runs between queries (not between
  * reps) so no query inherits a predecessor's persisted blocks and no
  * stale MEMORY_AND_DISK block evicts a live cache mid-suite; within
  * a query, later reps legitimately reuse caches the query itself
  * builds — that is what "warm" means.
  *
  * Failures are never swallowed: a throwing rep records the elapsed
  * time to the crash and the error lands in `errors` (a crashing
  * query must not bench as ~0 s).
  */
object Bench {

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => "\\u%04x".format(c.toInt)
      case c => c.toString
    } + "\""

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    val n = s.length
    if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // events.ts is parquet TIMESTAMP(NANOS): read as BIGINT nanos
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
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
    val rows = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      spark.catalog.clearCache()
      var err: Option[String] = None
      val times = (0 until reps).map { _ =>
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch {
          case e: Throwable if err.isEmpty =>
            err = Some(e.getClass.getSimpleName + ": " +
              Option(e.getMessage).getOrElse("").linesIterator
                .take(1).mkString.take(200))
          case _: Throwable => ()
        }
        (System.nanoTime() - t0) / 1e9
      }
      val cold = times.head
      val warm = if (times.length > 1) median(times.tail) else cold
      (name, cold, warm, err)
    }
    def obj(entries: Seq[(String, String)]): String =
      entries.map { case (k, v) => jsonStr(k) + ":" + v }.mkString("{", ",", "}")
    val warmQ = obj(rows.map(r => r._1 -> r._3.toString))
    val coldQ = obj(rows.map(r => r._1 -> r._2.toString))
    val errQ = obj(rows.collect { case (n, _, _, Some(e)) => n -> jsonStr(e) })
    val warmTotal = rows.map(_._3).sum
    val coldTotal = rows.map(_._2).sum
    println(
      s"""{"metric":"total_warm_median","value":$warmTotal,"unit":"sec",""" +
      s""""queries":$warmQ,"cold":$coldQ,"cold_total":$coldTotal,""" +
      s""""errors":$errQ,"reps":$reps,"sf":${jsonStr(sfDir)}}""")
    spark.stop()
  }
}
