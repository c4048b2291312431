package graft
import org.apache.spark.sql.SparkSession

/** Benchmark harness. Two JSON lines on stdout — a full detail line,
  * then a compact headline line LAST:
  *
  * {{{
  * {"metric":"total_warm_median","value":<sum>,"unit":"sec",
  *  "cold":{name: cold_sec, ...},"cold_total":N,
  *  "errors":{name: "Class: msg", ...},"reps":R,"sf":dir,
  *  "queries":{name: warm_median_sec, ...}}
  * {"metric":"total_warm_median","value":<sum>,"unit":"sec",
  *  "cold_total":N,"errors":{...},"reps":R,"sf":dir}
  * }}}
  *
  * The compact line is printed last because the driver keeps only a
  * fixed-size tail of stdout: the ~3 KB detail line alone got its head
  * (including the headline "value") truncated, losing the bench-gate
  * signal. The small final line always survives the tail capture.
  * Within the detail line the WARM `queries` dict comes last (cold
  * first): when the tail cuts into the detail line it takes its HEAD,
  * and warm medians are the numbers that measure the engine — round
  * 8's per-query analysis had to run on cold numbers because the warm
  * dict led the line and was truncated away.
  *
  * Each query runs `SPARK_GRAFT_BENCH_REPS` times (default 3): the
  * first execution is recorded as `cold` (codegen + JIT + any
  * query-internal cache build), the median of the remaining
  * *successful* runs as the per-query number in `queries`. The
  * headline `value` is the sum of warm medians — single cold
  * executions were shown to swing 2× run-to-run on identical code
  * (119.2 s vs 65.9 s across driver rounds), so cold wall-time
  * measures the box, not the engine.
  *
  * `spark.catalog.clearCache()` runs between queries (not between
  * reps) so no query inherits a predecessor's persisted blocks and no
  * stale MEMORY_AND_DISK block evicts a live cache mid-suite; within
  * a query, later reps legitimately reuse caches the query itself
  * builds — that is what "warm" means.
  *
  * Failures are never swallowed: the error lands in `errors`, and a
  * rep that threw is excluded from the warm median (a crashing query
  * must not deflate the headline by benching as ~0 s). A query whose
  * warm reps all failed is omitted from `queries` and the headline
  * sum entirely — and counted in `failed`, which both JSON lines
  * carry so a shrunken headline sum can never be mistaken for a
  * speedup by a consumer that only reads `value`.
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
      .config("spark.sql.session.timeZone", "UTC")
      // events.ts is parquet TIMESTAMP(NANOS): read as BIGINT nanos
      // (TIMESTAMP(MICROS) regenerations normalize in graft.Tables)
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

    // builder-side pre-flight only (the driver never sets it): restrict
    // the run to named queries when probing one operator's timing
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty[String])
    // noop sink: every projection executes (a count() would let
    // Catalyst prune map-only queries down to a parquet row count).
    val rows = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only(n) }
      .map { case (name, fn) =>
      spark.catalog.clearCache()
      var err: Option[String] = None
      // (elapsed_sec, succeeded) per rep; failed reps never enter the
      // warm median — a fast crash must not deflate the headline.
      val times = (0 until reps).map { _ =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch {
            case e: Throwable =>
              if (err.isEmpty)
                err = Some(e.getClass.getSimpleName + ": " +
                  Option(e.getMessage).getOrElse("").linesIterator
                    .take(1).mkString.take(200))
              false
          }
        ((System.nanoTime() - t0) / 1e9, ok)
      }
      val cold = times.head._1
      val warmOk = times.tail.collect { case (t, true) => t }
      val warm: Option[Double] =
        if (warmOk.nonEmpty) Some(median(warmOk))
        else if (times.length == 1 && times.head._2) Some(cold)
        else None
      (name, cold, warm, err)
    }
    def obj(entries: Seq[(String, String)]): String =
      entries.map { case (k, v) => jsonStr(k) + ":" + v }.mkString("{", ",", "}")
    val warmQ = obj(rows.collect { case (n, _, Some(w), _) => n -> w.toString })
    val coldQ = obj(rows.map(r => r._1 -> r._2.toString))
    val errQ = obj(rows.collect { case (n, _, _, Some(e)) => n -> jsonStr(e) })
    val warmTotal = rows.flatMap(_._3).sum
    val coldTotal = rows.map(_._2).sum
    // Queries contributing nothing to the headline sum: their absence
    // would otherwise read as a speedup in cross-round comparisons.
    val failed = rows.count(_._3.isEmpty)
    val headline =
      s"""{"metric":"total_warm_median","value":$warmTotal,"unit":"sec",""" +
      s""""cold_total":$coldTotal,"failed":$failed,"errors":$errQ,""" +
      s""""reps":$reps,"sf":${jsonStr(sfDir)}}"""
    // Detail first, compact headline LAST: the driver stores a
    // fixed-size stdout tail, so only a small final line is guaranteed
    // to reach its parser intact (BENCH_r05 recorded parsed:null when
    // the single 3 KB line's head was cut).
    println(
      s"""{"metric":"total_warm_median","value":$warmTotal,"unit":"sec",""" +
      s""""cold":$coldQ,"cold_total":$coldTotal,""" +
      s""""failed":$failed,"errors":$errQ,"reps":$reps,"sf":${jsonStr(sfDir)},""" +
      s""""queries":$warmQ}""")
    println(headline)
    spark.stop()
  }
}
