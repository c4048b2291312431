package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RelationalSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("q16: HLL estimate within 10% of exact, and exact counts right") {
    val truth = spark.read.parquet(s"$dir/events.parquet")
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact_users"))
      .collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("exact_users"))
      .toMap
    val rows = Relational.q16ApproxDistinct(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val et = r.getAs[String]("event_type")
      assert(r.getAs[Long]("n_users") === truth(et), s"$et exact mismatch")
      assert(r.getAs[Boolean]("hll_ok"), s"$et: HLL estimate off by >10%")
    }
  }

  test("URL source (S2): file:// URL reads identically to the file scan") {
    val viaUrl = graft.jobhistory.JobHistoryReader.readUrl(spark,
      "file://" + java.nio.file.Paths.get(
        graft.jobhistory.Fixtures.pig).toAbsolutePath)
    val viaFile = graft.jobhistory.JobHistoryReader.read(spark,
      graft.jobhistory.Fixtures.pig)
    assert(viaUrl.count() === viaFile.count())
    // line_no is an ordering key, not a dense index (byte offsets on
    // the file path, sequence on the in-memory path): compare parsed
    // content in record order, not the key values
    assert(viaUrl.orderBy("line_no").drop("line_no")
      .collect().map(_.toSeq).toSeq ===
      viaFile.orderBy("line_no").drop("line_no")
        .collect().map(_.toSeq).toSeq)
  }

  test("CSV sink (S5): delimited write round-trips the map details report") {
    val v = graft.jobhistory.JobHistoryViews.fromFile(spark,
      graft.jobhistory.Fixtures.pig)
    val df = graft.jobhistory.Reports.mapDetails(v)
    val out = "target/csv_sink_test"
    graft.jobhistory.Reports.writeCsv(df.coalesce(1), out, "|")
    val back = spark.read.option("sep", "|").option("header", "true")
      .option("inferSchema", "true").csv(out)
    assert(back.count() === 512L)
    assert(back.columns.toSeq === df.columns.toSeq)
  }

  test("q24: unpivot is the exact inverse of re-pivoting its output") {
    val long = Relational.q24Unpivot(spark, dir)
    val wide = long.groupBy("l_returnflag")
      .pivot("metric", Seq("sum_qty", "sum_price", "sum_disc"))
      .agg(first(col("v")))
    val direct = spark.read.parquet(s"$dir/lineitem.parquet")
      .groupBy(col("l_returnflag"))
      .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_price"),
        round(sum(col("l_discount")), 2).as("sum_disc"))
    assert(wide.select("l_returnflag", "sum_qty", "sum_price", "sum_disc")
      .except(direct).count() === 0)
    assert(long.count() === direct.count() * 3)
  }

  test("q28: sketch lands inside its rank bound and exact ranks match a driver check") {
    val rows = Relational.q28ApproxPercentiles(spark, dir).collect()
    assert(rows.nonEmpty)
    // per-group driver-side recomputation of the discrete percentiles
    val byType = spark.read.parquet(s"$dir/events.parquet")
      .select(col("event_type"), col("value")).collect()
      .groupBy(_.getAs[String]("event_type"))
      .view.mapValues(_.map(_.getAs[Double]("value")).sorted).toMap
    rows.foreach { r =>
      val vs = byType(r.getAs[String]("event_type"))
      assert(r.getAs[Long]("n") === vs.length.toLong)
      def at(q: Double) = vs(math.ceil(q * vs.length).toInt - 1)
      assert(r.getAs[Double]("p50") === at(0.5))
      assert(r.getAs[Double]("p90") === at(0.9))
      assert(r.getAs[Double]("p50") <= r.getAs[Double]("p90"))
      assert(r.getAs[Boolean]("apx_ok"),
        s"${r.getAs[String]("event_type")}: sketch outside its rank bound")
    }
  }

  test("q27: only the two requested sets appear, each a complete marginal") {
    val rows = Relational.q27GroupingSets(spark, dir).collect()
    val total = spark.read.parquet(s"$dir/lineitem.parquet").count()
    // exactly the requested sets — no pair level (gid 0), no grand
    // total (gid 3); each marginal partitions the full table
    assert(rows.map(_.getAs[Long]("gid")).toSet === Set(1L, 2L))
    Seq(1L, 2L).foreach { g =>
      assert(rows.filter(_.getAs[Long]("gid") == g)
        .map(_.getAs[Long]("n")).sum === total)
    }
    // the gid-1 set (l_linestatus aggregated away) matches a direct
    // groupBy on l_returnflag
    val direct = spark.read.parquet(s"$dir/lineitem.parquet")
      .groupBy(col("l_returnflag")).count().collect()
      .map(r => r.getAs[String]("l_returnflag") -> r.getAs[Long]("count"))
      .toMap
    rows.filter(_.getAs[Long]("gid") == 1L).foreach { r =>
      assert(r.getAs[String]("lstatus") === "ALL")
      assert(r.getAs[Long]("n") === direct(r.getAs[String]("rflag")))
    }
  }

  test("q23: cube marginals are consistent across grouping sets") {
    val rows = Relational.q23Cube(spark, dir).collect()
    def level(gid: Long) = rows.filter(_.getAs[Long]("gid") == gid)
    val leaves = level(0)
    // one scan, four grouping sets: every marginal re-aggregates the leaves
    val total = level(3)
    assert(total.length === 1)
    assert(total.head.getAs[Long]("n") === leaves.map(_.getAs[Long]("n")).sum)
    // gid bit semantics: bit set = column aggregated away ('ALL')
    rows.foreach { r =>
      val gid = r.getAs[Long]("gid")
      assert((r.getAs[String]("status") == "ALL") === ((gid & 2L) != 0))
      assert((r.getAs[String]("priority") == "ALL") === ((gid & 1L) != 0))
    }
    // status marginal (priority aggregated, gid=1) matches leaf sums
    level(1).foreach { m =>
      val n = leaves.filter(_.getAs[String]("status") ==
        m.getAs[String]("status")).map(_.getAs[Long]("n")).sum
      assert(m.getAs[Long]("n") === n)
    }
  }

  test("q33 SQL-text surface equals the DataFrame refresh; view hygiene (no clobber, no leak)") {
    // t34_sql's contract on the relational maintenance family: a
    // user's same-named view survives the statement and the catalog
    // holds nothing new afterwards
    spark.sql("CREATE OR REPLACE TEMP VIEW q33_events AS SELECT 7 AS x")
    val before = spark.catalog.listTables().collect().map(_.name).toSet
    val viaSql = Relational.q33IncrementalAggSql(spark, dir).collect()
      .map(_.toSeq.toVector).toSeq
    val viaDf = Relational.q33IncrementalAgg(spark, dir).collect()
      .map(_.toSeq.toVector).toSeq
    assert(viaSql === viaDf,
      "the SQL-text refresh must land on the identical aggregate")
    assert(spark.catalog.listTables().collect().map(_.name).toSet ===
      before, "the text path must drop its serial-suffixed views")
    assert(spark.sql("SELECT x FROM q33_events").head().getInt(0) === 7,
      "a same-named user view must never be clobbered")
    spark.catalog.dropTempView("q33_events")
    ()
  }

  test("q37 SQL-text surface equals the DataFrame compacted serve; view hygiene") {
    spark.sql("CREATE OR REPLACE TEMP VIEW q37_partials AS SELECT 7 AS x")
    val before = spark.catalog.listTables().collect().map(_.name).toSet
    val viaSql = Relational.q37PartialsCompactSql(spark, dir).collect()
      .map(_.toSeq.toVector).toSeq
    val viaDf = Relational.q37PartialsCompact(spark, dir).collect()
      .map(_.toSeq.toVector).toSeq
    assert(viaSql === viaDf,
      "the SQL-text serve must land on the identical aggregate")
    assert(spark.catalog.listTables().collect().map(_.name).toSet ===
      before, "the text path must drop its serial-suffixed views")
    assert(spark.sql("SELECT x FROM q37_partials").head().getInt(0) === 7,
      "a same-named user view must never be clobbered")
    spark.catalog.dropTempView("q37_partials")
    ()
  }
}
