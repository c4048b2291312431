package graft.queries

import graft.SparkSpec

/** The SQL-TEXT surface (jh_summary_sql / jh_timeline_sql): each
  * statement must land on the exact rows of its programmatic sibling
  * (the driver gate hashes both against one oracle; this pins the
  * equality engine-side too), and — the catalog-hygiene contract — an
  * invocation must leave NO temp views behind and must never clobber a
  * user's same-named view: the entries register per-invocation
  * suffixed names and drop them once the statement is analyzed.
  */
class JobHistorySqlSpec extends SparkSpec {

  private def catalogViews(): Set[String] =
    spark.catalog.listTables().collect().map(_.name).toSet

  test("jh_timeline_sql equals the programmatic timeline, no view residue") {
    val before = catalogViews()
    val viaSql = JobHistoryOps.queries("jh_timeline_sql")(spark, "").collect()
    assert(catalogViews() === before, "SQL-text entry leaked temp views")
    val prog = JobHistoryOps.queries("jh_timeline")(spark, "").collect()
    assert(viaSql.map(_.toSeq.toVector).toSeq ===
      prog.map(_.toSeq.toVector).toSeq)
    assert(viaSql.nonEmpty)
  }

  test("jh_summary_sql equals the programmatic summary, user views survive") {
    // a user view under one of the BASE names must be untouched by the
    // SQL-text invocation (fixed-name registration would clobber it)
    import spark.implicits._
    Seq((1L, "mine")).toDF("id", "tag").createOrReplaceTempView("jh_job")
    try {
      val viaSql = JobHistoryOps.queries("jh_summary_sql")(spark, "").collect()
      val prog = JobHistoryOps.queries("jh_summary")(spark, "").collect()
      assert(viaSql.map(_.toSeq.toVector).toSeq ===
        prog.map(_.toSeq.toVector).toSeq)
      val mine = spark.table("jh_job").collect()
      assert(mine.map(_.toSeq.toVector).toSeq ===
        Seq(Vector(1L, "mine")), "the user's jh_job view was clobbered")
    } finally spark.catalog.dropTempView("jh_job")
  }
}
