package graft.jobhistory

import java.nio.file.{Files, Paths, StandardCopyOption}

import graft.SparkSpec

/** Fleet-shape analysis: both fixture logs in one directory, one scan,
  * per-job results matching the single-log runs.
  */
class MultiLogSpec extends SparkSpec {

  private lazy val dir: String = {
    val d = Paths.get("target", "multilog")
    Files.createDirectories(d)
    Files.copy(Paths.get(Fixtures.pig), d.resolve("pig.txt"),
      StandardCopyOption.REPLACE_EXISTING)
    Files.copy(Paths.get(Fixtures.ec2), d.resolve("ec2.txt"),
      StandardCopyOption.REPLACE_EXISTING)
    d.toString
  }

  test("summaryPerJob over a 2-log directory matches the single-log summaries") {
    val v = JobHistoryViews.fromFile(spark, dir)
    val rows = Reports.summaryPerJob(v).collect()
    assert(rows.length === 2)
    val byJob = rows.map(r => r.getAs[String]("job_id") -> r).toMap

    val pig = byJob("job_201010291643_0125")
    assert(pig.getAs[Long]("num_maps") === 512L)
    assert(pig.getAs[Long]("num_reduces") === 320L)
    assert(pig.getAs[Double]("avg_map_time") === 9450.6328125)
    assert(pig.getAs[String]("user") === "kbhatia")

    val ec2 = byJob("job_201012162033_0001")
    assert(ec2.getAs[Long]("num_maps") === 1024L)
    assert(ec2.getAs[Long]("num_reduces") === 144L)
    assert(ec2.getAs[String]("job_status") === "SUCCESS")
  }

  test("readStream on a log directory frames records identically to batch") {
    import org.apache.spark.sql.functions._
    val batchCount = spark.read.option("lineSep", JobHistoryReader.RecordSep)
      .text(dir).filter(length(col("value")) > 0).count()
    val streamed = spark.readStream
      .option("lineSep", JobHistoryReader.RecordSep)
      .text(dir)
      .filter(length(col("value")) > 0)
    val q = streamed.writeStream.format("memory").queryName("tailcount")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      q.awaitTermination(60000)
      assert(spark.table("tailcount").count() === batchCount)
    } finally q.stop()
  }

  test("timelinePerJob slices equal the single-log timelines") {
    import org.apache.spark.sql.functions._
    val v = JobHistoryViews.fromFile(spark, dir)
    val fleet = Reports.timelinePerJob(v).collect()
      .groupBy(_.getAs[String]("job_id"))
    for ((fixture, job) <- Seq(
      Fixtures.pig -> "job_201010291643_0125",
      Fixtures.ec2 -> "job_201012162033_0001")) {
      val single = Reports.timeline(JobHistoryViews.fromFile(spark, fixture))
        .collect().map(_.toSeq)
      val slice = fleet(job).sortBy(_.getAs[Long]("time"))
        .map(_.toSeq.drop(1)) // drop job_id
      assert(slice.toSeq === single.toSeq, job)
    }
  }

  test("fleet sweep-line timeline is identical to fleet interval expansion") {
    val v = JobHistoryViews.fromFile(spark, dir)
    val a = Reports.timelinePerJob(v).collect().map(_.toSeq)
    val b = Reports.timelinePerJobSweepLine(v).collect().map(_.toSeq)
    assert(b.toSeq === a.toSeq)
  }

  test("task-level reports are already fleet-safe (globally unique task ids)") {
    val v = JobHistoryViews.fromFile(spark, dir)
    val all = Reports.mapDetails(v)
    assert(all.count() === 512L + 1024L)
    // per-job slice matches the single-log golden run
    val pigOnly = all.filter(
      Reports.jobIdOf(org.apache.spark.sql.functions.col("task_id")) ===
        "job_201010291643_0125")
    val single = Reports.mapDetails(JobHistoryViews.fromFile(spark, Fixtures.pig))
    assert(pigOnly.collect().map(_.toSeq).toSeq ===
      single.collect().map(_.toSeq).toSeq)
  }
}
