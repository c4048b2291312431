package graft.jobhistory

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Unit tests for record framing + attr/counter parsing (SURVEY §2.2
  * P1-P4) and the documented reference divergences (§2.10).
  */
class ParserSpec extends SparkSpec {

  test("P3: attrs parsed with escaping preserved verbatim") {
    val df = JobHistoryReader.readString(spark,
      "Job JOBID=\"job_1\" JOBNAME=\"datasize\\=100000,k\\=20\" USER=\"u\" .\n")
    val attrs = df.collect().head.getAs[Map[String, String]]("attrs")
    assert(attrs === Map(
      "JOBID" -> "job_1",
      "JOBNAME" -> """datasize\=100000,k\=20""",
      "USER" -> "u"))
  }

  test("P1: multi-line ERROR values fold into one record") {
    val log =
      "Task TASKID=\"t_1\" TASK_TYPE=\"MAP\" START_TIME=\"1000\" .\n" +
        "MapAttempt TASK_TYPE=\"MAP\" TASKID=\"t_1\" TASK_ATTEMPT_ID=\"a_1\" " +
        "TASK_STATUS=\"FAILED\" FINISH_TIME=\"5000\" " +
        "ERROR=\"java.lang.OutOfMemoryError: Java heap space\n" +
        "\tat java.util.Arrays.copyOf(Arrays.java:2786)\n" +
        "\tat Example.run(Example.java:1)\n\" .\n"
    val df = JobHistoryReader.readString(spark, log)
    assert(df.count() === 2)
    val attrs = df.filter(col("event") === "MapAttempt")
      .collect().head.getAs[Map[String, String]]("attrs")
    assert(attrs("TASK_STATUS") === "FAILED")
    assert(attrs("ERROR").contains("\n\tat java.util.Arrays.copyOf"))
    assert(attrs("FINISH_TIME") === "5000")
  }

  test("P1 on fixture: 3672 physical lines fold to 3620 records") {
    val v = JobHistoryViews.fromFile(spark, Fixtures.pig)
    assert(v.events.count() === 3620L)
    // the folded records are the FAILED attempts with stack traces
    val withNewline = v.events
      .filter(col("attrs").getItem("ERROR").contains("\n"))
    assert(withNewline.count() > 0)
  }

  test("P4: nested COUNTERS parse to Map[group, Map[counter, Long]]") {
    import spark.implicits._
    val c = "{(org.apache.hadoop.mapred.JobInProgress$Counter)" +
      "(Job Counters )[(TOTAL_LAUNCHED_REDUCES)(Launched reduce tasks)(332)]}" +
      "{(FileSystemCounters)(FileSystemCounters)" +
      "[(HDFS_BYTES_READ)(HDFS_BYTES_READ)(12345)]" +
      "[(HDFS_BYTES_WRITTEN)(HDFS_BYTES_WRITTEN)(1449879840)]}"
    val parsed = Seq(c).toDF("cs")
      .select(JobHistoryReader.parseCounters("cs").as("m"))
      .collect().head.getAs[Map[String, Map[String, Long]]]("m")
    assert(parsed("Job Counters ")("Launched reduce tasks") === 332L)
    assert(parsed("FileSystemCounters")("HDFS_BYTES_WRITTEN") === 1449879840L)
    assert(parsed("FileSystemCounters")("HDFS_BYTES_READ") === 12345L)
  }

  test("A9 on fixture: reduceBytes extracts HDFS_BYTES_WRITTEN per reduce task") {
    val v = JobHistoryViews.fromFile(spark, Fixtures.pig)
    val rows = v.reduceBytes.collect()
    assert(rows.length === 320)
    assert(rows.forall(_.getAs[Long]("reduce_output_bytes") > 0L))
  }

  test("P4: duplicate group/counter display names resolve last-wins") {
    import spark.implicits._
    val c = "{(k1)(Grp)[(A)(Name)(1)][(B)(Name)(2)]}" +
      "{(k2)(Grp)[(C)(Other)(3)]}"
    val parsed = Seq(c).toDF("cs")
      .select(JobHistoryReader.parseCounters("cs").as("m"))
      .collect().head.getAs[Map[String, Map[String, Long]]]("m")
    // second "Grp" group wins; within a group the later "Name" wins
    assert(parsed("Grp") === Map("Other" -> 3L))
  }

  test("duplicate keys within one record resolve last-wins") {
    val df = JobHistoryReader.readString(spark,
      "Job JOBID=\"first\" JOBID=\"second\" .\n")
    val attrs = df.collect().head.getAs[Map[String, String]]("attrs")
    assert(attrs("JOBID") === "second")
  }
}
