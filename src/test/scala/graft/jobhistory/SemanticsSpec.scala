package graft.jobhistory

import graft.SparkSpec

/** Pinned canonical semantics for the reference's documented
  * divergences (SURVEY §2.10) and the ordered-merge operators
  * (A1/A3, §7.4), on synthetic logs.
  */
class SemanticsSpec extends SparkSpec {

  private def views(records: String*): JobHistoryViews =
    new JobHistoryViews(spark,
      JobHistoryReader.readString(spark, records.map(_ + " .\n").mkString))

  private val header = Seq(
    """Job JOBID="j" SUBMIT_TIME="10000"""",
    """Job JOBID="j" LAUNCH_TIME="11000" JOB_STATUS="PREP"""")
  private val footer =
    """Job JOBID="j" JOB_STATUS="SUCCESS" FINISH_TIME="20000""""

  private def timelineMap(v: JobHistoryViews): Map[Long, Seq[Long]] =
    Reports.timeline(v).collect()
      .map(r => r.getLong(0) -> (1 to 5).map(r.getLong(_)).toSeq).toMap

  test("A3: superseded SUCCESS attempt becomes waste; last SUCCESS is final") {
    val v = views(header ++ Seq(
      """Task TASKID="t1" TASK_TYPE="MAP" START_TIME="12000"""",
      """MapAttempt TASK_TYPE="MAP" TASKID="t1" TASK_ATTEMPT_ID="a1" START_TIME="12000"""",
      """MapAttempt TASK_TYPE="MAP" TASKID="t1" TASK_ATTEMPT_ID="a1" TASK_STATUS="SUCCESS" FINISH_TIME="15000"""",
      """MapAttempt TASK_TYPE="MAP" TASKID="t1" TASK_ATTEMPT_ID="a2" START_TIME="13000"""",
      """MapAttempt TASK_TYPE="MAP" TASKID="t1" TASK_ATTEMPT_ID="a2" TASK_STATUS="SUCCESS" FINISH_TIME="16000"""",
      """Task TASKID="t1" TASK_TYPE="MAP" TASK_STATUS="SUCCESS" FINISH_TIME="16000"""") :+ footer: _*)
    val finals = v.finalAttempts.collect()
    assert(finals.length === 1)
    assert(finals.head.getAs[String]("attempt_id") === "a2")
    val tl = timelineMap(v)
    // a2 (final): maps over t=3..6; a1 (superseded): waste over t=2..5
    assert((3L to 6L).forall(t => tl(t)(0) === 1L), "maps series")
    assert((2L to 5L).forall(t => tl(t)(4) === 1L), "waste series")
    assert(tl(0)(0) === 0L && tl(7)(4) === 0L)
  }

  test("timeline clamp: attempt starting before submit counts from t=0 (CGI canonical)") {
    val v = views(header ++ Seq(
      """Task TASKID="t1" TASK_TYPE="MAP" START_TIME="5000"""",
      """MapAttempt TASK_TYPE="MAP" TASKID="t1" TASK_ATTEMPT_ID="a1" START_TIME="5000"""",
      """MapAttempt TASK_TYPE="MAP" TASKID="t1" TASK_ATTEMPT_ID="a1" TASK_STATUS="SUCCESS" FINISH_TIME="15000"""",
      """Task TASKID="t1" TASK_TYPE="MAP" TASK_STATUS="SUCCESS" FINISH_TIME="15000"""") :+ footer: _*)
    val tl = timelineMap(v)
    assert((0L to 5L).forall(t => tl(t)(0) === 1L))
    assert(tl(6)(0) === 0L)
  }

  test("timeline cap: attempt finishing after job finish is truncated at finish") {
    val v = views(header ++ Seq(
      """Task TASKID="t1" TASK_TYPE="MAP" START_TIME="12000"""",
      """MapAttempt TASK_TYPE="MAP" TASKID="t1" TASK_ATTEMPT_ID="a1" START_TIME="18000"""",
      """MapAttempt TASK_TYPE="MAP" TASKID="t1" TASK_ATTEMPT_ID="a1" TASK_STATUS="SUCCESS" FINISH_TIME="25000"""",
      """Task TASKID="t1" TASK_TYPE="MAP" TASK_STATUS="SUCCESS" FINISH_TIME="25000"""") :+ footer: _*)
    val tl = timelineMap(v)
    assert(tl.keySet.max === 10L) // spine still 0..(finish-submit)
    assert((8L to 10L).forall(t => tl(t)(0) === 1L))
  }

  test("P6: SETUP/CLEANUP map attempts are ignored entirely") {
    val v = views(header ++ Seq(
      """MapAttempt TASK_TYPE="SETUP" TASKID="ts" TASK_ATTEMPT_ID="s1" START_TIME="10500"""",
      """MapAttempt TASK_TYPE="SETUP" TASKID="ts" TASK_ATTEMPT_ID="s1" TASK_STATUS="SUCCESS" FINISH_TIME="11000"""",
      """Task TASKID="t1" TASK_TYPE="MAP" START_TIME="12000"""",
      """MapAttempt TASK_TYPE="MAP" TASKID="t1" TASK_ATTEMPT_ID="a1" START_TIME="12000"""",
      """MapAttempt TASK_TYPE="MAP" TASKID="t1" TASK_ATTEMPT_ID="a1" TASK_STATUS="SUCCESS" FINISH_TIME="15000"""",
      """Task TASKID="t1" TASK_TYPE="MAP" TASK_STATUS="SUCCESS" FINISH_TIME="15000"""") :+ footer: _*)
    assert(Reports.mapDetails(v).count() === 1L) // no "ts" row
    assert(v.finalAttempts.collect().map(_.getString(1)).toSet === Set("a1"))
  }

  test("P7: START_TIME scaling to zero means the attempt never starts") {
    val v = views(header ++ Seq(
      """Task TASKID="t1" TASK_TYPE="MAP" START_TIME="12000"""",
      """MapAttempt TASK_TYPE="MAP" TASKID="t1" TASK_ATTEMPT_ID="a1" START_TIME="0"""",
      """MapAttempt TASK_TYPE="MAP" TASKID="t1" TASK_ATTEMPT_ID="a1" TASK_STATUS="SUCCESS" FINISH_TIME="15000"""",
      """Task TASKID="t1" TASK_TYPE="MAP" TASK_STATUS="SUCCESS" FINISH_TIME="15000"""") :+ footer: _*)
    // finish record exists but no valid start → excluded from timeline
    val tl = timelineMap(v)
    assert(tl.values.forall(_.forall(_ === 0L)))
    // but the attempt still counts toward NUM_ATTEMPTS (A2)
    val row = Reports.mapDetails(v).collect().head
    assert(row.getAs[Long]("num_attempts") === 1L)
  }

  test("MapAttempt records without TASK_TYPE are kept (null != SETUP, reference parity)") {
    val v = views(header ++ Seq(
      """Task TASKID="t1" TASK_TYPE="MAP" START_TIME="12000"""",
      """MapAttempt TASKID="t1" TASK_ATTEMPT_ID="a1" START_TIME="12000"""",
      """MapAttempt TASKID="t1" TASK_ATTEMPT_ID="a1" TASK_STATUS="SUCCESS" FINISH_TIME="15000"""",
      """Task TASKID="t1" TASK_TYPE="MAP" TASK_STATUS="SUCCESS" FINISH_TIME="15000"""") :+ footer: _*)
    val row = Reports.mapDetails(v).collect().head
    assert(row.getAs[Long]("num_attempts") === 1L)
    assert(v.finalAttempts.collect().map(_.getString(1)).toSet === Set("a1"))
    val tl = timelineMap(v)
    assert((2L to 5L).forall(t => tl(t)(0) === 1L), "maps series")
  }

  test("final reduce lacking SHUFFLE/SORT_FINISHED is dropped from phase series, not corrupted") {
    val v = views(header ++ Seq(
      """Task TASKID="r1" TASK_TYPE="REDUCE" START_TIME="12000"""",
      """ReduceAttempt TASK_TYPE="REDUCE" TASKID="r1" TASK_ATTEMPT_ID="ra1" START_TIME="12000"""",
      """ReduceAttempt TASK_TYPE="REDUCE" TASKID="r1" TASK_ATTEMPT_ID="ra1" TASK_STATUS="SUCCESS" FINISH_TIME="18000"""",
      """Task TASKID="r1" TASK_TYPE="REDUCE" TASK_STATUS="SUCCESS" FINISH_TIME="18000"""") :+ footer: _*)
    val tl = timelineMap(v)
    // no [start, job_finish] shuffle blowup and no [0, ...] merge rows
    assert(tl.values.forall(_.forall(_ === 0L)))
  }

  test("inverted job bounds (finish < submit) yield an empty timeline, not a descending spine") {
    val v = views(
      """Job JOBID="j" SUBMIT_TIME="20000"""",
      """Job JOBID="j" JOB_STATUS="SUCCESS" FINISH_TIME="10000"""")
    assert(Reports.timeline(v).count() === 0L)
    assert(Reports.timelineSweepLine(v).count() === 0L)
  }

  test("A1: later Task records overwrite earlier attribute values") {
    val v = views(header ++ Seq(
      """Task TASKID="t1" TASK_TYPE="MAP" START_TIME="12000"""",
      """Task TASKID="t1" TASK_TYPE="MAP" START_TIME="13000"""",
      """Task TASKID="t1" TASK_TYPE="MAP" TASK_STATUS="SUCCESS" FINISH_TIME="15000"""") :+ footer: _*)
    val row = Reports.mapDetails(v).collect().head
    assert(row.getAs[Long]("start_time") === 13L)
    assert(row.getAs[Long]("elapsed") === 2L)
  }

  test("reduce phases split at shuffle/sort boundaries (T3)") {
    val v = views(header ++ Seq(
      """Task TASKID="r1" TASK_TYPE="REDUCE" START_TIME="12000"""",
      """ReduceAttempt TASK_TYPE="REDUCE" TASKID="r1" TASK_ATTEMPT_ID="ra1" START_TIME="12000"""",
      """ReduceAttempt TASK_TYPE="REDUCE" TASKID="r1" TASK_ATTEMPT_ID="ra1" TASK_STATUS="SUCCESS" """ +
        """SHUFFLE_FINISHED="14000" SORT_FINISHED="16000" FINISH_TIME="18000"""",
      """Task TASKID="r1" TASK_TYPE="REDUCE" TASK_STATUS="SUCCESS" FINISH_TIME="18000"""") :+ footer: _*)
    val tl = timelineMap(v)
    assert((2L to 4L).forall(t => tl(t)(1) === 1L), "shuffle 2..4")
    assert((4L to 6L).forall(t => tl(t)(2) === 1L), "merge 4..6")
    assert((6L to 8L).forall(t => tl(t)(3) === 1L), "reduce 6..8")
    assert(tl(5)(1) === 0L && tl(9)(3) === 0L)
  }

  test("failed reduce attempt contributes its whole interval to waste") {
    val v = views(header ++ Seq(
      """Task TASKID="r1" TASK_TYPE="REDUCE" START_TIME="12000"""",
      """ReduceAttempt TASK_TYPE="REDUCE" TASKID="r1" TASK_ATTEMPT_ID="ra1" START_TIME="12000"""",
      """ReduceAttempt TASK_TYPE="REDUCE" TASKID="r1" TASK_ATTEMPT_ID="ra1" TASK_STATUS="FAILED" FINISH_TIME="15000"""",
      """ReduceAttempt TASK_TYPE="REDUCE" TASKID="r1" TASK_ATTEMPT_ID="ra2" START_TIME="15000"""",
      """ReduceAttempt TASK_TYPE="REDUCE" TASKID="r1" TASK_ATTEMPT_ID="ra2" TASK_STATUS="SUCCESS" """ +
        """SHUFFLE_FINISHED="16000" SORT_FINISHED="17000" FINISH_TIME="18000"""",
      """Task TASKID="r1" TASK_TYPE="REDUCE" TASK_STATUS="SUCCESS" FINISH_TIME="18000"""") :+ footer: _*)
    val tl = timelineMap(v)
    assert((2L to 5L).forall(t => tl(t)(4) === 1L), "waste 2..5")
    assert((5L to 6L).forall(t => tl(t)(1) === 1L), "shuffle 5..6")
  }
}
