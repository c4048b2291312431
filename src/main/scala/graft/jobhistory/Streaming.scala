package graft.jobhistory

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming variants of the analysis (SURVEY §2.9): the
  * reference's single-pass fold is already streaming-shaped, so the
  * same parse + entity-state logic runs over `readStream` unchanged.
  *
  *  - Parsing reuses [[JobHistoryReader.parse]] verbatim — columnar
  *    expressions work identically on streaming DataFrames. A live
  *    deployment reads `spark.readStream.option("lineSep", " .\n")
  *    .text(logDir)`; record ordering (which last-write-wins depends
  *    on) comes from an explicit `line_no` column the source must
  *    provide (file offset / Kafka offset) — streaming has no implicit
  *    file order to lean on, so the contract is explicit here.
  *  - Entity state (A1/A3) is keyed state per task id via
  *    `flatMapGroupsWithState` in Update mode: a previously-final
  *    attempt can be superseded by a later SUCCESS (retraction —
  *    downstream consumers see the updated row, SURVEY §7.4).
  *  - The timeline becomes a windowed aggregation with a watermark on
  *    the slot time; late FINISH records update their slots (Update
  *    mode).
  */
object Streaming {

  /** One parsed record on the stream. */
  case class Rec(line_no: Long, event: String, attrs: Map[String, String])

  /** Merged task entity state: per-key last-write-wins attribute map +
    * attempt bookkeeping (NUM_ATTEMPTS, final attempt id). */
  case class TaskState(
      task_id: String,
      task_type: String,
      attrs: Map[String, String],
      num_attempts: Long,
      attempt_ids: Set[String],
      final_attempt: Option[String],
      max_line: Long)

  /** Parse a stream of (line_no, record) rows — batch and streaming
    * DataFrames take the identical plan. */
  def parseRecords(records: DataFrame): Dataset[Rec] = {
    val spark = records.sparkSession
    import spark.implicits._
    JobHistoryReader.parse(records).as[Rec]
  }

  /** A1 + A2 + A3 as keyed streaming state: one state row per task,
    * updated per micro-batch, emitted on change (Update mode).
    * Within a batch records apply in `line_no` order; across batches
    * the source's monotone offsets preserve the log order. */
  def taskStates(events: Dataset[Rec]): Dataset[TaskState] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .filter(r => r.event == "Task" || r.event == "MapAttempt" ||
        r.event == "ReduceAttempt")
      // P6: SETUP/CLEANUP map attempts never reach the entity state
      .filter(r => !(r.event == "MapAttempt" &&
        Set("SETUP", "CLEANUP").contains(r.attrs.getOrElse("TASK_TYPE", ""))))
      .groupByKey(_.attrs.getOrElse("TASKID", ""))
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[Rec], state: GroupState[TaskState]) =>
          val init = state.getOption.getOrElse(
            TaskState(key, "", Map.empty, 0L, Set.empty, None, -1L))
          val merged = rows.toSeq.sortBy(_.line_no).foldLeft(init) { (st, r) =>
            r.event match {
              case "Task" =>
                st.copy(
                  task_type = r.attrs.getOrElse("TASK_TYPE", st.task_type),
                  attrs = st.attrs ++ r.attrs,
                  max_line = math.max(st.max_line, r.line_no))
              case _ if !r.attrs.contains("TASK_ATTEMPT_ID") =>
                // batch countDistinct ignores NULL ids; mirror that
                st.copy(max_line = math.max(st.max_line, r.line_no))
              case _ =>
                val id = r.attrs("TASK_ATTEMPT_ID")
                val isFinish = !r.attrs.contains("START_TIME") &&
                  r.attrs.contains("FINISH_TIME")
                val newFinal =
                  if (isFinish && r.attrs.get("TASK_STATUS").contains("SUCCESS"))
                    Some(id)
                  else st.final_attempt
                st.copy(
                  attempt_ids = st.attempt_ids + id,
                  num_attempts = (st.attempt_ids + id).size.toLong,
                  final_attempt = newFinal,
                  max_line = math.max(st.max_line, r.line_no))
            }
          }
          if (merged != init) { state.update(merged); Iterator.single(merged) }
          else Iterator.empty
      }
  }

  /** The `-m` report as a live view: each state update re-emits the
    * task's current detail row (Update mode) — the final snapshot per
    * task equals the batch [[Reports.mapDetails]]. */
  def mapDetailsStream(events: Dataset[Rec], scale: Long = 1000L): DataFrame =
    taskStates(events)
      .filter(col("task_type") === "MAP")
      .select(
        col("task_id"),
        expr(s"CAST(attrs['START_TIME'] AS BIGINT) DIV $scale").as("start_time"),
        expr(s"CAST(attrs['FINISH_TIME'] AS BIGINT) DIV $scale").as("end_time"),
        ((col("attrs").getItem("FINISH_TIME").cast("long") -
          col("attrs").getItem("START_TIME").cast("long")) / scale)
          .cast("long").as("elapsed"),
        col("num_attempts"),
        col("max_line"))

  /** Streaming exact dedup (the t2 operator on a stream): first
    * occurrence of each content digest survives; duplicates arriving
    * within the watermark are dropped, state for old digests is
    * reclaimed past it. */
  def dedupStream(docs: DataFrame, watermarkDelay: String = "1 hour"): DataFrame =
    docs
      .withColumn("digest", md5(col("text")))
      .withWatermark("event_ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("digest")

  /** T1-T4 streaming: phase-classified slot events → windowed counts
    * with a watermark (slots arrive as attempts finish; late finishes
    * update their slots). `slots` carries (phase, slot_ts). */
  def slotCounts(slots: DataFrame, watermarkDelay: String = "1 hour"): DataFrame =
    slots
      .withWatermark("slot_ts", watermarkDelay)
      .groupBy(window(col("slot_ts"), "1 second"), col("phase"))
      .count()
      .select(
        col("window.start").cast("long").as("time"),
        col("phase"), col("count"))
}
