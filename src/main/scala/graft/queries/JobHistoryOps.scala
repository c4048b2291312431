package graft.queries

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.jobhistory.{JobHistoryViews, Reports}

/** Driver-gate entries for the job-history engine (SURVEY §2/§3), run
  * against the reference's Pig kmerStats fixture log. The `sfDir`
  * argument is ignored — these operators consume the JobHistory text
  * format, not the synthetic star schema.
  *
  * Oracles: DuckDB re-derives the reports directly from the raw log via
  * `read_text` + regexes, with `arg_max(value, record_ordinal)`
  * reproducing the last-write-wins merge — an independent second
  * implementation, complementing the byte-for-byte golden-file tests in
  * GoldenSpec (vis/grap/map.d, reduce.d, README scalars). summary and
  * the timelines are covered by goldens + the sweep-line equivalence
  * spec instead of SQL (fractional averages / interval expansion don't
  * hash stably across engines).
  */
object JobHistoryOps {

  private val FixtureSrc =
    "/root/reference/test/cvrsvc11-ib_1288370608574_job_201010291643_0125_kbhatia_PigLatin%3AkmerStats.pig.txt"
  private val FixturePath = "/root/repo/target/pig_fixture.txt"

  private def fixture(): String = synchronized {
    val p = Paths.get(FixturePath)
    if (!Files.exists(p)) {
      Files.createDirectories(p.getParent)
      Files.copy(Paths.get(FixtureSrc), p)
    }
    FixturePath
  }

  /** One parsed+cached event view per session — the reference reads its
    * input once and serves every report from it; so do we. Weak keys:
    * a retired session's views (and cached events) become collectable
    * instead of pinning memory for the JVM lifetime. */
  private val memo = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, JobHistoryViews]())

  private def v(s: SparkSession): JobHistoryViews =
    memo.computeIfAbsent(s, s2 => JobHistoryViews.fromFile(s2, fixture()))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "jh_task_counters" -> ((s, _) =>
      v(s).taskCounters.orderBy("task_id", "counter_group", "counter_name")),
    "jh_map_details" -> ((s, _) => Reports.mapDetails(v(s))),
    "jh_reduce_details" -> ((s, _) => Reports.reduceDetails(v(s))),
    "jh_bytes_report" -> ((s, _) => Reports.bytesReport(v(s))),
    "jh_summary" -> ((s, _) => Reports.summary(v(s))),
    "jh_timeline" -> ((s, _) => Reports.timeline(v(s))),
    "jh_timeline_sweep" -> ((s, _) => Reports.timelineSweepLine(v(s))))

  /** Shared DuckDB prelude: records with ordinals + event type. */
  private val prelude =
    s"""WITH raw AS (
       |  SELECT string_split(content, ' .' || chr(10)) AS arr
       |  FROM read_text('$FixturePath')
       |), ev AS (
       |  SELECT rec, ord, split_part(rec, ' ', 1) AS event
       |  FROM (SELECT unnest(arr) AS rec, generate_subscripts(arr, 1) AS ord FROM raw)
       |  WHERE length(rec) > 0
       |)""".stripMargin

  private def attr(key: String) =
    s"""nullif(regexp_extract(rec, '$key="([^"]*)"', 1), '')"""

  val oracle: Map[String, String] = Map(
    "jh_task_counters" ->
      s"""$prelude, cnt AS (
         |  SELECT ${attr("TASKID")} AS task_id,
         |    arg_max(regexp_extract(rec, 'COUNTERS="([^"]*)"', 1), ord) AS cs
         |  FROM ev WHERE event = 'Task' AND contains(rec, 'COUNTERS="')
         |  GROUP BY 1
         |), grps AS (
         |  SELECT task_id,
         |    unnest(regexp_extract_all(cs, '\\{\\([^)]+\\)\\([^)]+\\)[^}]+\\}')) AS g
         |  FROM cnt
         |), cc AS (
         |  SELECT task_id,
         |    regexp_extract(g, '\\{\\(([^)]+)\\)\\(([^)]+)\\)', 2) AS counter_group,
         |    unnest(regexp_extract_all(g, '\\[\\([^)]+\\)\\([^)]+\\)\\([^)]+\\)\\]')) AS c
         |  FROM grps
         |)
         |SELECT task_id, counter_group,
         |  regexp_extract(c, '\\[\\(([^)]+)\\)\\(([^)]+)\\)\\(([^)]+)\\)\\]', 2)
         |    AS counter_name,
         |  CAST(regexp_extract(c, '\\[\\(([^)]+)\\)\\(([^)]+)\\)\\(([^)]+)\\)\\]', 3)
         |    AS BIGINT) AS value
         |FROM cc ORDER BY task_id, counter_group, counter_name""".stripMargin,
    "jh_map_details" ->
      s"""$prelude, mt AS (
         |  SELECT ${attr("TASKID")} AS task_id,
         |    arg_max(CAST(${attr("START_TIME")} AS BIGINT), ord)
         |      FILTER (${attr("START_TIME")} IS NOT NULL) AS st,
         |    arg_max(CAST(${attr("FINISH_TIME")} AS BIGINT), ord)
         |      FILTER (${attr("FINISH_TIME")} IS NOT NULL) AS ft
         |  FROM ev WHERE event = 'Task' AND contains(rec, 'TASK_TYPE="MAP"')
         |  GROUP BY 1
         |), att AS (
         |  SELECT ${attr("TASKID")} AS task_id,
         |    count(DISTINCT ${attr("TASK_ATTEMPT_ID")}) AS num_attempts
         |  FROM ev WHERE event = 'MapAttempt'
         |    AND NOT contains(rec, 'TASK_TYPE="SETUP"')
         |    AND NOT contains(rec, 'TASK_TYPE="CLEANUP"')
         |  GROUP BY 1
         |)
         |SELECT task_id, st // 1000 AS start_time, ft // 1000 AS end_time,
         |  (ft - st) // 1000 AS elapsed,
         |  COALESCE(att.num_attempts, 0) AS num_attempts
         |FROM mt LEFT JOIN att USING (task_id) ORDER BY task_id""".stripMargin,
    "jh_reduce_details" ->
      s"""$prelude, rt AS (
         |  SELECT ${attr("TASKID")} AS task_id,
         |    arg_max(CAST(${attr("START_TIME")} AS BIGINT), ord)
         |      FILTER (${attr("START_TIME")} IS NOT NULL) AS st,
         |    arg_max(CAST(${attr("FINISH_TIME")} AS BIGINT), ord)
         |      FILTER (${attr("FINISH_TIME")} IS NOT NULL) AS ft
         |  FROM ev WHERE event = 'Task' AND contains(rec, 'TASK_TYPE="REDUCE"')
         |  GROUP BY 1
         |), att AS (
         |  SELECT ${attr("TASKID")} AS task_id,
         |    count(DISTINCT ${attr("TASK_ATTEMPT_ID")}) AS num_attempts
         |  FROM ev WHERE event = 'ReduceAttempt' GROUP BY 1
         |), fin AS (
         |  SELECT ${attr("TASKID")} AS task_id,
         |    arg_max(${attr("TASK_ATTEMPT_ID")}, ord) AS attempt_id
         |  FROM ev
         |  WHERE ((event = 'MapAttempt' AND NOT contains(rec, 'TASK_TYPE="SETUP"')
         |          AND NOT contains(rec, 'TASK_TYPE="CLEANUP"'))
         |         OR event = 'ReduceAttempt')
         |    AND ${attr("START_TIME")} IS NULL
         |    AND ${attr("FINISH_TIME")} IS NOT NULL
         |    AND contains(rec, 'TASK_STATUS="SUCCESS"')
         |  GROUP BY 1
         |), shuf AS (
         |  SELECT ${attr("TASK_ATTEMPT_ID")} AS attempt_id,
         |    arg_max(CAST(${attr("SHUFFLE_FINISHED")} AS BIGINT), ord)
         |      FILTER (${attr("START_TIME")} IS NULL
         |              AND ${attr("SHUFFLE_FINISHED")} IS NOT NULL) AS shuffle_ms
         |  FROM ev WHERE event = 'ReduceAttempt' GROUP BY 1
         |), amc AS (
         |  SELECT max(CAST(${attr("FINISH_TIME")} AS BIGINT) // 1000) AS maps_complete
         |  FROM ev WHERE event = 'Task' AND contains(rec, 'TASK_TYPE="MAP"')
         |)
         |SELECT rt.task_id, rt.st // 1000 AS start_time, amc.maps_complete,
         |  shuf.shuffle_ms // 1000 AS shuffle_finish, rt.ft // 1000 AS end_time,
         |  (rt.ft - rt.st) // 1000 AS elapsed,
         |  COALESCE(att.num_attempts, 0) AS num_attempts
         |FROM rt LEFT JOIN att USING (task_id) LEFT JOIN fin USING (task_id)
         |LEFT JOIN shuf USING (attempt_id) CROSS JOIN amc
         |ORDER BY task_id""".stripMargin,
    "jh_bytes_report" ->
      s"""$prelude, b AS (
         |  SELECT ${attr("TASKID")} AS task_id,
         |    arg_max(COALESCE(CAST(nullif(regexp_extract(rec,
         |      '\\[\\(HDFS_BYTES_WRITTEN\\)\\(HDFS_BYTES_WRITTEN\\)\\(([0-9]+)\\)\\]', 1), '')
         |      AS BIGINT), 0), ord) AS reduce_output_bytes
         |  FROM ev WHERE event = 'Task' AND contains(rec, 'TASK_TYPE="REDUCE"')
         |    AND contains(rec, 'COUNTERS="') GROUP BY 1
         |), fin AS (
         |  SELECT ${attr("TASKID")} AS task_id,
         |    arg_max(${attr("TASK_ATTEMPT_ID")}, ord) AS attempt_id
         |  FROM ev
         |  WHERE ((event = 'MapAttempt' AND NOT contains(rec, 'TASK_TYPE="SETUP"')
         |          AND NOT contains(rec, 'TASK_TYPE="CLEANUP"'))
         |         OR event = 'ReduceAttempt')
         |    AND ${attr("START_TIME")} IS NULL
         |    AND ${attr("FINISH_TIME")} IS NOT NULL
         |    AND contains(rec, 'TASK_STATUS="SUCCESS"')
         |  GROUP BY 1
         |), at AS (
         |  SELECT ${attr("TASK_ATTEMPT_ID")} AS attempt_id,
         |    arg_max(CAST(${attr("SHUFFLE_FINISHED")} AS BIGINT), ord)
         |      FILTER (${attr("START_TIME")} IS NULL
         |              AND ${attr("SHUFFLE_FINISHED")} IS NOT NULL) AS shuffle_ms,
         |    arg_max(CAST(${attr("FINISH_TIME")} AS BIGINT), ord)
         |      FILTER (${attr("START_TIME")} IS NULL
         |              AND ${attr("FINISH_TIME")} IS NOT NULL) AS end_ms
         |  FROM ev WHERE event = 'ReduceAttempt' GROUP BY 1
         |), sub AS (
         |  SELECT arg_max(CAST(${attr("SUBMIT_TIME")} AS BIGINT), ord)
         |    FILTER (${attr("SUBMIT_TIME")} IS NOT NULL) // 1000 AS submit_u
         |  FROM ev WHERE event = 'Job'
         |)
         |SELECT b.task_id, b.reduce_output_bytes,
         |  at.shuffle_ms // 1000 - sub.submit_u AS shuffle_finish,
         |  at.end_ms // 1000 - sub.submit_u AS reduce_finish
         |FROM b LEFT JOIN fin USING (task_id) LEFT JOIN at USING (attempt_id)
         |CROSS JOIN sub ORDER BY task_id""".stripMargin)
}
