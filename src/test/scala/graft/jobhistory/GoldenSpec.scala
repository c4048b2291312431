package graft.jobhistory

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import graft.SparkSpec

/** Golden-output tests against the reference's own published results
  * (SURVEY §5): vis/grap/map.d, vis/grap/reduce.d, README:25-47.
  */
class GoldenSpec extends SparkSpec {

  private lazy val v = JobHistoryViews.fromFile(spark, Fixtures.pig)

  test("mapDetails matches vis/grap/map.d byte-for-byte (512 rows)") {
    val got = Reports.mapDetails(v).collect().map(r =>
      s"${r.getString(0)} ${r.getLong(1)} ${r.getLong(2)} ${r.getLong(3)} ${r.getLong(4)}")
    val want = Files.readAllLines(Paths.get(Fixtures.mapGolden)).asScala
      .filter(_.nonEmpty)
    assert(got.length === 512)
    assert(got.toSeq === want.toSeq)
  }

  test("reduceDetails matches vis/grap/reduce.d (legacy 6-column subset, 320 rows)") {
    // reduce.d predates the maps-complete column (vis/grap/reducegraph.gr:28-29)
    val got = Reports.reduceDetails(v).collect().map(r =>
      s"${r.getString(0)} ${r.getLong(1)} ${r.getLong(3)} ${r.getLong(4)} ${r.getLong(5)} ${r.getLong(6)}")
    val want = Files.readAllLines(Paths.get(Fixtures.reduceGolden)).asScala
      .filter(_.nonEmpty)
    assert(got.length === 320)
    assert(got.toSeq === want.toSeq)
  }

  test("summary matches README:25-47 golden scalars") {
    val r = Reports.summary(v).collect().head
    assert(r.getAs[String]("job_id") === "job_201010291643_0125")
    assert(r.getAs[String]("job_name") === """PigLatin:kmerStats\.pig""")
    assert(r.getAs[String]("user") === "kbhatia")
    assert(r.getAs[String]("job_status") === "SUCCESS")
    assert(r.getAs[Long]("num_maps") === 512L)
    assert(r.getAs[Long]("num_reduces") === 320L)
    // README:26-28 — exact fractional averages
    assert(r.getAs[Double]("avg_map_time") === 9450.6328125)
    assert(math.abs(r.getAs[Double]("avg_shuffle_time") - 13765.465625) < 1e-9)
    assert(math.abs(r.getAs[Double]("avg_reduce_time") - 17074.065625) < 1e-9)
    // total time = FINISH/scale - LAUNCH/scale (A8)
    assert(r.getAs[Long]("total_time") ===
      1289568296892L / 1000 - 1289542275747L / 1000)
  }

  test("job view preserves escaped attribute values verbatim") {
    val attrs = v.job.collect().head.getAs[Map[String, String]]("attrs")
    assert(attrs("JOBNAME") === """PigLatin:kmerStats\.pig""")
    assert(attrs("TOTAL_MAPS") === "512")
    assert(attrs("TOTAL_REDUCES") === "320")
    assert(attrs("FAILED_MAPS") === "127")
    assert(attrs("FINISHED_REDUCES") === "320")
  }

  test("timeline spine spans 0..(finish-submit) inclusive") {
    val rows = Reports.timeline(v).collect()
    assert(rows.length === (1289568296L - 1289542263L + 1).toInt)
    assert(rows.head.getLong(0) === 0L)
    // at t=0 nothing is running yet (first map starts 21s after submit)
    assert(rows.head.toSeq.drop(1) === Seq(0L, 0L, 0L, 0L, 0L))
  }

  test("timeline column sums equal total interval slot counts") {
    val iv = Reports.intervals(v)
      .groupBy("phase").sum("hi").collect() // placeholder guard: phases exist
    assert(iv.map(_.getString(0)).toSet ===
      Set("maps", "shuffle", "merge", "reduce", "waste"))
    val slotSums = Reports.intervals(v).collect()
      .groupBy(_.getString(0))
      .view.mapValues(_.map(r => r.getLong(2) - r.getLong(1) + 1).sum).toMap
    val tl = Reports.timeline(v).collect()
    val colSums = Seq("maps", "shuffle", "merge", "reduce", "waste").zipWithIndex
      .map { case (p, i) => p -> tl.map(_.getLong(i + 1)).sum }.toMap
    assert(colSums === slotSums)
  }

  test("sweep-line timeline is identical to interval expansion") {
    val a = Reports.timeline(v).collect().map(_.toSeq)
    val b = Reports.timelineSweepLine(v).collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
  }

  test("sweep-line equivalence holds at the CGI's 10x finer scale (100ms units)") {
    val fine = JobHistoryViews.fromFile(spark, Fixtures.ec2, scale = 100L)
    val a = Reports.timeline(fine).collect().map(_.toSeq)
    val b = Reports.timelineSweepLine(fine).collect().map(_.toSeq)
    assert(a.length > 300000) // ~312k slots — the wide-spine regime
    assert(a.toSeq === b.toSeq)
  }

  test("bytesReport: every reduce task reports bytes and final-attempt times") {
    val rows = Reports.bytesReport(v).collect()
    assert(rows.length === 320)
    assert(rows.forall(_.getAs[Long]("reduce_output_bytes") > 0))
    assert(rows.forall(r => r.getAs[Long]("shuffle_finish") > 0 &&
      r.getAs[Long]("reduce_finish") >= r.getAs[Long]("shuffle_finish")))
  }

  test("EC2 fixture: 1024 maps / 144 reduces, clean run") {
    val v2 = JobHistoryViews.fromFile(spark, Fixtures.ec2)
    assert(Reports.mapDetails(v2).count() === 1024L)
    assert(Reports.reduceDetails(v2).count() === 144L)
    val s = Reports.summary(v2).collect().head
    assert(s.getAs[String]("job_status") === "SUCCESS")
    assert(s.getAs[Long]("num_maps") === 1024L)
  }
}
