package graft.jobhistory

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property tests (SURVEY §5.3): generated event logs, checked against
  * a tiny in-memory interpreter of the documented reference semantics
  * (last-write-wins merge, final-attempt supersession, attempt
  * counting). Spark must agree with the interpreter on every sample.
  * (Raw ScalaCheck sampling with fixed seeds — the scalatest bridge
  * isn't in the offline dependency cache.)
  */
class PropertySpec extends SparkSpec {

  private def forAll(gen: Gen[Seq[Ev]], samples: Int = 8)(body: Seq[Ev] => Unit): Unit =
    (1 to samples).foreach { i =>
      body(gen.pureApply(Gen.Parameters.default, Seed(i.toLong)))
    }

  private case class Ev(event: String, attrs: Seq[(String, String)]) {
    def render: String =
      event + " " + attrs.map { case (k, v) => s"""$k="$v"""" }.mkString(" ")
  }

  /** The documented semantics, interpreted directly (SURVEY §2.3). */
  private def interpret(evs: Seq[Ev]) = {
    val tasks = scala.collection.mutable.Map.empty[String, Map[String, String]]
    val attempts = scala.collection.mutable.Map.empty[String, Set[String]]
    var finals = Map.empty[String, String]
    evs.foreach { e =>
      val a = e.attrs.toMap
      e.event match {
        case "Task" if a.get("TASK_TYPE").contains("MAP") =>
          val id = a("TASKID")
          tasks(id) = tasks.getOrElse(id, Map.empty) ++ a
        case "MapAttempt" if !a.get("TASK_TYPE").exists(Set("SETUP", "CLEANUP")) =>
          val id = a("TASKID")
          attempts(id) = attempts.getOrElse(id, Set.empty) + a("TASK_ATTEMPT_ID")
          if (!a.contains("START_TIME") && a.contains("FINISH_TIME") &&
            a.get("TASK_STATUS").contains("SUCCESS"))
            finals += id -> a("TASK_ATTEMPT_ID")
        case _ =>
      }
    }
    (tasks.toMap, attempts.toMap, finals)
  }

  private val genLog: Gen[Seq[Ev]] = for {
    nTasks <- Gen.choose(1, 4)
    evs <- Gen.sequence[Seq[Seq[Ev]], Seq[Ev]]((0 until nTasks).map { t =>
      val tid = s"task_$t"
      for {
        nAtt <- Gen.choose(1, 3)
        start <- Gen.choose(10L, 50L)
        dur <- Gen.choose(1L, 40L)
        statuses <- Gen.listOfN(nAtt, Gen.oneOf("SUCCESS", "FAILED", "KILLED"))
        restated <- Gen.option(Gen.choose(51L, 99L)) // LWW overwrite record
      } yield {
        val base = Seq(
          Ev("Task", Seq("TASKID" -> tid, "TASK_TYPE" -> "MAP",
            "START_TIME" -> s"${start * 1000}")))
        val over = restated.toSeq.map(v => Ev("Task",
          Seq("TASKID" -> tid, "TASK_TYPE" -> "MAP",
            "START_TIME" -> s"${v * 1000}")))
        val atts = statuses.zipWithIndex.flatMap { case (st, i) =>
          val aid = s"attempt_${t}_$i"
          Seq(
            Ev("MapAttempt", Seq("TASK_TYPE" -> "MAP", "TASKID" -> tid,
              "TASK_ATTEMPT_ID" -> aid, "START_TIME" -> s"${(start + i) * 1000}")),
            Ev("MapAttempt", Seq("TASK_TYPE" -> "MAP", "TASKID" -> tid,
              "TASK_ATTEMPT_ID" -> aid, "TASK_STATUS" -> st,
              "FINISH_TIME" -> s"${(start + i + dur) * 1000}")))
        }
        val fin = Ev("Task", Seq("TASKID" -> tid, "TASK_TYPE" -> "MAP",
          "TASK_STATUS" -> "SUCCESS",
          "FINISH_TIME" -> s"${(start + dur + nAtt) * 1000}"))
        base ++ over ++ atts :+ fin
      }
    }).map(_.flatten)
  } yield Seq(
    Ev("Job", Seq("JOBID" -> "j", "SUBMIT_TIME" -> "5000")),
    Ev("Job", Seq("JOBID" -> "j", "LAUNCH_TIME" -> "6000"))) ++ evs :+
    Ev("Job", Seq("JOBID" -> "j", "JOB_STATUS" -> "SUCCESS",
      "FINISH_TIME" -> "200000"))

  /** A multi-job log with Hadoop-convention ids (the fleet key),
    * reduce phases, supersession, and deliberately clamp-exercising
    * times: attempts may start before job submit (CGI clamp) and
    * finish after job finish (cap), reduce finishes sometimes omit
    * SHUFFLE/SORT (dropped from the phase series), and non-SUCCESS
    * attempts land in waste. */
  private def genJob(j: Int): Gen[Seq[Ev]] = {
    val jid = f"job_1111_$j%04d"
    def taskId(kind: String, t: Int) = f"task_1111_$j%04d_${kind}_$t%06d"
    def attId(kind: String, t: Int, i: Int) =
      f"attempt_1111_$j%04d_${kind}_$t%06d_$i"
    for {
      submit <- Gen.choose(10L, 20L)
      dur <- Gen.choose(40L, 100L)
      nMap <- Gen.choose(1, 3)
      nRed <- Gen.choose(0, 2)
      mapTasks <- Gen.sequence[Seq[Seq[Ev]], Seq[Ev]]((0 until nMap).map { t =>
        for {
          nAtt <- Gen.choose(1, 2)
          specs <- Gen.listOfN(nAtt, for {
            off <- Gen.choose(-15L, 60L) // can start before submit
            len <- Gen.choose(1L, 80L) // can finish after job finish
            st <- Gen.oneOf("SUCCESS", "SUCCESS", "FAILED")
          } yield (off, len, st))
        } yield specs.zipWithIndex.flatMap { case ((off, len, status), i) =>
          val start = math.max(1L, submit + off)
          Seq(
            Ev("MapAttempt", Seq("TASK_TYPE" -> "MAP",
              "TASKID" -> taskId("m", t), "TASK_ATTEMPT_ID" -> attId("m", t, i),
              "START_TIME" -> s"${start * 1000}")),
            Ev("MapAttempt", Seq("TASK_TYPE" -> "MAP",
              "TASKID" -> taskId("m", t), "TASK_ATTEMPT_ID" -> attId("m", t, i),
              "TASK_STATUS" -> status,
              "FINISH_TIME" -> s"${(start + len) * 1000}")))
        }
      }).map(_.flatten)
      redTasks <- Gen.sequence[Seq[Seq[Ev]], Seq[Ev]]((0 until nRed).map { t =>
        for {
          off <- Gen.choose(0L, 40L)
          shufLen <- Gen.choose(1L, 20L)
          sortLen <- Gen.choose(1L, 15L)
          redLen <- Gen.choose(1L, 40L)
          withPhases <- Gen.frequency(4 -> Gen.const(true), 1 -> Gen.const(false))
          status <- Gen.oneOf("SUCCESS", "SUCCESS", "FAILED")
        } yield {
          val start = submit + off
          val sf = start + shufLen
          val so = sf + sortLen
          val e = so + redLen
          val finishAttrs = Seq("TASKID" -> taskId("r", t),
            "TASK_ATTEMPT_ID" -> attId("r", t, 0), "TASK_STATUS" -> status,
            "FINISH_TIME" -> s"${e * 1000}") ++
            (if (withPhases) Seq("SHUFFLE_FINISHED" -> s"${sf * 1000}",
              "SORT_FINISHED" -> s"${so * 1000}")
            else Nil)
          Seq(
            Ev("ReduceAttempt", Seq("TASKID" -> taskId("r", t),
              "TASK_ATTEMPT_ID" -> attId("r", t, 0),
              "START_TIME" -> s"${start * 1000}")),
            Ev("ReduceAttempt", finishAttrs))
        }
      }).map(_.flatten)
    } yield
      Ev("Job", Seq("JOBID" -> jid, "SUBMIT_TIME" -> s"${submit * 1000}")) +:
        (mapTasks ++ redTasks) :+
        Ev("Job", Seq("JOBID" -> jid, "JOB_STATUS" -> "SUCCESS",
          "FINISH_TIME" -> s"${(submit + dur) * 1000}"))
  }

  private def genFleetLog(nJobs: Int): Gen[Seq[Ev]] =
    Gen.sequence[Seq[Seq[Ev]], Seq[Ev]]((1 to nJobs).map(genJob)).map(_.flatten)

  test("generated fleet logs: sweep-line timelines equal interval expansion") {
    forAll(genFleetLog(3), samples = 6) { evs =>
      val log = evs.map(_.render + " .\n").mkString
      val v = new JobHistoryViews(spark, JobHistoryReader.readString(spark, log))
      try {
        // single-job surface (global bounds over all Job records)
        val a = Reports.timeline(v).collect().map(_.toSeq)
        val b = Reports.timelineSweepLine(v).collect().map(_.toSeq)
        assert(b.toSeq === a.toSeq)
        // fleet surface (per-job bounds through the id-embedded job)
        val pa = Reports.timelinePerJob(v).collect().map(_.toSeq)
        val pb = Reports.timelinePerJobSweepLine(v).collect().map(_.toSeq)
        assert(pb.toSeq === pa.toSeq)
      } finally v.release()
    }
  }

  test("generated logs: Spark views agree with the reference interpreter") {
    forAll(genLog) { evs =>
      val log = evs.map(_.render + " .\n").mkString
      val v = new JobHistoryViews(spark, JobHistoryReader.readString(spark, log))
      val (refTasks, refAttempts, refFinals) = interpret(evs)

      val gotTasks = v.mapTasks.collect()
        .map(r => r.getAs[String]("task_id") ->
          (r.getAs[Map[String, String]]("attrs"), r.getAs[Long]("num_attempts")))
        .toMap
      assert(gotTasks.keySet === refTasks.keySet)
      refTasks.foreach { case (id, attrs) =>
        assert(gotTasks(id)._1 === attrs, s"attrs of $id")
        assert(gotTasks(id)._2 === refAttempts.getOrElse(id, Set.empty).size.toLong,
          s"num_attempts of $id")
      }

      val gotFinals = v.finalAttempts.collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(gotFinals === refFinals)

      // partition property: finals ∪ wasted == all finished attempts
      val finished = evs.collect {
        case e if e.event == "MapAttempt" &&
          !e.attrs.toMap.contains("START_TIME") &&
          e.attrs.toMap.contains("FINISH_TIME") =>
          e.attrs.toMap.apply("TASK_ATTEMPT_ID")
      }.toSet
      val wasted = finished -- refFinals.values.toSet
      assert(refFinals.values.toSet.subsetOf(finished))
      assert((refFinals.values.toSet ++ wasted) === finished)
    }
  }

  test("generated logs: streaming interval deltas sum to the batch timeline") {
    val spark2 = spark
    import spark2.implicits._
    implicit val ctx = spark.sqlContext
    var chunkSize = 2
    forAll(genLog, samples = 4) { evs =>
      chunkSize += 3 // vary the micro-batch split across samples
      val records = evs.map(_.render).zipWithIndex
        .map { case (r, i) => (i.toLong, r) }
      val input = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, String)]
      val events = Streaming.parseRecords(
        input.toDF().withColumnRenamed("_1", "line_no")
          .withColumnRenamed("_2", "record"))
      val name = s"tlprop$chunkSize"
      val q = Streaming.timelineStream(events).writeStream
        .format("memory").queryName(name).outputMode("complete").start()
      try {
        records.grouped(chunkSize).foreach { c =>
          input.addData(c); q.processAllAvailable()
        }
        val got = spark.table(name).collect()
          .map(r => (r.getAs[Long]("time"), r.getAs[String]("phase")) ->
            r.getAs[Long]("count"))
          .filter(_._2 > 0).toMap
        val v = new JobHistoryViews(spark,
          JobHistoryReader.readString(spark, evs.map(_.render + " .\n").mkString))
        val want = Reports.timeline(v).collect()
          .flatMap { r =>
            Seq("maps", "shuffle", "merge", "reduce", "waste").flatMap { p =>
              val c = r.getAs[Long](p)
              if (c > 0) Some((r.getAs[Long]("time"), p) -> c) else None
            }
          }.toMap
        assert(got === want)
      } finally q.stop()
    }
  }

  test("generated logs: timeline column sums equal interval slot totals") {
    forAll(genLog) { evs =>
      val log = evs.map(_.render + " .\n").mkString
      val v = new JobHistoryViews(spark, JobHistoryReader.readString(spark, log))
      val slotSums = Reports.intervals(v).collect()
        .groupBy(_.getString(0))
        .view.mapValues(_.map(r => r.getLong(2) - r.getLong(1) + 1).sum).toMap
      val tl = Reports.timeline(v).collect()
      Seq("maps", "shuffle", "merge", "reduce", "waste").zipWithIndex.foreach {
        case (p, i) =>
          assert(tl.map(_.getLong(i + 1)).sum === slotSums.getOrElse(p, 0L), p)
      }
    }
  }
}
