package graft.jobhistory

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Batch ≡ streaming: the same fixture log fed through MemoryStream in
  * micro-batches must converge to the batch views (SURVEY §2.9, §5.5).
  */
class StreamingSpec extends SparkSpec {

  private def fixtureRecords: Seq[(Long, String)] = {
    val text = Files.readString(Paths.get(Fixtures.pig))
    text.split(" \\.\n", -1).toSeq.filter(_.nonEmpty)
      .zipWithIndex.map { case (r, i) => (i.toLong, r) }
  }

  test("stateful task states converge to the batch entity views") {
    val spark2 = spark
    import spark2.implicits._
    implicit val ctx = spark.sqlContext

    val input = MemoryStream[(Long, String)]
    val events = Streaming.parseRecords(
      input.toDF().withColumnRenamed("_1", "line_no")
        .withColumnRenamed("_2", "record"))
    val q = Streaming.taskStates(events).writeStream
      .format("memory").queryName("tstates").outputMode("update").start()
    try {
      // four micro-batches, in log order (monotone offsets)
      fixtureRecords.grouped(1000).foreach { chunk =>
        input.addData(chunk); q.processAllAvailable()
      }
      // latest state per task = the row with the highest max_line
      val streamed = spark.table("tstates").collect()
        .groupBy(_.getAs[String]("task_id"))
        .map { case (k, rows) => k -> rows.maxBy(_.getAs[Long]("max_line")) }

      val v = JobHistoryViews.fromFile(spark, Fixtures.pig)
      val batchMaps = v.mapTasks.collect()
        .map(r => r.getAs[String]("task_id") ->
          (r.getAs[Map[String, String]]("attrs"), r.getAs[Long]("num_attempts")))
        .toMap
      val streamedMaps = streamed.filter(_._2.getAs[String]("task_type") == "MAP")
      assert(streamedMaps.keySet === batchMaps.keySet)
      streamedMaps.foreach { case (id, row) =>
        val (battrs, bnum) = batchMaps(id)
        assert(row.getAs[Map[String, String]]("attrs") === battrs, s"attrs of $id")
        assert(row.getAs[Long]("num_attempts") === bnum, s"num_attempts of $id")
      }

      val batchFinals = v.finalAttempts.collect()
        .map(r => r.getAs[String]("task_id") -> r.getAs[String]("attempt_id"))
        .toMap
      val streamedFinals = streamed.collect {
        case (id, row) if row.getAs[String]("final_attempt") != null =>
          id -> row.getAs[String]("final_attempt")
      }
      assert(streamedFinals === batchFinals)
    } finally q.stop()
  }

  test("supersession retracts a previously emitted final attempt (Update mode)") {
    val spark2 = spark
    import spark2.implicits._
    implicit val ctx = spark.sqlContext

    val input = MemoryStream[(Long, String)]
    val events = Streaming.parseRecords(
      input.toDF().withColumnRenamed("_1", "line_no")
        .withColumnRenamed("_2", "record"))
    val q = Streaming.taskStates(events).writeStream
      .format("memory").queryName("tsuper").outputMode("update").start()
    try {
      input.addData(Seq(
        (0L, """MapAttempt TASK_TYPE="MAP" TASKID="t1" TASK_ATTEMPT_ID="a1" TASK_STATUS="SUCCESS" FINISH_TIME="15000"""")))
      q.processAllAvailable()
      val first = spark.table("tsuper").collect().last
      assert(first.getAs[String]("final_attempt") === "a1")

      input.addData(Seq(
        (1L, """MapAttempt TASK_TYPE="MAP" TASKID="t1" TASK_ATTEMPT_ID="a2" TASK_STATUS="SUCCESS" FINISH_TIME="16000"""")))
      q.processAllAvailable()
      val rows = spark.table("tsuper").collect()
      val latest = rows.maxBy(_.getAs[Long]("max_line"))
      assert(latest.getAs[String]("final_attempt") === "a2")
      assert(latest.getAs[Long]("num_attempts") === 2L)
    } finally q.stop()
  }

  test("streaming map details converge to the batch -m report") {
    val spark2 = spark
    import spark2.implicits._
    implicit val ctx = spark.sqlContext

    val input = MemoryStream[(Long, String)]
    val events = Streaming.parseRecords(
      input.toDF().withColumnRenamed("_1", "line_no")
        .withColumnRenamed("_2", "record"))
    val q = Streaming.mapDetailsStream(events).writeStream
      .format("memory").queryName("mdetails").outputMode("update").start()
    try {
      fixtureRecords.grouped(1500).foreach { chunk =>
        input.addData(chunk); q.processAllAvailable()
      }
      val streamed = spark.table("mdetails").collect()
        .groupBy(_.getAs[String]("task_id"))
        .map { case (_, rows) => rows.maxBy(_.getAs[Long]("max_line")) }
        .map(r => r.toSeq.dropRight(1)) // drop max_line
        .toSet
      val batch = Reports.mapDetails(
        JobHistoryViews.fromFile(spark, Fixtures.pig))
        .collect().map(_.toSeq).toSet
      assert(streamed === batch)
    } finally q.stop()
  }

  test("streaming exact dedup: first digest occurrence survives across batches") {
    val spark2 = spark
    import spark2.implicits._
    implicit val ctx = spark.sqlContext

    val input = MemoryStream[(Long, String)]
    val docs = input.toDF()
      .withColumn("event_ts", timestamp_seconds(col("_1")))
      .withColumnRenamed("_2", "text")
      .select(col("_1").as("doc_id"), col("text"), col("event_ts"))
    val q = Streaming.dedupStream(docs).writeStream
      .format("memory").queryName("dedup").outputMode("append").start()
    try {
      input.addData(Seq((1L, "alpha"), (2L, "beta"), (3L, "alpha")))
      q.processAllAvailable()
      input.addData(Seq((4L, "beta"), (5L, "gamma")))
      q.processAllAvailable()
      val survivors = spark.table("dedup").collect()
        .map(_.getAs[String]("text")).sorted.toSeq
      assert(survivors === Seq("alpha", "beta", "gamma"))
    } finally q.stop()
  }

  test("streaming classification: incremental emission + supersession retraction") {
    val spark2 = spark
    import spark2.implicits._
    implicit val ctx = spark.sqlContext

    val input = MemoryStream[(Long, String)]
    val events = Streaming.parseRecords(
      input.toDF().withColumnRenamed("_1", "line_no")
        .withColumnRenamed("_2", "record"))
    val q = Streaming.timelineStream(events).writeStream
      .format("memory").queryName("tlsynth").outputMode("complete").start()
    try {
      def table(): Map[(Long, String), Long] = spark.table("tlsynth").collect()
        .map(r => (r.getAs[Long]("time"), r.getAs[String]("phase")) ->
          r.getAs[Long]("count"))
        .filter(_._2 > 0).toMap

      // batch 1: job bounds land first (submit 10s, finish 100s)
      input.addData(Seq(
        (0L, """Job JOBID="job_1111_0001" SUBMIT_TIME="10000""""),
        (1L, """Job JOBID="job_1111_0001" JOB_STATUS="SUCCESS" FINISH_TIME="100000"""")))
      q.processAllAvailable()
      assert(table().isEmpty, "no attempts yet")

      // batch 2: attempt a1 runs [20s, 30s] and succeeds -> final
      input.addData(Seq(
        (2L, """MapAttempt TASK_TYPE="MAP" TASKID="task_1111_0001_m_000001" TASK_ATTEMPT_ID="a1" START_TIME="20000""""),
        (3L, """MapAttempt TASK_TYPE="MAP" TASKID="task_1111_0001_m_000001" TASK_ATTEMPT_ID="a1" TASK_STATUS="SUCCESS" FINISH_TIME="30000"""")))
      q.processAllAvailable()
      val mid = table()
      assert((10L to 20L).forall(t => mid.get((t, "maps")).contains(1L)),
        "a1 counts as real map work once final")
      assert(!mid.exists(_._1._2 == "waste"), "no waste yet")

      // batch 3: a2 [25s, 35s] succeeds later -> supersedes a1, which
      // is retracted from maps and re-emitted as waste
      input.addData(Seq(
        (4L, """MapAttempt TASK_TYPE="MAP" TASKID="task_1111_0001_m_000001" TASK_ATTEMPT_ID="a2" START_TIME="25000""""),
        (5L, """MapAttempt TASK_TYPE="MAP" TASKID="task_1111_0001_m_000001" TASK_ATTEMPT_ID="a2" TASK_STATUS="SUCCESS" FINISH_TIME="35000"""")))
      q.processAllAvailable()
      val end = table()
      assert((15L to 25L).forall(t => end.get((t, "maps")).contains(1L)),
        "a2 is the final attempt")
      assert((10L to 14L).forall(t => !end.contains((t, "maps"))),
        "a1's maps slots retracted")
      assert((10L to 20L).forall(t => end.get((t, "waste")).contains(1L)),
        "a1 demoted to waste")
    } finally q.stop()
  }

  test("end-to-end streaming timeline equals the batch timeline (Pig fixture)") {
    val spark2 = spark
    import spark2.implicits._
    implicit val ctx = spark.sqlContext

    // scale 10000 keeps the slot volume test-sized; semantics identical
    val scale = 10000L
    val input = MemoryStream[(Long, String)]
    val events = Streaming.parseRecords(
      input.toDF().withColumnRenamed("_1", "line_no")
        .withColumnRenamed("_2", "record"))
    val q = Streaming.timelineStream(events, scale).writeStream
      .format("memory").queryName("tlpig").outputMode("complete").start()
    try {
      fixtureRecords.grouped(1000).foreach { chunk =>
        input.addData(chunk); q.processAllAvailable()
      }
      val got = spark.table("tlpig").collect()
        .map(r => (r.getAs[Long]("time"), r.getAs[String]("phase")) ->
          r.getAs[Long]("count"))
        .filter(_._2 > 0).toMap
      val want = Reports.timeline(
        JobHistoryViews.fromFile(spark, Fixtures.pig, scale)).collect()
        .flatMap { r =>
          Seq("maps", "shuffle", "merge", "reduce", "waste").flatMap { p =>
            val c = r.getAs[Long](p)
            if (c > 0) Some((r.getAs[Long]("time"), p) -> c) else None
          }
        }.toMap
      assert(got === want)
    } finally q.stop()
  }

  test("fleet: interleaved logs stream into correct per-job timelines") {
    val spark2 = spark
    import spark2.implicits._
    implicit val ctx = spark.sqlContext

    val scale = 10000L
    def recordsOf(path: String): Seq[(Long, String)] = {
      val text = Files.readString(Paths.get(path))
      text.split(" \\.\n", -1).toSeq.filter(_.nonEmpty)
        .zipWithIndex.map { case (r, i) => (i.toLong, r) }
    }
    // two jobs' records interleaved chunk-by-chunk — the multi-log
    // directory scan shape, live
    val pig = recordsOf(Fixtures.pig).grouped(800).toSeq
    val ec2 = recordsOf(Fixtures.ec2).grouped(800).toSeq

    val input = MemoryStream[(Long, String)]
    val events = Streaming.parseRecords(
      input.toDF().withColumnRenamed("_1", "line_no")
        .withColumnRenamed("_2", "record"))
    val q = Streaming.timelineStreamPerJob(events, scale).writeStream
      .format("memory").queryName("tlfleet").outputMode("complete").start()
    try {
      pig.map(Some(_)).zipAll(ec2.map(Some(_)), None, None).foreach {
        case (a, b) =>
          a.foreach(input.addData(_)); b.foreach(input.addData(_))
          q.processAllAvailable()
      }
      val got = spark.table("tlfleet").collect()
        .map(r => (r.getAs[String]("job_id"), r.getAs[Long]("time"),
          r.getAs[String]("phase")) -> r.getAs[Long]("count"))
        .filter(_._2 > 0).toMap

      Seq(Fixtures.pig, Fixtures.ec2).foreach { path =>
        val v = JobHistoryViews.fromFile(spark, path, scale)
        val jobId = v.job.collect().head
          .getAs[Map[String, String]]("attrs")("JOBID")
        val want = Reports.timeline(v).collect()
          .flatMap { r =>
            Seq("maps", "shuffle", "merge", "reduce", "waste").flatMap { p =>
              val c = r.getAs[Long](p)
              if (c > 0) Some((jobId, r.getAs[Long]("time"), p) -> c) else None
            }
          }.toMap
        val gotJob = got.filter(_._1._1 == jobId)
        assert(gotJob === want, s"timeline of $jobId")
      }
    } finally q.stop()
  }

  test("file source: a growing log directory converges to the batch timeline") {
    val spark2 = spark
    import spark2.implicits._

    // The live ingestion path claimed at Streaming.scala:13-17:
    // readStream.option("lineSep", " .\n").text(dir), with the
    // record-order contract (`line_no`) provided by the source — here
    // file sequence (zero-padded name) + in-file record offset, the
    // file-source analogue of a Kafka offset. No MemoryStream anywhere.
    val dir = Files.createTempDirectory("graft-stream-logs")
    val scale = 10000L
    val lines = spark.readStream
      .option("lineSep", " .\n")
      .text(dir.toString)
      .select(input_file_name().as("file"), col("value").as("record"))
      .as[(String, String)]
      .mapPartitions { it =>
        // rows arrive in (file, offset) order within a partition; the
        // file's sequence number makes line_no globally monotone
        val seqRe = "chunk-(\\d+)".r
        var lastFile = ""
        var idx = 0L
        it.map { case (f, r) =>
          if (f != lastFile) { lastFile = f; idx = 0L }
          idx += 1
          val seq = seqRe.findFirstMatchIn(f).map(_.group(1).toLong).getOrElse(0L)
          (seq * 1000000L + idx, r)
        }
      }
      .toDF("line_no", "record")
      .filter(length(col("record")) > 0)

    val events = Streaming.parseRecords(lines)
    val q = Streaming.timelineStream(events, scale).writeStream
      .format("memory").queryName("tlfile").outputMode("complete").start()
    try {
      // the directory grows one chunk file per micro-batch
      fixtureRecords.grouped(1000).zipWithIndex.foreach { case (chunk, i) =>
        val tmp = dir.resolve(s".chunk-$i.tmp")
        Files.writeString(tmp, chunk.map(_._2).mkString("", " .\n", " .\n"))
        Files.move(tmp, dir.resolve(f"chunk-$i%05d.txt"),
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        q.processAllAvailable()
      }
      val got = spark.table("tlfile").collect()
        .map(r => (r.getAs[Long]("time"), r.getAs[String]("phase")) ->
          r.getAs[Long]("count"))
        .filter(_._2 > 0).toMap
      val want = Reports.timeline(
        JobHistoryViews.fromFile(spark, Fixtures.pig, scale)).collect()
        .flatMap { r =>
          Seq("maps", "shuffle", "merge", "reduce", "waste").flatMap { p =>
            val c = r.getAs[Long](p)
            if (c > 0) Some((r.getAs[Long]("time"), p) -> c) else None
          }
        }.toMap
      assert(got === want)
    } finally {
      q.stop()
      dir.toFile.listFiles().foreach(_.delete()); Files.delete(dir)
    }
  }

  test("streaming slot counts equal the batch timeline maps series") {
    val spark2 = spark
    import spark2.implicits._
    implicit val ctx = spark.sqlContext

    val v = JobHistoryViews.fromFile(spark, Fixtures.ec2)
    val slots = Reports.intervals(v)
      .filter(col("phase") === "maps")
      .select(col("phase"), explode(sequence(col("lo"), col("hi"))).as("slot"))
      .select(col("phase"), col("slot"))
      .as[(String, Long)].collect().toSeq

    val input = MemoryStream[(String, Long)]
    val streamed = Streaming.slotCounts(
      input.toDF().withColumnRenamed("_1", "phase")
        .withColumn("slot_ts", timestamp_seconds(col("_2")))
        .select(col("phase"), col("slot_ts")))
    val q = streamed.writeStream
      .format("memory").queryName("slots").outputMode("complete").start()
    try {
      slots.grouped(200000).foreach { chunk =>
        input.addData(chunk); q.processAllAvailable()
      }
      val got = spark.table("slots").collect()
        .map(r => r.getAs[Long]("time") -> r.getAs[Long]("count")).toMap
      val want = Reports.timeline(v).collect()
        .map(r => r.getLong(0) -> r.getAs[Long]("maps"))
        .filter(_._2 > 0).toMap
      assert(got === want)
    } finally q.stop()
  }
}
