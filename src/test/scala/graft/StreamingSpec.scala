package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.exec.{Engine, SpanRecorder}
import graft.streaming.SpanStream

/** Streaming-surface tests (SURVEY §2 Group H): drive file-source streams
  * from real engine runs through memory sinks synchronously. */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Run two small DAGs and dump their spans as two JSONL files (the
    * append-style layout the reference produces). */
  def spanDir: String = {
    val dir = Files.createTempDirectory("graft-stream").toString
    val engine = new Engine(spark, 4)
    val ok = engine.task("ok_task")(_ => 1)
    SpanRecorder.record(engine) { engine.runDag(ok(Nil), Map()) }
    engine.sink.writeJsonl(s"$dir/run1.jsonl")
    engine.sink.clear()
    val bad = engine.task("bad_task")(_ => throw new Exception("stream-boom"))
    SpanRecorder.record(engine) { engine.runDag(bad(Nil), Map()) }
    engine.sink.writeJsonl(s"$dir/run2.jsonl")
    dir
  }

  test("H1/H2/H4 tailing + windowed task throughput with watermark") {
    val dir = spanDir
    val stream = SpanStream.readSpanStream(spark, dir)
    assert(stream.isStreaming)
    val q = SpanStream.taskThroughput(stream, "1 minute")
      .writeStream.outputMode("append").format("memory")
      .queryName("throughput").start()
    try {
      q.processAllAvailable()
      // append mode only emits closed windows; check state via complete mode
    } finally q.stop()

    val q2 = SpanStream.taskThroughput(stream, "1 minute")
      .writeStream.outputMode("complete").format("memory")
      .queryName("throughput_c").start()
    try {
      q2.processAllAvailable()
      val rows = spark.sql(
        "select status_code, sum(n_tasks) n from throughput_c group by 1")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(rows.getOrElse("OK", 0L) == 1L)
      assert(rows.getOrElse("ERROR", 0L) == 1L)
    } finally q2.stop()
  }

  test("H-EXT checkpoint recovery: restart resumes exactly-once with state") {
    // the operational contract a long-running 100 TB feed depends on: a
    // stopped query restarted from its checkpoint must (1) not re-emit
    // finalized windows, (2) carry OPEN window state across the restart,
    // (3) carry the WATERMARK across the restart so late data stays
    // dropped. All three fail loudly here if checkpointing regresses.
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val src = Files.createTempDirectory("graft-ckpt-src").toString
    val out = Files.createTempDirectory("graft-ckpt-out").toString
    val ckpt = Files.createTempDirectory("graft-ckpt-state").toString
    val schema = StructType(Seq(
      StructField("user", StringType), StructField("ts", TimestampType)))
    def writeFile(name: String, lines: Seq[String]): Unit =
      Files.write(java.nio.file.Paths.get(src, name),
        lines.mkString("\n").getBytes("UTF-8"))
    def startQuery() = spark.readStream.schema(schema).json(src)
      .withWatermark("ts", "10 seconds")
      .groupBy(window(col("ts"), "1 minute").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("win_start"), col("n"))
      .writeStream.outputMode("append")
      .format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).start()
    def ev(t: String) = s"""{"user":"u1","ts":"2024-03-01T$t"}"""
    // phase 1: two events in window 10:00, then one at 10:05 that pushes
    // the watermark past 10:01 and finalizes the first window
    writeFile("p1.jsonl", Seq(ev("10:00:10"), ev("10:00:20"), ev("10:05:00")))
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()
    val after1 = spark.read.schema(
      StructType(Seq(StructField("win_start", TimestampType),
        StructField("n", LongType))))
      .parquet(out).collect()
      .map(r => r.getTimestamp(0).toString -> r.getLong(1)).toMap
    assert(after1 == Map("2024-03-01 10:00:00.0" -> 2L))
    // phase 2 (fresh query from the SAME checkpoint): a LATE 10:00 event
    // (behind the recovered watermark — must stay dropped), another
    // 10:05 event (joins the RECOVERED open-window count), and a far
    // event finalizing 10:05
    writeFile("p2.jsonl", Seq(ev("10:00:30"), ev("10:05:10"), ev("10:15:00")))
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()
    val after2 = spark.read.schema(
      StructType(Seq(StructField("win_start", TimestampType),
        StructField("n", LongType))))
      .parquet(out).collect()
      .map(r => r.getTimestamp(0).toString -> r.getLong(1))
    // exactly-once: ONE row per finalized window — 10:00 NOT re-emitted
    // (and not incremented by the late event), 10:05 counts BOTH sides
    // of the restart
    assert(after2.sorted.toSeq == Seq(
      "2024-03-01 10:00:00.0" -> 2L, "2024-03-01 10:05:00.0" -> 2L))
  }

  test("H3 session windows per trace") {
    val dir = spanDir
    val q = SpanStream.traceSessions(SpanStream.readSpanStream(spark, dir), "30 seconds")
      .writeStream.outputMode("complete").format("memory")
      .queryName("sessions").start()
    try {
      q.processAllAvailable()
      val rows = spark.sql("select trace_id, n_spans, n_errors from sessions").collect()
      assert(rows.length == 2) // two traces (two runs)
      assert(rows.map(_.getLong(1)).sum >= 6) // ≥3 spans per run
      assert(rows.map(_.getLong(2)).sum >= 1) // the failed task
    } finally q.stop()
  }

  test("H6 streaming dedup drops re-delivered spans within the watermark") {
    val dir = spanDir
    // simulate an at-least-once exporter: re-flush run1's spans verbatim
    val first = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".jsonl")).minBy(_.getName)
    Files.copy(first.toPath, new java.io.File(dir, "redelivered.jsonl").toPath)
    val totalWithDups = spark.read.json(s"$dir/*.jsonl").count()
    val q = SpanStream.dedupSpans(SpanStream.readSpanStream(spark, dir))
      .writeStream.outputMode("append").format("memory")
      .queryName("deduped").start()
    try {
      q.processAllAvailable()
      val deduped = spark.sql("select * from deduped").count()
      val distinctIds = spark.read.json(s"$dir/*.jsonl")
        .select("context.span_id").distinct().count()
      assert(totalWithDups > distinctIds) // the fixture really has dups
      assert(deduped == distinctIds)
    } finally q.stop()
  }

  test("H2/H6 streaming results equal their batch equivalents") {
    import org.apache.spark.sql.functions._
    val dir = spanDir
    // at-least-once replay: duplicate one run's spans verbatim
    val first = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".jsonl")).minBy(_.getName)
    Files.copy(first.toPath, new java.io.File(dir, "redelivered.jsonl").toPath)
    val batch = spark.read.schema(SpanStream.streamSchema).json(s"$dir/*.jsonl")
      .withColumn("start_ts", to_timestamp(col("start_time")))
      .withColumn("end_ts", to_timestamp(col("end_time")))

    // H6: streaming dedup == batch dropDuplicates on the span id
    val qd = SpanStream.dedupSpans(SpanStream.readSpanStream(spark, dir))
      .writeStream.outputMode("append").format("memory")
      .queryName("dedup_parity").start()
    try {
      qd.processAllAvailable()
      val streamed = spark.sql("select context.span_id from dedup_parity")
        .collect().map(_.getString(0)).sorted.toSeq
      val batched = batch.withColumn("span_id", col("context.span_id"))
        .dropDuplicates("span_id" :: Nil)
        .select(col("span_id"))
        .collect().map(_.getString(0)).sorted.toSeq
      assert(streamed == batched)
    } finally qd.stop()

    // H2: streaming windowed throughput (complete mode, all data arrived)
    // == the same aggregate expressed in batch
    val qt = SpanStream.taskThroughput(SpanStream.readSpanStream(spark, dir))
      .writeStream.outputMode("complete").format("memory")
      .queryName("throughput_parity").start()
    try {
      qt.processAllAvailable()
      def canon(df: org.apache.spark.sql.DataFrame) = df
        .select(col("window.start").cast("long"), col("window.end").cast("long"),
          col("status_code"), col("n_tasks"), col("total_us"))
        .collect().map(_.toSeq).sortBy(_.toString).toSeq
      val streamed = canon(spark.table("throughput_parity"))
      val batched = canon(batch
        .filter(col("name") === "execute-task")
        .groupBy(window(col("end_ts"), "1 minute"),
          col("status.status_code").as("status_code"))
        .agg(count(lit(1)).as("n_tasks"),
          sum(unix_micros(col("end_ts")) - unix_micros(col("start_ts")))
            .as("total_us")))
      assert(streamed.nonEmpty && streamed == batched)
    } finally qt.stop()
  }

  test("H7 stream-stream interval join equals the batch child-parent join") {
    import org.apache.spark.sql.functions._
    val dir = spanDir
    val q = SpanStream.childParentJoin(SpanStream.readSpanStream(spark, dir))
      .writeStream.outputMode("append").format("memory")
      .queryName("join_parity").start()
    try {
      q.processAllAvailable()
      def canon(df: org.apache.spark.sql.DataFrame) = df
        .select("p_span", "c_span", "drain_us")
        .collect().map(_.toSeq).sortBy(_.toString).toSeq
      val streamed = canon(spark.table("join_parity"))
      val batch = spark.read.schema(SpanStream.streamSchema).json(s"$dir/*.jsonl")
        .withColumn("end_ts", to_timestamp(col("end_time")))
      val children = batch.filter(col("parent_id").isNotNull)
        .select(col("parent_id").as("c_parent"),
          col("context.span_id").as("c_span"), col("end_ts").as("c_end"))
      val parents = batch
        .select(col("context.span_id").as("p_span"), col("end_ts").as("p_end"))
      val batched = canon(children.join(parents,
        col("c_parent") === col("p_span") &&
          col("c_end") >= col("p_end") - expr("interval 1 hour") &&
          col("c_end") <= col("p_end"))
        .select(col("p_span"), col("c_span"),
          (unix_micros(col("p_end")) - unix_micros(col("c_end"))).as("drain_us")))
      assert(streamed.nonEmpty && streamed == batched)
      // every emitted drain is inside the declared horizon bound
      assert(streamed.forall { r =>
        val d = r(2).asInstanceOf[Long]; d >= 0 && d <= 3600L * 1000 * 1000
      })
    } finally q.stop()
  }

  test("H4 one sessionization operator, two modes: stream equals batch") {
    import org.apache.spark.sql.functions._
    // Relational.sessionize is a plain groupBy(session_window) — the SAME
    // operator must run unchanged as a streaming aggregate and produce the
    // batch answer once all data has arrived (complete mode)
    val d = "/root/testdata/sf0.001"
    val batchEvents = graft.queries.Tables.events(spark, d)
    val tmp = Files.createTempDirectory("graft-sess").toString
    batchEvents.write.mode("overwrite").parquet(tmp)
    val streamed = spark.readStream.schema(batchEvents.schema).parquet(tmp)
    val q = graft.queries.Relational.sessionize(streamed, "12 hours")
      .writeStream.outputMode("complete").format("memory")
      .queryName("sess_parity").start()
    try {
      q.processAllAvailable()
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(_.toSeq).sortBy(_.toString).toSeq
      val s = canon(spark.table("sess_parity"))
      val b = canon(graft.queries.Relational.sessionize(batchEvents, "12 hours"))
      assert(s.nonEmpty && s == b)
    } finally q.stop()
  }

  test("H4/H5/H6 pressure: 100k spans — watermark eviction bounds state") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val waves = 10
    val perWave = 10000
    val base = java.sql.Timestamp.valueOf("2026-01-01 00:00:00").getTime

    // (span idx, wave) → span row; waves are 10 event-minutes apart, so each
    // wave pushes the watermark far past the previous one
    def spansOf(mem: MemoryStream[(Long, Int)]) = mem.toDF()
      .select(
        lit("execute-task").as("name"),
        struct(
          // 100 spans per trace, traces strictly per-wave (so old traces go
          // idle and MUST be evicted by the accumulator's TTL)
          concat(lit("t"), (col("_1") / 100).cast("long").cast("string"))
            .as("trace_id"),
          concat(lit("s"), col("_1").cast("string")).as("span_id"),
          lit("[]").as("trace_state")).as("context"),
        struct(lit("OK").as("status_code"),
          lit(null).cast("string").as("description")).as("status"),
        timestamp_millis(lit(base) + col("_2").cast("long") * 600000L)
          .as("end_ts"),
        timestamp_millis(lit(base) + col("_2").cast("long") * 600000L)
          .as("start_ts"))
      .withColumn("end_time", col("end_ts").cast("string"))

    def wave(w: Int): Seq[(Long, Int)] =
      (w.toLong * perWave until (w + 1).toLong * perWave).map(i => (i, w))

    def lastStateRows(q: org.apache.spark.sql.streaming.StreamingQuery): Long =
      q.recentProgress.reverse.find(_.stateOperators.nonEmpty)
        .map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(-1L)

    // H6 dedup: 100k distinct ids + 10k re-deliveries, 2-minute lateness
    val memD = MemoryStream[(Long, Int)]
    val qd = SpanStream.dedupSpans(spansOf(memD), lateness = "2 minutes")
      .writeStream.outputMode("append").format("memory")
      .queryName("pressure_dedup").start()
    try {
      (0 until waves).foreach { w =>
        memD.addData(wave(w))
        memD.addData(wave(w).take(1000)) // at-least-once re-delivery
        qd.processAllAvailable()
      }
      assert(spark.table("pressure_dedup").count() == waves.toLong * perWave)
      val stateRows = lastStateRows(qd)
      // keys older than the watermark are gone: state holds ~the last wave,
      // not the whole 100k-key history
      assert(stateRows > 0 && stateRows <= 3L * perWave,
        s"dedup state not bounded by the watermark: $stateRows rows")
    } finally qd.stop()

    // H5 accumulator: per-wave traces go idle; 5-minute TTL past the
    // watermark must evict them
    val memS = MemoryStream[(Long, Int)]
    val qs = SpanStream.runStatusStream(spansOf(memS),
        lateness = "2 minutes", stateTtlMinutes = 5)
      .writeStream.outputMode("append").format("memory")
      .queryName("pressure_status").start()
    try {
      (0 until waves).foreach { w =>
        memS.addData(wave(w))
        qs.processAllAvailable()
      }
      // every span was counted: each trace's final row carries its 100 tasks
      val counted = spark.sql(
        "select sum(n) from (select trace_id, max(n_tasks) n from pressure_status group by 1)")
        .head().getLong(0)
      assert(counted == waves.toLong * perWave)
      val totalTraces = waves.toLong * perWave / 100
      // bounded by ACTIVE traces throughout the run (idle waves evicted by
      // the TTL — final state may legitimately be 0, everything idle)
      val maxStateRows = qs.recentProgress.flatMap(_.stateOperators)
        .map(_.numRowsTotal).max
      assert(maxStateRows > 0 && maxStateRows <= totalTraces / 2,
        s"accumulator state not evicted: peak $maxStateRows of $totalTraces traces")
      assert(lastStateRows(qs) <= totalTraces / 2)
    } finally qs.stop()
  }

  test("H7 pressure: stream-stream join state is evicted by the watermark") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val waves = 10
    val perWave = 10000
    val base = java.sql.Timestamp.valueOf("2026-01-01 00:00:00").getTime

    // even idx = parent span, odd idx = child of idx-1; waves are 10
    // event-minutes apart so each wave pushes the watermark far past the
    // previous one — with lateness 2 min and horizon 1 min, BOTH join
    // buffers must drop old waves
    def spansOf(mem: MemoryStream[(Long, Int)]) = mem.toDF()
      .select(
        when(col("_1") % 2 === 0, lit(null).cast("string"))
          .otherwise(concat(lit("s"), (col("_1") - 1).cast("string")))
          .as("parent_id"),
        struct(
          concat(lit("s"), col("_1").cast("string")).as("span_id"))
          .as("context"),
        lit("span").as("name"),
        timestamp_millis(lit(base) + col("_2").cast("long") * 600000L)
          .as("end_ts"))

    val mem = MemoryStream[(Long, Int)]
    val q = SpanStream.childParentJoin(spansOf(mem),
        lateness = "2 minutes", horizon = "1 minute")
      .writeStream.outputMode("append").format("memory")
      .queryName("pressure_join").start()
    try {
      def wave(w: Int): Seq[(Long, Int)] =
        (w.toLong * perWave until (w + 1).toLong * perWave).map(i => (i, w))
      (0 until waves).foreach { w =>
        mem.addData(wave(w))
        q.processAllAvailable()
      }
      // extra empty batches advance the watermark so the final waves'
      // matched rows flush out of the join buffers too
      mem.addData(Seq((waves.toLong * perWave, waves + 2)))
      q.processAllAvailable()
      // every child joined its same-wave parent exactly once (span ids are
      // unique and the pair's event-time gap is 0, inside the horizon)
      assert(spark.table("pressure_join").count() ==
        (waves.toLong * perWave) / 2)
      val stateRows = q.recentProgress.reverse
        .find(_.stateOperators.nonEmpty)
        .map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(-1L)
      // the join buffered 100k spans over the run; watermark eviction must
      // leave only ~the most recent wave(s), never the full history
      assert(stateRows >= 0 && stateRows <= 3L * perWave,
        s"join state not bounded by the watermark: $stateRows rows")
    } finally q.stop()
  }

  test("H5 pressure at sf0.1: real span feed, batch ground truth, eviction") {
    // the synthetic pressure test above proves the TTL bounds state; this
    // one drives the accumulator with the REAL sf0.1-derived span shapes
    // (one trace per customer, one task span per order, status from the
    // order, a dag-top-span closing each trace) and cross-checks every
    // count against the batch table the spans derive from
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val orders = graft.queries.Tables.orders(spark, "/root/testdata/sf0.1")
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderstatus"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val nOrders = orders.length.toLong
    val nErrOrders = orders.count(_._3 == "F").toLong
    val traces = orders.map(_._1).distinct
    val nTraces = traces.length.toLong
    assert(nOrders > 40000L, s"sf0.1 should be bench-sized: $nOrders orders")

    val waves = 10
    val base = java.sql.Timestamp.valueOf("2026-01-01 00:00:00").getTime
    // (custkey, orderkey, status); orderkey -1 = the trace's dag-top-span
    val mem = MemoryStream[(Long, Long, String)]
    val feed = mem.toDF().select(
      when(col("_2") < 0, "dag-top-span").otherwise("execute-task").as("name"),
      struct(
        concat(lit("c"), col("_1").cast("string")).as("trace_id"),
        concat(lit("s"), col("_1").cast("string"), lit("-"),
          col("_2").cast("string")).as("span_id"),
        lit("[]").as("trace_state")).as("context"),
      struct(
        when(col("_3") === "F", "ERROR").otherwise("OK").as("status_code"),
        lit(null).cast("string").as("description")).as("status"),
      timestamp_millis(lit(base) + (col("_1") % waves) * 600000L).as("end_ts"))
      .withColumn("end_time", col("end_ts").cast("string"))

    val q = SpanStream.runStatusStream(feed,
        lateness = "2 minutes", stateTtlMinutes = 5)
      .writeStream.outputMode("append").format("memory")
      .queryName("pressure_sf01").start()
    try {
      // customers arrive in 10 event-time waves 10 minutes apart: each
      // wave's traces complete (top span included) and go idle, so the
      // 5-minute TTL must evict them as later waves advance the watermark
      (0 until waves).foreach { w =>
        val rows = orders.filter(_._1 % waves == w) ++
          traces.filter(_ % waves == w).map(c => (c, -1L, "O"))
        mem.addData(rows.toSeq)
        q.processAllAvailable()
      }
      val fin = spark.sql(
        """select trace_id, max(n_tasks) n_tasks, max(n_errors) n_errors,
          |  bool_or(finished) finished
          |from pressure_sf01 group by 1""".stripMargin).collect()
      // batch ground truth: every order counted exactly once, every F order
      // an error, every customer's trace closed by its top span
      assert(fin.length.toLong == nTraces)
      assert(fin.map(_.getAs[Long]("n_tasks")).sum == nOrders)
      assert(fin.map(_.getAs[Long]("n_errors")).sum == nErrOrders)
      assert(fin.forall(_.getAs[Boolean]("finished")))
      // eviction observed: peak state stays a fraction of the trace count
      val maxStateRows = q.recentProgress.flatMap(_.stateOperators)
        .map(_.numRowsTotal).max
      assert(maxStateRows > 0 && maxStateRows <= nTraces / 2,
        s"state not evicted: peak $maxStateRows of $nTraces traces")
    } finally q.stop()
  }

  test("H8 streaming frequent items: bounded state covers every true heavy hitter") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.{col, count, lit}
    import graft.streaming.FrequentItems
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    // Zipf-ish corpus far larger than the counter budget, fed in 3 batches
    val corpus = (1 to 800).flatMap(i => Seq.fill(math.max(1, 600 / i))(s"w$i"))
    val shuffled = new scala.util.Random(7).shuffle(corpus)
    val (nBuckets, k) = (4, 32)

    val mem = MemoryStream[String]
    val q = FrequentItems
      .frequentTokensStream(mem.toDF(), "value", nBuckets, k)
      .writeStream.format("memory").queryName("h8_freq")
      .outputMode("update").start()
    try {
      shuffled.grouped((shuffled.size + 2) / 3).foreach { batch =>
        mem.addData(batch)
        q.processAllAvailable()
      }
    } finally q.stop()

    // latest summary per bucket = the row with the max (monotone) n
    val rows = spark.table("h8_freq")
      .as[FrequentItems.BucketSummary].collect()
      .groupBy(_.bucket).map { case (_, v) => v.maxBy(_.n) }

    // exact ground truth per bucket via the SAME bucket expression
    val exact = shuffled.toDF("token")
      .select(FrequentItems.bucketOf(col("token"), nBuckets).as("bucket"),
        col("token"))
      .groupBy(col("bucket"), col("token")).agg(count(lit(1)).as("cnt"))
      .collect()
      .groupBy(_.getInt(0))
      .map { case (b, rs) =>
        b -> rs.map(r => (r.getString(1), r.getLong(2))).toMap
      }

    assert(rows.map(_.n).sum == shuffled.size,
      "cumulative bucket counts must partition the stream")
    var checkedHitters = 0
    rows.foreach { s =>
      assert(s.tokens.length <= k, s"bucket ${s.bucket} state exceeds k")
      val truth = exact(s.bucket)
      val bound = s.n / (k + 1)
      for ((tok, c) <- truth if c > bound) {
        checkedHitters += 1
        assert(s.tokens.contains(tok),
          s"bucket ${s.bucket}: $tok (count $c > bound $bound) missing " +
            "from the cross-batch summary")
      }
    }
    assert(checkedHitters > 0, "degenerate fixture: no heavy hitters")
  }

  test("H5 stateful run-status accumulator finalizes on dag-top-span") {
    val dir = spanDir
    val q = SpanStream.runStatusStream(SpanStream.readSpanStream(spark, dir))
      .writeStream.outputMode("append").format("memory")
      .queryName("runstatus").start()
    try {
      q.processAllAvailable()
      val rows = spark.sql(
        """select trace_id, max(n_tasks) n_tasks, max(n_errors) n_errors,
          |  bool_or(finished) finished
          |from runstatus group by 1""".stripMargin)
        .collect()
      assert(rows.length == 2)
      assert(rows.forall(_.getAs[Boolean]("finished")))
      assert(rows.map(_.getAs[Long]("n_tasks")).sum == 2L)
      assert(rows.map(_.getAs[Long]("n_errors")).sum == 1L)
    } finally q.stop()
  }

  test("H9 streaming HLL distinct: register-exact vs batch, evicted by TTL") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    import graft.streaming.ApproxDistinct
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val base = java.sql.Timestamp.valueOf("2026-02-01 00:00:00").getTime
    // 3 hourly windows; window w sees users [300w, 300w + 1800): 1800
    // distinct each, two-thirds shared with the neighbor
    val events = for {
      w <- 0 until 3
      u <- 300 * w until (300 * w + 1800)
      rep <- 0 until 2 // duplicates must not move the estimate
    } yield (s"user$u", new java.sql.Timestamp(
      base + w * 3600000L + ((u * 7 + rep * 13) % 3600) * 1000L))
    val shuffled = new scala.util.Random(11).shuffle(events)

    val mem = MemoryStream[(String, java.sql.Timestamp)]
    val q = ApproxDistinct.distinctPerWindow(
        mem.toDF().toDF("user", "ts"), "ts", "user",
        // the feed is FULLY shuffled across the 3-hour span, so allowed
        // lateness must cover the whole disorder or the watermark would
        // (correctly) drop the late arrivals the batch truth counts; the
        // 5-minute TTL is floored to the 4-hour lateness internally (a
        // finalized row must be final), so eviction needs the watermark
        // past windowEnd + 4 h — the +48 h straggler provides that
        windowDur = "1 hour", lateness = "4 hours", stateTtlMinutes = 5)
      .writeStream.outputMode("append").format("memory")
      .queryName("h9_hll").start()
    try {
      shuffled.grouped((shuffled.size + 3) / 4).foreach { b =>
        mem.addData(b.toSeq)
        q.processAllAvailable()
      }
      // a far-future straggler pushes the watermark past every window's
      // TTL: the three windows must emit finalized rows and drop state
      mem.addData(Seq(("tail",
        new java.sql.Timestamp(base + 48 * 3600000L))))
      q.processAllAvailable()
      mem.addData(Seq(("tail2",
        new java.sql.Timestamp(base + 49 * 3600000L))))
      q.processAllAvailable()

      val out = spark.table("h9_hll")
        .as[ApproxDistinct.WindowEstimate].collect()
      val fin = out.filter(_.finalized).map(e => e.win_start_us -> e).toMap
      val wins = (0 until 3).map(w => (base + w * 3600000L) * 1000L)
      assert(wins.forall(fin.contains),
        s"missing finalized windows: got ${fin.keys.toSeq.sorted}")

      // batch ground truth: SAME hash expression, SAME fold — registers
      // must match bit-for-bit (merge order cannot matter)
      val hashed = shuffled.toDF("user", "ts")
        .select(unix_micros(window(col("ts"), "1 hour")
          .getField("start")).as("w"), xxhash64(col("user")).as("h"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      for (w <- wins) {
        val regs = new Array[Byte](ApproxDistinct.M)
        hashed.filter(_._1 == w).foreach(p => ApproxDistinct.fold(regs, p._2))
        assert(java.util.Arrays.equals(fin(w).registers, regs),
          s"window $w: stream registers differ from the batch fold")
        assert(fin(w).estimate == ApproxDistinct.estimate(regs))
        val truth = 1800.0
        assert(math.abs(fin(w).estimate - truth) / truth < 0.15,
          s"window $w: estimate ${fin(w).estimate} vs true $truth")
      }
      // every event-window pair counted exactly once across batches
      assert(fin.values.map(_.n_events).sum == events.size)
      // eviction observed: final state holds only the straggler windows
      val lastStateRows = q.recentProgress.flatMap(_.stateOperators)
        .map(_.numRowsTotal).last
      assert(lastStateRows <= 2,
        s"window state not evicted: $lastStateRows rows live")
    } finally q.stop()
  }

  test("H12 exact streaming serve: bit-parity with batch, stateless plan, append-once across batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val d = "/root/testdata/sf0.001"
    val e = graft.queries.Tables.embeddings(spark, d)
    val corpus = e.filter(col("vec_id") >= 64)
    val queryRows = e.filter(col("vec_id") < 64)
      .select(col("vec_id"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    assert(queryRows.length == 64)
    val (b1, b2) = queryRows.splitAt(32)

    val mem = MemoryStream[(Long, Seq[Float])]
    val serve = graft.streaming.VectorServe.serveExact(
      mem.toDF().toDF("vec_id", "embedding"), corpus, "vec_id", "embedding", k = 5)
    assert(serve.isStreaming)
    val q = serve.writeStream.outputMode("append").format("memory")
      .queryName("h12_exact").start()
    try {
      mem.addData(b1: _*)
      q.processAllAvailable()
      val afterB1 = spark.table("h12_exact").count()
      assert(afterB1 == 32L * 5)
      // the serve micro-batch is a pure projection + generator — NO state
      // operator: nothing grows with query volume, nothing awaits a
      // watermark, checkpoint recovery has only source offsets to replay
      assert(q.lastProgress.stateOperators.isEmpty,
        s"serve plan grew state: ${q.lastProgress.stateOperators.mkString}")
      mem.addData(b2: _*)
      q.processAllAvailable()
      val streamed = spark.table("h12_exact").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      // batch-1 answers appended exactly once (no recompute on batch 2)
      assert(streamed.length == 64 * 5)
      // bit-parity with the batch serving tier: same integer-grid dots,
      // same (score DESC, id ASC) ties — the stream answers exactly what
      // one batch over the same queries would
      val batch = graft.llm.Similarity.batchTopK(
        e.filter(col("vec_id") < 64), corpus, "vec_id", "embedding", k = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      assert(streamed.toSet == batch.toSet)
    } finally q.stop()
  }

  test("H12 filtered streaming serve: parity with the filtered batch tier, stateless, pushed filter") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val d = "/root/testdata/sf0.001"
    val e = graft.queries.Tables.embeddings(spark, d)
    val pred = col("vec_id") >= 64 && col("label").isin(0L, 1L)
    // the predicate reaches the corpus parquet scan as pushed filters —
    // the same plan contract the batch i3_filtered_topk row pins: rows
    // outside the scope never decode their embedding column
    val scanPlan = e.filter(pred).queryExecution.executedPlan.toString
    assert(scanPlan.contains("PushedFilters") &&
      scanPlan.contains("GreaterThanOrEqual(vec_id,64"), scanPlan.take(1200))

    val queryRows = e.filter(col("vec_id") < 64)
      .select(col("vec_id"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    val mem = MemoryStream[(Long, Seq[Float])]
    val serve = graft.streaming.VectorServe.serveExactFiltered(
      mem.toDF().toDF("vec_id", "embedding"), e, pred,
      "vec_id", "embedding", k = 5)
    assert(serve.isStreaming)
    val q = serve.writeStream.outputMode("append").format("memory")
      .queryName("h12_filtered").start()
    val streamed = try {
      mem.addData(queryRows: _*)
      q.processAllAvailable()
      assert(q.lastProgress.stateOperators.isEmpty,
        "filtered serve must stay stateless")
      spark.table("h12_filtered").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    } finally q.stop()
    // every neighbor satisfies the predicate (no post-filter under-fill:
    // all k slots are true filtered-set neighbors)
    val inScope = e.filter(pred).select(col("vec_id"))
      .collect().map(_.getLong(0)).toSet
    assert(streamed.nonEmpty && streamed.forall(t => inScope(t._2)))
    assert(streamed.groupBy(_._1).values.forall(_.length == 5))
    // tuple-for-tuple parity with the filtered BATCH serve
    val batch = graft.llm.Similarity.batchTopK(
      e.filter(col("vec_id") < 64), e.filter(pred),
      "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(streamed.toSet == batch.toSet)
  }

  test("H12 IVF streaming serve: parity with batch ivfServe, filtered variant scoped, stateless") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val d = "/root/testdata/sf0.001"
    val e = graft.queries.Tables.embeddings(spark, d)
    val corpus = e.filter(col("vec_id") >= 64)
    val queryRows = e.filter(col("vec_id") < 64)
      .select(col("vec_id"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))

    val mem = MemoryStream[(Long, Seq[Float])]
    val serve = graft.streaming.VectorServe.serveIvf(
      mem.toDF().toDF("vec_id", "embedding"), corpus, "vec_id", "embedding", k = 5)
    assert(serve.isStreaming)
    val q = serve.writeStream.outputMode("append").format("memory")
      .queryName("h12_ivf").start()
    val streamed = try {
      mem.addData(queryRows.take(20): _*)
      q.processAllAvailable()
      // stateless: the probe + heap-scan is a projection + generator
      assert(q.lastProgress.stateOperators.isEmpty,
        s"IVF serve plan grew state: ${q.lastProgress.stateOperators.mkString}")
      mem.addData(queryRows.drop(20): _*)
      q.processAllAvailable()
      spark.table("h12_ivf").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    } finally q.stop()
    // tuple-for-tuple parity with the BATCH IVF serve: same centroids
    // (identical training call), same cell assignment (the same executor
    // expression packs the broadcast), same probe arithmetic (shared
    // NearestCells.pick), same integer-grid dots and tie conventions
    val batch = graft.llm.Similarity.ivfServe(
      e.filter(col("vec_id") < 64), corpus, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(streamed.toSet == batch.toSet,
      s"stream/batch diverged: ${streamed.toSet.diff(batch.toSet).take(3)} vs ${batch.toSet.diff(streamed.toSet).take(3)}")

    // filtered variant: every neighbor satisfies the predicate, parity
    // with the batch serve over the filtered corpus
    val pred = col("vec_id") >= 64 && col("label").isin(0L, 1L)
    val mem2 = MemoryStream[(Long, Seq[Float])]
    val serveF = graft.streaming.VectorServe.serveIvfFiltered(
      mem2.toDF().toDF("vec_id", "embedding"), e, pred,
      "vec_id", "embedding", k = 5)
    val q2 = serveF.writeStream.outputMode("append").format("memory")
      .queryName("h12_ivf_filtered").start()
    val streamedF = try {
      mem2.addData(queryRows: _*)
      q2.processAllAvailable()
      assert(q2.lastProgress.stateOperators.isEmpty)
      spark.table("h12_ivf_filtered").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    } finally q2.stop()
    val inScope = e.filter(pred).select(col("vec_id"))
      .collect().map(_.getLong(0)).toSet
    assert(streamedF.nonEmpty && streamedF.forall(t => inScope(t._2)))
    val batchF = graft.llm.Similarity.ivfServe(
      e.filter(col("vec_id") < 64), e.filter(pred),
      "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(streamedF.toSet == batchF.toSet)
  }

  test("H12 PQ streaming serve: stream equals the batch ADC kernel, recall holds vs exact") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val d = "/root/testdata/sf0.001"
    val e = graft.queries.Tables.embeddings(spark, d)
    val corpus = e.filter(col("vec_id") >= 64)
    val queriesDf = e.filter(col("vec_id") < 64)
    val queryRows = queriesDf.select(col("vec_id"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))

    val mem = MemoryStream[(Long, Seq[Float])]
    val serve = graft.streaming.VectorServe.servePq(
      mem.toDF().toDF("vec_id", "embedding"), corpus, "vec_id", "embedding", k = 5)
    val q = serve.writeStream.outputMode("append").format("memory")
      .queryName("h12_pq").start()
    val streamed = try {
      mem.addData(queryRows.take(20): _*)
      q.processAllAvailable()
      assert(q.lastProgress.stateOperators.isEmpty)
      mem.addData(queryRows.drop(20): _*)
      q.processAllAvailable()
      spark.table("h12_pq").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    } finally q.stop()

    // structure: ≤k per query, contiguous ranks, neighbors from the corpus
    val byQuery = streamed.groupBy(_._1)
    assert(byQuery.size == queryRows.length)
    byQuery.values.foreach { rs =>
      assert(rs.length <= 5)
      assert(rs.map(_._4).sorted.toSeq == (1 to rs.length))
    }
    assert(streamed.forall(_._2 >= 64))

    // the streaming plumbing changes nothing: same code table (cached by
    // corpus key), same per-row ADC kernel — batch application of servePq's
    // kernel over the same queries must agree tuple-for-tuple
    val batchPq = graft.streaming.VectorServe.servePq(
      queriesDf, corpus, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(streamed.toSet == batchPq.toSet)

    // PQ quantization keeps rank-1 recall well above chance vs the exact
    // serve. Measured 0.719 on this 64-query/436-corpus split (2026-08-15)
    // — lower than the ~0.9 the self-join PqCalib run shows because the
    // codebooks train on the 436-row corpus sample only; floor at 0.6
    // leaves jitter slack while still catching a broken kernel (random
    // top-1 would be ~1/436)
    val exact1 = graft.llm.Similarity.batchTopK(
      queriesDf, corpus, "vec_id", "embedding", k = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq1 = streamed.filter(_._4 == 1).map(t => (t._1, t._2)).toSet
    val recall = exact1.count(pq1.contains).toDouble / exact1.size
    assert(recall >= 0.6, s"PQ rank-1 recall $recall below floor")
  }
}
