package graft

import org.apache.spark.sql.SparkSession

/** Per-query profiling harness: like Bench but prints each query's time as
  * it completes (and can run a single query by name). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val only = args.headOption
    val explain = args.contains("--explain")
    if (only.contains("parsebench")) {
      // synthetic workflow: nTasks execute-task trees, each with guard +
      // call + values/artifacts/dependency spans (the reference's shape)
      import graft.model._
      val nTasks = args.lift(1).flatMap(a => scala.util.Try(a.toInt).toOption)
        .getOrElse(2000)
      val perTask = 20
      def iso(i: Long) = TimeFns.toIso(java.time.Instant.ofEpochMilli(1700000000000L + i))
      val spans = scala.collection.mutable.ArrayBuffer.empty[SpanRow]
      def mk(name: String, sid: String, parent: Option[String], t: Long,
          attrs: Map[String, Any] = Map.empty, status: String = "OK") =
        SpanRow(name, SpanContextRow("0xt", sid, "[]"), parent, "SpanKind.INTERNAL",
          iso(t), iso(t + 10), SpanStatusRow(status, None),
          AttrCodec.renderMap(attrs), Nil, Nil, Map.empty)
      spans += mk("dag-top-span", "0xtop", None, 0L,
        Map("workflow.env" -> "bench"))
      (0 until nTasks).foreach { t =>
        val tid = f"0xtask$t%06d"
        spans += mk("execute-task", tid, Some("0xtop"), t * 100L,
          Map("task.id" -> s"task_$t", "task.type" -> "python",
            "task.num_cpus" -> 1, "task.timeout_s" -> -1))
        spans += mk("timeout-guard", s"$tid-g", Some(tid), t * 100L + 1)
        spans += mk("call-python-function", s"$tid-c", Some(s"$tid-g"), t * 100L + 2)
        (0 until perTask).foreach { v =>
          spans += mk("named-value", f"$tid-v$v%03d", Some(s"$tid-c"), t * 100L + 3 + v,
            Map("name" -> s"metric_$v", "type" -> "int",
              "encoding" -> "json", "content_encoded" -> v.toString))
        }
      }
      val total = spans.size
      println(s"parsebench: $total spans, $nTasks tasks")
      val df = SpanModel.toDF(spark, spans.toSeq)
      df.count()
      val t0 = System.nanoTime()
      val summary = parser.SpanParser.parseSpans(df)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"parseSpans: $sec%.2f s, ${total / sec}%.0f spans/s, " +
        s"${summary.taskRuns.size} task runs")
      val t1 = System.nanoTime()
      val n = parser.SpanParser.taskRunsDF(df).count()
      println(f"taskRunsDF: ${(System.nanoTime() - t1) / 1e9}%.2f s ($n rows)")
      spark.stop(); return
    }
    if (only.contains("cosparts")) {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      def time[A](label: String)(f: => A): A = {
        val t0 = System.nanoTime(); val r = f
        println(f"  ${(System.nanoTime() - t0) / 1e9}%7.2f  $label"); r
      }
      val e = queries.Tables.embeddings(spark, sfDir)
      time("warmup")(e.count())
      val q = e.select(col("vec_id").as("query_id"),
        llm.Similarity.quantize(col("embedding")).as("qv"))
        .withColumn("qn", sqrt(functions.ArrayOps.longArrayDot(col("qv"), col("qv")).cast("double")))
      val c = e.select(col("vec_id").as("neighbor_id"),
        llm.Similarity.quantize(col("embedding")).as("cv"))
        .withColumn("cn", sqrt(functions.ArrayOps.longArrayDot(col("cv"), col("cv")).cast("double")))
      val pairs = q.join(broadcast(c), col("query_id") =!= col("neighbor_id"))
        .withColumn("cos_sim",
          functions.ArrayOps.longArrayDot(col("qv"), col("cv")).cast("double") / (col("qn") * col("cn")))
      time("pairs only (join+dot)")(pairs.count())
      time("pairs only again")(pairs.count())
      val slim = pairs.select(col("query_id"), col("neighbor_id"), col("cos_sim"))
      time("slim pairs")(slim.count())
      time("heap topk")(pairs.groupBy(col("query_id"))
        .agg(functions.TopKAgg.topKByScore(
          struct(col("cos_sim").as("score"), col("neighbor_id").as("id")), 5).as("top"))
        .count())
      time("heap topk on slim")(slim.groupBy(col("query_id"))
        .agg(functions.TopKAgg.topKByScore(
          struct(col("cos_sim").as("score"), col("neighbor_id").as("id")), 5).as("top"))
        .count())
      time("production bruteForceTopK")(
        llm.Similarity.bruteForceTopK(e, e, "vec_id", "embedding", k = 5).count())
      time("production again")(
        llm.Similarity.bruteForceTopK(e, e, "vec_id", "embedding", k = 5).count())
      val pairsW = q.join(broadcast(c), col("query_id") =!= col("neighbor_id"))
        .withColumn("cos_sim",
          when(col("qn") * col("cn") > 0d,
            functions.ArrayOps.longArrayDot(col("qv"), col("cv")).cast("double")
              / (col("qn") * col("cn"))).otherwise(lit(null)))
      time("when-pairs")(pairsW.count())
      val fW = pairsW.filter(col("cos_sim").isNotNull)
      time("when-pairs+filter")(fW.count())
      time("heap topk when+filter")(fW.groupBy(col("query_id"))
        .agg(functions.TopKAgg.topKByScore(
          struct(col("cos_sim").as("score"), col("neighbor_id").as("id")), 5).as("top"))
        .count())
      val agged = fW.groupBy(col("query_id"))
        .agg(functions.TopKAgg.topKByScore(
          struct(col("cos_sim").as("score"), col("neighbor_id").as("id")), 5).as("top"))
      time("topk + posexplode")(agged
        .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "entry")))
        .select(col("query_id"), col("entry.id").as("neighbor_id"),
          col("entry.score").as("cos_sim"),
          (col("pos") + 1).cast("int").as("rank"))
        .count())
      spark.stop(); return
    }
    if (only.contains("scratch")) {
      import org.apache.spark.sql.functions._
      def time[A](label: String)(f: => A): A = {
        val t0 = System.nanoTime(); val r = f
        println(f"  ${(System.nanoTime() - t0) / 1e9}%7.2f  $label"); r
      }
      val li = queries.Tables.lineitem(spark, sfDir)
      time("warmup")(li.count())
      val basket = li.filter(col("l_quantity") >= 25)
        .select(col("l_orderkey"), col("l_partkey"))
        .repartition(col("l_orderkey")).distinct()
      val edges = basket.select(col("l_orderkey"), col("l_partkey").as("a"))
        .join(basket.select(col("l_orderkey"), col("l_partkey").as("b")),
          Seq("l_orderkey"))
        .filter(col("a") < col("b"))
        .select(col("a"), col("b")).distinct()
      time("edges 1st")(edges.count())
      time("edges 2nd")(edges.count())
      val t0 = System.nanoTime()
      val sym = edges.select(col("a").as("u"), col("b").as("v"))
        .unionAll(edges.select(col("b").as("u"), col("a").as("v")))
        .repartition(col("u")).localCheckpoint()
      println(f"  ${(System.nanoTime() - t0) / 1e9}%7.2f  sym checkpoint")
      var deg = time("deg0")(sym.groupBy(col("u")).agg(count(lit(1)).as("deg")).localCheckpoint())
      var r = 0
      while (r < 15) {
        val t1 = System.nanoTime()
        val doomed = deg.filter(col("deg") < 20).select(col("u"))
        val empty = doomed.isEmpty
        val t2 = System.nanoTime()
        if (empty) { println(f"  round $r%2d: isEmpty ${(t2-t1)/1e9}%.2f -> converged"); r = 99 }
        else {
          val dec = sym.join(doomed.select(col("u").as("v")), "v")
            .groupBy(col("u")).agg(count(lit(1)).as("dec"))
          val prevDeg = deg
          deg = deg.filter(col("deg") >= 20)
            .join(dec, Seq("u"), "left")
            .select(col("u"), (col("deg") - coalesce(col("dec"), lit(0L))).as("deg"))
            .localCheckpoint()
          graft.operators.Checkpoints.release(prevDeg)
          println(f"  round $r%2d: isEmpty ${(t2-t1)/1e9}%.2f ckpt ${(System.nanoTime()-t2)/1e9}%.2f")
          r += 1
        }
      }
      spark.stop(); return
    }
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (only.forall(o => o.startsWith("--") || name.contains(o))) {
        if (explain) {
          println(s"==== $name")
          fn(spark, sfDir).explain("formatted")
        } else {
          // --twice re-runs each query in-session: run1−run2 ≈ plan+codegen
          // overhead, run2 ≈ steady-state execution
          val reps = if (args.contains("--twice")) 2 else 1
          (1 to reps).foreach { rep =>
            val t0 = System.nanoTime()
            val n = try fn(spark, sfDir).count()
            catch { case e: Throwable => println(s"$name FAILED: ${e.getMessage}"); -1L }
            println(f"${(System.nanoTime() - t0) / 1e9}%8.2f  $name#$rep ($n rows)")
            Console.flush()
          }
        }
      }
    }
    spark.stop()
  }
}
