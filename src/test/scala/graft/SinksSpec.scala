package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.exec.{Engine, SpanRecorder, TaskContext}
import graft.model.SpanModel
import graft.parser.SpanParser
import graft.sinks._

/** Sink-layer tests (SURVEY §2 G1-G4, F3): directory layout and Mermaid
  * rendering over a real engine run — ports of the reference's
  * `test_otel_logging.py:155-182` layout assertions. */
class SinksSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  def runWorkflow(): graft.parser.WorkflowSummary = {
    val engine = new Engine(spark, 4)
    val ok = engine.task("ingest-data")(_ => {
      TaskContext.get.logArtefact("out.txt", "file-contents")
      TaskContext.get.logInt("n_rows", 42)
      1
    })
    val fail = engine.task("train.model")(args =>
      throw new Exception("training exploded"))
    val spans = SpanRecorder.record(engine) {
      engine.runDag(Seq(fail(Seq(ok(Nil)))), Map("workflow.env" -> "ci"))
    }
    SpanParser.parseSpans(SpanModel.toDF(spark, spans))
  }

  lazy val summary = runWorkflow()

  test("G1 directory-tree sink layout") {
    val out = Files.createTempDirectory("graft-dirsink")
    DirectoryTreeSink.write(summary, out)

    assert(Files.exists(out.resolve("run-time-metadata.json")))
    val dirs = Files.list(out).iterator()
    val names = scala.jdk.CollectionConverters.IteratorHasAsScala(dirs)
      .asScala.map(_.getFileName.toString).toSet - "run-time-metadata.json"
    val okRun = summary.taskRuns.find(_.taskId == "ingest-data").get
    val failRun = summary.taskRuns.find(_.taskId == "train.model").get
    assert(names.contains(s"python-task--ingest-data--${okRun.spanId}--OK"))
    // "." in task id sanitized to "-"
    assert(names.contains(s"python-task--train-model--${failRun.spanId}--FAILED"))
    val artifact = out.resolve(
      s"python-task--ingest-data--${okRun.spanId}--OK/artifacts/out.txt")
    assert(Files.exists(artifact))
    assert(new String(Files.readAllBytes(artifact)) == "file-contents")
    // metadata json parses back
    val meta = graft.model.Json.parse(new String(Files.readAllBytes(
      out.resolve("run-time-metadata.json"))))
    assert(meta.asInstanceOf[collection.Map[String, Any]]("span_id") != null)
  }

  test("G1 safePath rejects traversal") {
    intercept[IllegalArgumentException](
      DirectoryTreeSink.safePath(java.nio.file.Paths.get("/tmp/a/../b")))
    intercept[IllegalArgumentException](
      DirectoryTreeSink.safePath(java.nio.file.Paths.get("relative/path")))
  }

  test("artifact names cannot escape the sink directory (resolveSafe)") {
    val base = java.nio.file.Paths.get("/tmp/www/artifacts")
    // Path.resolve discards the base for absolute input; ".." walks out —
    // both must be rejected on user-controlled artifact names
    intercept[IllegalArgumentException](
      DirectoryTreeSink.resolveSafe(base, "/etc/evil"))
    intercept[IllegalArgumentException](
      DirectoryTreeSink.resolveSafe(base, "a/../../../evil"))
    assert(DirectoryTreeSink.resolveSafe(base, "sub/ok.txt")
      .startsWith(base))
    assert(DirectoryTreeSink.resolveSafe(base, "a/./b.txt").toString
      == "/tmp/www/artifacts/a/b.txt")
  }

  test("G2 Mermaid DAG rendering") {
    val dag = Mermaid.dagInputFile(summary, generateLinks = false)
    assert(dag.startsWith("graph LR"))
    summary.taskRuns.foreach { t =>
      assert(dag.contains(s"TASK_SPAN_ID_${t.spanId}"))
    }
    assert(dag.contains("ingest-data (Python task)"))
    val okRun = summary.taskRuns.find(_.taskId == "ingest-data").get
    val failRun = summary.taskRuns.find(_.taskId == "train.model").get
    assert(dag.contains(
      s"TASK_SPAN_ID_${okRun.spanId} --> TASK_SPAN_ID_${failRun.spanId}"))

    val linked = Mermaid.dagInputFile(summary, generateLinks = true)
    assert(linked.contains("<a href='./#/experiments/ingest-data/runs/"))
    assert(linked.contains("task.num_cpus=1"))
    assert(!linked.contains("task.type=")) // excluded from attr lines
  }

  test("G3 Mermaid Gantt rendering") {
    val gantt = Mermaid.ganttInputFile(summary)
    assert(gantt.startsWith("gantt"))
    assert(gantt.contains("dateFormat x"))
    assert(gantt.contains("section ingest-data (Python task)"))
    assert(gantt.contains("- OK : "))
    assert(gantt.contains("- FAILED :crit "))
  }

  test("G4 static-data sink union schema") {
    val www = Files.createTempDirectory("graft-www")
    val entries = StaticDataSink.process(summary, www)
    StaticDataSink.writeStaticData(entries, www)

    assert(entries.head("type") == "workflow")
    assert(entries.head("parent_span_id") == null)
    assert(entries.tail.forall(_("type") == "task"))
    assert(entries.tail.forall(_("parent_span_id") == summary.spanId))

    assert(Files.exists(www.resolve("static_data.json")))
    assert(Files.exists(www.resolve(
      s"artifacts/workflow/${summary.spanId}/dag.mmd")))
    assert(Files.exists(www.resolve(
      s"artifacts/workflow/${summary.spanId}/gantt.mmd")))
    val okRun = summary.taskRuns.find(_.taskId == "ingest-data").get
    assert(Files.exists(www.resolve(
      s"artifacts/task/${okRun.spanId}/out.txt")))
    assert(Files.exists(www.resolve(
      s"artifacts/task/${okRun.spanId}/run-time-metadata.json")))
  }

  test("F3 GitHub env capture with secrets guard") {
    val env = Map(
      "GITHUB_REPOSITORY" -> "myorg/myrepo",
      "GITHUB_ACTOR" -> "someone",
      "RUNNER_NAME" -> "Hosted Agent")
    val got = GithubEnv.githubEnvVariables(env.get)
    assert(got == Map(
      "workflow.github.repository" -> "myorg/myrepo",
      "workflow.github.actor" -> "someone",
      "workflow.github.runner_name" -> "Hosted Agent"))
    assert(GithubEnv.githubEnvVariables(_ => None).isEmpty)
  }

  test("G6 parquet runs archive: date-partitioned, partition-pruned reads") {
    val engine = new Engine(spark, 2)
    val t = engine.task("archived")(_ => 1)
    val spans = SpanRecorder.record(engine) { engine.runDag(t(Nil), Map()) }
    val df = SpanParser.taskRunsDF(graft.model.SpanModel.toDF(spark, spans))
    val dir = Files.createTempDirectory("graft-archive").toString + "/runs"
    graft.sinks.ParquetRunsSink.write(df, dir)
    // layout: run_date=YYYY-MM-DD partition directories
    val parts = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("run_date="))
    assert(parts.nonEmpty, new java.io.File(dir).listFiles().toSeq)
    val back = graft.sinks.ParquetRunsSink.read(spark, dir)
    assert(back.count() == df.count())
    // a run_date filter must prune partitions at the scan
    val day = parts.head.getName.stripPrefix("run_date=")
    val filtered = back.filter(org.apache.spark.sql.functions
      .col("run_date") === day)
    filtered.collect()
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(run_date"), plan)
  }

  test("G5 zip source round-trip for the static-data path") {
    // build a run zip: spans as a JSON array under opentelemetry-spans.json
    val engine = new Engine(spark, 2)
    val t = engine.task("solo")(_ => 7)
    val spans = SpanRecorder.record(engine) { engine.runDag(t(Nil), Map()) }
    val json = "[" + spans.map(graft.exec.SpanJson.render).mkString(",\n") + "]"

    val dir = Files.createTempDirectory("graft-zips")
    val zipPath = dir.resolve("run1.zip")
    val zos = new java.util.zip.ZipOutputStream(Files.newOutputStream(zipPath))
    zos.putNextEntry(new java.util.zip.ZipEntry("opentelemetry-spans.json"))
    zos.write(json.getBytes("UTF-8"))
    zos.closeEntry(); zos.close()

    val back = graft.spans.SpanSource.readZips(spark, s"$dir/*.zip")
    assert(back.count() == spans.size)
    val s = SpanParser.parseSpans(back.drop("source_zip"))
    assert(s.taskRuns.map(_.taskId) == Seq("solo"))
  }
}
