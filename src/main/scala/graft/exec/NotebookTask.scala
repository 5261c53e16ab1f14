package graft.exec

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

import scala.collection.immutable.ListMap

import graft.model.Json

/** E8 — jupytext notebook parsing: the py:percent format the reference's
  * notebook tasks are stored in (`jupytext --to notebook`,
  * `composable_logs/tasks/tasks.py:16-43`). `# %%` opens a code cell,
  * `# %% [markdown]` a markdown cell (source carried in `#` comments);
  * the leading `# ---` YAML header is metadata, not a cell.
  */
object Jupytext {
  case class Cell(cellType: String, source: String)

  def parse(py: String): Seq[Cell] = {
    val lines = py.linesIterator.toVector
    // column 0 only, like jupytext: an INDENTED "# %%" is an ordinary
    // comment inside a cell body, not a cell boundary
    def isMarker(l: String) = l.startsWith("# %%")
    val markerIdxs = lines.indices.filter(i => isMarker(lines(i)))
    val cells = scala.collection.mutable.ArrayBuffer.empty[Cell]

    def trimmed(v: Vector[String]): Vector[String] =
      v.dropWhile(_.trim.isEmpty).reverse.dropWhile(_.trim.isEmpty).reverse

    // drop ONLY the jupytext YAML header (the opening `# ---` through the
    // closing `# ---`); jupytext keeps any post-header pre-marker content
    // as an implicit first cell, so discarding the whole block would eat
    // real code. The delimiter is EXACTLY `# ---` (what jupytext emits) —
    // a looser startsWith would classify an ordinary `# ---- setup ----`
    // comment ruler as a header and silently drop the script under it.
    // An unterminated header is all metadata.
    def isDelim(l: String) = l.trim == "# ---"
    def dropHeader(v: Vector[String]): Vector[String] = {
      val t = trimmed(v)
      if (t.isEmpty || !isDelim(t.head)) t
      else {
        val closing = t.indexWhere(isDelim, 1)
        if (closing < 0) Vector.empty else trimmed(t.drop(closing + 1))
      }
    }

    if (markerIdxs.isEmpty) {
      val body = dropHeader(lines)
      return if (body.isEmpty) Seq.empty
      else Seq(Cell("code", body.mkString("\n")))
    }
    val head = dropHeader(lines.take(markerIdxs.head))
    if (head.nonEmpty) cells += Cell("code", head.mkString("\n"))

    markerIdxs.zipAll(markerIdxs.drop(1), -1, lines.length).foreach {
      case (start, end) =>
        val isMd = lines(start).contains("[markdown]")
        val body = trimmed(lines.slice(start + 1, end))
        val source =
          if (isMd) body.map(l => // strip exactly ONE comment marker
            if (l.startsWith("# ")) l.drop(2) else l.stripPrefix("#"))
          else body
        if (source.nonEmpty)
          cells += Cell(if (isMd) "markdown" else "code", source.mkString("\n"))
    }
    cells.toSeq
  }
}

/** E8 — notebook-task execution (`make_jupytext_task`,
  * `composable_logs/tasks/tasks.py:16-79` + `notebooks_helpers.py:26-155`):
  * the py:percent notebook is parsed on the JVM, then its code cells are
  * executed IN ORDER in one shared namespace by a stdlib-only `python3`
  * subprocess (no papermill/jupyter needed), with the resolved parameters
  * injected as the `P` dict. Per-cell stdout/stderr and errors are
  * collected nbformat-style and the EVALUATED ipynb is always logged as
  * the `notebook.ipynb` artifact — also on cell failure, with the
  * partially evaluated outputs and the remaining cells unexecuted
  * (papermill's partial-notebook contract, `notebooks_helpers.py:105-113`)
  * — but NOT when the task is timeout-killed. The B5 parser then derives
  * `notebook.html` from the logged ipynb automatically.
  */
object NotebookTask {

  /** The cell runner: pure-stdlib python so it runs on any `python3`.
    * argv = (cells.json, out.ipynb); parameters arrive via `P_JSON`. */
  private val Runner: String =
    """import contextlib, io, json, os, sys, traceback
      |cells = json.load(open(sys.argv[1]))
      |P = json.loads(os.environ.get("P_JSON", "{}"))
      |ns = {"P": P, "__name__": "__main__"}
      |nb = {"nbformat": 4, "nbformat_minor": 5,
      |      "metadata": {"kernelspec": {"name": "python3", "language": "python",
      |                                  "display_name": "Python 3"}},
      |      "cells": []}
      |failed = False
      |n_exec = 0
      |for c in cells:
      |    if c["cell_type"] != "code":
      |        nb["cells"].append({"cell_type": "markdown", "metadata": {},
      |                            "source": c["source"]})
      |        continue
      |    cell = {"cell_type": "code", "execution_count": None, "metadata": {},
      |            "source": c["source"], "outputs": []}
      |    nb["cells"].append(cell)
      |    if failed:
      |        continue  # papermill leaves post-failure cells unexecuted
      |    buf = io.StringIO()
      |    try:
      |        with contextlib.redirect_stdout(buf), contextlib.redirect_stderr(buf):
      |            exec(compile(c["source"], "<cell>", "exec"), ns)
      |        n_exec += 1
      |        cell["execution_count"] = n_exec
      |        if buf.getvalue():
      |            cell["outputs"].append({"output_type": "stream", "name": "stdout",
      |                                    "text": buf.getvalue()})
      |    except BaseException as e:
      |        if buf.getvalue():
      |            cell["outputs"].append({"output_type": "stream", "name": "stdout",
      |                                    "text": buf.getvalue()})
      |        cell["outputs"].append({"output_type": "error",
      |                                "ename": type(e).__name__, "evalue": str(e),
      |                                "traceback": traceback.format_exc().splitlines()})
      |        failed = True
      |with open(sys.argv[2], "w") as f:
      |    json.dump(nb, f)
      |sys.exit(1 if failed else 0)
      |""".stripMargin

  def make(
      engine: Engine,
      notebookPath: Path,
      pythonExe: String = "python3",
      timeoutS: Option[Double] = Some(60.0),
      numCpus: Int = 1,
      parameters: Map[String, Any] = Map.empty): Seq[Node] => Node = {

    val stem = {
      val name = notebookPath.getFileName.toString
      val dot = name.lastIndexOf('.')
      if (dot > 0) name.take(dot) else name
    }

    engine.task(stem, parameters, numCpus, timeoutS, taskType = "jupytext") { _ =>
      val ctx = TaskContext.get
      val cells = Jupytext.parse(Files.readString(notebookPath))
      val p = ListMap(ctx.parameters.toSeq.sortBy(_._1): _*)
        .map { case (k, v) => k -> String.valueOf(v) }

      val dir = Files.createTempDirectory("graft-nb")
      val cellsJson = dir.resolve("cells.json")
      val runnerPy = dir.resolve("runner.py")
      val outIpynb = dir.resolve("out.ipynb")
      Files.write(cellsJson, Json.render(cells.map(c =>
        ListMap("cell_type" -> c.cellType, "source" -> c.source)))
        .getBytes(StandardCharsets.UTF_8))
      Files.write(runnerPy, Runner.getBytes(StandardCharsets.UTF_8))

      val pb = new ProcessBuilder(pythonExe, runnerPy.toString,
        cellsJson.toString, outIpynb.toString)
      pb.redirectErrorStream(true)
      pb.redirectOutput(dir.resolve("runner.log").toFile)
      pb.environment().put("P_JSON", Json.render(p))

      def cleanup(): Unit = {
        Seq(cellsJson, runnerPy, outIpynb, dir.resolve("runner.log"), dir)
          .foreach(f => try Files.deleteIfExists(f) catch { case _: Exception => })
      }
      val process =
        try pb.start()
        catch { case e: Throwable => cleanup(); throw e }
      try {
        val exit = process.waitFor()
        // evaluated-notebook contract: log also when a cell failed (the
        // runner writes the partial notebook before exiting non-zero)
        if (Files.exists(outIpynb))
          ctx.logArtefact("notebook.ipynb",
            new String(Files.readAllBytes(outIpynb), StandardCharsets.UTF_8))
        if (exit != 0)
          throw new Exception(s"Notebook task $stem failed with exit code $exit")
        ()
      } catch {
        case e: InterruptedException =>
          // timeout kill: no artifact, reap the interpreter. destroyForcibly
          // is async — wait (briefly, with the interrupt flag parked) for
          // the process to actually die, or the cleanup below races its
          // final writes and leaks the temp dir
          process.destroyForcibly()
          Thread.interrupted() // clear so the bounded reap can block
          process.waitFor(2, java.util.concurrent.TimeUnit.SECONDS)
          Thread.currentThread().interrupt() // restore the kill signal
          throw e
      } finally cleanup()
    }
  }
}
