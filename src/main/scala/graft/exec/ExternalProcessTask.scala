package graft.exec

import java.nio.charset.StandardCharsets
import java.nio.file.Path

import scala.collection.immutable.ListMap

import graft.model.Json

/** E8 — the notebook-task lane re-hosted as an external-process task type
  * (SURVEY §7.4.5: papermill/jupytext have no JVM equivalent; the
  * *observable logging contract* of `make_jupytext_task`
  * (`composable_logs/tasks/tasks.py:16-79`) is preserved):
  *
  *  - task id = script filename stem (`tasks.py:38-43`);
  *  - task type = "jupytext" (the parser/sink contracts enforce
  *    `type ∈ {python, jupytext}`);
  *  - resolved parameters are injected into the process as the `P_JSON`
  *    environment variable (the `P` dict injection);
  *  - the captured process output is ALWAYS logged as an artifact — also
  *    on failure (partial-output contract, `notebooks_helpers.py:105-113`)
  *    — but NOT when the task is timeout-killed;
  *  - on non-zero exit the original error surfaces after the artifact log.
  */
object ExternalProcessTask {

  def make(
      engine: Engine,
      scriptPath: Path,
      command: Seq[String],
      cwd: Option[Path] = None,
      timeoutS: Option[Double] = Some(60.0),
      numCpus: Int = 1,
      parameters: Map[String, Any] = Map.empty,
      artifactName: String = "output.txt"): Seq[Node] => Node = {

    val stem = {
      val name = scriptPath.getFileName.toString
      val dot = name.lastIndexOf('.')
      if (dot > 0) name.take(dot) else name
    }

    engine.task(stem, parameters, numCpus, timeoutS, taskType = "jupytext") { _ =>
      val ctx = TaskContext.get
      // P = full resolved parameter map (baggage ⊕ task ⊕ system)
      val p = ListMap(ctx.parameters.toSeq.sortBy(_._1): _*)
        .map { case (k, v) => k -> String.valueOf(v) }

      val pb = new ProcessBuilder(command: _*)
      pb.redirectErrorStream(true)
      // output goes to a file, not a pipe: the body thread then blocks only
      // in the interruptible waitFor (a blocked pipe read would ignore the
      // timeout guard's interrupt and leak both thread and process)
      val outFile = java.nio.file.Files.createTempFile("graft-proc", ".out")
      pb.redirectOutput(outFile.toFile)
      cwd.foreach(d => pb.directory(d.toFile))
      pb.environment().put("P_JSON", Json.render(p))

      // temp-file cleanup must also cover a failed start (command not found)
      val process =
        try pb.start()
        catch {
          case e: Throwable =>
            java.nio.file.Files.deleteIfExists(outFile)
            throw e
        }
      try {
        val exit = process.waitFor()
        val output = new String(
          java.nio.file.Files.readAllBytes(outFile), StandardCharsets.UTF_8)
        // partial-output contract: log also when the process failed...
        ctx.logArtefact(artifactName, output)
        if (exit != 0)
          throw new Exception(
            s"External process task $stem failed with exit code $exit")
        output
      } catch {
        case e: InterruptedException =>
          // ...but not when killed by the timeout guard: hard-stop the
          // process and propagate the kill (no artifact — matches the
          // reference's timeout behavior, `tests/.../test_stuck_notebook.py`)
          process.destroyForcibly()
          throw e
      } finally {
        java.nio.file.Files.deleteIfExists(outFile)
      }
    }
  }
}
