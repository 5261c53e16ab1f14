package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

import scala.util.Failure

import org.scalatest.funsuite.AnyFunSuite

import graft.exec.{Engine, ExternalProcessTask, SpanRecorder}
import graft.model.SpanModel
import graft.parser.SpanParser

/** E8 external-process task tests — ports of the reference's notebook task
  * contracts (`test_ok_notebook.py`, `test_always_fail.py`,
  * `test_stuck_notebook.py`): filename-stem task id, P injection,
  * partial-output-on-failure, nothing-on-timeout. */
class ExternalProcessSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  def script(name: String, body: String): Path = {
    val dir = Files.createTempDirectory("graft-scripts")
    val p = dir.resolve(name)
    Files.write(p, s"#!/bin/sh\n$body\n".getBytes(StandardCharsets.UTF_8))
    p
  }

  def run(engine: Engine, node: graft.exec.Node) = {
    val spans = SpanRecorder.record(engine) { engine.runDag(node) }
    SpanParser.parseSpans(SpanModel.toDF(spark, spans))
  }

  test("ok script: stem task id, jupytext type, output artifact, P injection") {
    val engine = new Engine(spark, 4)
    val sh = script("ingest-data.sh", """echo "variable_a=$P_JSON"""")
    val t = ExternalProcessTask.make(engine, sh, Seq("/bin/sh", sh.toString),
      parameters = Map("task.variant" -> "a"))
    val s = run(engine, t(Nil))
    val r = s.taskRuns.head
    assert(r.taskId == "ingest-data")
    assert(r.attributes("task.type") == "jupytext")
    assert(r.isSuccess)
    val out = r.getArtifact("output.txt").content.asInstanceOf[String]
    assert(out.contains(""""task.variant": "a""""))
    assert(out.contains(""""task.id": "ingest-data""""))
    assert(out.contains("_opentelemetry_traceparent"))
  }

  test("failing script: artifact still logged (partial output), task failed") {
    val engine = new Engine(spark, 4)
    val sh = script("always-fail.sh", "echo partial-result; exit 3")
    val t = ExternalProcessTask.make(engine, sh, Seq("/bin/sh", sh.toString))
    var result: scala.util.Try[Any] = null
    val spans = SpanRecorder.record(engine) { result = engine.runDag(t(Nil)) }
    result match {
      case Failure(e) => assert(e.getMessage.contains("exit code 3"))
      case other => fail(s"$other")
    }
    val s = SpanParser.parseSpans(SpanModel.toDF(spark, spans))
    val r = s.taskRuns.head
    assert(r.isFailure)
    assert(r.getArtifact("output.txt").content == "partial-result\n")
  }

  test("stuck script: timeout kill, no artifact, process reaped") {
    val engine = new Engine(spark, 4)
    val sh = script("stuck.sh", "sleep 1000")
    val t = ExternalProcessTask.make(engine, sh, Seq("/bin/sh", sh.toString),
      timeoutS = Some(0.5))
    var result: scala.util.Try[Any] = null
    val spans = SpanRecorder.record(engine) { result = engine.runDag(t(Nil)) }
    result match {
      case Failure(e) => assert(e.getMessage ==
        "Timeout error: execution did not finish within timeout limit.")
      case other => fail(s"$other")
    }
    val s = SpanParser.parseSpans(SpanModel.toDF(spark, spans))
    assert(s.taskRuns.head.loggedArtifacts.isEmpty)
    Thread.sleep(300) // destroyForcibly is async
    import scala.sys.process._
    val pat = sh.getParent.toString + "/[s]tuck.sh" // bracket: avoid pgrep self-match
    val leftover = Seq("/bin/sh", "-c", s"pgrep -f '$pat' || true").!!
    assert(leftover.trim.isEmpty, s"process leaked: $leftover")
  }

  test("ipynb artifact name triggers the parser's html derivation (B5)") {
    val engine = new Engine(spark, 4)
    val sh = script("render-nb.sh", """echo '{"cells": []}'""")
    val t = ExternalProcessTask.make(engine, sh, Seq("/bin/sh", sh.toString),
      artifactName = "notebook.ipynb")
    val s = run(engine, t(Nil))
    val names = s.taskRuns.head.loggedArtifacts.map(_.name)
    assert(names == Seq("notebook.ipynb", "notebook.html"))
  }

  // ---- E8 notebook tasks (jupytext parse + python cell runner) ----

  def python3Available: Boolean =
    try { new ProcessBuilder("python3", "--version").start().waitFor() == 0 }
    catch { case _: java.io.IOException => false }

  def notebook(name: String, body: String): Path = {
    val dir = Files.createTempDirectory("graft-nb-src")
    val p = dir.resolve(name)
    Files.write(p, body.getBytes(StandardCharsets.UTF_8))
    p
  }

  test("jupytext py:percent parse: header dropped, markdown stripped, cells split") {
    val cells = graft.exec.Jupytext.parse(
      """# ---
        |# jupyter:
        |#   jupytext:
        |#     formats: ipynb,py:percent
        |# ---
        |
        |# %% [markdown]
        |# # Title
        |# some prose
        |
        |# %%
        |x = 1
        |print(x)
        |
        |# %%
        |def f():
        |    # %% indented: an ordinary comment, NOT a cell boundary
        |    return x + 1
        |y = f()
        |""".stripMargin)
    assert(cells.map(_.cellType) == Seq("markdown", "code", "code"))
    assert(cells.head.source == "# Title\nsome prose")
    assert(cells(1).source == "x = 1\nprint(x)")
    assert(cells(2).source ==
      "def f():\n    # %% indented: an ordinary comment, NOT a cell boundary\n    return x + 1\ny = f()")
  }

  test("jupytext parse: code between the YAML header and the first marker survives") {
    // jupytext treats post-header content as an implicit first cell — only
    // the `# ---` ... `# ---` block itself is metadata
    val cells = graft.exec.Jupytext.parse(
      """# ---
        |# jupyter:
        |#   jupytext:
        |#     formats: ipynb,py:percent
        |# ---
        |import os
        |setup = 1
        |
        |# %%
        |x = setup
        |""".stripMargin)
    assert(cells.map(_.cellType) == Seq("code", "code"))
    assert(cells.head.source == "import os\nsetup = 1")
    assert(cells(1).source == "x = setup")
    // same stripping when there are no markers at all
    val only = graft.exec.Jupytext.parse(
      "# ---\n# jupyter:\n# ---\ny = 2\n")
    assert(only.map(_.source) == Seq("y = 2"))
    // an unterminated header is all metadata, not code
    assert(graft.exec.Jupytext.parse("# ---\n# jupyter:\n").isEmpty)
    // a comment RULER is not a header: the delimiter is exactly '# ---'
    val ruled = graft.exec.Jupytext.parse(
      "# ---- setup ----\nimport os\nx = 1\n")
    assert(ruled.map(_.source) == Seq("# ---- setup ----\nimport os\nx = 1"))
  }

  test("markdown cells render as markup in the derived html (E8)") {
    val ipynb = graft.model.Json.render(scala.collection.immutable.ListMap(
      "cells" -> Vector(
        scala.collection.immutable.ListMap(
          "cell_type" -> "markdown",
          "source" -> "## Results\nthe *final* **loss** is `0.03` & < 0.1"),
        scala.collection.immutable.ListMap(
          "cell_type" -> "code",
          "source" -> "# not markdown: a python comment",
          "outputs" -> Vector.empty)),
      "nbformat" -> 4))
    val html = graft.parser.Notebooks.convertIpynbToHtml(ipynb)
    assert(html.contains("<h2>Results</h2>"))
    assert(html.contains("<em>final</em>"))
    assert(html.contains("<strong>loss</strong>"))
    assert(html.contains("<code>0.03</code>"))
    // escape-first: literal markup in the text cannot inject html
    assert(html.contains("&amp; &lt; 0.1"))
    // code cells stay literal — a leading # is python, not a header
    assert(html.contains("<pre class=\"input\"># not markdown: a python comment</pre>"))
    // code-span contents are VERBATIM (nbconvert contract): asterisks
    // inside backticks must not sprout emphasis tags
    val starry = graft.parser.Notebooks.convertIpynbToHtml(
      graft.model.Json.render(scala.collection.immutable.ListMap(
        "cells" -> Vector(scala.collection.immutable.ListMap(
          "cell_type" -> "markdown",
          "source" -> "pass `*args` and `**kwargs` but *emphasize* this")),
        "nbformat" -> 4)))
    assert(starry.contains("<code>*args</code>"))
    assert(starry.contains("<code>**kwargs</code>"))
    assert(starry.contains("<em>emphasize</em>"))
    // a literal NUL in the cell text (legal JSON via \u0000) must not form
    // a phantom code-span placeholder and crash the whole B5 derivation
    val nulText = "before \u00007\u0000 after `real` end"
    val nul = graft.parser.Notebooks.convertIpynbToHtml(
      graft.model.Json.render(scala.collection.immutable.ListMap(
        "cells" -> Vector(scala.collection.immutable.ListMap(
          "cell_type" -> "markdown", "source" -> nulText)),
        "nbformat" -> 4)))
    assert(nul.contains("<code>real</code>"))
    assert(nul.contains("before 7 after"))
  }

  test("markdown lists, fenced code, ANSI tracebacks, rich outputs (E8/B5)") {
    import scala.collection.immutable.ListMap
    val ipynb = graft.model.Json.render(ListMap(
      "cells" -> Vector(
        ListMap(
          "cell_type" -> "markdown",
          "source" -> ("steps:\n- load *data*\n- fit\n1. first\n2) second\n" +
            "```\nraw **not bold** <tag>\n```\ntail")),
        ListMap(
          "cell_type" -> "code",
          "source" -> "plot()",
          "outputs" -> Vector(
            ListMap("output_type" -> "display_data",
              "data" -> ListMap(
                "image/png" -> Vector("aGVs\n", "bG8=\n"),
                "text/plain" -> "<Figure>")),
            ListMap("output_type" -> "execute_result",
              "data" -> ListMap("text/html" -> "<table><tr><td>1</td></tr></table>",
                "text/plain" -> "df")),
            ListMap("output_type" -> "error",
              "ename" -> "ValueError", "evalue" -> "bad",
              "traceback" -> Vector("\u001b[0;31mValueError\u001b[0m: bad")),
            ListMap("output_type" -> "stream",
              "text" -> "plain [bracketed] text")))),
      "nbformat" -> 4))
    val html = graft.parser.Notebooks.convertIpynbToHtml(ipynb)
    // lists: bullets → <ul>, ordered (both "1." and "2)") → <ol>
    assert(html.contains("<ul>\n<li>load <em>data</em></li>\n<li>fit</li>\n</ul>"))
    assert(html.contains("<ol>\n<li>first</li>\n<li>second</li>\n</ol>"))
    // fenced block: verbatim, escaped, no emphasis applied
    assert(html.contains("<pre><code>raw **not bold** &lt;tag&gt;</code></pre>"))
    assert(html.contains("<p>tail</p>"))
    // rich outputs, nbconvert precedence: png beats text/plain and embeds
    // as a contiguous data URI; text/html passes through as markup
    assert(html.contains("""<img class="output" src="data:image/png;base64,aGVsbG8="/>"""))
    assert(html.contains("""<div class="output html"><table><tr><td>1</td></tr></table></div>"""))
    assert(!html.contains("&lt;Figure&gt;"))
    // ANSI SGR sequences are stripped from tracebacks, bracketed plain
    // text survives untouched
    assert(html.contains("ValueError: bad"))
    assert(!html.contains("0;31m"))
    assert(html.contains("plain [bracketed] text"))
  }

  test("markdown math passthrough and cell attachments (E8/B5)") {
    import scala.collection.immutable.ListMap
    val ipynb = graft.model.Json.render(ListMap(
      "cells" -> Vector(
        ListMap(
          "cell_type" -> "markdown",
          // inline math with * and _ that emphasis must NOT touch, code
          // span beside it, display math inline and as a block
          "source" -> ("energy $E = m*c^2$ and `a*b` inline\n" +
            "$$\\sum_{i=1}^{n} x_i < 1$$\n" +
            "$$\n\\frac{a}{b} **not bold**\n$$\n" +
            "after *emph*")),
        ListMap(
          "cell_type" -> "markdown",
          "source" -> ("see ![the \"plot\"](attachment:plot.png) and " +
            "![missing](attachment:nope.png)"),
          "attachments" -> ListMap(
            "plot.png" -> ListMap(
              "image/png" -> Vector("aGVs\n", "bG8=\n"))))),
      "nbformat" -> 4))
    val html = graft.parser.Notebooks.convertIpynbToHtml(ipynb)
    // inline math: delimiters and content verbatim, no <em> inside
    assert(html.contains("$E = m*c^2$"), html)
    assert(html.contains("<code>a*b</code>"))
    // single-line display math survives as-is
    assert(html.contains("$$\\sum_{i=1}^{n} x_i &lt; 1$$"), html)
    // block display math: own div, ** NOT bolded, escaped only
    assert(html.contains("<div class=\"math\">$$\n\\frac{a}{b} **not bold**\n$$</div>"), html)
    assert(!html.contains("<strong>not bold</strong>"))
    // emphasis still applies outside math
    assert(html.contains("<em>emph</em>"))
    // attachment resolves to a contiguous data URI with quoted alt
    assert(html.contains(
      """<img class="attachment" alt="the &quot;plot&quot;" src="data:image/png;base64,aGVsbG8="/>"""),
      html)
    // unresolvable attachment name stays literal text
    assert(html.contains("![missing](attachment:nope.png)"))
  }

  test("hostile attachment mime cannot break out of the img attribute (B5)") {
    import scala.collection.immutable.ListMap
    // a mime KEY that passes a naive startsWith("image/") check but
    // carries an attribute-breakout payload must be dropped entirely —
    // the strict image/[A-Za-z0-9.+-]+ full-match is the gate
    val ipynb = graft.model.Json.render(ListMap(
      "cells" -> Vector(
        ListMap(
          "cell_type" -> "markdown",
          "source" -> "![x](attachment:evil.png)",
          "attachments" -> ListMap(
            "evil.png" -> ListMap(
              "image/png\" onerror=\"alert(1)" -> Vector("aGVsbG8=\n"))))),
      "nbformat" -> 4))
    val html = graft.parser.Notebooks.convertIpynbToHtml(ipynb)
    assert(!html.contains("onerror"), html)
    // the ref stays literal text, matching the broken-ref behavior
    assert(html.contains("![x](attachment:evil.png)"))
  }

  test("markdown nested lists and raw cells (E8/B5)") {
    import scala.collection.immutable.ListMap
    val ipynb = graft.model.Json.render(ListMap(
      "cells" -> Vector(
        ListMap(
          "cell_type" -> "markdown",
          // two-level bullet nesting, an ordered child list, a dedent
          // back to the top level, and a marker switch at the top level
          "source" -> ("- top *one*\n  - child a\n  - child b\n- top two\n" +
            "1. ord one\n   1. ord child\n2. ord two")),
        ListMap(
          "cell_type" -> "raw",
          "source" -> "<section id=\"inject\">verbatim &raw;</section>",
          "metadata" -> ListMap("raw_mimetype" -> "text/html")),
        ListMap(
          "cell_type" -> "raw",
          "source" -> "no declared mimetype — still included"),
        ListMap(
          "cell_type" -> "raw",
          "source" -> "\\LaTeX-only payload",
          "metadata" -> ListMap("raw_mimetype" -> "text/latex"))),
      "nbformat" -> 4))
    val html = graft.parser.Notebooks.convertIpynbToHtml(ipynb)
    // child items nest INSIDE the parent's <li> (commonmark/nbconvert
    // shape), and the dedented sibling closes the child list
    assert(html.contains(
      "<li>top <em>one</em>\n<ul>\n<li>child a</li>\n<li>child b</li>\n</ul></li>"),
      html)
    assert(html.contains("<li>top two</li>\n</ul>"))
    // ordered nesting inside an ordered parent
    assert(html.contains(
      "<li>ord one\n<ol>\n<li>ord child</li>\n</ol></li>"), html)
    // marker switch at the same depth: the <ul> run closes before the <ol>
    assert(html.contains("</ul>\n<ol>\n<li>ord one"))
    // html raw cell passes through VERBATIM (no escaping — that is the
    // point of a raw cell), undeclared mimetype is included too,
    // non-html mimetype is dropped
    assert(html.contains("<section id=\"inject\">verbatim &raw;</section>"))
    assert(html.contains("no declared mimetype — still included"))
    assert(!html.contains("LaTeX-only payload"))
  }

  test("E8 ok notebook: cells executed in order, P injected, evaluated ipynb + html") {
    assume(python3Available, "python3 not on PATH")
    val engine = new Engine(spark, 4)
    val nb = notebook("train-model.py",
      """# %% [markdown]
        |# # Training notebook
        |
        |# %%
        |x = 40
        |print("setting up")
        |
        |# %%
        |print("variant=" + P["task.variant"])
        |print("answer=" + str(x + 2))
        |""".stripMargin)
    val t = graft.exec.NotebookTask.make(engine, nb,
      parameters = Map("task.variant" -> "a"))
    val s = run(engine, t(Nil))
    val r = s.taskRuns.head
    assert(r.taskId == "train-model")
    assert(r.attributes("task.type") == "jupytext")
    assert(r.isSuccess)
    val ipynb = r.getArtifact("notebook.ipynb").content.asInstanceOf[String]
    // shared namespace across cells + P parameter injection, nbformat shape
    assert(ipynb.contains("setting up"))
    assert(ipynb.contains("variant=a"))
    assert(ipynb.contains("answer=42"))
    assert(ipynb.contains("\"nbformat\": 4"))
    // B5 derivation kicks in on the evaluated notebook, outputs included
    val html = r.getArtifact("notebook.html").content.asInstanceOf[String]
    assert(html.contains("answer=42") && html.contains("Training notebook"))
  }

  test("E8 failing notebook: partial evaluated ipynb logged, later cells unexecuted") {
    assume(python3Available, "python3 not on PATH")
    val engine = new Engine(spark, 4)
    val nb = notebook("exploration.py",
      """# %%
        |print("before the failure")
        |
        |# %%
        |raise ValueError("someone is to blame")
        |
        |# %%
        |print("never-reached-output")
        |""".stripMargin)
    val t = graft.exec.NotebookTask.make(engine, nb)
    var result: scala.util.Try[Any] = null
    val spans = SpanRecorder.record(engine) { result = engine.runDag(t(Nil)) }
    result match {
      case Failure(e) => assert(e.getMessage.contains("exit code 1"))
      case other => fail(s"$other")
    }
    val s = SpanParser.parseSpans(SpanModel.toDF(spark, spans))
    val r = s.taskRuns.head
    assert(r.isFailure)
    val ipynb = r.getArtifact("notebook.ipynb").content.asInstanceOf[String]
    assert(ipynb.contains("before the failure")) // earlier output kept
    assert(ipynb.contains("ValueError"))
    assert(ipynb.contains("someone is to blame"))
    // the post-failure cell is present but was NOT executed
    assert(ipynb.contains("never-reached-output")
      && !ipynb.contains("\"text\": \"never-reached-output"))
  }
}
