package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.util.Base64

import org.scalatest.funsuite.AnyFunSuite

import graft.exec.{Engine, SpanRecorder, TaskContext}
import graft.mlflow.MlflowShim
import graft.model.SpanModel
import graft.parser.SpanParser

/** F2 MLflow-shim contract tests — port of
  * `tests/test_mlflow_server/test_connection.py:36-210`: stringification
  * table, tags prefix, metric floats, nested-run rejection, 501 catch-all,
  * parallel-task isolation, artifact bytes. */
class MlflowSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  def basicAuth(user: String): String =
    "Basic " + Base64.getEncoder.encodeToString(
      s"$user:${MlflowShim.ServerPassword}".getBytes(StandardCharsets.UTF_8))

  test("translator: stringification table, tags, metrics, nested rejection") {
    val logged = scala.collection.mutable.ArrayBuffer.empty[(String, String, Any)]
    val tr = new MlflowShim.Translator(
      (tp, k, v) => logged += ((tp, k, v)),
      (tp, k, v) => logged += ((tp, k, v)),
      (tp, k, v) => logged += ((tp, k, v)),
      "http://x/artifacts")

    val tp = "00-aa-bb-01"
    // params arrive stringified by the MLflow client: "x"→"x", 123→"123",
    // 123.4→"123.4", [1,2,3]→"[1, 2, 3]" (FIXTURES.md §5)
    for ((k, v) <- Seq(("s", "x"), ("i", "123"), ("f", "123.4"), ("l", "[1, 2, 3]"))) {
      val r = tr.handle("POST", "/api/2.0/mlflow/runs/log-parameter", tp,
        s"""{"run_uuid": "r", "run_id": "r", "key": "$k", "value": "$v"}""")
      assert(r == MlflowShim.Ok(Map.empty))
    }
    assert(logged.toList == List(
      (tp, "s", "x"), (tp, "i", "123"), (tp, "f", "123.4"), (tp, "l", "[1, 2, 3]")))
    logged.clear()

    tr.handle("POST", "/api/2.0/mlflow/runs/set-tag", tp,
      """{"run_uuid": "r", "run_id": "r", "key": "env", "value": "ci"}""")
    assert(logged.toList == List((tp, "tags.env", "ci")))
    logged.clear()

    tr.handle("POST", "/api/2.0/mlflow/runs/log-metric", tp,
      """{"run_uuid": "r", "run_id": "r", "key": "acc", "value": 0.98, "timestamp": 1, "step": 7}""")
    assert(logged.toList == List((tp, "acc", 0.98))) // step/timestamp dropped
    logged.clear()

    tr.handle("POST", "/api/2.0/mlflow/runs/log-batch", tp,
      """{"run_id": "r", "params": [{"key": "a", "value": "1"}, {"key": "b", "value": "2"}]}""")
    assert(logged.toList == List((tp, "a", "1"), (tp, "b", "2")))

    val nested = tr.handle("POST", "/api/2.0/mlflow/runs/create", tp,
      """{"tags": [{"key": "mlflow.parentRunId", "value": "xyz"}]}""")
    assert(nested == MlflowShim.Err(501,
      "POST /api/2.0/mlflow/runs/create --- nested runs are not supported"))

    val created = tr.handle("POST", "/api/2.0/mlflow/runs/create", tp, "{}")
    created match {
      case MlflowShim.Ok(m) =>
        val info = m("run").asInstanceOf[collection.Map[String, Any]]("info")
          .asInstanceOf[collection.Map[String, Any]]
        assert(info("run_id") == tp)
        assert(info("artifact_uri").toString.endsWith(s"/$tp/"))
      case other => fail(s"$other")
    }

    assert(tr.handle("POST", "/api/2.0/mlflow/unknown", tp, "{}")
      .isInstanceOf[MlflowShim.Err])
  }

  test("HTTP round-trip: logs attach to the right task, parallel isolation") {
    val engine = new Engine(spark, 4)
    val server = MlflowShim.start(engine)
    val port = server.getAddress.getPort
    val client = HttpClient.newHttpClient()

    def post(path: String, tp: String, body: String): Int = {
      val req = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
        .header("Authorization", basicAuth(tp))
        .header("Content-Type", "application/json")
        .POST(HttpRequest.BodyPublishers.ofString(body)).build()
      client.send(req, HttpResponse.BodyHandlers.ofString()).statusCode()
    }

    try {
      // two parallel tasks, each logging via the shim with its own traceparent
      val t1 = engine.task("ml_task_1")(_ => {
        val tp = TaskContext.get.parameters("_opentelemetry_traceparent").toString
        assert(post("/api/2.0/mlflow/runs/log-parameter", tp,
          """{"run_uuid": "r", "run_id": "r", "key": "shared-name", "value": "from-1"}""") == 200)
        assert(post("/api/2.0/mlflow/runs/log-metric", tp,
          """{"run_uuid": "r", "run_id": "r", "key": "m", "value": 1.5, "timestamp": 0, "step": 0}""") == 200)
        1
      })
      val t2 = engine.task("ml_task_2")(_ => {
        val tp = TaskContext.get.parameters("_opentelemetry_traceparent").toString
        assert(post("/api/2.0/mlflow/runs/log-parameter", tp,
          """{"run_uuid": "r", "run_id": "r", "key": "shared-name", "value": "from-2"}""") == 200)
        // artifact over HTTP PUT
        val req = HttpRequest.newBuilder(
          URI.create(s"http://127.0.0.1:$port/artifacts/$tp/out/result.bin"))
          .header("Authorization", basicAuth(tp))
          .PUT(HttpRequest.BodyPublishers.ofByteArray(Array[Byte](1, 2, 3))).build()
        assert(client.send(req, HttpResponse.BodyHandlers.ofString()).statusCode() == 200)
        2
      })
      val spans = SpanRecorder.record(engine) {
        assert(engine.runDag(Seq(t1(Nil), t2(Nil)), Map()).isSuccess)
      }
      val s = SpanParser.parseSpans(SpanModel.toDF(spark, spans))
      val r1 = s.taskRuns.find(_.taskId == "ml_task_1").get
      val r2 = s.taskRuns.find(_.taskId == "ml_task_2").get
      assert(r1.loggedValues("shared-name").content == "from-1")
      assert(r1.loggedValues("m").content == 1.5)
      assert(r2.loggedValues("shared-name").content == "from-2")
      assert(r2.getArtifact("out/result.bin").content
        .asInstanceOf[Array[Byte]].toSeq == Seq[Byte](1, 2, 3))

      // /status: unauthenticated readiness poll (reference parity)
      val status = HttpRequest.newBuilder(
        URI.create(s"http://127.0.0.1:$port/status")).GET().build()
      assert(client.send(status, HttpResponse.BodyHandlers.ofString())
        .statusCode() == 200)
      // wrong password on a real endpoint → config error; unknown → 501
      val bad = HttpRequest.newBuilder(
        URI.create(s"http://127.0.0.1:$port/api/2.0/mlflow/runs/get"))
        .header("Authorization", "Basic " + Base64.getEncoder.encodeToString(
          "u:wrong".getBytes(StandardCharsets.UTF_8))).GET().build()
      assert(client.send(bad, HttpResponse.BodyHandlers.ofString()).statusCode() == 500)
      assert(post("/api/2.0/mlflow/nope", "00-aa-bb-01", "{}") == 501)
      // traversal artifact names rejected at the protocol boundary
      val evil = HttpRequest.newBuilder(
        URI.create(s"http://127.0.0.1:$port/artifacts/00-aa-bb-01/a/../../x"))
        .header("Authorization", basicAuth("00-aa-bb-01"))
        .PUT(HttpRequest.BodyPublishers.ofByteArray(Array[Byte](1))).build()
      assert(client.send(evil, HttpResponse.BodyHandlers.ofString()).statusCode() == 400)
    } finally server.stop(0)
  }

  test("F2 FTP artifact endpoint speaks the ftplib upload sequence") {
    import java.net.Socket
    val logged = scala.collection.mutable.ArrayBuffer.empty[(String, String, Seq[Byte])]
    val server = new graft.mlflow.MlflowFtpServer(
      (tp, name, bytes) => logged.synchronized { logged += ((tp, name, bytes.toSeq)) })
    try {
      val sock = new Socket("127.0.0.1", server.boundPort)
      sock.setSoTimeout(15000)
      val in = new java.io.BufferedReader(
        new java.io.InputStreamReader(sock.getInputStream, StandardCharsets.UTF_8))
      val out = sock.getOutputStream
      def cmd(c: String): String = {
        out.write((c + "\r\n").getBytes(StandardCharsets.UTF_8)); out.flush()
        in.readLine()
      }
      def pasvPort(reply: String): Int = {
        // 227 Entering Passive Mode (h1,h2,h3,h4,p1,p2)
        val nums = reply.split("[(),]").filter(_.forall(_.isDigit)).filter(_.nonEmpty)
        nums(nums.length - 2).toInt * 256 + nums.last.toInt
      }
      def transfer(c: String, send: Option[Array[Byte]]): (String, Array[Byte]) = {
        val p = pasvPort(cmd("PASV"))
        out.write((c + "\r\n").getBytes(StandardCharsets.UTF_8)); out.flush()
        val preliminary = in.readLine()
        if (!preliminary.startsWith("150")) return (preliminary, Array.empty)
        val data = new Socket("127.0.0.1", p)
        val received = try {
          send.foreach { b => data.getOutputStream.write(b); data.getOutputStream.flush() }
          if (send.isEmpty) data.getInputStream.readAllBytes() else Array.empty[Byte]
        } finally data.close()
        (in.readLine(), received)
      }

      assert(in.readLine().startsWith("220"))
      // the exact ftplib/FTPArtifactRepository sequence: login, binary
      // type, mkdirs, cwd, passive upload
      assert(cmd("USER anonymous").startsWith("331"))
      assert(cmd("PASS mlflow@client").startsWith("230"))
      assert(cmd("SYST").startsWith("215"))
      assert(cmd("TYPE I").startsWith("200"))
      assert(cmd("MKD 00-aa-bb-01").startsWith("257"))
      assert(cmd("MKD 00-aa-bb-01/model").startsWith("257"))
      assert(cmd("CWD 00-aa-bb-01/model").startsWith("250"))
      assert(cmd("PWD").contains("/00-aa-bb-01/model"))
      val payload = Array.tabulate[Byte](512)(_.toByte)
      val (storReply, _) = transfer("STOR weights.bin", Some(payload))
      assert(storReply.startsWith("226"))
      assert(logged.synchronized(logged.toList) ==
        List(("00-aa-bb-01", "model/weights.bin", payload.toSeq)))

      // read-back: SIZE + RETR serve what STOR accepted
      assert(cmd("SIZE /00-aa-bb-01/model/weights.bin") == "213 512")
      val (retrReply, echoed) = transfer("RETR /00-aa-bb-01/model/weights.bin", None)
      assert(retrReply.startsWith("226") && echoed.toSeq == payload.toSeq)

      // MLflow probes file-vs-directory with CWD: a stored FILE path must
      // refuse (550) while its parent directory accepts — and NLST of the
      // directory lists the file (the stock-client download sequence)
      assert(cmd("CWD /00-aa-bb-01/model/weights.bin").startsWith("550"))
      assert(cmd("CWD /00-aa-bb-01/model").startsWith("250"))
      assert(cmd("CWD /unknown/dir").startsWith("550")) // not auto-vivified
      val (nlstReply, listing) = transfer("NLST /00-aa-bb-01/model", None)
      assert(nlstReply.startsWith("226") &&
        new String(listing, StandardCharsets.UTF_8).trim == "weights.bin")

      // guards: traversal rejected, root-level upload rejected (needs the
      // <traceparent>/ prefix), like the reference's confined FTP home
      assert(cmd("CWD ../escape").startsWith("550"))
      val (evilReply, _) = transfer("STOR ../../evil.bin", Some(Array[Byte](1)))
      assert(evilReply.startsWith("550"))
      assert(cmd("CWD /").startsWith("250"))
      val (rootReply, _) = transfer("STOR orphan.bin", Some(Array[Byte](1)))
      assert(rootReply.startsWith("550"))
      assert(cmd("QUIT").startsWith("221"))
      sock.close()

      // only anonymous login is accepted (reference parity)
      val sock2 = new Socket("127.0.0.1", server.boundPort)
      sock2.setSoTimeout(15000)
      val in2 = new java.io.BufferedReader(
        new java.io.InputStreamReader(sock2.getInputStream, StandardCharsets.UTF_8))
      val out2 = sock2.getOutputStream
      def cmd2(c: String): String = {
        out2.write((c + "\r\n").getBytes(StandardCharsets.UTF_8)); out2.flush()
        in2.readLine()
      }
      assert(in2.readLine().startsWith("220"))
      assert(cmd2("USER mallory").startsWith("331"))
      assert(cmd2("PASS x").startsWith("530"))
      assert(cmd2("STOR a/b").startsWith("530")) // nothing works unauthenticated
      sock2.close()
    } finally server.stop()
  }

  test("F2 FTP read-back store evicts oldest past the byte budget") {
    import java.net.Socket
    val logged = scala.collection.mutable.ArrayBuffer.empty[String]
    val server = new graft.mlflow.MlflowFtpServer(
      (tp, name, _) => logged.synchronized { logged += s"$tp/$name" },
      maxStoreBytes = 1000, maxUploadBytes = 900)
    try {
      val sock = new Socket("127.0.0.1", server.boundPort)
      sock.setSoTimeout(15000)
      val in = new java.io.BufferedReader(
        new java.io.InputStreamReader(sock.getInputStream, StandardCharsets.UTF_8))
      val out = sock.getOutputStream
      def cmd(c: String): String = {
        out.write((c + "\r\n").getBytes(StandardCharsets.UTF_8)); out.flush()
        in.readLine()
      }
      def pasvPort(reply: String): Int = {
        val nums = reply.split("[(),]").filter(_.nonEmpty).filter(_.forall(_.isDigit))
        nums(nums.length - 2).toInt * 256 + nums.last.toInt
      }
      def stor(path: String, n: Int): String = {
        val p = pasvPort(cmd("PASV"))
        out.write(s"STOR $path\r\n".getBytes(StandardCharsets.UTF_8)); out.flush()
        assert(in.readLine().startsWith("150"))
        val data = new Socket("127.0.0.1", p)
        try data.getOutputStream.write(new Array[Byte](n)) finally data.close()
        in.readLine()
      }
      assert(in.readLine().startsWith("220"))
      assert(cmd("USER anonymous").startsWith("331"))
      assert(cmd("PASS x").startsWith("230"))
      assert(stor("/tp/a.bin", 800).startsWith("226"))
      assert(cmd("SIZE /tp/a.bin") == "213 800")
      assert(stor("/tp/b.bin", 800).startsWith("226"))
      // budget 1000 < 1600: the oldest upload fell out, the newest serves
      assert(cmd("SIZE /tp/a.bin").startsWith("550"))
      assert(cmd("SIZE /tp/b.bin") == "213 800")
      // the durable sink saw BOTH uploads — eviction only trims read-back
      assert(logged.synchronized(logged.toList) == List("tp/a.bin", "tp/b.bin"))
      // an upload past the per-upload cap is refused DURING the read (552)
      // and reaches neither the store nor the durable sink
      assert(stor("/tp/too-big.bin", 950).startsWith("552"))
      assert(cmd("SIZE /tp/too-big.bin").startsWith("550"))
      assert(logged.synchronized(logged.size) == 2)
      cmd("QUIT")
      sock.close()
    } finally server.stop()
  }

  test("F2 FTP dir entries are evicted with their files; stop() ends live sessions") {
    import java.net.Socket
    val server = new graft.mlflow.MlflowFtpServer(
      (_, _, _) => (), maxStoreBytes = 1000, maxUploadBytes = 900, maxDirs = 4)
    val sock = new Socket("127.0.0.1", server.boundPort)
    try {
      sock.setSoTimeout(15000)
      val in = new java.io.BufferedReader(
        new java.io.InputStreamReader(sock.getInputStream, StandardCharsets.UTF_8))
      val out = sock.getOutputStream
      def cmd(c: String): String = {
        out.write((c + "\r\n").getBytes(StandardCharsets.UTF_8)); out.flush()
        in.readLine()
      }
      def pasvPort(reply: String): Int = {
        val nums = reply.split("[(),]").filter(_.nonEmpty).filter(_.forall(_.isDigit))
        nums(nums.length - 2).toInt * 256 + nums.last.toInt
      }
      def stor(path: String, n: Int): String = {
        val p = pasvPort(cmd("PASV"))
        out.write(s"STOR $path\r\n".getBytes(StandardCharsets.UTF_8)); out.flush()
        assert(in.readLine().startsWith("150"))
        val data = new Socket("127.0.0.1", p)
        try data.getOutputStream.write(new Array[Byte](n)) finally data.close()
        in.readLine()
      }
      assert(in.readLine().startsWith("220"))
      assert(cmd("USER anonymous").startsWith("331"))
      assert(cmd("PASS x").startsWith("230"))
      // two traceparent dirs; the second upload evicts the first's file
      assert(stor("/tp1/a.bin", 800).startsWith("226"))
      assert(cmd("CWD /tp1").startsWith("250"))
      assert(cmd("CWD /").startsWith("250"))
      assert(stor("/tp2/b.bin", 800).startsWith("226"))
      // tp1 lost its only file → the dir entry is gone with it
      assert(cmd("CWD /tp1").startsWith("550"))
      assert(cmd("CWD /tp2").startsWith("250"))
      assert(cmd("CWD /").startsWith("250"))
      // dir-cap prune: oldest CHILDLESS dirs go; file-backed dirs survive
      // (evicting one would 550 a CWD to a dir whose artifacts still serve)
      (1 to 6).foreach(i => assert(cmd(s"MKD /empty$i").startsWith("257")))
      assert(cmd("CWD /").startsWith("250"))
      assert(cmd("CWD /tp2").startsWith("250"), "file-backed dir must survive prune")
      assert(cmd("CWD /empty1").startsWith("550"), "oldest childless dir pruned")
      assert(cmd("CWD /empty6").startsWith("250"), "newest dirs kept")
      assert(cmd("CWD /").startsWith("250"))
      // leave a session with an armed PASV listener, then stop the server
      assert(pasvPort(cmd("PASV")) > 0)
      server.stop()
      // the control socket was closed under the client: EOF (or reset)
      val eof = try in.readLine() == null catch { case _: java.io.IOException => true }
      assert(eof, "active session must be closed by stop()")
      // accept socket, sessions, and the armed data listener are all closed —
      // asserted on SERVER state, not by probing the freed ports: the OS can
      // hand a just-freed ephemeral port to another process in the concurrent
      // suite JVM, making a connect-refused probe flaky (round-12 341/342)
      assert(server.stopped,
        "stop() must close the accept socket, sessions, and data listeners")
    } finally { server.stop(); sock.close() }
  }
}
