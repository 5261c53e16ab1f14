package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.functions.Registry
import graft.model.SpanModel
import graft.spans.LegacyReader
import SpanFixtures._

/** D18 (UDF/UDAF surface) + B7 (legacy last-write-wins reader) specs. */
class RegistrySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("D18 SQL function registration: codec, time, sketch kernels") {
    Registry.registerAll(spark)
    val r = spark.sql(
      """SELECT graft_encode_type('foo') AS t,
        | graft_decode_utf8('utf-8', 'utf-8', 'bar') AS v,
        | graft_iso8601_to_epoch_ms('2022-03-19T14:47:02.118432Z') AS ms,
        | graft_long_dot(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS dot,
        | graft_simhash64(array('a', 'b')) AS sh,
        | size(graft_minhash_sig(array('a', 'b'))) AS sig_len""".stripMargin).head()
    assert(r.getAs[String]("t") == "utf-8")
    assert(r.getAs[String]("v") == "bar")
    assert(r.getAs[Long]("ms") == 1647701222118L)
    assert(r.getAs[Long]("dot") == 32L)
    assert(r.getAs[Int]("sig_len") == 64)
  }

  test("D18 graft_stopword_count / graft_lang_id SQL surface") {
    Registry.registerAll(spark)
    val r = spark.sql(
      """SELECT graft_stopword_count('the cat and the dog', 'the,and') AS n,
        | graft_lang_id('der hund und die katze ist mit von') AS de,
        | graft_lang_id('xyzzy qwerty') AS und,
        | graft_lang_id(CAST(NULL AS STRING)) AS nul""".stripMargin).head()
    assert(r.getAs[Int]("n") == 3)
    assert(r.getAs[String]("de") == "de")
    assert(r.getAs[String]("und") == "und")
    assert(r.getAs[String]("nul") == "und") // null text contract
    // a non-literal word list is an analysis error, not a runtime surprise
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_stopword_count('x', concat('a', rand()))").collect()
    }
    assert(e.getMessage.contains("graft_stopword_count"))
  }

  test("D18 graft_blocklist_hits SQL surface") {
    Registry.registerAll(spark)
    val r = spark.sql(
      """SELECT graft_blocklist_hits('a slow table and a big dup here',
        |  'slow table,big dup,dup row') AS hits,
        | graft_blocklist_hits('nothing to see', 'slow table') AS clean,
        | graft_blocklist_hits(CAST(NULL AS STRING), 'slow table') AS nul
        |""".stripMargin).head()
    assert(r.getAs[Int]("hits") == 2)
    assert(r.getAs[Int]("clean") == 0)
    assert(r.isNullAt(2))
    // malformed phrase lists fail at analysis with the function named
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_blocklist_hits('x', 'Bad Case')").collect()
    }
    assert(e.getMessage.contains("graft_blocklist_hits"))
  }

  test("D18 graft_kmeans_assign SQL surface: argmin + literal validation") {
    Registry.registerAll(spark)
    val r = spark.sql(
      """SELECT graft_kmeans_assign(array(0L, 0L), '0,0;10,10') AS a,
        | graft_kmeans_assign(array(9L, 9L), '0,0;10,10') AS b,
        | graft_kmeans_assign(array(5L, 5L), '0,0;10,10') AS tie""".stripMargin)
      .head()
    assert(r.getStruct(0).getInt(0) == 0 && r.getStruct(0).getLong(1) == 0L)
    assert(r.getStruct(1).getInt(0) == 1 && r.getStruct(1).getLong(1) == 2L)
    assert(r.getStruct(2).getInt(0) == 0) // equidistant → lower index
    // ragged or non-literal centroid tables are analysis errors
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_kmeans_assign(array(0L), '1;2,3')").collect()
    }
    assert(e.getMessage.contains("graft_kmeans_assign"))
  }

  test("D18 graft_top_k SQL aggregate: bounded heap, deterministic ties") {
    Registry.registerAll(spark)
    Seq((1L, 0.5, 10L), (1L, 0.9, 11L), (1L, 0.9, 12L), (1L, 0.1, 13L),
      (2L, 0.7, 20L))
      .toDF("q", "score", "id").createOrReplaceTempView("topk_in")
    val rows = spark.sql(
      """SELECT q, graft_top_k(struct(score, id), 2) AS top
        |FROM topk_in GROUP BY q""".stripMargin)
      .collect().map(r => r.getLong(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(e => (e.getDouble(0), e.getLong(1))))
      .toMap
    assert(rows(1L) == Seq((0.9, 11L), (0.9, 12L))) // ties: lower id first
    assert(rows(2L) == Seq((0.7, 20L)))
  }

  test("D18 graft_hyperplane_lsh matches the Column API kernel") {
    Registry.registerAll(spark)
    val e = graft.queries.Tables.embeddings(spark, "/root/testdata/sf0.001").limit(20)
    e.createOrReplaceTempView("emb_lsh")
    val viaSql = spark.sql(
      "SELECT vec_id, graft_hyperplane_lsh(embedding, 8, 1) AS b FROM emb_lsh")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaCol = e.select(col("vec_id"),
      graft.llm.Similarity.lshBucket(col("embedding"), 8, 1).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaSql == viaCol)
    val err = intercept[Exception](spark.sql(
      "SELECT graft_hyperplane_lsh(embedding, vec_id, 0) FROM emb_lsh"))
    assert(err.getMessage.contains("graft_hyperplane_lsh"))
  }

  test("D18 graft_top_k: NaN scores never rank; heap stays correct") {
    Registry.registerAll(spark)
    // NaN arriving during the initial heap fill must not block better
    // entries (IEEE < is false both ways for NaN)
    Seq((1L, Double.NaN, 9L), (1L, 0.2, 10L), (1L, 0.8, 11L), (1L, 0.5, 12L))
      .toDF("q", "score", "id").createOrReplaceTempView("topk_nan")
    val top = spark.sql(
      """SELECT graft_top_k(struct(score, id), 2) AS top
        |FROM topk_nan GROUP BY q""".stripMargin)
      .head().getSeq[org.apache.spark.sql.Row](0)
      .map(e => (e.getDouble(0), e.getLong(1)))
    assert(top == Seq((0.8, 11L), (0.5, 12L)))
  }

  test("D18 graft_top_k rejects non-literal / null / non-positive k") {
    Registry.registerAll(spark)
    Seq((1L, 0.5, 10L)).toDF("q", "score", "id")
      .createOrReplaceTempView("topk_badk")
    for (k <- Seq("id", "NULL", "0", "-3")) {
      val e = intercept[Exception](spark.sql(
        s"SELECT graft_top_k(struct(score, id), $k) FROM topk_badk GROUP BY q"))
      assert(e.getMessage.contains("graft_top_k"), s"k=$k: ${e.getMessage}")
    }
  }

  test("D18 GraftExtensions injects the SQL surface at session build time") {
    import org.apache.spark.sql.SparkSession
    val base = spark
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      // a NEW session over the same SparkContext, configured the way a
      // cluster deployment would (spark.sql.extensions equivalent)
      val s2 = SparkSession.builder()
        .withExtensions(new graft.GraftExtensions)
        .getOrCreate()
      assert(s2 ne base)
      // no Registry.registerAll(s2): the functions come from the extension
      val r = s2.sql(
        """SELECT graft_simhash64(array('a','b')) AS sh,
          | graft_lang_id('der hund und die katze') AS lang,
          | graft_stopword_count('the cat and dog', 'the,and') AS n""".stripMargin)
        .head()
      assert(!r.isNullAt(0))
      assert(r.getString(1) == "de")
      assert(r.getInt(2) == 2)
    } finally {
      SparkSession.setDefaultSession(prevDefault.orNull)
      SparkSession.setActiveSession(prevActive.getOrElse(base))
    }
  }

  test("D18/A4 AttrUnionAggregator: union + conflict detection as a UDAF") {
    val agg = new Registry.AttrUnionAggregator().toColumn
    val ok = Seq(("a", "1"), ("b", "2"), ("a", "1")).toDS()
      .select(agg).head()
    assert(ok == Map("a" -> "1", "b" -> "2"))
    val e = intercept[Exception] {
      Seq(("a", "1"), ("a", "2")).toDS().select(agg).collect()
    }
    assert(e.getMessage.contains("Encountered key=a with different values") ||
      Option(e.getCause).exists(_.getMessage
        .contains("Encountered key=a with different values")))
  }

  test("B7 legacy reader: last write wins across duplicate names") {
    val spans = Seq(
      span("named-value", "0x1", start = "2021-01-01T00:00:01.000000Z",
        attrs = Map("name" -> "metric", "type" -> "int",
          "encoding" -> "json", "content_encoded" -> "1"), status = "OK"),
      span("named-value", "0x2", start = "2021-01-01T00:00:05.000000Z",
        attrs = Map("name" -> "metric", "type" -> "int",
          "encoding" -> "json", "content_encoded" -> "2"), status = "OK"),
      span("named-value", "0x3", start = "2021-01-01T00:00:03.000000Z",
        attrs = Map("name" -> "other", "type" -> "utf-8",
          "encoding" -> "utf-8", "content_encoded" -> "x"), status = "OK"),
      span("artefact", "0x4", start = "2021-01-01T00:00:02.000000Z",
        attrs = Map("name" -> "f.txt", "type" -> "utf-8",
          "encoding" -> "utf-8", "content_encoded" -> "old"), status = "OK"),
      span("artefact", "0x5", start = "2021-01-01T00:00:04.000000Z",
        attrs = Map("name" -> "f.txt", "type" -> "utf-8",
          "encoding" -> "utf-8", "content_encoded" -> "new"), status = "OK"))
    val df = SpanModel.toDF(spark, spans)
    assert(LegacyReader.getLoggedValues(df) == Map("metric" -> 2L, "other" -> "x"))
    assert(LegacyReader.getLoggedArtifacts(df) == Map("f.txt" -> "new"))
  }
}
