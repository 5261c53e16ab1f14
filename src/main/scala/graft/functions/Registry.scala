package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator

/** D18 — the UDF/UDAF surface, exposed both as Scala APIs and as SQL
  * functions so `spark.sql(...)` users reach every custom kernel.
  */
object Registry {

  /** A4 as a reusable typed Aggregator (SURVEY §4.2.2): attribute-union
    * with conflict detection over (key, value) pairs, producing the exact
    * reference error message on a key bound to two distinct values
    * (`opentelemetry_helpers.py:483-487`). */
  class AttrUnionAggregator
      extends Aggregator[(String, String), Map[String, String], Map[String, String]] {
    override def zero: Map[String, String] = Map.empty

    private def put(m: Map[String, String], k: String, v: String): Map[String, String] =
      m.get(k) match {
        case Some(existing) if existing != v =>
          throw new IllegalArgumentException(
            s"Encountered key=$k with different values $existing and $v")
        case _ => m + (k -> v)
      }

    override def reduce(b: Map[String, String], a: (String, String)): Map[String, String] =
      put(b, a._1, a._2)
    override def merge(b1: Map[String, String], b2: Map[String, String]): Map[String, String] =
      b2.foldLeft(b1) { case (acc, (k, v)) => put(acc, k, v) }
    override def finish(r: Map[String, String]): Map[String, String] = r
    override def bufferEncoder: Encoder[Map[String, String]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, String]]()
    override def outputEncoder: Encoder[Map[String, String]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, String]]()
  }


  import org.apache.spark.sql.catalyst.expressions.Expression

  /** Every native-Expression SQL function, shared by [[registerAll]]
    * (imperative, one session) and [[graft.GraftExtensions]] (the
    * `spark.sql.extensions` injection path every session on a cluster
    * gets for free). Builders that need literal arguments validate them
    * at analysis time with a named AnalysisException. */
  private[graft] val sqlFunctions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    // sketch kernels (native expressions, full codegen/fused)
    "graft_long_dot" -> (exprs => LongArrayDot(exprs(0), exprs(1))),
    "graft_simhash64" -> (exprs => SimHash64Expr(exprs(0))),
    "graft_minhash_sig" -> (exprs => MinHashSigExpr(exprs(0), 64)),
    // text kernels (I5): graft_lang_id(text) over the built-in language
    // table; graft_stopword_count(text, 'w1,w2,…') with a literal word
    // list — both fully codegen'd single-pass scans
    "graft_lang_id" -> (exprs => LangIdExpr(exprs(0),
      graft.llm.TextAnalysis.stopwordTable.toSeq.sortBy(_._1))),
    "graft_stopword_count" -> (stopwordCountBuilder(_)),
    // graft_hyperplane_lsh(vec, nPlanes, table) — literal plane/table ids
    "graft_hyperplane_lsh" -> (hyperplaneLshBuilder(_)),
    // graft_kmeans_assign(vec, 'c1_1,c1_2;c2_1,c2_2;…') — literal
    // centroid table (semicolon-separated centroids of comma-separated
    // longs); returns struct(cluster, dist)
    "graft_kmeans_assign" -> (kmeansAssignBuilder(_)),
    // graft_blocklist_hits(text, 'phrase one,phrase two,…') — literal
    // comma-separated phrase list, one Aho–Corasick scan per row
    "graft_blocklist_hits" -> (blocklistHitsBuilder(_)),
    // aggregate: graft_top_k(struct(score, id), k) with literal k
    "graft_top_k" -> (topKBuilder(_)))

  private def blocklistHitsBuilder(exprs: Seq[Expression]): Expression = {
    val v = if (exprs(1).foldable) exprs(1).eval() else null
    v match {
      case s: org.apache.spark.unsafe.types.UTF8String =>
        val patterns = s.toString.split(",").toSeq.map(_.trim).filter(_.nonEmpty)
        try AhoCorasick.of(patterns) // validate at analysis time; cached
        catch {
          case e: IllegalArgumentException =>
            throw new org.apache.spark.sql.AnalysisException(
              errorClass = "INVALID_PARAMETER_VALUE.PATTERN",
              messageParameters = Map(
                "parameter" -> s"`patterns` (${e.getMessage})",
                "functionName" -> "`graft_blocklist_hits`",
                "value" -> exprs(1).sql))
        }
        BlocklistHitsExpr(exprs(0), patterns)
      case _ => throw new org.apache.spark.sql.AnalysisException(
        errorClass = "INVALID_PARAMETER_VALUE.PATTERN",
        messageParameters = Map(
          "parameter" -> "`patterns` (must be a string literal: 'p1,p2,…')",
          "functionName" -> "`graft_blocklist_hits`",
          "value" -> exprs(1).sql))
    }
  }

  private def kmeansAssignBuilder(exprs: Seq[Expression]): Expression = {
    val v = if (exprs(1).foldable) exprs(1).eval() else null
    val parsed = v match {
      case s: org.apache.spark.unsafe.types.UTF8String =>
        try {
          val cents = s.toString.split(";").map(_.trim).filter(_.nonEmpty)
            .map(_.split(",").map(_.trim.toLong))
          if (cents.nonEmpty && cents.map(_.length).distinct.length == 1)
            Some(cents)
          else None
        } catch { case _: NumberFormatException => None }
      case _ => None
    }
    parsed match {
      case Some(cents) => KMeansAssignExpr(exprs(0), cents)
      case None => throw new org.apache.spark.sql.AnalysisException(
        errorClass = "INVALID_PARAMETER_VALUE.PATTERN",
        messageParameters = Map(
          "parameter" -> ("`centroids` (must be a string literal " +
            "'c1_1,c1_2;c2_1,c2_2;…' of equal-length long vectors)"),
          "functionName" -> "`graft_kmeans_assign`",
          "value" -> exprs(1).sql))
    }
  }

  private def stopwordCountBuilder(exprs: Seq[Expression]): Expression = {
    val v = if (exprs(1).foldable) exprs(1).eval() else null
    v match {
      case s: org.apache.spark.unsafe.types.UTF8String =>
        val words = s.toString.split(",").toSeq.map(_.trim).filter(_.nonEmpty)
        TextScan.setOf(words) // validate at analysis, driver-side
        StopwordCountExpr(exprs(0), words)
      case _ => throw new org.apache.spark.sql.AnalysisException(
        errorClass = "INVALID_PARAMETER_VALUE.PATTERN",
        messageParameters = Map(
          "parameter" -> "`words` (must be a string literal: 'w1,w2,…')",
          "functionName" -> "`graft_stopword_count`",
          "value" -> exprs(1).sql))
    }
  }

  private def intLit(e: Expression, name: String, fn: String): Int = {
    val v = if (e.foldable) e.eval() else null
    v match {
      case n: Number => n.intValue()
      case _ => throw new org.apache.spark.sql.AnalysisException(
        errorClass = "INVALID_PARAMETER_VALUE.INTEGER",
        messageParameters = Map(
          "parameter" -> s"`$name` (must be an integer literal)",
          "functionName" -> s"`$fn`",
          "invalidValue" -> e.sql))
    }
  }

  private def hyperplaneLshBuilder(exprs: Seq[Expression]): Expression =
    HyperplaneLshExpr(exprs(0),
      intLit(exprs(1), "nPlanes", "graft_hyperplane_lsh"),
      intLit(exprs(2), "table", "graft_hyperplane_lsh"))

  private def topKBuilder(exprs: Seq[Expression]): Expression = {
    val k = intLit(exprs(1), "k", "graft_top_k")
    if (k <= 0) throw new org.apache.spark.sql.AnalysisException(
      errorClass = "INVALID_PARAMETER_VALUE.INTEGER",
      messageParameters = Map(
        "parameter" -> "`k` (must be a positive integer literal)",
        "functionName" -> "`graft_top_k`",
        "invalidValue" -> exprs(1).sql))
    TopKByScore(exprs(0), k)
  }

  /** Inject every native function at session-extension time
    * ([[graft.GraftExtensions]]). */
  def injectNative(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
    sqlFunctions.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.Registry", name), builder))
    }
  }

  /** Register the engine's custom functions on an EXISTING session. */
  def registerAll(spark: SparkSession): Unit = {
    // scalar codec (C1/C2) as SQL functions
    spark.udf.register("graft_encode_type",
      (s: String) => graft.model.SerializedData.encode(s).tpe)
    spark.udf.register("graft_decode_utf8",
      (t: String, e: String, c: String) =>
        graft.model.SerializedData(t, e, c).decode().toString)
    // time fns (C3)
    spark.udf.register("graft_iso8601_to_epoch_us",
      (s: String) => graft.model.TimeFns.iso8601ToEpochUs(s))
    spark.udf.register("graft_iso8601_to_epoch_ms",
      (s: String) => graft.model.TimeFns.iso8601ToEpochMs(s))
    sqlFunctions.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
  }
}
