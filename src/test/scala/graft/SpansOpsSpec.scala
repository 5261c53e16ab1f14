package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model.SpanModel
import graft.spans.SpansOps._
import SpanFixtures._

/** Ports of the reference's Spans/UDT semantics tests
  * (`tests/test_composable_logs/test_opentelemetry_helpers.py:85-263`,
  * `tests/.../opentelemetry_helpers/test_spans.py`). Forest under test:
  *
  *        1            10
  *        |  \
  *        2    6
  *      / | \
  *     3  4  5
  */
class SpansOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  def forest = Seq(
    span("root", "0x1", None, start = "2021-01-01T00:00:01.000000Z"),
    span("mid", "0x2", Some("0x1"), start = "2021-01-01T00:00:02.000000Z"),
    span("leaf", "0x3", Some("0x2"), start = "2021-01-01T00:00:03.000000Z"),
    span("leaf", "0x4", Some("0x2"), start = "2021-01-01T00:00:04.000000Z"),
    span("leaf", "0x5", Some("0x2"), start = "2021-01-01T00:00:05.000000Z"),
    span("side", "0x6", Some("0x1"), start = "2021-01-01T00:00:06.000000Z"),
    span("other-root", "0x10", None, start = "2021-01-01T00:00:00.500000Z"))

  def df = SpanModel.toDF(spark, forest)

  test("A1 filterNested: top-level, struct path, attribute map path") {
    assert(df.filterNested(Seq("name"), "leaf").count() == 3)
    val d2 = SpanModel.toDF(spark, Seq(
      span("s", "0x1", status = "OK"),
      span("s", "0x2", status = "ERROR")))
    assert(d2.filterNested(Seq("status", "status_code"), "OK").count() == 1)
    val d3 = SpanModel.toDF(spark, Seq(
      span("s", "0x1", attrs = Map("task.id" -> "ingest")),
      span("s", "0x2", attrs = Map("task.id" -> "train")),
      span("s", "0x3")))
    assert(d3.filterNested(Seq("attributes", "task.id"), "ingest").count() == 1)
    // missing path ⇒ row dropped, not error
    assert(d3.filterNested(Seq("attributes", "nope"), "x").count() == 0)
  }

  test("A2 sortByStartTime") {
    val ids = df.sortByStartTime().select("context.span_id")
      .collect().map(_.getString(0)).toSeq
    assert(ids == Seq("0x10", "0x1", "0x2", "0x3", "0x4", "0x5", "0x6"))
    val rev = df.sortByStartTime(reverse = true).select("context.span_id")
      .collect().map(_.getString(0)).toSeq
    assert(rev == ids.reverse)
  }

  test("A3 containsSpanId") {
    assert(df.containsSpanId("0x4"))
    assert(!df.containsSpanId("0x99"))
  }

  test("A4 attributesUnion with prefix filter and conflict detection") {
    val d = SpanModel.toDF(spark, Seq(
      span("a", "0x1", attrs = Map("task.id" -> "t1", "workflow.env" -> "xyz")),
      span("b", "0x2", attrs = Map("task.num_cpus" -> 2, "other" -> "zzz")),
      span("c", "0x3", attrs = Map("workflow.env" -> "xyz"))))
    assert(d.attributesUnion() == Map(
      "task.id" -> "t1", "workflow.env" -> "xyz",
      "task.num_cpus" -> 2L, "other" -> "zzz"))
    assert(d.attributesUnion(Some(Set("workflow."))) == Map("workflow.env" -> "xyz"))
    assert(d.attributesUnion(Some(Set("task.", "workflow."))) ==
      Map("task.id" -> "t1", "task.num_cpus" -> 2L, "workflow.env" -> "xyz"))

    val conflict = SpanModel.toDF(spark, Seq(
      span("a", "0x1", attrs = Map("k" -> "v1")),
      span("b", "0x2", attrs = Map("k" -> "v2"))))
    val e = intercept[IllegalArgumentException](conflict.attributesUnion())
    assert(e.getMessage.contains("Encountered key=k with different values"))
  }

  test("A5 exceptionEvents") {
    val d = SpanModel.toDF(spark, Seq(
      span("a", "0x1", events = Seq(exceptionEvent("boom"))),
      span("b", "0x2", events = Seq(exceptionEvent("bang"), exceptionEvent("pow"))),
      span("c", "0x3")))
    assert(d.exceptionEvents().count() == 3)
  }

  test("A6/A9 edges and roots") {
    assert(df.spanEdges().count() == 5)
    val roots = df.rootSpans().select("context.span_id")
      .collect().map(_.getString(0)).toSet
    assert(roots == Set("0x1", "0x10"))
  }

  test("A7 boundUnder / boundInclusive") {
    def ids(d: org.apache.spark.sql.DataFrame) =
      d.select("context.span_id").collect().map(_.getString(0)).toSet
    assert(ids(df.boundUnder("0x1")) == Set("0x2", "0x3", "0x4", "0x5", "0x6"))
    assert(ids(df.boundInclusive("0x2")) == Set("0x2", "0x3", "0x4", "0x5"))
    assert(ids(df.boundUnder("0x3")) == Set.empty)
    assert(ids(df.boundInclusive("0x10")) == Set("0x10"))
  }

  test("A8 containsPath incl. intermediate nodes") {
    assert(df.containsPath("0x1", "0x2"))
    assert(df.containsPath("0x1", "0x3"))
    assert(df.containsPath("0x1", "0x2", "0x3"))
    assert(!df.containsPath("0x3", "0x4"))
    assert(!df.containsPath("0x5", "0x1"))
    assert(!df.containsPath("0x1", "0x10"))
  }

  test("A10 graphEquals") {
    assert(df.graphEquals(SpanModel.toDF(spark, forest.reverse)))
    assert(!df.graphEquals(SpanModel.toDF(spark, forest.tail)))
  }

  test("A8 containsPaths evaluates several paths in one closure pass") {
    assert(df.containsPaths(Seq(
      Seq("0x1", "0x2", "0x3"),
      Seq("0x3", "0x4"),
      Seq("0x1", "0x3"),
      Seq("0x5", "0x1"))) == Seq(true, false, true, false))
  }

  test("A10 gate falls back to the full derivation on a degenerate scope") {
    import org.apache.spark.sql.functions.col
    // a predicate matching NO customers: the scoped derivation carries no
    // dependency spans, so eq_truncated would flip spuriously — the gate
    // must fall back to the full archive, which always has them
    val spans = graft.queries.SpanAlgebra.spansWithDepsOrFull(
      spark, "/root/testdata/sf0.001", col("o_custkey") < 0)
    assert(spans.filter(col("name") === "task-dependency").limit(1).count() > 0,
      "degenerate scope must fall back to the full derivation")
  }

  test("D1 JSONL round-trip through SpanSource") {
    val sink = new graft.exec.SpanSink
    forest.foreach(sink.add)
    val tmp = java.nio.file.Files.createTempDirectory("graft-spans")
    sink.writeJsonl(s"$tmp/spans.txt")
    val back = graft.spans.SpanSource.readJsonl(spark, s"$tmp/spans.txt")
    assert(back.count() == forest.size)
    assert(back.graphEquals(df))
    val attrs = SpanModel.toDF(spark, Seq(
      span("a", "0x1", attrs = Map("task.id" -> "t1", "task.num_cpus" -> 2))))
    val sink2 = new graft.exec.SpanSink
    attrs.collect() // noop, just materialize
    sink2.add(span("a", "0x1", attrs = Map("task.id" -> "t1", "task.num_cpus" -> 2)))
    sink2.writeJsonl(s"$tmp/spans2.txt")
    val back2 = graft.spans.SpanSource.readJsonl(spark, s"$tmp/spans2.txt")
    assert(back2.attributesUnion() == Map("task.id" -> "t1", "task.num_cpus" -> 2L))
  }

  test("A7 treeClosureGrouped ignores null-parent edges (roots)") {
    import spark.implicits._
    val edges = Seq((1L, Option.empty[Long], 10L), (1L, Some(10L), 11L),
      (1L, Some(11L), 12L))
      .toDF("k", "parent", "child")
    val out = graft.operators.Closure.treeClosureGrouped(edges, "k")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // no fabricated ancestor 0 rows; just the 10->11->12 chain
    assert(out == Set((10L, 11L, 1), (10L, 12L, 2), (11L, 12L, 1)))
  }

  test("A7 descendantsWithRoots dedups diamond DAGs (node at two depths)") {
    import spark.implicits._
    // a -> b -> d and a -> c -> d: d reachable from root a at depth 2 twice
    val edges = Seq(("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"))
      .toDF("parent", "child")
    val roots = Seq("a").toDF("id")
    // both execution paths must agree: the driver-local walk (small edge
    // sets) and the distributed fixpoint loop (forced via the threshold)
    for (threshold <- Seq(100000L, 0L)) {
      val saved = graft.operators.Closure.LocalWalkMaxEdges
      graft.operators.Closure.LocalWalkMaxEdges = threshold
      try {
        val out = graft.operators.Closure
          .descendantsWithRoots(edges, roots)
          .collect().map(r => (r.getString(0), r.getString(1)))
        assert(out.length == out.distinct.length,
          s"duplicate pairs at threshold=$threshold: ${out.toSeq}")
        assert(out.toSet == Set(("a", "a"), ("a", "b"), ("a", "c"), ("a", "d")))
      } finally graft.operators.Closure.LocalWalkMaxEdges = saved
    }
  }

  test("A7 closure aligns mixed root/edge id types on both paths") {
    import spark.implicits._
    // IntegerType roots against LongType edges: the driver-local walk keys
    // a map on raw values (Integer vs Long would silently miss) and mixes
    // root/child values in one result column — both paths must agree on
    // the widened type
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("parent", "child")
    val roots = Seq(1).toDF("id") // Int, not Long
    for (threshold <- Seq(100000L, 0L)) {
      val saved = graft.operators.Closure.LocalWalkMaxEdges
      graft.operators.Closure.LocalWalkMaxEdges = threshold
      try {
        val out = graft.operators.Closure
          .descendantsWithRoots(edges, roots)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(out == Set((1L, 1L), (1L, 2L), (1L, 3L)),
          s"threshold=$threshold: $out")
      } finally graft.operators.Closure.LocalWalkMaxEdges = saved
    }
  }

  test("A7/A8 local and distributed closure paths agree on the span forest") {
    def ids(d: org.apache.spark.sql.DataFrame) =
      d.select("context.span_id").collect().map(_.getString(0)).toSet
    val saved = graft.operators.Closure.LocalWalkMaxEdges
    graft.operators.Closure.LocalWalkMaxEdges = 0L // force distributed
    try {
      assert(df.containsPaths(Seq(
        Seq("0x1", "0x2", "0x3"),
        Seq("0x3", "0x4"))) == Seq(true, false))
      assert(ids(df.boundInclusive("0x2")) == Set("0x2", "0x3", "0x4", "0x5"))
    } finally graft.operators.Closure.LocalWalkMaxEdges = saved
    assert(ids(df.boundInclusive("0x2")) == Set("0x2", "0x3", "0x4", "0x5"))
  }
}
