package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.operators.KCore

/** k-core synchronous peeling ([[graft.operators.KCore]]): hand cases,
  * cascade behavior, fixture parity with a naive driver recompute,
  * idempotence, and the non-convergence guard. */
class KCoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("clique survives, pendant peels; degrees are within-core") {
    // 4-clique {1,2,3,4} plus pendant 5-1: the 3-core is the clique
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (1L, 5L)).toDF("a", "b")
    val out = KCore.core(edges, k = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("cascading peel empties a path graph") {
    // path 1-2-3-4 at k=2: endpoints peel, then everything cascades away
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    assert(KCore.core(edges, k = 2).count() == 0)
    // k=1 keeps the whole path with its real degrees
    val k1 = KCore.core(edges, k = 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(k1 == Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L))
  }

  test("fixture 20-core matches a naive driver peel exactly") {
    val li = graft.queries.Tables.lineitem(spark, "/root/testdata/sf0.001")
    val basket = li.filter(col("l_quantity") >= 25)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val edges = basket.as("x").join(basket.as("y"), col("x.o") === col("y.o"))
      .filter(col("x.p") < col("y.p"))
      .select(col("x.p").as("a"), col("y.p").as("b")).distinct()
    val got = KCore.core(edges, k = 20).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // naive synchronous peel on the driver
    val pairs = edges.collect().map(r => (r.getLong(0), r.getLong(1)))
    var adj = pairs.flatMap(p => Seq(p, p.swap)).groupBy(_._1)
      .map { case (u, vs) => u -> vs.map(_._2).toSet }
    var alive = adj.keySet
    var changed = true
    while (changed) {
      val next = alive.filter(u => adj(u).count(alive) >= 20)
      changed = next != alive
      alive = next
    }
    val expect = alive.map(u => u -> adj(u).count(alive).toLong).toMap
    assert(got == expect)
    assert(got.nonEmpty && got.size < adj.size,
      "fixture 20-core must be a proper non-empty subgraph")
  }

  test("local and forced-distributed peels agree exactly") {
    val li = graft.queries.Tables.lineitem(spark, "/root/testdata/sf0.001")
    val basket = li.filter(col("l_quantity") >= 25)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val edges = basket.as("x").join(basket.as("y"), col("x.o") === col("y.o"))
      .filter(col("x.p") < col("y.p"))
      .select(col("x.p").as("a"), col("y.p").as("b")).distinct()
      .localCheckpoint()
    val local = KCore.core(edges, k = 20).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = KCore.core(edges, k = 20, localPeelMaxEdges = 0).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(local == dist)
  }

  test("peeling is idempotent: the core of the core is itself") {
    val li = graft.queries.Tables.lineitem(spark, "/root/testdata/sf0.001")
    val basket = li.filter(col("l_quantity") >= 25)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val edges = basket.as("x").join(basket.as("y"), col("x.o") === col("y.o"))
      .filter(col("x.p") < col("y.p"))
      .select(col("x.p").as("a"), col("y.p").as("b")).distinct()
      .localCheckpoint()
    val core1 = KCore.core(edges, k = 20)
    val coreNodes = core1.select(col("node")).localCheckpoint()
    val coreEdges = edges
      .join(coreNodes.select(col("node").as("a")), "a")
      .join(coreNodes.select(col("node").as("b")), "b")
    val core2 = KCore.core(coreEdges, k = 20).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val first = core1.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core2 == first)
  }

  test("non-convergence guard raises instead of looping") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("a", "b")
    val e = intercept[IllegalStateException] {
      KCore.core(edges, k = 2, maxRounds = 1)
    }
    assert(e.getMessage.contains("did not converge"))
  }
}
