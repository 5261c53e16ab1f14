package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Triangles

/** Degree-orientation triangle counting vs a brute-force enumeration of
  * the same graph — exact equality of the per-node counts, including
  * skewed (hub-heavy) graphs where the orientation bound matters. */
class TrianglesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def brute(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val adj = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (n, es) => n -> es.map(_._2).toSet }
    val nodes = adj.keys.toSeq.sorted
    val counts = scala.collection.mutable.Map.empty[Long, Long]
    for {
      i <- nodes.indices; j <- (i + 1) until nodes.size; k <- (j + 1) until nodes.size
      a = nodes(i); b = nodes(j); c = nodes(k)
      if adj(a)(b) && adj(a)(c) && adj(b)(c)
    } Seq(a, b, c).foreach(n => counts(n) = counts.getOrElse(n, 0L) + 1L)
    counts.toMap
  }

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Triangles.perNodeCounts(edges.toDF("a", "b")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("K4 plus a pendant path: 4 corners of 3 triangles each, path sees none") {
    // complete graph on 1..4, then 4-5-6 path
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val edges = k4 ++ Seq((4L, 5L), (5L, 6L))
    val got = run(edges)
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("triangle-free bipartite graph yields no rows") {
    val edges = for (a <- 1L to 5L; b <- 10L to 14L) yield (a, b)
    assert(run(edges).isEmpty)
  }

  test("random graphs (incl. a forced hub) match brute force exactly") {
    val rnd = new scala.util.Random(1234)
    for (trial <- 1 to 3) {
      val n = 24
      val pool = for (a <- 1L to n; b <- (a + 1) to n) yield (a, b)
      // ~22% density plus every edge at the hub node 1 — the skew case
      val edges = pool.filter { case (a, b) => a == 1L || rnd.nextDouble() < 0.22 }
      val expected = brute(edges)
      assert(run(edges) == expected, s"trial $trial")
    }
  }
}
