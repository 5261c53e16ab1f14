package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.LabelPropagation

/** Synchronous LPA contract: bit-identical to a single-threaded
  * evaluation of the same most-frequent/min-label vote. */
class LabelPropagationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def reference(edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
    val adj = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (n, es) => n -> es.map(_._2) }
    var labels = adj.keys.map(n => n -> n).toMap
    for (_ <- 1 to rounds) {
      labels = adj.map { case (n, nbrs) =>
        val counts = nbrs.map(labels).groupBy(identity)
          .map { case (l, g) => (l, g.size) }
        n -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    }
    labels
  }

  private def run(edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] =
    LabelPropagation.communities(edges.toDF("a", "b"), rounds).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("two dense cliques joined by one bridge edge collapse to two labels") {
    val c1 = for (a <- 1L to 5L; b <- (a + 1) to 5L) yield (a, b)
    val c2 = for (a <- 11L to 15L; b <- (a + 1) to 15L) yield (a, b)
    val edges = c1 ++ c2 ++ Seq((5L, 11L))
    val got = run(edges, 2)
    assert(got == reference(edges, 2))
    // each clique's interior converges onto its minimum member
    assert((1L to 4L).forall(n => got(n) == 1L))
    assert((12L to 15L).forall(n => got(n) == 11L))
  }

  test("random graphs match the single-threaded recurrence exactly") {
    val rnd = new scala.util.Random(99)
    for (trial <- 1 to 3) {
      val pool = for (a <- 1L to 20L; b <- (a + 1) to 20L) yield (a, b)
      val edges = pool.filter(_ => rnd.nextDouble() < 0.25)
      if (edges.nonEmpty) {
        assert(run(edges, 2) == reference(edges, 2), s"trial $trial")
      }
    }
  }
}
