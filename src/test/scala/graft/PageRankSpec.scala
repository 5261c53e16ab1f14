package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.PageRank

/** PageRank's integer fixed-point contract: bit-identical to a
  * straightforward single-threaded evaluation of the same recurrence, on a
  * graph small enough to enumerate. */
class PageRankSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // star (hub 1 ← spokes 2,3,4) plus a chain 4→5→6; directed edges
  private val edges =
    Seq((2L, 1L), (3L, 1L), (4L, 1L), (4L, 5L), (5L, 6L))

  private def reference(iters: Int): Map[Long, Long] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val out = edges.groupBy(_._1).map { case (u, es) => u -> es.size.toLong }
    val n = nodes.size.toLong
    val r0 = PageRank.Unit_ / n
    val base = (15L * r0) / 100L
    var r = nodes.map(_ -> r0).toMap
    for (_ <- 1 to iters) {
      val in = edges.groupBy(_._2).map { case (v, es) =>
        v -> es.map { case (u, _) => r(u) / out(u) }.sum
      }
      r = nodes.map(v => v -> (base + (85L * in.getOrElse(v, 0L)) / 100L)).toMap
    }
    r
  }

  test("ranks match the single-threaded recurrence bit-for-bit") {
    val df = edges.toDF("u", "v")
    val got = PageRank.ranks(df, 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == reference(3))
  }

  test("the hub out-ranks every spoke") {
    val df = edges.toDF("u", "v")
    val got = PageRank.ranks(df, 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(2L, 3L, 4L).forall(sp => got(1L) > got(sp)))
  }
}
