package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.GlobalRank
import graft.llm.Dedup

/** GlobalRank: dense 1..n ranks equal to the single-partition sort, built
  * without one; sorted-neighborhood dedup: candidates and survivors match
  * a brute-force windowed scan. */
class GlobalRankSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("ranks are dense 1..n in total (key, id) order across partitions") {
    val rnd = new scala.util.Random(7)
    val rows = (1L to 500L).map(i => (i, rnd.nextInt(40).toString))
    val ranked = GlobalRank.withGlobalRank(
      rows.toDF("id", "k").repartition(7), "rn", col("k"), col("id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val expected = rows.sortBy { case (id, k) => (k, id) }
      .zipWithIndex.map { case ((id, k), i) => (id, k, i + 1L) }
    assert(ranked.sortBy(_._3).toSeq == expected)
  }

  test("empty input ranks to empty") {
    val df = Seq.empty[(Long, String)].toDF("id", "k")
    assert(GlobalRank.withGlobalRank(df, "rn", col("k"), col("id")).count() == 0)
  }

  test("sorted-neighborhood pairs match a brute-force windowed scan") {
    // clusters of edited copies sharing prefixes + unrelated docs
    def doc(i: Long, t: String) = (i, t)
    val corpus = Seq(
      doc(1, "alpha beta gamma delta epsilon zeta eta theta"),
      doc(2, "alpha beta gamma delta epsilon zeta eta iota"),
      doc(3, "alpha beta gamma delta epsilon zeta kappa theta"),
      doc(10, "one two three four five six seven eight nine"),
      doc(11, "one two three four five six seven eight ten"),
      doc(20, "completely different text with no relation at all"),
      doc(21, "short a b"),
      doc(22, "zz yy xx ww vv uu tt ss"))
    val w = 3
    // brute force: same sort key order, same window, exact jaccard
    val keyed = corpus.map { case (id, t) => (t.trim.take(24), id, t) }.sorted
    def grams(t: String): Set[String] = {
      val ws = t.trim.split(" +")
      if (ws.length < 3) Set.empty
      else ws.sliding(3).map(_.mkString(" ")).toSet
    }
    val expected = (for {
      i <- keyed.indices; j <- (i + 1) to math.min(i + w, keyed.size - 1)
      a = keyed(i); b = keyed(j)
      ga = grams(a._3); gb = grams(b._3)
      if ga.nonEmpty && gb.nonEmpty
      shared = (ga & gb).size
      jac = shared.toDouble / (ga.size + gb.size - shared)
      if jac >= 0.5
    } yield (math.min(a._2, b._2), math.max(a._2, b._2), shared)).toSet
    val got = Dedup.sortedNeighborPairs(
      corpus.toDF("doc_id", "text"), "doc_id", "text",
      window = w, keyPrefixLen = 24, n = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == expected)
    assert(expected.nonEmpty) // the fixture actually exercises the path
  }
}
