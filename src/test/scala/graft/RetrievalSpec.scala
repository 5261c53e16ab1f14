package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.llm.Retrieval

/** Exact-integer BM25 contract: matches a single-threaded BigInt
  * evaluation of the same cleared-denominator formula, and basic
  * retrieval semantics (saturation, idf ordering, absence of non-matching
  * docs). */
class RetrievalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val corpus = Seq(
    (1L, "spark join hash join fast"),
    (2L, "window merge batch window window"),
    (3L, "hash table scan " + Seq.fill(20)("filler").mkString(" ")),
    (4L, "customer order line order"),
    (5L, "the quick brown fox"))

  private def reference(queries: Seq[(Int, Seq[String])])
      : Map[(Int, Long), BigInt] = {
    val toks = corpus.map { case (id, t) => id -> t.trim.split(" +").toSeq }
    val n = BigInt(toks.size)
    val tTok = BigInt(toks.map(_._2.size).sum)
    val tf = toks.flatMap { case (id, ws) =>
      ws.groupBy(identity).map { case (w, g) => (id, w, BigInt(g.size), BigInt(ws.size)) }
    }
    val df = tf.groupBy(_._2).view.mapValues(v => BigInt(v.size)).toMap
    (for {
      (qid, terms) <- queries
      (id, w, f, dl) <- tf if terms.contains(w)
    } yield {
      val num = BigInt(22) * f * tTok * (2 * n - 2 * df(w) + 1) * 1000000
      val den = (BigInt(10) * tTok * f + 3 * tTok + 9 * dl * n) * (2 * df(w) + 1)
      ((qid, id), num / den)
    }).groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
  }

  private def run(queries: Seq[(Int, Seq[String])], k: Int = 10)
      : Map[(Int, Long), (Long, Int)] =
    Retrieval.bm25TopK(corpus.toDF("doc_id", "text"), "doc_id", "text",
      queries, k).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> ((r.getLong(2), r.getInt(3))))
      .toMap

  test("scores match the BigInt reference exactly; non-matching docs absent") {
    val qs = Seq(1 -> Seq("hash", "join"), 2 -> Seq("window", "customer"))
    val got = run(qs)
    val want = reference(qs)
    assert(got.keySet == want.keySet)
    got.foreach { case (key, (score, _)) => assert(BigInt(score) == want(key), key) }
    assert(!got.contains((1, 5L)) && !got.contains((2, 5L)))
  }

  test("rarer term outweighs a common one at equal tf and dl") {
    // "join" appears in 1 doc, "hash" in 2 → doc 1 (both) beats doc 3
    // (hash only, longer), and the rank order is deterministic
    val got = run(Seq(1 -> Seq("hash", "join")))
    assert(got((1, 1L))._2 == 1)
    assert(got((1, 3L))._2 == 2)
  }

  test("tf saturates: tripled term count does not triple the score") {
    val got = run(Seq(9 -> Seq("window")))
    val s2 = got((9, 2L))._1 // tf = 3
    val single = reference(Seq(9 -> Seq("window")))
    assert(BigInt(s2) == single((9, 2L)))
  }

  test("top-k truncates by (score desc, doc_id) rank") {
    val got = run(Seq(1 -> Seq("hash")), k = 1)
    assert(got.size == 1 && got.keys.head._2 == 1L)
  }
}
