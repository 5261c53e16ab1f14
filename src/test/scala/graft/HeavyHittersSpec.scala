package graft

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.HeavyHitters

class HeavyHittersSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // deterministic Zipf-ish corpus: word w_i appears ~C/i times over a vocab
  // far larger than the counter budget k, so the summary genuinely compresses
  private def zipfCorpus(vocab: Int, scale: Int, seed: Int): Seq[String] = {
    val raw = (1 to vocab).flatMap(i => Seq.fill(math.max(1, scale / i))(s"w$i"))
    new Random(seed).shuffle(raw)
  }

  test("summarize keeps every item above the n/(k+1) bound") {
    val corpus = zipfCorpus(vocab = 500, scale = 400, seed = 1)
    val k = 16
    val (summary, n) = HeavyHitters.summarize(corpus.iterator, k)
    assert(n == corpus.size)
    assert(summary.size <= k)
    val exact = corpus.groupBy(identity).map { case (w, xs) => (w, xs.size.toLong) }
    val bound = n / (k + 1)
    for ((w, c) <- exact if c > bound) {
      assert(summary.contains(w), s"$w (count $c > bound $bound) missing")
      assert(summary(w) >= c - bound && summary(w) <= c)
    }
  }

  test("merge preserves the additive bound and the k-entry cap") {
    val a = zipfCorpus(vocab = 300, scale = 200, seed = 2)
    val b = zipfCorpus(vocab = 300, scale = 300, seed = 3)
    val k = 12
    val (sa, na) = HeavyHitters.summarize(a.iterator, k)
    val (sb, nb) = HeavyHitters.summarize(b.iterator, k)
    val merged = HeavyHitters.merge(sa, sb, k)
    assert(merged.size <= k)
    val exact = (a ++ b).groupBy(identity).map { case (w, xs) => (w, xs.size.toLong) }
    val bound = (na + nb) / (k + 1)
    for ((w, c) <- exact if c > bound)
      assert(merged.contains(w), s"$w (count $c > merged bound $bound) missing")
  }

  test("distributed exact() equals brute force on a multi-partition Zipf corpus") {
    import spark.implicits._
    val corpus = zipfCorpus(vocab = 2000, scale = 1500, seed = 4)
    val k = 64
    // θ = 1/32 > 1/(k+1): the guarantee precondition holds with k << vocab
    val ds = spark.createDataset(corpus).repartition(7)
    val got = HeavyHitters.exact(ds, k, num = 1, den = 32)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val n = corpus.size.toLong
    val thr = (n + 31) / 32
    val want = corpus.groupBy(identity)
      .map { case (w, xs) => (w, xs.size.toLong) }
      .filter(_._2 >= thr)
    assert(got == want)
    assert(want.nonEmpty, "degenerate fixture: no heavy hitters to check")
  }

  test("exact() on an empty corpus returns no rows instead of throwing") {
    import spark.implicits._
    val got = HeavyHitters.exact(spark.emptyDataset[String], k = 8,
      num = 1, den = 4)
    assert(got.count() == 0)
  }

  test("exact() rejects thresholds below the Misra-Gries guarantee") {
    import spark.implicits._
    val ds = spark.createDataset(Seq("a", "b"))
    intercept[IllegalArgumentException] {
      HeavyHitters.exact(ds, k = 4, num = 1, den = 10) // 1/10 < 1/(k+1)=1/5
    }
  }
}
