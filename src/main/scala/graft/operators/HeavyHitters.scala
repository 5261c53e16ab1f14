package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Distributed exact heavy hitters (frequent items) via Misra–Gries
  * summaries (Misra & Gries 1982) merged as mergeable summaries
  * (Agarwal et al., PODS 2012).
  *
  * Why this shape at 100 TB: a plain `groupBy(token).count()` shuffles the
  * FULL key universe — for an open vocabulary (n-grams, URLs, user agents)
  * that is a shuffle the size of the input. The two-pass scheme instead:
  *
  *   1. each partition builds a bounded k-counter Misra–Gries summary
  *      (O(k) memory regardless of partition size), and the summaries are
  *      tree-reduced to ONE ≤k-entry summary on the driver — no shuffle of
  *      the key universe at all, and the driver never sees more than k
  *      candidates (a per-partition candidate `collect` would be k×P);
  *   2. an exact recount restricted to those ≤k candidates (broadcast
  *      semi-join, map-side partial aggregation over ≤k distinct keys).
  *
  * The Misra–Gries bound — any item with true count > n/(k+1) survives the
  * summary, and merging preserves the bound — makes pass 2 EXACT for every
  * threshold num/den > 1/(k+1): the candidate set provably contains all
  * qualifying items, so the recount's output equals the brute-force
  * `HAVING count(*) >= ceil(n·num/den)` answer. The threshold is a rational
  * (num/den) and the cut-off `ceil(n·num/den)` is computed in integer
  * arithmetic, so Spark and any SQL oracle agree bit-for-bit.
  */
object HeavyHitters {

  /** One-pass Misra–Gries summary of a partition: at most `k` counters;
    * every item with partition count c survives with counter ≥ c − n/(k+1).
    * Returns (summary, items-seen). */
  def summarize(it: Iterator[String], k: Int): (Map[String, Long], Long) = {
    require(k >= 1, s"need at least one counter, got k=$k")
    val m = mutable.HashMap.empty[String, Long]
    var n = 0L
    while (it.hasNext) {
      val x = it.next(); n += 1
      m.get(x) match {
        case Some(c) => m(x) = c + 1
        case None if m.size < k => m(x) = 1L
        case None =>
          // decrement-all round: drops ≥1 counter, amortized O(1) per item
          val dead = mutable.ArrayBuffer.empty[String]
          m.foreach { case (w, c) => if (c == 1L) dead += w else m(w) = c - 1 }
          dead.foreach(m.remove)
      }
    }
    (m.toMap, n)
  }

  /** Mergeable-summaries merge: add counters pointwise, then subtract the
    * (k+1)-th largest counter value and drop non-positive counters. The
    * error bounds add, so the merged bound stays n_total/(k+1). */
  def merge(a: Map[String, Long], b: Map[String, Long], k: Int): Map[String, Long] = {
    val sum = mutable.HashMap.empty[String, Long]
    a.foreach { case (w, c) => sum(w) = c }
    b.foreach { case (w, c) => sum(w) = sum.getOrElse(w, 0L) + c }
    if (sum.size <= k) sum.toMap
    else {
      val cut = sum.values.toArray.sortInPlace()(Ordering[Long].reverse)(k)
      sum.iterator.collect { case (w, c) if c > cut => (w, c - cut) }.toMap
    }
  }

  /** Bounded candidate sweep: ≤k candidate keys plus the exact item count,
    * via one tree aggregation of per-partition summaries (treeAggregate,
    * not treeReduce: its zero value makes the empty / zero-partition input
    * return (no candidates, 0) instead of throwing). Superset guarantee:
    * contains every item with global count > n/(k+1). */
  def candidates(tokens: Dataset[String], k: Int): (Seq[String], Long) = {
    val comb: ((Map[String, Long], Long), (Map[String, Long], Long)) =>
        (Map[String, Long], Long) =
      { case ((m1, n1), (m2, n2)) => (merge(m1, m2, k), n1 + n2) }
    val (summary, n) = tokens.rdd
      .mapPartitions(it => Iterator.single(summarize(it, k)))
      .treeAggregate((Map.empty[String, Long], 0L))(comb, comb)
    (summary.keys.toSeq, n)
  }

  /** EXACT frequent items: every token with count ≥ ceil(n·num/den), as
    * (token, cnt). Requires num/den > 1/(k+1) so the Misra–Gries candidate
    * set provably covers the threshold.
    *
    * NOTE: the candidate sweep is an EAGER action (the threshold needs N
    * before the recount plan exists), so building this DataFrame already
    * runs the sweep jobs — plan-only tooling (explain, shuffle-budget
    * audits) sees just the recount. The sweep itself moves only ≤k-entry
    * summary maps between tree levels, never row data. */
  def exact(tokens: Dataset[String], k: Int, num: Long, den: Long): DataFrame = {
    require(num > 0 && den > 0, s"threshold must be positive: $num/$den")
    require(num * (k + 1) > den,
      s"threshold $num/$den is below the Misra-Gries guarantee 1/(k+1) for k=$k")
    val spark = tokens.sparkSession
    import spark.implicits._
    val (cand, n) = candidates(tokens, k)
    val thr = (num * n + den - 1) / den // ceil(n·num/den), exact integers
    tokens.toDF("token")
      .join(broadcast(cand.toDF("token")), Seq("token"), "left_semi")
      .groupBy(col("token"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= thr)
  }
}
