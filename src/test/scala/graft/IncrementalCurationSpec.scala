package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.llm.IncrementalCuration
import graft.llm.IncrementalCuration.StateTables

/** The v7 incremental-curation loop the oracle row (`i6_curation_v7_
  * incremental`) can't drive alone: increment N+1 processes against the
  * persisted state, [[IncrementalCuration.updateState]] folds it in, and
  * increment N+2 must then see N+1's survivors (dup-flag a copy of one)
  * while NOT seeing retired docs (a copy of a retired doc must survive).
  * Also pins the tombstone/compaction equivalence and the stats update's
  * exact incremental identity.
  */
class IncrementalCurationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def st(tag: String) = StateTables(
    s"ics_${tag}_bands", s"ics_${tag}_feats", s"ics_${tag}_doctoks",
    s"ics_${tag}_srcstats", s"ics_${tag}_tombstones", s"ics_${tag}_meta",
    new java.io.File(sys.props("java.io.tmpdir"), s"ics_${tag}_lr").toString)

  // ≥50 repeated-but-distinct words so docs clear the quality label and
  // LSH near-dups are non-trivial; `suffix` perturbs the tail only.
  // `seed` feeds every token, so texts of different seeds share nothing
  // (the `% 23` variant collided seeds 23 apart — seed 50 == seed 4)
  private def longText(seed: Int, suffix: String = ""): String =
    ((0 until 60).map(i => s"s${seed}word${(seed * 7 + i * 3) % 23}tok$i")
      .mkString(" ") + " " + suffix).trim

  private def docsDF(rows: Seq[(Long, String, String)]): DataFrame =
    rows.toDF("doc_id", "text", "source")

  test("increment N+2 sees N+1 survivors and forgets retired docs") {
    val standing = docsDF(Seq(
      (1L, longText(1), "wiki"),
      (2L, longText(2), "wiki"),
      (3L, longText(3), "crawl"),
      (4L, longText(4), "crawl"),
      (5L, longText(5), "crawl")))
    val t = st("loop")
    IncrementalCuration.buildState(standing, "doc_id", "text", "source", t)

    // ---- increment N+1: retire doc 2, add a fresh doc 10 and a near-dup
    // of doc 3 (id 11; first-seen-wins drops it)
    val inc1 = docsDF(Seq(
      (10L, longText(40), "wiki"),
      (11L, longText(3, "tail tweak"), "crawl")))
    val ret1 = Seq(2L).toDF("doc_id")
    val state1 = IncrementalCuration.loadState(spark, t)
    val v1 = IncrementalCuration.processIncrement(state1, inc1, ret1,
      "doc_id", "text", "source").cache()
    val v1Map = v1.select("doc_id", "is_dup", "curated_in").collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1), r.getBoolean(2))).toMap
    assert(!v1Map(10L)._1, "fresh doc must not be a dup")
    assert(v1Map(11L)._1, "near-dup of standing doc 3 must be flagged")
    assert(!v1Map(11L)._2, "a dup is never curated in")
    IncrementalCuration.updateState(t, state1, inc1, v1, ret1,
      "doc_id", "text", "source")

    // ---- increment N+2 against the UPDATED state
    val inc2 = docsDF(Seq(
      (20L, longText(40, "small change"), "wiki"), // near-dups N+1's doc 10
      (21L, longText(2, "minor edit"), "wiki"),    // near-dups RETIRED doc 2
      (22L, longText(50), "crawl")))               // fresh
    val ret2 = Seq(5L).toDF("doc_id") // retire doc 5; its content never re-enters
    val state2 = IncrementalCuration.loadState(spark, t)
    val v2 = IncrementalCuration.processIncrement(state2, inc2, ret2,
      "doc_id", "text", "source").cache()
    val v2rows = v2.select("doc_id", "is_dup", "best_match").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(v2rows(20L).getBoolean(1),
      "a copy of an N+1 SURVIVOR must be flagged against the updated state")
    assert(v2rows(20L).getLong(2) == 10L, "best_match must be the survivor")
    assert(!v2rows(21L).getBoolean(1),
      "a copy of a RETIRED doc must NOT match its tombstoned state rows")
    assert(!v2rows(22L).getBoolean(1))

    // ---- compaction: physically folds tombstones in; verdicts unchanged
    IncrementalCuration.updateState(t, state2, inc2, v2, ret2,
      "doc_id", "text", "source")
    val preCompact = spark.table(t.bands).count()
    IncrementalCuration.compactState(spark, t)
    assert(spark.table(t.tombstones).count() == 0)
    assert(spark.table(t.bands).count() < preCompact,
      "compaction must drop the retired doc's band rows")
    val inc3 = docsDF(Seq((30L, longText(40, "small change 2"), "wiki"),
      (31L, longText(5, "minor edit 2"), "wiki"), // near-dups RETIRED doc 5
      (32L, longText(2, "third edit"), "wiki")))  // doc 2's content RE-ENTERED
                                                  // via survivor 21 — must match
    val state3 = IncrementalCuration.loadState(spark, t)
    val v3 = IncrementalCuration.processIncrement(state3, inc3,
      spark.range(0).select(col("id").as("doc_id")),
      "doc_id", "text", "source")
      .select("doc_id", "is_dup").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(v3(30L), "survivor families must still match after compaction")
    assert(!v3(31L), "retired content must stay forgotten after compaction")
    assert(v3(32L),
      "content re-added by a later survivor must match (first-seen-wins)")
  }

  test("a CHANGED doc (retired ∩ increment) keeps its NEW version live") {
    // the round-13 id-only tombstone killed the new version's state rows:
    // a changed doc arrived in both `retired` and the increment, updateState
    // tombstoned the id, and the next increment's probe excluded the NEW
    // rows — later near-dups of changed content silently passed as fresh.
    // Versioned tombstones (doc_id, dead_lt) fix it; this test pins that.
    val standing = docsDF(Seq(
      (1L, longText(1), "wiki"),
      (2L, longText(2), "wiki"),
      (4L, longText(4), "crawl")))
    val t = st("changed")
    IncrementalCuration.buildState(standing, "doc_id", "text", "source", t)

    // ---- increment N+1: doc 4 CHANGES to completely fresh content
    // (seed 44), arriving under its own id in BOTH retired and increment
    val inc1 = docsDF(Seq((4L, longText(44), "crawl")))
    val ret1 = Seq(4L).toDF("doc_id")
    val state1 = IncrementalCuration.loadState(spark, t)
    val v1 = IncrementalCuration.processIncrement(state1, inc1, ret1,
      "doc_id", "text", "source").localCheckpoint()
    assert(!v1.filter(col("doc_id") === 4L).head().getAs[Boolean]("is_dup"),
      "the changed doc must not match its own retired old version")
    IncrementalCuration.updateState(t, state1, inc1, v1, ret1,
      "doc_id", "text", "source")

    // ---- increment N+2: a near-dup of the NEW version must be flagged
    // (the round-13 bug let it through); a near-dup of the OLD version
    // must NOT match (old rows are dead)
    val inc2 = docsDF(Seq(
      (20L, longText(44, "tail tweak"), "crawl"), // near-dups NEW v of 4
      (21L, longText(4, "tail tweak"), "crawl"))) // near-dups OLD v of 4
    val state2 = IncrementalCuration.loadState(spark, t)
    val v2 = IncrementalCuration.processIncrement(state2, inc2,
      spark.range(0).select(col("id").as("doc_id")),
      "doc_id", "text", "source").localCheckpoint()
    val byId = v2.select("doc_id", "is_dup", "best_match").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(byId(20L).getBoolean(1),
      "a near-dup of a changed doc's NEW version must be flagged")
    assert(byId(20L).getLong(2) == 4L)
    assert(!byId(21L).getBoolean(1),
      "a near-dup of a changed doc's OLD version must not match dead rows")
    IncrementalCuration.updateState(t, state2, inc2, v2,
      spark.range(0).select(col("id").as("doc_id")),
      "doc_id", "text", "source")

    // ---- retiring the changed doc later subtracts only the NEW
    // version's live tokens (the old row is already dead — the round-13
    // newlyRetired skip drifted srcStats here)
    val inc3 = docsDF(Seq((30L, longText(77), "news")))
    val ret3 = Seq(4L).toDF("doc_id")
    val state3 = IncrementalCuration.loadState(spark, t)
    val v3 = IncrementalCuration.processIncrement(state3, inc3, ret3,
      "doc_id", "text", "source").localCheckpoint()
    IncrementalCuration.updateState(t, state3, inc3, v3, ret3,
      "doc_id", "text", "source")
    val got = spark.table(t.srcStats).as[(String, Long)].collect().toMap
    // expected = fresh aggregate over the final snapshot:
    // wiki {1,2}, crawl {20,21} (4 retired), news {30}
    val want = docsDF(Seq(
      (1L, longText(1), "wiki"), (2L, longText(2), "wiki"),
      (20L, longText(44, "tail tweak"), "crawl"),
      (21L, longText(4, "tail tweak"), "crawl"),
      (30L, longText(77), "news")))
      .groupBy(col("source"))
      .agg(sum(graft.llm.TextAnalysis.tokenCount(col("text")).cast("long"))
        .as("ns"))
      .as[(String, Long)].collect().toMap
    assert(got == want, s"got $got want $want")

    // ---- compaction after the changed-doc history must keep the live
    // rows of survivors and drop every dead version
    IncrementalCuration.compactState(spark, t)
    val liveIds = spark.table(t.docToks).select("doc_id")
      .distinct().as[Long].collect().toSet
    assert(liveIds == Set(1L, 2L, 20L, 21L, 30L), liveIds)
  }

  test("updateState auto-compacts when tombstones cross the bound") {
    val standing = docsDF(Seq(
      (1L, longText(1), "wiki"), (2L, longText(2), "wiki"),
      (3L, longText(3), "crawl"), (4L, longText(4), "crawl")))
    val t = st("autocompact")
    IncrementalCuration.buildState(standing, "doc_id", "text", "source", t)
    val state1 = IncrementalCuration.loadState(spark, t)
    val inc1 = docsDF(Seq((10L, longText(10), "wiki")))
    val ret1 = Seq(1L).toDF("doc_id")
    val v1 = IncrementalCuration.processIncrement(state1, inc1, ret1,
      "doc_id", "text", "source").localCheckpoint()
    // 1 tombstone, nLive 4: 1 > 0.5*4 is false → no compaction
    val c1 = IncrementalCuration.updateState(t, state1, inc1, v1, ret1,
      "doc_id", "text", "source",
      compactFrac = 0.5, compactMinTombstones = 1L)
    assert(!c1, "below the bound, no compaction")
    assert(spark.table(t.tombstones).count() == 1)
    // retire two more: 3 tombstones > 0.5 * nLive(3) → auto-compacts
    val state2 = IncrementalCuration.loadState(spark, t)
    val inc2 = docsDF(Seq((11L, longText(11), "wiki")))
    val ret2 = Seq(2L, 3L).toDF("doc_id")
    val v2 = IncrementalCuration.processIncrement(state2, inc2, ret2,
      "doc_id", "text", "source").localCheckpoint()
    val preBands = spark.table(t.bands).count()
    val c2 = IncrementalCuration.updateState(t, state2, inc2, v2, ret2,
      "doc_id", "text", "source",
      compactFrac = 0.5, compactMinTombstones = 1L)
    assert(c2, "crossing the bound must trigger compaction")
    assert(spark.table(t.tombstones).count() == 0,
      "compaction folds the tombstones in")
    assert(spark.table(t.bands).count() < preBands)
    val liveIds = spark.table(t.docToks).select("doc_id")
      .distinct().as[Long].collect().toSet
    assert(liveIds == Set(4L, 10L, 11L), liveIds)
  }

  test("N increments + compaction ≡ from-scratch build on the final " +
      "snapshot (LSM equivalence, 2 seeds)") {
    // drive 3 increments with add/change/remove interleaved (content all
    // pairwise non-dup, so every doc survives and the index-side
    // equivalence is exact), compact mid-way on one seed, then check the
    // LIVE state rows equal a fresh buildState over the final snapshot.
    for (seed <- Seq(7, 13)) {
      val rnd = new scala.util.Random(seed)
      var nextSeed = seed * 1000
      def fresh(): String = { nextSeed += 1; longText(nextSeed) }
      var snap = (1 to 8).map(i => i.toLong ->
        (fresh(), if (i % 2 == 0) "wiki" else "crawl")).toMap
      val t = st(s"equiv$seed")
      IncrementalCuration.buildState(
        docsDF(snap.toSeq.map { case (id, (tx, src)) => (id, tx, src) }),
        "doc_id", "text", "source", t, lrIters = 5)
      var nextId = 100L * seed
      for (step <- 1 to 3) {
        val ids = snap.keys.toSeq.sorted
        val removed = Seq(ids(rnd.nextInt(ids.size)))
        val changed = Seq(ids.filterNot(removed.contains)
          .apply(rnd.nextInt(ids.size - 1)))
        val added = (1 to 2).map { _ => nextId += 1; nextId }
        val incRows = changed.map(id => (id, fresh(), snap(id)._2)) ++
          added.map(id => (id, fresh(), if (rnd.nextBoolean()) "wiki"
            else "news"))
        val retired = (removed ++ changed).toDF("doc_id")
        val inc = docsDF(incRows)
        val state = IncrementalCuration.loadState(spark, t)
        val v = IncrementalCuration.processIncrement(state, inc, retired,
          "doc_id", "text", "source").localCheckpoint()
        assert(v.filter(col("is_dup") || col("is_batch_exact_dup"))
          .count() == 0, "fuzz content is pairwise non-dup by construction")
        IncrementalCuration.updateState(t, state, inc, v, retired,
          "doc_id", "text", "source")
        snap = (snap -- removed) ++ incRows.map { case (id, tx, src) =>
          id -> (tx, src) }
        if (seed == 7 && step == 2)
          IncrementalCuration.compactState(spark, t)
      }
      // from-scratch reference state over the final snapshot
      val rt = st(s"equivref$seed")
      IncrementalCuration.buildState(
        docsDF(snap.toSeq.map { case (id, (tx, src)) => (id, tx, src) }),
        "doc_id", "text", "source", rt, lrIters = 5)
      def liveRows(tables: StateTables): (Set[(String, Long)],
          Set[(Long, Long)], Set[(Long, String, Long)], Map[String, Long]) = {
        IncrementalCuration.compactState(spark, tables)
        (spark.table(tables.bands).select("band_key", "doc_b")
          .as[(String, Long)].collect().toSet,
         spark.table(tables.feats)
           .select(col("doc_b"), xxhash64(col("sh")).as("h"))
           .as[(Long, Long)].collect().toSet,
         spark.table(tables.docToks).select("doc_id", "source", "tok")
           .as[(Long, String, Long)].collect().toSet,
         spark.table(tables.srcStats).as[(String, Long)].collect().toMap)
      }
      val (gb, gf, gd, gs) = liveRows(t)
      val (wb, wf, wd, ws) = liveRows(rt)
      assert(gb == wb, s"seed $seed: band index diverged from batch build")
      assert(gf == wf, s"seed $seed: feature table diverged")
      assert(gd == wd, s"seed $seed: docToks diverged")
      assert(gs == ws, s"seed $seed: srcStats diverged")
    }
  }

  test("source stats update equals a fresh aggregate over the new corpus") {
    val standing = docsDF(Seq(
      (1L, "a b c", "wiki"),
      (2L, "d e", "wiki"),
      (3L, "f g h i", "crawl")))
    val t = st("stats")
    IncrementalCuration.buildState(standing, "doc_id", "text", "source", t)
    val inc = docsDF(Seq((4L, "x y z w v", "crawl"), (5L, "p q", "news")))
    val ret = Seq(2L).toDF("doc_id")
    val state = IncrementalCuration.loadState(spark, t)
    val v = IncrementalCuration.processIncrement(state, inc, ret,
      "doc_id", "text", "source").localCheckpoint()
    IncrementalCuration.updateState(t, state, inc, v, ret,
      "doc_id", "text", "source")
    val got = spark.table(t.srcStats).as[(String, Long)].collect().toMap
    // new corpus: wiki {1}, crawl {3,4}, news {5}
    assert(got == Map("wiki" -> 3L, "crawl" -> 9L, "news" -> 2L), got)
  }

  test("batch-exact dedup keeps the min id; gate column is uniform") {
    val standing = docsDF(Seq((1L, longText(1), "wiki"),
      (2L, longText(2), "wiki")))
    val t = st("exact")
    IncrementalCuration.buildState(standing, "doc_id", "text", "source", t)
    val twin = longText(60)
    val inc = docsDF(Seq((12L, twin, "wiki"), (11L, twin, "wiki"),
      (13L, longText(61), "wiki")))
    val state = IncrementalCuration.loadState(spark, t)
    val v = IncrementalCuration.processIncrement(state, inc,
      spark.range(0).select(col("id").as("doc_id")),
      "doc_id", "text", "source")
      .select("doc_id", "is_batch_exact_dup", "quality_gate_met").collect()
    val byId = v.map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(byId == Map(11L -> false, 12L -> true, 13L -> false), byId)
    assert(v.map(_.getBoolean(2)).distinct.length == 1,
      "the gate verdict is one broadcast boolean for the whole batch")
  }

  test("the increment probe reads the stored band index exchange-free") {
    val standing = docsDF((1 to 40).map(i =>
      (i.toLong, longText(i), if (i % 2 == 0) "wiki" else "crawl")))
    val t = st("plan")
    IncrementalCuration.buildState(standing, "doc_id", "text", "source", t)
    val state = IncrementalCuration.loadState(spark, t)
    val inc = docsDF(Seq((100L, longText(3, "x"), "wiki")))
    val out = IncrementalCuration.processIncrement(state, inc,
      spark.range(0).select(col("id").as("doc_id")),
      "doc_id", "text", "source")
    out.collect() // force execution so the adaptive plan is final
    val plan = out.queryExecution.executedPlan.toString
    // the stored band-index scan must not be followed by a shuffle on the
    // stored side: its FileScan appears with bucket metadata and the probe
    // joins it via its bucketed output partitioning
    assert(plan.contains("SelectedBucketsCount") ||
      plan.toLowerCase.contains("bucketed: true"), plan.take(4000))
  }
}
