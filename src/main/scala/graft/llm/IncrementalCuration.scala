package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sinks.Bucketing

/** Incremental curation — the daily-batch production shape (round-13
  * headline; EXT adjunct to SURVEY Group I, generalizing the run-over-run
  * ingestion loop of the reference's static-data CLI,
  * `OTP/cli_generate_static_data.py:178-201`, from per-run append to
  * stateful corpus curation): increment N+1 flows snapshot-diff →
  * near-dedup against a PERSISTED band index → persisted-model quality
  * gate → mixture/split membership, then updates the stored state — so a
  * 100 TB pipeline pays per-increment cost proportional to the INCREMENT,
  * never re-curating the standing corpus.
  *
  * Persisted state (all catalog tables + one model file):
  *  - `bands`   (band_key, doc_b)        bucketed on band_key — the
  *    md5-MinHash band index ([[Dedup.buildBandIndex]]); the increment's
  *    band probe equi-joins it with the stored side exchange-free.
  *  - `feats`   (doc_b, sh)              bucketed on doc_b — word-n-gram
  *    feature sets for the exact verify of band candidates.
  *  - `docToks` (doc_id, source, tok)    bucketed on doc_id — per-doc
  *    token counts, so retiring a doc can subtract its contribution from
  *    the source stats with an increment-sized probe.
  *  - `srcStats` (source, ns)            tiny — per-source token totals
  *    of the standing corpus; the temperature-mixture rates derive from
  *    it without any corpus scan.
  *  - `tombstones` (doc_id)              tiny — ids retired by earlier
  *    increments whose bands/feats/docToks rows are still physically
  *    present (LSM discipline: writes are appends + tombstones, reads
  *    anti-join the tombstone set, [[compactState]] folds them in).
  *  - `lrModelPath`                      the [[QualityClassifier]] LR
  *    model fit on the standing corpus ([[ModelStore]] round-trip).
  *
  * Dedup semantics are FIRST-SEEN-WINS: an increment doc that near-matches
  * a live standing doc is dropped (the standing copy already shipped — the
  * canonical-quality keep rule of the batch compositions cannot
  * retroactively un-ship it). Within-batch dedup is EXACT (min-id per
  * content hash); within-batch NEAR-dedup is the batch-mode operator
  * ([[Dedup.lshVerifiedPairs]]) applied to the increment when batches are
  * large enough to warrant it — increments are corpus-fractions, so the
  * standing-index probe dominates the recall budget.
  *
  * Scale audit (the 100 TB question): every per-increment step is sized by
  * the increment — the band probe and verify join broadcast nothing bigger
  * than the batch and read the stored side in place; the stats update
  * probes docToks by broadcast id set; state writes append batch-sized
  * bucketed file sets ([[Bucketing.appendBucketed]]). The two non-goals:
  * the snapshot DIFF (when computed from full snapshots rather than a
  * crawler delta feed) is one corpus-linear md5 compare join, and
  * [[compactState]] is a corpus-linear rewrite run occasionally — both are
  * outside the per-increment serve path and measured separately
  * (`tools/MeasureV7Serve`).
  */
object IncrementalCuration {

  /** Names of the persisted state tables (catalog) + LR model path. */
  case class StateTables(
      bands: String,
      feats: String,
      docToks: String,
      srcStats: String,
      tombstones: String,
      lrModelPath: String)

  /** The state as loaded for an increment run. */
  case class State(
      bands: DataFrame,
      feats: DataFrame,
      docToks: DataFrame,
      srcStats: DataFrame,
      tombstones: DataFrame,
      model: LrModel)

  /** The ≥50-whitespace-token C4-style length-quality label the persisted
    * LR gate is fit on and checked against (same rule as
    * `i5_lr_quality_gate`). */
  private def qualityLabel(textCol: String) =
    (size(split(trim(col(textCol)), " +")) >= 50).cast("int")

  private def tokExpr(textCol: String) =
    coalesce(TextAnalysis.tokenCount(col(textCol)).cast("long"), lit(0L))

  /** Build + persist the standing-corpus state from scratch (the one
    * corpus-sized pass, paid once; increments maintain it after). */
  def buildState(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      sourceCol: String,
      st: StateTables,
      buckets: Int = 32,
      shingleN: Int = 5,
      k: Int = 64,
      nBands: Int = 16,
      n: Int = 3,
      lrIters: Int = 200,
      lrTrainPct: Int = 80): Unit = {
    val spark = corpus.sparkSession
    val (bands, feats) =
      Dedup.buildBandIndex(corpus, idCol, textCol, shingleN, k, nBands, n)
    Bucketing.writeBucketed(bands, st.bands, "band_key", buckets)
    Bucketing.writeBucketed(feats, st.feats, "doc_b", buckets)
    val toks = corpus.select(
      col(idCol).cast("long").as("doc_id"),
      col(sourceCol).as("source"),
      tokExpr(textCol).as("tok"))
    Bucketing.writeBucketed(toks, st.docToks, "doc_id", buckets)
    Bucketing.writeSmallTable(
      toks.groupBy(col("source")).agg(sum(col("tok")).as("ns")),
      st.srcStats)
    Bucketing.writeSmallTable(
      spark.range(0).select(col("id").as("doc_id")), st.tombstones)
    val model = QualityClassifier.fit(corpus, textCol, qualityLabel(textCol),
      iters = lrIters, trainPct = lrTrainPct)
    ModelStore.saveLr(spark, model, st.lrModelPath)
  }

  def loadState(spark: SparkSession, st: StateTables): State = State(
    spark.table(st.bands),
    spark.table(st.feats),
    spark.table(st.docToks),
    spark.table(st.srcStats),
    spark.table(st.tombstones),
    ModelStore.loadLr(spark, st.lrModelPath))

  /** Ids dead to the probe: previously tombstoned ∪ retired by THIS
    * increment (deduped; broadcast — increments and tombstone sets are
    * metadata-sized between compactions). */
  private def deadIds(state: State, retired: DataFrame,
      idCol: String): DataFrame =
    broadcast(
      retired.select(col(idCol).cast("long").as("rid")).distinct()
        .unionByName(state.tombstones.select(col("doc_id").as("rid")))
        .distinct())

  /** Retired ids that are actually live (not already tombstoned) — the
    * set whose docToks contributions leave the source stats. */
  private def newlyRetired(state: State, retired: DataFrame,
      idCol: String): DataFrame =
    broadcast(
      retired.select(col(idCol).cast("long").as("rid")).distinct()
        .join(state.tombstones,
          col("rid") === state.tombstones("doc_id"), "left_anti"))

  /** Per-source token totals AFTER applying the increment: standing `ns`
    * minus retired docs' tokens (docToks probe) plus the increment's
    * tokens — equal, by construction, to a fresh aggregate over the
    * updated snapshot, at increment cost. Sources whose total hits zero
    * drop out (a zero-token source has no mixture rate). */
  private def updatedSrcStats(state: State, increment: DataFrame,
      retired: DataFrame, idCol: String, textCol: String,
      sourceCol: String): DataFrame = {
    val gone = state.docToks
      .join(newlyRetired(state, retired, idCol),
        col("doc_id") === col("rid"), "left_semi")
      .groupBy(col("source")).agg(sum(col("tok")).as("gone"))
    val added = increment
      .select(col(sourceCol).as("source"), tokExpr(textCol).as("tok"))
      .groupBy(col("source")).agg(sum(col("tok")).as("added"))
    state.srcStats
      .join(gone, Seq("source"), "full_outer")
      .join(added, Seq("source"), "full_outer")
      .select(col("source"),
        (coalesce(col("ns"), lit(0L)) - coalesce(col("gone"), lit(0L))
          + coalesce(col("added"), lit(0L))).as("ns"))
      .filter(col("ns") > 0L)
  }

  /** Temperature-mixture (α=0.5) keep thresholds from per-source totals —
    * the same exact-integer N_min formulation as the batch
    * `i6_temperature_mixture` row (pairwise vs MIN, one correctly-rounded
    * sqrt; see LlmOps.temperatureMixtureOver). */
  private def mixtureRates(srcStats: DataFrame): DataFrame = {
    val nmin = srcStats.agg(min(col("ns")).as("nmin"))
    srcStats.crossJoin(broadcast(nmin))
      .select(col("source"),
        floor(sqrt(col("nmin").cast("double") / col("ns").cast("double"))
          * 10000).cast("int").as("keep_threshold"))
  }

  /** Process increment N+1 against the loaded state: one row per
    * increment doc with the full curation verdict —
    * (doc_id, is_batch_exact_dup, n_matches, best_match, best_jaccard,
    * is_dup, split, keep_threshold, mix_keep, quality_gate_met,
    * curated_in). `retired` lists standing-corpus ids superseded by this
    * increment (removed docs + changed docs' old versions); their state
    * rows are excluded from the probe and their tokens leave the stats.
    *
    * The quality gate scores the INCREMENT with the persisted model and
    * requires accuracy ≥ `accFloor` against the length-quality label — the
    * model-staleness check a daily pipeline runs before trusting stored
    * weights on new data. It is an AGGREGATE verdict (one boolean column,
    * broadcast onto every row): a failed gate zeroes `curated_in` for the
    * whole batch, the production "abort the increment" semantics. */
  def processIncrement(
      state: State,
      increment: DataFrame,
      retired: DataFrame,
      idCol: String,
      textCol: String,
      sourceCol: String,
      shingleN: Int = 5,
      k: Int = 64,
      nBands: Int = 16,
      n: Int = 3,
      threshold: Double = 0.5,
      accFloor: Double = 0.6): DataFrame = {
    val dead = deadIds(state, retired, idCol)
    // candidate generation already restricts doc_b to live ids via the
    // band-side anti-join; the feats anti-join is correct-by-construction
    // redundancy at broadcast cost
    val liveBands = state.bands
      .join(dead, col("doc_b") === col("rid"), "left_anti")
    val liveFeats = state.feats
      .join(dead, col("doc_b") === col("rid"), "left_anti")
    val inc = increment.select(
      col(idCol).cast("long").as("doc_id"),
      col(textCol).as("text"), col(sourceCol).as("source"))
    val verdicts = Dedup.incrementalDedupFromBandIndex(
      liveBands, liveFeats, inc, "doc_id", "text",
      shingleN, k, nBands, n, threshold)
    // within-batch exact dedup: min-id per content hash (null text cannot
    // be a content dup — mirrored from the batch compositions)
    val batchExact = inc
      .withColumn("__rep",
        min(col("doc_id")).over(Window.partitionBy(md5(col("text")))))
      .withColumn("is_batch_exact_dup",
        col("text").isNotNull && col("doc_id") =!= col("__rep"))
      .drop("__rep")
    val rates = broadcast(mixtureRates(
      updatedSrcStats(state, increment, retired, idCol, textCol, sourceCol)))
    val label = qualityLabel("text") === 1
    val gate = broadcast(
      QualityClassifier.score(inc, "text", state.model)
        .agg((sum(when(col("pred") === label, 1L).otherwise(0L))
          .cast("double") / count(lit(1)).cast("double") >= accFloor)
          .as("quality_gate_met")))
    batchExact
      .join(verdicts, Seq("doc_id"))
      .join(rates, Seq("source"))
      .crossJoin(gate)
      .select(col("doc_id"), col("is_batch_exact_dup"),
        col("n_matches"), col("best_match"), col("best_jaccard"),
        col("is_dup"),
        Sampling.splitLabel(col("text")).as("split"),
        col("keep_threshold"),
        (Sampling.hashBucket(col("text"), 10000) < col("keep_threshold"))
          .as("mix_keep"),
        col("quality_gate_met"),
        (!col("is_batch_exact_dup") && !col("is_dup") && col("mix_keep")
          && col("quality_gate_met")).as("curated_in"))
  }

  /** Fold the processed increment into the persisted state — all writes
    * increment-sized: survivors' (non-dup) bands/feats append, ALL
    * increment docs' token rows append (a future increment may retire
    * them), retired ids join the tombstones, and the tiny source stats
    * overwrite with the updated totals. `verdicts` is
    * [[processIncrement]]'s output for this increment. */
  def updateState(
      st: StateTables,
      state: State,
      increment: DataFrame,
      verdicts: DataFrame,
      retired: DataFrame,
      idCol: String,
      textCol: String,
      sourceCol: String,
      buckets: Int = 32,
      shingleN: Int = 5,
      k: Int = 64,
      nBands: Int = 16,
      n: Int = 3): Unit = {
    val survivors = verdicts
      .filter(!col("is_batch_exact_dup") && !col("is_dup"))
      .select(col("doc_id").as("__keep"))
    val newDocs = increment
      .join(broadcast(survivors),
        col(idCol).cast("long") === col("__keep"), "left_semi")
    val (nb, nf) =
      Dedup.buildBandIndex(newDocs, idCol, textCol, shingleN, k, nBands, n)
    Bucketing.appendBucketed(nb, st.bands, "band_key", buckets)
    Bucketing.appendBucketed(nf, st.feats, "doc_b", buckets)
    Bucketing.appendBucketed(
      increment.select(col(idCol).cast("long").as("doc_id"),
        col(sourceCol).as("source"), tokExpr(textCol).as("tok")),
      st.docToks, "doc_id", buckets)
    val stats = updatedSrcStats(state, increment, retired, idCol, textCol,
      sourceCol).localCheckpoint() // pin before the overwrite drops inputs
    val tombs = state.tombstones
      .unionByName(retired.select(col(idCol).cast("long").as("doc_id")))
      .distinct().localCheckpoint()
    Bucketing.writeSmallTable(stats, st.srcStats)
    Bucketing.writeSmallTable(tombs, st.tombstones)
  }

  /** Occasional corpus-linear maintenance: rewrite bands/feats/docToks
    * minus the tombstoned ids and clear the tombstone set. Run when the
    * tombstone fraction makes the probe-side anti-join broadcast heavy —
    * the LSM compaction step, outside the per-increment serve path. */
  def compactState(spark: SparkSession, st: StateTables,
      buckets: Int = 32): Unit = {
    val tombs = broadcast(spark.table(st.tombstones)
      .select(col("doc_id").as("rid")))
    val bands = spark.table(st.bands)
      .join(tombs, col("doc_b") === col("rid"), "left_anti")
      .localCheckpoint()
    val feats = spark.table(st.feats)
      .join(tombs, col("doc_b") === col("rid"), "left_anti")
      .localCheckpoint()
    val toks = spark.table(st.docToks)
      .join(tombs, col("doc_id") === col("rid"), "left_anti")
      .localCheckpoint()
    Bucketing.writeBucketed(bands, st.bands, "band_key", buckets)
    Bucketing.writeBucketed(feats, st.feats, "doc_b", buckets)
    Bucketing.writeBucketed(toks, st.docToks, "doc_id", buckets)
    Bucketing.writeSmallTable(
      spark.range(0).select(col("id").as("doc_id")), st.tombstones)
  }
}
