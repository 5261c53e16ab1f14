package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / dataset-split operators for training-data
  * pipelines (SURVEY Group I adjunct). Membership is a pure function of
  * CONTENT (first 8 md5 hex digits as an integer), so the same document
  * lands in the same split across engines, runs, repartitions, and
  * cluster sizes — `rand()`/`row_number()` splits silently reshuffle
  * membership whenever the data moves, which leaks val/test documents
  * into training on any pipeline re-run. Pure codegen'd column
  * expressions, shuffle-free.
  */
object Sampling {

  /** Content-hash bucket in [0, nBuckets): `int(md5(c)[0:8], 16) % n`. */
  def hashBucket(c: Column, nBuckets: Int = 100): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long") % nBuckets

  /** Deterministic train/val/test label at the given percent cuts. */
  def splitLabel(c: Column, trainPct: Int = 80, valPct: Int = 10): Column = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"bad split cuts: train=$trainPct val=$valPct")
    val b = hashBucket(c)
    when(b < trainPct, "train")
      .when(b < trainPct + valPct, "val")
      .otherwise("test")
  }

  /** Deterministic pct-sample: keep rows whose content bucket < pct. */
  def deterministicSample(df: DataFrame, c: Column, pct: Int): DataFrame = {
    require(pct >= 0 && pct <= 100, s"bad sample pct: $pct")
    df.filter(hashBucket(c) < pct)
  }

  /** Deterministic mixture sampling — the data-mixing step that sets per-
    * source sampling rates when composing a training corpus (e.g. wiki
    * 100%, crawl 25%): keep a row iff its content bucket falls below its
    * stratum's keep-rate (integer percent; `defaultPct` for strata not in
    * the map). Membership stays a pure function of content, so re-runs,
    * repartitions, and engine swaps keep the exact same mixture — and a
    * document kept at 25% is also kept at any higher rate (nested samples,
    * the property mixture-ablation studies rely on). Pure codegen'd filter
    * on the scan: no shuffle, no per-stratum pass. */
  def mixtureSample(
      df: DataFrame, stratum: Column, content: Column,
      weights: Map[String, Int], defaultPct: Int = 0): DataFrame = {
    require((defaultPct +: weights.values.toSeq).forall(p => p >= 0 && p <= 100),
      s"mixture rates must be integer percents in [0,100]: $weights / $defaultPct")
    val rate = weights.toSeq.sortBy(_._1).foldRight(lit(defaultPct): Column) {
      case ((k, pct), acc) => when(stratum === k, lit(pct)).otherwise(acc)
    }
    df.filter(hashBucket(content) < rate)
  }

  /** D4-style prototypicality pruning (Tirumala et al. 2023,
    * arXiv:2308.12284 — the selection step D4 runs AFTER SemDeDup,
    * [[Dedup.semDedup]]): k-means the embedding space, then within each
    * cluster drop the `dropPct`% of points CLOSEST to the centroid — the
    * most "prototypical" mass is the most redundant, and pruning it
    * measurably improves LM data efficiency. Ranking uses the exact
    * integer squared distance [[KMeans.fit]] emits (tie-broken by id), so
    * the kept set is a pure function of the data. One k-means pass plus
    * one window over the assignment — the window partitions by cluster,
    * so no stratum ever sorts outside its own partition at 100 TB.
    *
    * Returns survivors: (idCol, cluster_id, dist, proto_rank) where
    * proto_rank 1 = closest to centroid; rows with
    * `proto_rank <= floor(n_cluster * dropPct / 100)` are pruned. */
  def protoPrune(
      df: DataFrame, idCol: String, vecCol: String,
      k: Int, updates: Int, dropPct: Int): DataFrame = {
    require(dropPct >= 0 && dropPct <= 100, s"bad dropPct: $dropPct")
    val asg = KMeans.fit(df, idCol, vecCol, k, updates)
    val byDist = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster")).orderBy(col("dist").asc, col(idCol).asc)
    val whole = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster"))
    asg
      .withColumn("__rnk", row_number().over(byDist))
      .withColumn("__n", count(lit(1)).over(whole))
      // floor() is exact below 2^53 and matches DuckDB's `//` on
      // non-negative counts; Spark's `/` alone would be double division
      .filter(col("__rnk") > floor(col("__n") * dropPct / 100).cast("long"))
      .select(col(idCol),
        col("cluster").cast("long").as("cluster_id"),
        col("dist"),
        col("__rnk").cast("long").as("proto_rank"))
  }

  /** Token-budget corpus assembly: keep documents per stratum (source,
    * language, …) until a TOKEN budget is exhausted — the unit that
    * actually prices an LLM training mixture ("20B tokens of web, 5B of
    * code"), where a doc-count cap ([[stratifiedCap]]) would skew toward
    * whichever source writes longer documents. Selection order inside a
    * stratum is (content-hash bucket, id) — the same deterministic,
    * re-run-stable order the other sampling operators use — and a doc is
    * kept iff the running token total INCLUDING it stays ≤ `budget`, so
    * the kept set is a pure function of the data. One window per stratum
    * (running sum, rows frame); no stratum ever sorts outside its own
    * partition. Returns kept rows with `n_tokens` and `cum_tokens`. */
  def tokenBudgetCap(
      df: DataFrame, stratum: Column, content: Column, idCol: Column,
      tokens: Column, budget: Long): DataFrame = {
    require(budget >= 0, s"bad token budget: $budget")
    // null contract, aligned with the DuckDB oracle in both places it
    // could silently diverge: a null token count participates as 0 (the
    // row is kept, not dropped by a NULL running sum), and null content
    // buckets order NULLS LAST (DuckDB's ASC default; Spark's default is
    // nulls-first)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stratum)
      .orderBy(hashBucket(content).asc_nulls_last, idCol.asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    df.withColumn("n_tokens", coalesce(tokens, lit(0L)))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <= budget)
  }

  /** DSIR importance weights (Xie et al. 2023, arXiv:2302.03169): score
    * every document by how target-like its token distribution is —
    * `weight = mean_tokens p_target(bucket) / mean_tokens p_raw(bucket)`
    * under Laplace-smoothed hashed-unigram models — the importance-
    * resampling signal that up-weights crawl documents resembling a
    * curated target domain. This is the arithmetic-mean likelihood ratio
    * (exact-BIGINT hit sums, the `lmScore` formulation) rather than the
    * paper's log-sum: sums of logs are float-order-dependent, integer hit
    * sums are not, and the ranking they induce agrees on everything but
    * pathological outlier tokens.
    *
    * Scale design: the model is `2 × nBuckets` longs built by ONE
    * map-side-combined aggregation over the token stream and collected
    * (256 buckets = 4 KB — bounded regardless of vocabulary, which is the
    * point of DSIR's hashing); scoring is a single shuffle-free codegen
    * scan with the tables broadcast by closure
    * ([[graft.functions.DsirKernel]] — same shape as the k-means
    * assignment kernel). No token explode, join, or per-doc re-aggregation
    * on the scoring path.
    *
    * Returns one row per input row: idCol, is_target, n_tokens, hits_t,
    * hits_r, weight — weight NULL for token-less documents. Downstream
    * selects by weight (top-k via TakeOrdered, or an approx-quantile
    * threshold at scale). */
  def dsirWeights(
      df: DataFrame, idCol: String, textCol: String, isTarget: Column,
      nBuckets: Int = 256): DataFrame = {
    require(nBuckets > 0, s"bad nBuckets: $nBuckets")
    val toks = df
      .select(isTarget.cast("boolean").as("tgt"),
        explode(split(trim(col(textCol)), " +")).as("w"))
      .filter(col("w") =!= "")
    val model = toks
      .groupBy(hashBucket(col("w"), nBuckets).as("b"))
      .agg(sum(when(col("tgt"), 1L).otherwise(0L)).as("ct"),
        count(lit(1)).as("cr"))
      .collect() // ≤ nBuckets rows — bounded by construction
    val ct = new Array[Long](nBuckets)
    val cr = new Array[Long](nBuckets)
    var nT = 0L
    var nR = 0L
    model.foreach { r =>
      val b = r.getLong(0).toInt
      ct(b) = r.getLong(1); cr(b) = r.getLong(2)
      nT += r.getLong(1); nR += r.getLong(2)
    }
    df.select(col(idCol), isTarget.cast("boolean").as("is_target"),
        graft.functions.DsirExprs.hits(col(textCol), ct, cr).as("__h"))
      .select(col(idCol), col("is_target"),
        col("__h.n_tokens").as("n_tokens"),
        col("__h.hits_t").as("hits_t"),
        col("__h.hits_r").as("hits_r"))
      .withColumn("weight",
        when(col("n_tokens") > 0,
          (col("hits_t").cast("double") / lit((nT + nBuckets).toDouble)) /
            (col("hits_r").cast("double") / lit((nR + nBuckets).toDouble)))
          .otherwise(lit(null).cast("double")))
  }

  /** Stratified cap: at most `cap` rows per stratum (e.g. per language),
    * kept deterministically — rows ranked by content-hash bucket with an
    * id tie-break, so the KEPT SET is a pure function of the data, like
    * everything else here. The `rank <= cap` filter makes Spark plan a
    * PARTIAL WindowGroupLimit below the exchange (PlanSpec-pinned): each
    * input partition ships at most `cap` rows per stratum, so a stratum
    * with billions of rows never sorts in one task — the balance pass
    * that stops one language from dominating a 100 TB corpus. */
  def stratifiedCap(
      df: DataFrame, stratum: Column, content: Column, idCol: Column,
      cap: Int): DataFrame = {
    require(cap >= 0, s"bad stratum cap: $cap")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stratum).orderBy(hashBucket(content).asc, idCol.asc)
    df.withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= cap)
      .drop("__rank")
  }
}
