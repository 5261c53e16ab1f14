package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (SURVEY §2 Group I, I3):
  * brute-force cosine top-k as the exactness baseline, LSH-bucketed
  * (random-hyperplane) search as the scale path. Dot products via
  * `zip_with` + `aggregate` — pure codegen'd expressions, no UDFs.
  */
object Similarity {

  /** Cosine similarity between two float-array columns (double math). */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b,
      (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)
    val na = aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, x) => acc + x)
    val nb = aggregate(transform(b, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, x) => acc + x)
    dot / (sqrt(na) * sqrt(nb))
  }

  /** Integer-quantized embedding (`floor(x · 10^6)` per component): exact
    * integer dot products → bit-identical results across engines, used by
    * the oracle-checked queries. Quantization error at 1e-6 is far below
    * float32 input precision. */
  def quantize(a: Column): Column =
    transform(a, x => floor(x.cast("double") * 1000000d).cast("long"))

  /** Exact integer dot product — native codegen'd expression
    * ([[graft.functions.LongArrayDot]]); the `zip_with`+`aggregate`
    * formulation pays one interpreted dispatch per element per pair. */
  def dotQ(a: Column, b: Column): Column =
    graft.functions.ArrayOps.longArrayDot(a, b)

  def cosineQ(a: Column, b: Column): Column =
    dotQ(a, b).cast("double") /
      (sqrt(dotQ(a, a).cast("double")) * sqrt(dotQ(b, b).cast("double")))

  /** Cosine from precomputed quantized vectors + norms, null on a zero
    * vector: under ANSI mode (Spark 4 default) a bare `x / 0.0` raises
    * DIVIDE_BY_ZERO and kills the whole query; a NaN would silently poison
    * the top-k heap. Degenerate pairs are droppable, not fatal. */
  private def safeCosine(qv: Column, cv: Column, qn: Column, cn: Column): Column =
    when(qn * cn > 0d,
      dotQ(qv, cv).cast("double") / (qn * cn)).otherwise(lit(null))

  /** I3h — hard-negative mining for contrastive/retrieval training (the
    * negative-selection step of DPR-style dual-encoder pipelines,
    * Karpukhin et al. 2020, arXiv:2004.04906): for each query vector, the
    * top-k most SIMILAR corpus vectors bearing a DIFFERENT label — the
    * near-misses that make the hardest training negatives.
    *
    * Scale shape is the reverse of [[bruteForceTopK]]: the QUERY side
    * broadcasts (a mining batch is thousands of rows; the corpus is the
    * 100 TB side), so the whole mine is ONE linear partitioned corpus
    * scan feeding the bounded-heap top-k aggregate — corpus rows never
    * shuffle, only |Q|·k winners do. Null-label rows never match a
    * `label <> label` predicate in either engine, so they are excluded
    * symmetrically. Exact integer dots on the 1e-6 grid keep ranks
    * engine-exact. Returns (query_id, neg_id, cos_sim, rank). */
  def hardNegatives(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, labelCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"),
        quantize(col(vecCol)).as("qv"), col(labelCol).as("q_label"))
      .withColumn("qn", sqrt(dotQ(col("qv"), col("qv")).cast("double")))
    val c = corpus.select(col(idCol).as("neighbor_id"),
        quantize(col(vecCol)).as("cv"), col(labelCol).as("c_label"))
      .withColumn("cn", sqrt(dotQ(col("cv"), col("cv")).cast("double")))
    val pairs = broadcast(q).join(c, col("q_label") =!= col("c_label"))
      .withColumn("cos_sim", safeCosine(col("qv"), col("cv"), col("qn"), col("cn")))
      .filter(col("cos_sim").isNotNull)
    topKPerQuery(pairs, k)
      .withColumnRenamed("neighbor_id", "neg_id")
  }

  /** I3f — query-batch retrieval serving: exact top-k cosine neighbors
    * for a SMALL query batch against an UNBOUNDED corpus — the production
    * regime the self-join ANN fixtures can't show (there the query set IS
    * the corpus, so total work grows ~n² as the corpus grows; here the
    * batch is fixed and the whole serve is ONE linear corpus scan). Dual
    * of [[bruteForceTopK]]'s bounded-corpus contract and the same shape
    * as [[hardNegatives]] without the label predicate: the QUERY side
    * broadcasts, corpus rows never shuffle — each partition scores the
    * batch map-side and only ≤ |Q|·k winners reach the single shuffle
    * (the bounded-heap partial aggregate). Batch and corpus may overlap;
    * a shared id pairs with itself at cos 1.0 like any other neighbor.
    * Exact integer dots on the 1e-6 grid keep ranks engine-exact, so the
    * output is fully oracle-checkable (no hash dependence). */
  def batchTopK(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int = 5): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"),
        quantize(col(vecCol)).as("qv"))
      .withColumn("qn", sqrt(dotQ(col("qv"), col("qv")).cast("double")))
    val c = corpus.select(col(idCol).as("neighbor_id"),
        quantize(col(vecCol)).as("cv"))
      .withColumn("cn", sqrt(dotQ(col("cv"), col("cv")).cast("double")))
    val pairs = c.crossJoin(broadcast(q))
      .withColumn("cos_sim", safeCosine(col("qv"), col("cv"), col("qn"), col("cn")))
      .filter(col("cos_sim").isNotNull)
    topKPerQuery(pairs, k)
  }

  /** I3a — brute-force cosine top-k neighbors for each query vector.
    * The corpus side is broadcast when it fits (queries stream past it);
    * for corpus >> memory use [[lshTopK]] instead. */
  def bruteForceTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 5,
      broadcastCorpus: Boolean = true): DataFrame = {
    // the fused broadcast kernel works on long ids; non-integral id columns
    // (or disabled broadcast) take the join+aggregate path, which preserves
    // the id type
    import org.apache.spark.sql.types._
    def integral(df: DataFrame) = df.schema(idCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    if (broadcastCorpus && integral(queries) && integral(corpus))
      return bruteForceTopKBroadcast(queries, corpus, idCol, vecCol, k)
    if (broadcastCorpus) requireBroadcastable(corpus, idCol)
    // norms computed ONCE per vector before the join (cosineQ inline would
    // recompute both self-dots for every one of the |Q|×|C| pairs)
    val q = queries.select(col(idCol).as("query_id"), quantize(col(vecCol)).as("qv"))
      .withColumn("qn", sqrt(dotQ(col("qv"), col("qv")).cast("double")))
    val c = corpus.select(col(idCol).as("neighbor_id"), quantize(col(vecCol)).as("cv"))
      .withColumn("cn", sqrt(dotQ(col("cv"), col("cv")).cast("double")))
    val pairs = q.join(if (broadcastCorpus) broadcast(c) else c,
        col("query_id") =!= col("neighbor_id"))
      .withColumn("cos_sim", safeCosine(col("qv"), col("cv"), col("qn"), col("cn")))
      .filter(col("cos_sim").isNotNull)
    topKPerQuery(pairs, k)
  }

  /** One broadcast per DISTINCT corpus (keyed by the canonicalized logical
    * plan + columns): repeated bench/verify/explain calls on the same
    * corpus — the way every long-running driver actually calls this — reuse
    * one corpus-sized allocation instead of leaking one per call.
    *
    * Contract and bounds:
    *  - assumes corpus files are IMMUTABLE while cached (plan equality is
    *    path-based; rewriting a parquet in place and re-querying within one
    *    session would serve the old vectors — call [[releaseBroadcasts]]
    *    after any such rewrite);
    *  - bounded at [[MaxCachedCorpora]] entries, oldest evicted first —
    *    eviction only DROPS the strong reference (no destroy), so in-flight
    *    plans keep working and Spark's ContextCleaner reclaims the
    *    broadcast once their DataFrames are garbage. */
  private val MaxCachedCorpora = 8
  /** Cache key: (applicationId, canonicalized corpus plan, id col, vec col).
    * The applicationId component is load-bearing: broadcasts die with their
    * SparkContext, so a plan-identical corpus queried from a RESTARTED
    * session must miss (a hit would hand out a broadcast whose blocks no
    * longer exist and fail at execution with an opaque fetch error). */
  private type CorpusKey =
    (String, org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, String, String)
  private val corpusCache = new java.util.LinkedHashMap[
    CorpusKey,
    org.apache.spark.broadcast.Broadcast[graft.functions.TopKCorpus]](16, 0.75f, false) {
    override def removeEldestEntry(e: java.util.Map.Entry[
      CorpusKey,
      org.apache.spark.broadcast.Broadcast[graft.functions.TopKCorpus]]) =
      size() > MaxCachedCorpora
  }

  private[graft] def corpusKey(corpus: DataFrame, idCol: String, vecCol: String): CorpusKey =
    (corpus.sparkSession.sparkContext.applicationId,
      corpus.queryExecution.analyzed.canonicalized, idCol, vecCol)

  /** PQ code-table cache, same lifecycle contract as [[corpusCache]]:
    * keyed by the corpus plan PLUS every parameter that shapes the
    * codebooks/codes, so a repeated bench/verify call reuses one broadcast
    * instead of leaking one per call. */
  private type PqKey = (CorpusKey, Int, Int, Int, Int)
  private val pqCache = new java.util.LinkedHashMap[
    PqKey,
    (graft.functions.PqCodebooks,
      org.apache.spark.broadcast.Broadcast[graft.functions.PqCodeTable])](
    16, 0.75f, false) {
    override def removeEldestEntry(e: java.util.Map.Entry[
      PqKey,
      (graft.functions.PqCodebooks,
        org.apache.spark.broadcast.Broadcast[graft.functions.PqCodeTable])]) =
      size() > MaxCachedCorpora
  }

  /** Destroy every cached broadcast — brute-force corpora AND PQ code
    * tables (driver lifecycle hook — called by Bench/Verify at teardown;
    * call it between suites or after a corpus file rewrite). DataFrames
    * built by earlier [[bruteForceTopK]]/[[pqTopK]] calls must not run
    * (or be constructed concurrently) after this. */
  def releaseBroadcasts(): Unit = {
    corpusCache.synchronized {
      val it = corpusCache.values().iterator()
      while (it.hasNext) { it.next().destroy(); it.remove() }
    }
    pqCache.synchronized {
      val it = pqCache.values().iterator()
      while (it.hasNext) { it.next()._2.destroy(); it.remove() }
    }
  }

  /** Visible for tests: number of live cached corpus broadcasts. */
  private[graft] def cachedBroadcastCount: Int =
    corpusCache.synchronized(corpusCache.size())

  /** Visible for tests: number of live cached PQ code tables. */
  private[graft] def pqCachedCount: Int =
    pqCache.synchronized(pqCache.size())

  /** Visible for tests: the cached broadcast for a corpus, if any. */
  private[graft] def cachedBroadcastFor(
      corpus: DataFrame, idCol: String, vecCol: String) =
    corpusCache.synchronized(Option(corpusCache.get(
      corpusKey(corpus, idCol, vecCol))))

  /** Broadcast-corpus brute force: the corpus (quantized vectors + norms) is
    * collected once and shipped as a Spark broadcast — the same memory
    * contract as the broadcast hash join it replaces — and each query row
    * computes its whole top-k in one fused kernel
    * ([[graft.functions.BroadcastTopKExpr]]). No join, no shuffle, no
    * aggregate: queries stream past the corpus exactly like the
    * BroadcastNestedLoopJoin plan, minus |Q|×|C| row materialization.
    *
    * Note the corpus collect (and the broadcast, on a cache miss) happens
    * EAGERLY at DataFrame-construction time, like a prepared statement —
    * plan-only inspection of the result also pays it. */
  /** Conf key bounding the brute-force broadcast corpus (rows). The
    * broadcast path ships the WHOLE corpus to the driver and every
    * executor; at 64-dim quantized vectors the default 2M-row budget is
    * ~1 GB — comfortably broadcastable, far below a 100 TB corpus. Above
    * it, fail fast with a pointer at the scale paths instead of OOMing
    * the driver mid-collect. */
  val MaxBroadcastRowsConf = "graft.similarity.maxBroadcastCorpusRows"
  private val DefaultMaxBroadcastRows = 2000000L

  /** Corpus-size gate for every broadcast brute-force path. The probe is
    * bounded (`limit(budget+1).count` — scans at most budget+1 ids, never
    * a full count of an over-budget corpus). */
  private def requireBroadcastable(corpus: DataFrame, idCol: String): Unit = {
    val budget = corpus.sparkSession.conf
      .get(MaxBroadcastRowsConf, DefaultMaxBroadcastRows.toString).toLong
    val probe = math.min(budget + 1, Int.MaxValue.toLong).toInt
    if (corpus.select(col(idCol)).limit(probe).count() > budget)
      throw new IllegalArgumentException(
        s"bruteForceTopK: corpus exceeds the $budget-row broadcast budget " +
          s"($MaxBroadcastRowsConf) — the brute-force path ships the whole " +
          "corpus to every executor. Use Similarity.lshTopK or " +
          "Similarity.ivfTopK for large corpora, or raise the budget.")
  }

  private[graft] def bruteForceTopKBroadcast(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val cacheKey = corpusKey(corpus, idCol, vecCol)
    val cached = corpusCache.synchronized(corpusCache.get(cacheKey))
    if (cached != null)
      return bruteForceTopKWith(queries, cached, idCol, vecCol, k)
    requireBroadcastable(corpus, idCol)
    val rows = corpus.select(col(idCol).cast("long"), quantize(col(vecCol)))
      .collect()
    val n = rows.length
    val dim = if (n == 0) 0 else rows(0).getSeq[Long](1).size
    val ids = new Array[Long](n)
    val flat = new Array[Long](n * dim)
    val norms = new Array[Double](n)
    var j = 0
    while (j < n) {
      ids(j) = rows(j).getLong(0)
      val v = rows(j).getSeq[Long](1)
      require(v.size == dim, s"ragged embedding dim: ${v.size} != $dim")
      var dot = 0L
      var i = 0
      while (i < dim) {
        val x = v(i)
        flat(j * dim + i) = x
        dot += x * x
        i += 1
      }
      norms(j) = math.sqrt(dot.toDouble)
      j += 1
    }
    val bc = queries.sparkSession.sparkContext.broadcast(
      new graft.functions.TopKCorpus(ids, flat, norms, dim))
    // first-writer-wins: a concurrent builder of the same corpus keeps the
    // existing entry, and the loser's broadcast is destroyed before
    // anything can plan on it
    val winner = corpusCache.synchronized {
      val prev = corpusCache.get(cacheKey)
      if (prev == null) { corpusCache.put(cacheKey, bc); bc } else prev
    }
    if (winner ne bc) bc.destroy()
    bruteForceTopKWith(queries, winner, idCol, vecCol, k)
  }

  private def bruteForceTopKWith(
      queries: DataFrame,
      bc: org.apache.spark.broadcast.Broadcast[graft.functions.TopKCorpus],
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val topExpr = graft.functions.ArrayOps.broadcastTopK(
      col("query_id"), col("qv"), bc, k)
    // ids are long inside the kernel; cast back so the output schema matches
    // the join path whatever integral type came in
    val idType = queries.schema(idCol).dataType
    queries
      .select(col(idCol).cast("long").as("query_id"), quantize(col(vecCol)).as("qv"))
      .select(col("query_id"), posexplode(topExpr).as(Seq("pos", "entry")))
      .select(col("query_id").cast(idType).as("query_id"),
        col("entry.id").cast(idType).as("neighbor_id"),
        col("entry.score").as("cos_sim"),
        (col("pos") + 1).cast("int").as("rank"))
  }

  /** Build-once cell-partitioned broadcast index for the STREAMING IVF
    * serve tier ([[graft.streaming.VectorServe.serveIvf]]): centroids
    * trained exactly as [[ivfServe]]'s, corpus cells assigned by the SAME
    * executor expression the batch plan uses (parity by construction, not
    * by re-implementation), rows collected (budget-guarded) and packed
    * cell-sorted with offsets. None on an empty / all-null-vector corpus. */
  private[graft] def ivfBroadcastIndex(
      corpus: DataFrame, idCol: String, vecCol: String,
      nList: Int, lloydIters: Int, maxTrainSample: Int)
      : Option[org.apache.spark.broadcast.Broadcast[graft.functions.IvfCorpus]] = {
    import graft.functions.ArrayOps.nearestCells
    val c0 = corpus.filter(col(vecCol).isNotNull)
    requireBroadcastable(c0, idCol)
    if (c0.limit(1).isEmpty) return None
    val centroids = trainCosineCentroids(
      boundedSample(c0.select(col(idCol).cast("long").as("id"),
        col(vecCol).as("v")), maxTrainSample), nList, lloydIters)
    val rows = c0.select(col(idCol).cast("long"),
        quantize(col(vecCol)),
        element_at(nearestCells(col(vecCol), centroids, 1), 1))
      .collect()
    val n = rows.length
    val dim = rows(0).getSeq[Long](1).size
    val nCells = centroids.length
    val counts = new Array[Int](nCells)
    rows.foreach(r => counts(r.getInt(2)) += 1)
    val cellStart = new Array[Int](nCells + 1)
    var c = 0
    while (c < nCells) { cellStart(c + 1) = cellStart(c) + counts(c); c += 1 }
    val ids = new Array[Long](n)
    val flat = new Array[Long](n * dim)
    val norms = new Array[Double](n)
    val fill = cellStart.clone()
    rows.foreach { r =>
      val cell = r.getInt(2)
      val j = fill(cell)
      fill(cell) += 1
      ids(j) = r.getLong(0)
      val v = r.getSeq[Long](1)
      require(v.size == dim, s"ragged embedding dim: ${v.size} != $dim")
      var dot = 0L
      var i = 0
      while (i < dim) {
        val x = v(i)
        flat(j * dim + i) = x
        dot += x * x
        i += 1
      }
      norms(j) = math.sqrt(dot.toDouble)
    }
    Some(corpus.sparkSession.sparkContext.broadcast(
      new graft.functions.IvfCorpus(cellStart, ids, flat, norms, dim, centroids)))
  }

  /** Per-query top-k via the bounded-heap aggregate
    * ([[graft.functions.TopKByScore]]): map-side partial top-k means only k
    * rows per query cross the shuffle — the window/row_number formulation
    * shuffles and sorts every candidate pair. Tie-break (score DESC,
    * neighbor ASC) matches the oracle's ROW_NUMBER ordering. */
  private def topKPerQuery(pairs: DataFrame, k: Int): DataFrame =
    pairs.schema("neighbor_id").dataType match {
      case org.apache.spark.sql.types.LongType =>
        pairs
          .groupBy(col("query_id"))
          .agg(graft.functions.TopKAgg.topKByScore(
            struct(col("cos_sim").as("score"), col("neighbor_id").as("id")), k)
            .as("top"))
          .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "entry")))
          .select(col("query_id"),
            col("entry.id").as("neighbor_id"),
            col("entry.score").as("cos_sim"),
            (col("pos") + 1).cast("int").as("rank"))
      case _ =>
        // the bounded-heap aggregate is long-id only; any other id type goes
        // through the (slower, shuffle-every-pair) window formulation
        val w = Window.partitionBy(col("query_id"))
          .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
        pairs.withColumn("rank", row_number().over(w))
          .filter(col("rank") <= k)
          .select(col("query_id"), col("neighbor_id"), col("cos_sim"), col("rank"))
    }

  /** I3j — scalar (int8) quantization: per-dimension min/max over the
    * corpus, each component linearly mapped to an integer code in
    * [0, 255]. The memory axis of vector serving WITHOUT a training step:
    * unlike PQ's sampled k-means codebooks there is no seed anywhere, so
    * codes — and every downstream rank — are exactly reproducible across
    * engines (the one quantization family the DuckDB oracle can
    * hash-check end to end, vs the recall-gated PQ/IVF/LSH rows).
    *
    * Scale shape: the stats pass is a posexplode + groupBy(pos) whose
    * map-side partial min/max reduces the shuffle to #partitions·dim
    * rows; the 2·dim stats then ride ONE broadcast row back onto an
    * un-exploded `transform` over the original vectors (per-element
    * `element_at` into a broadcast-local array attribute — O(1), not a
    * re-evaluated subtree), so corpus rows never shuffle to get coded.
    * A constant dimension (mx == mn) codes to 0 everywhere. */
  /** The 1-row (mns, mxs) per-dimension stats frame for SQ8: posexplode +
    * groupBy(pos) whose map-side partial min/max reduces the shuffle to
    * #partitions·dim rows, regrouped into two dim-length arrays. */
  private def sq8Stats(in: DataFrame, vecCol: String): DataFrame =
    in.select(posexplode(col(vecCol)).as(Seq("pos", "x")))
      .select(col("pos"), col("x").cast("double").as("x"))
      .groupBy(col("pos"))
      .agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      .agg(sort_array(collect_list(struct(col("pos"), col("mn")))).as("smn"),
        sort_array(collect_list(struct(col("pos"), col("mx")))).as("smx"))
      .select(transform(col("smn"), s => s.getField("mn")).as("mns"),
        transform(col("smx"), s => s.getField("mx")).as("mxs"))

  def sq8Codes(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val in = df.filter(col(vecCol).isNotNull)
    in.crossJoin(broadcast(sq8Stats(in, vecCol)))
      .select(col(idCol).as("vid"),
        transform(col(vecCol), (x, i) => {
          val mn = element_at(col("mns"), i + 1)
          val mx = element_at(col("mxs"), i + 1)
          when(mx > mn,
            floor((x.cast("double") - mn) / (mx - mn) * 255 + lit(0.5))
              .cast("long"))
            .otherwise(lit(0L))
        }).as("codes"))
  }

  /** I3j — exhaustive top-k under SQ8: rank by cosine of the
    * RECONSTRUCTED vectors (x̂ = mn + code·range/255 — raw code dots are
    * offset-dominated because int8 codes are unsigned), snapped to the
    * 1e-6 integer grid so the dot products are exact integers and ranks
    * are engine-reproducible. Queries broadcast over a single partitioned
    * corpus scan into the bounded-heap top-k aggregate; corpus rows never
    * shuffle, only k winners per query do. Kept exhaustive so ranking
    * error is ONLY quantization error; the candidate-pruning axes (IVF
    * cells, LSH buckets) compose orthogonally exactly as over PQ codes. */
  def sq8TopK(df: DataFrame, idCol: String, vecCol: String,
      nQueries: Int, k: Int): DataFrame = {
    val in = df.filter(col(vecCol).isNotNull)
    val recon = in.crossJoin(broadcast(sq8Stats(in, vecCol)))
      .select(col(idCol).as("vid"),
        transform(col(vecCol), (x, i) => {
          val mn = element_at(col("mns"), i + 1)
          val mx = element_at(col("mxs"), i + 1)
          when(mx > mn,
            floor((mn + floor((x.cast("double") - mn) / (mx - mn) * 255
              + lit(0.5)) * (mx - mn) / 255) * 1000000d).cast("long"))
            .otherwise(floor(mn * 1000000d).cast("long"))
        }).as("r"))
      .withColumn("nrm", sqrt(
        graft.functions.ArrayOps.longArrayDot(col("r"), col("r"))
          .cast("double")))
      // pinned: the query slice and the scan side both read the
      // reconstructed vectors, and unpinned each re-ran the per-dimension
      // min/max stats aggregate AND the dequantize kernel (round-14 plan
      // audit: the stats explode+aggregate subtree appeared twice)
      .localCheckpoint()
    val q = recon.filter(col("vid") < nQueries)
      .select(col("vid").as("query_id"), col("r").as("qr"),
        col("nrm").as("qn"))
    val pairs = recon.crossJoin(broadcast(q))
      .filter(col("vid") =!= col("query_id"))
      .select(col("query_id"), col("vid").as("neighbor_id"),
        safeCosine(col("qr"), col("r"), col("qn"), col("nrm")).as("cos_sim"))
      .filter(col("cos_sim").isNotNull)
    topKPerQuery(pairs, k)
  }

  /** I3e — Product-Quantization ANN (Jégou et al., TPAMI 2011): vectors are
    * chopped into `nBlocks` subvectors, each encoded as its nearest
    * per-block centroid id (`nCodes` per block, per-block Euclidean Lloyd
    * trained driver-side on a bounded sample — the same sample-fit /
    * full-assign shape as [[ivfTopK]]), compressing dim floats to nBlocks
    * small ints. Search is ADC: per query one O(dim·nCodes) lookup table,
    * then every candidate scores in O(nBlocks) array lookups from its CODES
    * — the corpus's raw vectors are never touched at query time.
    *
    * PQ is the MEMORY axis of billion-scale ANN: 64-dim float vectors are
    * 256 bytes, their codes 16 (one byte per block at nCodes=256) — a
    * corpus whose raw vectors can never fit executor memory scans
    * comfortably as codes. The candidate axis is
    * orthogonal: compose with [[ivfTopK]]'s cell partitioning (IVF-PQ) or
    * [[lshTopK]]'s buckets to avoid the exhaustive scan this standalone
    * form runs (kept exhaustive here so recall is bounded ONLY by
    * quantization error — gated by `i3_pq_recall_gate`). */
  def pqTopK(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 5,
      nBlocks: Int = 16,
      nCodes: Int = 256,
      lloydIters: Int = 3,
      maxTrainSample: Int = 65536): DataFrame = {
    import graft.functions.PqOps
    require(nCodes >= 2 && nCodes <= 256,
      s"nCodes must be in [2, 256] (codes are byte-packed): $nCodes")
    // null vectors are droppable everywhere (sample, encode, queries) —
    // without the filter a null in the training sample NPEs the driver
    val feats = df.filter(col(vecCol).isNotNull)
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
    val key = (corpusKey(df, idCol, vecCol),
      nBlocks, nCodes, lloydIters, maxTrainSample)
    val cached = pqCache.synchronized(pqCache.get(key))
    val (books, table) = if (cached != null) cached else {
      // fail-fast BEFORE the sample scan and Lloyd training — an
      // over-budget corpus must not pay minutes of work first
      requireBroadcastable(df, idCol)
      built(feats, nBlocks, nCodes, lloydIters, maxTrainSample) match {
        case None =>
          return feats.limit(0).select(col("id").as("query_id"),
            col("id").as("neighbor_id"), lit(0.0).as("cos_sim"),
            lit(1).cast("int").as("rank"))
        case Some(fresh) =>
          // first-writer-wins, like the brute-force corpus cache
          val winner = pqCache.synchronized {
            val prev = pqCache.get(key)
            if (prev == null) { pqCache.put(key, fresh); fresh } else prev
          }
          if (winner ne fresh) fresh._2.destroy()
          winner
      }
    }
    // one fused ADC kernel per query row: LUT built once, every code row
    // scored in O(nBlocks) lookups into a bounded heap — no join, no
    // shuffle, no |Q|×|C| materialization (the join formulation dragged
    // the 32 KB LUT through every pair; profiled 10× slower)
    val topExpr = PqOps.pqTopK(col("query_id"), col("v"), table, books, k)
    feats.select(col("id").as("query_id"), col("v"))
      .select(col("query_id"), posexplode(topExpr).as(Seq("pos", "entry")))
      .select(col("query_id"),
        col("entry.id").as("neighbor_id"),
        col("entry.score").as("cos_sim"),
        (col("pos") + 1).cast("int").as("rank"))
  }

  /** [[pqTopK]] with INTEGER-Lloyd per-block codebooks — the derandomized,
    * fully oracle-checkable PQ (round 11; the `i3_ivf_ann_topk` playbook
    * on the block axis): codebooks come from [[KMeans.blockCodebooks]]
    * (nCodes lowest-id seed slices, exact fixed-point updates, one
    * distributed pass per update), and both the encode argmin and the ADC
    * scan run on exact-integer-valued DOUBLES (the 1e-6 grid: every
    * product ≤ 2^41 and every sum ≤ 2^47 stays exact in IEEE double), so
    * the existing [[graft.functions.PqEncodeExpr]]/
    * [[graft.functions.PqTopKExpr]] kernels are reused unchanged and
    * DuckDB reproduces codes, reconstruction norms, scores and ranks
    * bit-for-bit by extending the shared k-means CTE recurrence per
    * block. Same broadcast-code-table scan shape (and cache) as
    * [[pqTopK]]; the float sample-trained path stays for sample-fit
    * workflows. */
  def pqTopKExact(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 5,
      nBlocks: Int = 16,
      nCodes: Int = 256,
      updates: Int = 1): DataFrame = {
    import graft.functions.{PqCodebooks, PqCodeTable, PqOps}
    require(nCodes >= 2 && nCodes <= 256,
      s"nCodes must be in [2, 256] (codes are byte-packed): $nCodes")
    val df0 = df.filter(col(vecCol).isNotNull)
    val feats = df0.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
    // exact-integer-valued double view on the unshifted 1e-6 grid
    // (floor() yields BIGINT; the kernels take float/double arrays, and
    // the cast back is exact — |values| ≤ 2^21 ≪ 2^53)
    val quantD = transform(col("v"),
      x => floor(x.cast("double") * 1000000d).cast("double"))
    val key = (corpusKey(df, idCol, vecCol), nBlocks, nCodes, updates, -1)
    val cached = pqCache.synchronized(pqCache.get(key))
    val (books, table) = if (cached != null) cached else {
      requireBroadcastable(df, idCol)
      if (feats.limit(1).isEmpty) {
        return feats.limit(0).select(col("id").as("query_id"),
          col("id").as("neighbor_id"), lit(0.0).as("cos_sim"),
          lit(1).cast("int").as("rank"))
      }
      // shifted-grid integer codebooks → unshift (exact: the +1e6 shift is
      // uniform, so floor-mean commutes with it) → exact-int doubles
      val (shifted, bs, dim) =
        KMeans.blockCodebooks(df0, idCol, vecCol, nCodes, updates, nBlocks)
      val books = new PqCodebooks(
        shifted.map(_.map(_.map(v => (v - KMeans.Scale).toDouble))), bs, dim)
      val mEff = books.nBlocks
      // distributed encode on the quantized grid; zero RAW-norm rows are
      // excluded before the table is built (same contract as built())
      val rawNorm2 = aggregate(
        transform(col("v"), x => x.cast("double") * x.cast("double")),
        lit(0.0), (acc, x) => acc + x)
      val codeRows = feats
        .repartition(Par.of(feats))
        .filter(rawNorm2 > 0d)
        .select(col("id"), PqOps.pqEncode(quantD, books).as("codes"))
        .collect()
      val n = codeRows.length
      val ids = new Array[Long](n)
      val flat = new Array[Byte](n * mEff)
      var j = 0
      while (j < n) {
        ids(j) = codeRows(j).getLong(0)
        val cs = codeRows(j).getSeq[Int](1)
        var b = 0
        while (b < mEff) { flat(j * mEff + b) = cs(b).toByte; b += 1 }
        j += 1
      }
      val fresh = (books, feats.sparkSession.sparkContext.broadcast(
        new PqCodeTable(ids, flat, mEff)))
      val winner = pqCache.synchronized {
        val prev = pqCache.get(key)
        if (prev == null) { pqCache.put(key, fresh); fresh } else prev
      }
      if (winner ne fresh) fresh._2.destroy()
      winner
    }
    val topExpr = PqOps.pqTopK(col("query_id"), col("v"), table, books, k)
    feats.select(col("id").as("query_id"), quantD.as("v"))
      .select(col("query_id"), posexplode(topExpr).as(Seq("pos", "entry")))
      .select(col("query_id"),
        col("entry.id").as("neighbor_id"),
        col("entry.score").as("cos_sim"),
        (col("pos") + 1).cast("int").as("rank"))
  }

  /** The IVF × PQ COMPOSITION with both quantizers integer-Lloyd — the
    * round-11 capstone: candidate generation from [[ivfTopKExact]]'s
    * coarse cells/probes, scoring from [[pqTopKExact]]'s per-block
    * codebooks via the distributed ADC kernel ([[ivfPqServe]]'s shape:
    * corpus carries cell + 16-byte codes, raw vectors never reach the
    * join). Every stage is exact integer arithmetic, so the WHOLE
    * composed index — cells, probes, codes, ADC scores, ranks — is one
    * DuckDB-reproducible function of the data; the serve-tier gates keep
    * pinning the float/sample production path. Self-join form (queries =
    * corpus) like the other fixture rows. */
  def ivfPqTopKExact(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 5,
      nList: Int = 16,
      nProbe: Int = 4,
      nBlocks: Int = 16,
      nCodes: Int = 256,
      updates: Int = 1): DataFrame = {
    import graft.functions.PqOps
    require(nCodes >= 2 && nCodes <= 256,
      s"nCodes must be in [2, 256] (codes are byte-packed): $nCodes")
    val df0 = df.filter(col(vecCol).isNotNull)
    val quantD = transform(col(vecCol),
      x => floor(x.cast("double") * 1000000d).cast("double"))
    if (df0.limit(1).isEmpty) {
      return df0.limit(0).select(col(idCol).cast("long").as("query_id"),
        col(idCol).cast("long").as("neighbor_id"),
        lit(0.0).as("cos_sim"), lit(1).cast("int").as("rank"))
    }
    val cents = KMeans.centroids(df0, idCol, vecCol, nList, updates)
    val (shifted, bs, dim) =
      KMeans.blockCodebooks(df0, idCol, vecCol, nCodes, updates, nBlocks)
    val books = new graft.functions.PqCodebooks(
      shifted.map(_.map(_.map(v => (v - KMeans.Scale).toDouble))), bs, dim)
    val rawNorm2 = aggregate(
      transform(col(vecCol), x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, x) => acc + x)
    // corpus: coarse cell + PQ codes, raw vectors dropped before the join
    val corpusCodes = df0.filter(rawNorm2 > 0d)
      .select(col(idCol).cast("long").as("neighbor_id"),
        graft.functions.KMeansExprs
          .assign(KMeans.quantize(col(vecCol)), cents)("cluster").as("cell"),
        PqOps.pqEncode(quantD, books).as("codes"))
      // barrier: cell + codes computed once. Keyed by ID, not cell
      // (round-15): the probe side broadcasts, so the join never needed
      // cell co-partitioning, and hashing nList=16 cell values into the
      // partition space left ~40% of cores idle (plus per-cell skew) for
      // the quadratic ADC stage downstream — the §2.5 low-cardinality-key
      // trap. The id key spreads the scoring stage perfectly evenly at
      // any scale; a bounded (cell, salt-4) middle ground measured 1.8×
      // SLOWER here at the 10× shard (cell-slice skew tails the
      // interpreted ADC stage), and the id spread's cost — partial top-k
      // heaps fan out to every partition a query's candidates touch — is
      // an O(P·|Q|) term against the O(|Q|·n/nProbe) scoring win.
      .repartition(Par.of(df), col("neighbor_id"))
    val queryProbes = df0.select(col(idCol).cast("long").as("query_id"),
      quantD.as("qv"),
      explode(graft.functions.KMeansExprs
        .nearestCells(KMeans.quantize(col(vecCol)), cents, nProbe)).as("cell"))
    val pairs = corpusCodes.join(queryProbes, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos_sim", PqOps.pqAdc(col("qv"), col("codes"), books))
      .filter(col("cos_sim").isNotNull)
      .select(col("query_id"), col("neighbor_id"), col("cos_sim"))
    topKPerQuery(pairs, k)
  }

  /** Train codebooks + build the broadcast code table; None on an empty
    * (or empty-vector) corpus. */
  private[graft] def built(
      feats: DataFrame, nBlocks: Int, nCodes: Int,
      lloydIters: Int, maxTrainSample: Int)
      : Option[(graft.functions.PqCodebooks,
        org.apache.spark.broadcast.Broadcast[graft.functions.PqCodeTable])] = {
    import graft.functions.{PqCodebooks, PqCodeTable, PqOps}
    val sample = boundedSample(feats, maxTrainSample)
    val books = trainCodebooks(sample, nBlocks, nCodes, lloydIters) match {
      case None => return None
      case Some(b) => b
    }
    val mEff = books.nBlocks
    // encode DISTRIBUTED (width-pinned barrier — compact inputs otherwise
    // scan as one partition), then collect only the byte codes; the
    // corpus's raw vectors never reach the driver. Zero-norm vectors are
    // excluded HERE on the raw norm: they reconstruct to nonzero
    // centroids, so no later check could exclude them (brute-force parity:
    // the zero vector is never anyone's neighbor). Codes are 16× smaller
    // than the raw corpus — raise the budget accordingly when composing.
    val rawNorm2 = aggregate(
      transform(col("v"), x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, x) => acc + x)
    val codeRows = feats
      .repartition(Par.of(feats))
      .filter(rawNorm2 > 0d)
      .select(col("id"), PqOps.pqEncode(col("v"), books).as("codes"))
      .collect()
    val n = codeRows.length
    val ids = new Array[Long](n)
    val flat = new Array[Byte](n * mEff)
    var j = 0
    while (j < n) {
      ids(j) = codeRows(j).getLong(0)
      val cs = codeRows(j).getSeq[Int](1)
      var b = 0
      while (b < mEff) { flat(j * mEff + b) = cs(b).toByte; b += 1 }
      j += 1
    }
    val bc = feats.sparkSession.sparkContext.broadcast(
      new PqCodeTable(ids, flat, mEff))
    Some((books, bc))
  }

  /** Train the per-block PQ codebooks on a bounded sample; None on an
    * empty (or empty-vector) sample. Shared by [[pqTopK]]'s broadcast
    * table build and [[ivfPqServe]]'s distributed encode. */
  private[graft] def trainCodebooks(
      sample: Array[Array[Double]], nBlocks: Int, nCodes: Int,
      lloydIters: Int): Option[graft.functions.PqCodebooks] = {
    if (sample.isEmpty || sample(0).isEmpty) return None
    val dim = sample(0).length
    val bs = (dim + nBlocks - 1) / nBlocks
    val mEff = (dim + bs - 1) / bs
    val blocks = Array.tabulate(mEff) { b =>
      val from = b * bs
      val len = math.min(bs, dim - from)
      lloydEuclid(sample.map(x =>
        java.util.Arrays.copyOfRange(x, from, from + len)), nCodes, lloydIters)
    }
    Some(new graft.functions.PqCodebooks(blocks, bs, dim))
  }

  /** Per-block Euclidean Lloyd for the PQ codebooks: deterministic min-id
    * init (first k sample subvectors), empty clusters keep their previous
    * centroid — same conventions as [[ivfTopK]]'s coarse quantizer. */
  private def lloydEuclid(
      xs: Array[Array[Double]], k: Int, iters: Int): Array[Array[Double]] = {
    if (xs.isEmpty) return Array.empty
    var cents = xs.take(k).map(_.clone())
    val len = xs(0).length
    (0 until iters).foreach { _ =>
      val sums = Array.fill(cents.length)(new Array[Double](len))
      val counts = new Array[Long](cents.length)
      xs.foreach { x =>
        var best = 0
        var bestD = Double.MaxValue
        var c = 0
        while (c < cents.length) {
          var d = 0.0
          var i = 0
          while (i < len) { val t = x(i) - cents(c)(i); d += t * t; i += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        counts(best) += 1
        var i = 0
        while (i < len) { sums(best)(i) += x(i); i += 1 }
      }
      cents = cents.zipWithIndex.map { case (old, c) =>
        if (counts(c) == 0) old else sums(c).map(_ / counts(c))
      }
    }
    cents
  }

  /** Deterministic bounded training sample for the sample-fit/full-assign
    * quantizer trainers: first `maxTrainSample` rows by id — stable across
    * partitioning, layouts, and scale-ups that append ids. `feats` must be
    * `(id: long, v: array)`. */
  private def boundedSample(
      feats: DataFrame, maxTrainSample: Int): Array[Array[Double]] =
    feats.orderBy(col("id")).limit(maxTrainSample).collect()
      .map(_.getSeq[Any](1).map(_.asInstanceOf[Number].doubleValue()).toArray)

  /** Driver-side cosine Lloyd for the IVF coarse quantizer: deterministic
    * min-id init (first `nList` sample vectors), empty cells keep their
    * previous centroid — shared by [[ivfTopK]] (self-join fixture) and
    * [[ivfServe]] (query-batch serving) so both probe the SAME cell
    * geometry for a given corpus. A sample smaller than `nList` simply
    * yields fewer cells. */
  private[graft] def trainCosineCentroids(
      sample: Array[Array[Double]], nList: Int,
      iters: Int): Array[Array[Double]] = {
    var centroids: Array[Array[Double]] = sample.take(nList).map(_.clone())
    val m = centroids.length
    val cNorm = new Array[Double](m)
    def cosSim(x: Array[Double], c: Array[Double], cn: Double): Double = {
      var dot = 0.0; var xn = 0.0; var i = 0
      val n = math.min(x.length, c.length)
      while (i < n) { dot += x(i) * c(i); xn += x(i) * x(i); i += 1 }
      if (xn > 0 && cn > 0) dot / (math.sqrt(xn) * cn) else Double.NegativeInfinity
    }
    (0 until iters).foreach { _ =>
      var ci = 0
      while (ci < m) {
        cNorm(ci) = math.sqrt(centroids(ci).map(x => x * x).sum); ci += 1
      }
      val sums = Array.fill(m)(new Array[Double](
        if (sample.isEmpty) 0 else sample(0).length))
      val counts = new Array[Long](m)
      sample.foreach { x =>
        var best = 0; var bestScore = Double.NegativeInfinity
        var c = 0
        while (c < m) {
          val s = cosSim(x, centroids(c), cNorm(c))
          if (s > bestScore) { bestScore = s; best = c }
          c += 1
        }
        counts(best) += 1
        var i = 0
        while (i < math.min(x.length, sums(best).length)) {
          sums(best)(i) += x(i); i += 1
        }
      }
      centroids = centroids.zipWithIndex.map { case (old, c) =>
        if (counts(c) == 0) old // empty cells keep their previous centroid
        else sums(c).map(_ / counts(c))
      }
    }
    centroids
  }

  /** I3f at scale — IVF-accelerated query-batch serving: the
    * [[batchTopK]] contract (small fixed batch, unbounded corpus) with the
    * corpus scan narrowed by [[ivfTopK]]'s coarse quantizer instead of
    * scored exhaustively. Train on a bounded corpus sample, assign each
    * corpus row its ONE nearest cell map-side (broadcast centroids ride
    * the plan), explode each query into its `nProbe` nearest cells, then
    * broadcast-hash-join the tiny (|Q|·nProbe)-row query side on the cell
    * id: corpus rows never shuffle, rows outside every probed cell are
    * dropped at the join without being scored, and only the bounded-heap
    * winners (≤ |Q|·k) cross the one shuffle. At 100 TB the same geometry
    * goes further: write the corpus partitioned BY the cell id once
    * (`df.withColumn("cell", …).write.partitionBy("cell")`) and a probe
    * filter on `cell` becomes partition pruning — the serve then READS
    * only nProbe/nList of the corpus instead of merely not scoring it
    * (layout pinned by LlmSpec's pruning test). Recall is bounded by the
    * probe set like any IVF; gated vs exact [[batchTopK]] by
    * `i3_ivf_serve_gate`. */
  def ivfServe(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int = 5,
      nList: Int = 16, nProbe: Int = 4,
      lloydIters: Int = 3, maxTrainSample: Int = 65536): DataFrame = {
    import graft.functions.ArrayOps.nearestCells
    val c0 = corpus.filter(col(vecCol).isNotNull)
    val centroids = trainCosineCentroids(
      boundedSample(c0.select(col(idCol).cast("long").as("id"),
        col(vecCol).as("v")), maxTrainSample), nList, lloydIters)
    val corpusCells = c0.select(col(idCol).cast("long").as("neighbor_id"),
        quantize(col(vecCol)).as("cv"),
        element_at(nearestCells(col(vecCol), centroids, 1), 1).as("cell"))
      .withColumn("cn", sqrt(dotQ(col("cv"), col("cv")).cast("double")))
    val queryProbes = queries.filter(col(vecCol).isNotNull)
      .select(col(idCol).cast("long").as("query_id"),
        quantize(col(vecCol)).as("qv"),
        explode(nearestCells(col(vecCol), centroids, nProbe)).as("cell"))
      .withColumn("qn", sqrt(dotQ(col("qv"), col("qv")).cast("double")))
    // each corpus vector lives in exactly one cell ⇒ no pair dedup needed
    val pairs = corpusCells.join(broadcast(queryProbes), Seq("cell"))
      .withColumn("cos_sim", safeCosine(col("qv"), col("cv"), col("qn"), col("cn")))
      .filter(col("cos_sim").isNotNull)
      .select(col("query_id"), col("neighbor_id"), col("cos_sim"))
    topKPerQuery(pairs, k)
  }

  /** I3f, both axes — IVF-PQ batch serving (the billion-scale ANN
    * composition [[pqTopK]]'s scaladoc points at): [[ivfServe]]'s coarse
    * cells bound the CANDIDATES, product-quantization codes bound the
    * MEMORY. The corpus is encoded distributed — each row becomes
    * (cell, nBlocks bytes of codes) and its raw vector is dropped from
    * the serve plan right there, so the per-row payload past the scan is
    * ~16 bytes instead of dim floats; nothing corpus-sized is ever
    * collected or broadcast (the difference from [[pqTopK]], whose code
    * TABLE is a driver-built broadcast and caps the corpus at the
    * broadcast budget). Probed candidates score via [[graft.functions.PqAdcExpr]]
    * directly on their codes; only bounded-heap winners cross the one
    * shuffle. Recall compounds both quantizers' losses — gated vs exact
    * [[batchTopK]] by `i3_ivfpq_serve_gate`. Zero-norm corpus rows are
    * excluded at encode time on the RAW norm, as in [[pqTopK]]'s build
    * (they reconstruct to nonzero centroids, so no later check could
    * exclude them). */
  def ivfPqServe(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int = 5,
      nList: Int = 16, nProbe: Int = 4,
      nBlocks: Int = 16, nCodes: Int = 256,
      lloydIters: Int = 3, maxTrainSample: Int = 65536): DataFrame = {
    import graft.functions.{ArrayOps, PqOps}
    require(nCodes >= 2 && nCodes <= 256,
      s"nCodes must be in [2, 256] (codes are byte-packed): $nCodes")
    val c0 = corpus.filter(col(vecCol).isNotNull)
    val sample = boundedSample(c0.select(col(idCol).cast("long").as("id"),
      col(vecCol).as("v")), maxTrainSample)
    val centroids = trainCosineCentroids(sample, nList, lloydIters)
    val books = trainCodebooks(sample, nBlocks, nCodes, lloydIters) match {
      case None => // empty corpus: empty result, serve shape preserved
        return queries.limit(0).select(
          col(idCol).cast("long").as("query_id"),
          col(idCol).cast("long").as("neighbor_id"),
          lit(0.0).as("cos_sim"), lit(1).cast("int").as("rank"))
      case Some(b) => b
    }
    val rawNorm2 = aggregate(
      transform(col(vecCol), x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, x) => acc + x)
    val corpusCodes = c0.filter(rawNorm2 > 0d)
      .select(col(idCol).cast("long").as("neighbor_id"),
        element_at(ArrayOps.nearestCells(col(vecCol), centroids, 1), 1).as("cell"),
        PqOps.pqEncode(col(vecCol), books).as("codes"))
    val queryProbes = queries.filter(col(vecCol).isNotNull)
      .select(col(idCol).cast("long").as("query_id"), col(vecCol).as("qv"),
        explode(ArrayOps.nearestCells(col(vecCol), centroids, nProbe)).as("cell"))
    val pairs = corpusCodes.join(broadcast(queryProbes), Seq("cell"))
      .withColumn("cos_sim", PqOps.pqAdc(col("qv"), col("codes"), books))
      .filter(col("cos_sim").isNotNull)
      .select(col("query_id"), col("neighbor_id"), col("cos_sim"))
    topKPerQuery(pairs, k)
  }

  /** Sign-bucket id for LSH table `table`: `nPlanes` random-hyperplane sign
    * bits packed into a long. Vectors in the same bucket are cosine-close
    * with probability (1 − θ/π)^nPlanes. One fused kernel
    * ([[graft.functions.HyperplaneLshExpr]]) — the `aggregate`/`zip_with`
    * formulation built a (planes × elements) interpreted-lambda tree whose
    * analysis time alone dominated the query. */
  def lshBucket(vec: Column, nPlanes: Int = 12, table: Int = 0,
      hashFamily: String = "murmur"): Column = {
    require(hashFamily == "murmur" || hashFamily == "md5",
      s"unknown hashFamily '$hashFamily' (expected murmur or md5)")
    if (hashFamily == "md5")
      graft.functions.HashExprs.md5HyperplaneLsh(vec, nPlanes, table)
    else graft.functions.HashExprs.hyperplaneLsh(vec, nPlanes, table)
  }

  /** IVF ANN with the INTEGER-Lloyd coarse quantizer — the derandomized,
    * fully oracle-checkable variant (round 11, the md5-MinHash playbook
    * applied to IVF): centroids come from [[KMeans.centroids]] (k
    * lowest-id seeds, exact fixed-point updates), corpus cells from the
    * same argmin kernel, query probes from
    * [[graft.functions.KMeansNearestCellsExpr]] (top-nProbe by squared
    * grid distance, ties to the lower index), and candidate scoring is
    * the exact quantized-integer cosine. Every stage is a pure integer
    * function of the data, so DuckDB reproduces cells, probes, candidates
    * and ranks bit-for-bit by extending the `i3_kmeans` CTE chain. Same
    * plan shape as [[ivfTopK]] (cell equi-join, no all-pairs); the
    * float-trained [[ivfTopK]] stays available for sample-fit workflows. */
  def ivfTopKExact(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 5,
      nList: Int = 16,
      nProbe: Int = 4,
      updates: Int = 1): DataFrame = {
    val df0 = df.filter(col(vecCol).isNotNull)
    // empty/all-null corpus: zero seeds would make KMeansExprs.assign throw;
    // return the empty typed frame like pqTopKExact / ivfPqTopKExact do
    if (df0.limit(1).isEmpty) {
      return df0.limit(0).select(col(idCol).cast("long").as("query_id"),
        col(idCol).cast("long").as("neighbor_id"),
        lit(0.0).as("cos_sim"), lit(1).cast("int").as("rank"))
    }
    val cents = KMeans.centroids(df0, idCol, vecCol, nList, updates)
    val corpusCells = df0.select(col(idCol).cast("long").as("neighbor_id"),
      quantize(col(vecCol)).as("cv"),
      graft.functions.KMeansExprs
        .assign(KMeans.quantize(col(vecCol)), cents)("cluster").as("cell"))
      .withColumn("cn", sqrt(dotQ(col("cv"), col("cv")).cast("double")))
      // barrier: features + cell computed once. Keyed by ID, not cell
      // (round-15) — see ivfPqTopKExact: 16 cell values cap + skew the
      // scoring stage's parallelism (§2.5); the probe join broadcasts
      // either way.
      .repartition(Par.of(df), col("neighbor_id"))
    val queryProbes = df0.select(col(idCol).cast("long").as("query_id"),
      quantize(col(vecCol)).as("qv"),
      explode(graft.functions.KMeansExprs
        .nearestCells(KMeans.quantize(col(vecCol)), cents, nProbe)).as("cell"))
      .withColumn("qn", sqrt(dotQ(col("qv"), col("qv")).cast("double")))
    val pairs = queryProbes.join(corpusCells, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos_sim", safeCosine(col("qv"), col("cv"), col("qn"), col("cn")))
      .filter(col("cos_sim").isNotNull)
      .select(col("query_id"), col("neighbor_id"), col("cos_sim"))
    // bounded-heap aggregate, not a window: map-side partial top-k means
    // k rows per query cross the shuffle instead of every candidate pair
    // (at the 16× shard the window shuffled ~256M skinny pair rows)
    topKPerQuery(pairs, k)
  }

  /** I3c — IVF (inverted-file) ANN: a coarse centroid table partitions the
    * corpus into `nList` cells (k-means-style Lloyd refinement, deterministic
    * min-id init); each query probes its `nProbe` nearest cells and reranks
    * exactly within them. Candidate generation is an equi-join on the cell
    * id — linear in corpus size and naturally partitioned, the alternative
    * scale path to [[lshTopK]] when cluster structure (not random planes)
    * should drive recall. Centroids are tiny (nList × dim doubles) and ride
    * along in the plan; the corpus never leaves the executors. */
  def ivfTopK(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 5,
      nList: Int = 16,
      nProbe: Int = 4,
      lloydIters: Int = 3,
      maxTrainSample: Int = 65536): DataFrame = {
    import graft.functions.ArrayOps.nearestCells
    // null vectors are droppable, not fatal: without the filter a null in
    // the training sample NPEs the driver-side collect (same contract as
    // pqTopK)
    val df0 = df.filter(col(vecCol).isNotNull)
    val feats = df0.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
    // Sample-fit, full-assign (the standard IVF training shape): Lloyd runs
    // driver-side over a bounded deterministic sample — one collect total
    // instead of one assignment job per iteration; at 64k × 64 dims the
    // sample is ~32 MB. Assignment of the FULL corpus stays distributed.
    val centroids = trainCosineCentroids(
      boundedSample(feats, maxTrainSample), nList, lloydIters)
    val corpusCells = df0.select(col(idCol).cast("long").as("neighbor_id"),
      quantize(col(vecCol)).as("cv"),
      element_at(nearestCells(col(vecCol), centroids, 1), 1).as("cell"))
      .withColumn("cn", sqrt(dotQ(col("cv"), col("cv")).cast("double")))
      // barrier: features + cell computed once. Keyed by ID, not cell
      // (round-15) — see ivfPqTopKExact: 16 cell values cap + skew the
      // scoring stage (§2.5); the probe join broadcasts either way.
      .repartition(Par.of(df), col("neighbor_id"))
    val queryProbes = df0.select(col(idCol).cast("long").as("query_id"),
      quantize(col(vecCol)).as("qv"),
      explode(nearestCells(col(vecCol), centroids, nProbe)).as("cell"))
      .withColumn("qn", sqrt(dotQ(col("qv"), col("qv")).cast("double")))
    val pairs = queryProbes.join(corpusCells, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos_sim", safeCosine(col("qv"), col("cv"), col("qn"), col("cn")))
      .filter(col("cos_sim").isNotNull)
      .select(col("query_id"), col("neighbor_id"), col("cos_sim"))
    // no distinct needed: each corpus vector lives in exactly ONE cell, so a
    // (query, neighbor) pair can only arise from that single cell
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    pairs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos_sim"), col("rank"))
  }

  /** I3b — LSH-bucketed ANN: `nTables` independent hyperplane tables; a
    * pair is a candidate if it collides in ANY table (IVF-style recall
    * boost: 1 − (1−p)^T), then exact cosine + top-k within candidates.
    *
    * Scale note (measured, session-13 audit): at FIXED `nPlanes` the
    * self-join candidate count is Θ(N²/2^nPlanes) — 64 buckets that each
    * grow linearly with the corpus pair quadratically (the 16× shard
    * audit OOM'd an 8 GiB heap on ~128M candidate rows). `nPlanes = 0`
    * selects the plane count automatically so expected bucket occupancy
    * stays ≤ [[LshTargetOccupancy]] at any corpus size: candidates stay
    * ~occupancy·N (linear), which is how a production corpus actually
    * runs LSH — index params grow with log N. The corpus is counted once
    * (one bounded aggregate) to size the family. */
  val LshTargetOccupancy = 32L

  /** Smallest plane count keeping expected bucket occupancy n/2^p at or
    * under [[LshTargetOccupancy]], clamped to [4, 24]. */
  private[graft] def lshAutoPlanes(n: Long): Int =
    math.min(24, math.max(4,
      64 - java.lang.Long.numberOfLeadingZeros(
        math.max(1L, (n - 1) / LshTargetOccupancy))))

  def lshTopK(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 5,
      nPlanes: Int = 8,
      nTables: Int = 4,
      hashFamily: String = "murmur"): DataFrame = {
    require(nPlanes >= 0 && nPlanes <= 64, s"nPlanes must be in [0, 64]: $nPlanes")
    val planes = if (nPlanes > 0) nPlanes else lshAutoPlanes(df.count())
    val b = df.select(
      (Seq(col(idCol).as("query_id"), quantize(col(vecCol)).as("qv")) ++
        (0 until nTables).map(t =>
          lshBucket(col(vecCol), planes, t, hashFamily).as(s"bucket_$t"))): _*)
      .withColumn("qn", sqrt(dotQ(col("qv"), col("qv")).cast("double")))
      .repartition(Par.of(df), col("query_id")) // barrier: buckets + norm computed once
    // the bucket self-join and the cross-table dedup move ID PAIRS ONLY:
    // shipping the two quantized vectors through the collision join
    // multiplied every candidate row by ~1 KB × table multiplicity (the
    // 64× shard audit measured the old shape 6.3× over its 16→64×
    // candidate growth — pure exchange volume). Features re-attach after
    // distinct by two id-keyed joins against the (already materialized)
    // barrier frame, so each vector crosses the wire once per SIDE it
    // appears on, not once per collision.
    val buckets = b.select(col("query_id"),
      posexplode(array((0 until nTables).map(t => col(s"bucket_$t")): _*))
        .as(Seq("table_idx", "bucket")))
    val other = buckets.select(col("query_id").as("neighbor_id"),
      col("table_idx"), col("bucket"))
    val candIds = buckets.join(other, Seq("table_idx", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"))
      .distinct() // a pair colliding in several tables counts once
    val qFeats = b.select(col("query_id"), col("qv"), col("qn"))
    val nFeats = b.select(col("query_id").as("neighbor_id"),
      col("qv").as("cv"), col("qn").as("cn"))
    // candidate sets per query are bucket-sized (tens), so the plain window
    // top-k wins here; the heap aggregate pays off on the brute-force path
    // where every query sees the whole corpus (measured both ways at sf0.1)
    val pairs = candIds
      .join(qFeats, Seq("query_id"))
      .join(nFeats, Seq("neighbor_id"))
      .withColumn("cos_sim", safeCosine(col("qv"), col("cv"), col("qn"), col("cn")))
      .filter(col("cos_sim").isNotNull)
    // window, not the heap aggregate, on purpose (re-measured session 13
    // AFTER the id-pair dedup restructure): the heap's extra groupBy
    // exchange lost at both ends — 0.59 vs 0.44 s at sf0.1 and 235 vs
    // 213 s at the 16× fixed-plane shard — because the post-join pair
    // rows are already skinny and the cosine compute dominates. (The IVF
    // path keeps the heap: its pairs arrive pre-shuffled by cell, where
    // the map-side partial top-k measured 37 vs 57 s at 16×.)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    pairs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos_sim"), col("rank"))
  }
}
