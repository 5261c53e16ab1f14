package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination (SURVEY §2 I7b): flag corpus documents that
  * share any word n-gram with a benchmark/eval set — the leakage guard a
  * training pipeline runs before pre-training (the n-gram-overlap method
  * published with GPT-3/PaLM-style data cards; n=8..13 word grams).
  *
  * Same blocked shape as fuzzy dedup: explode n-grams, equi-join on the
  * gram, distinct doc ids back. The benchmark side is an eval set —
  * thousands of documents, not terabytes — so its distinct gram table is
  * explicitly broadcast and the corpus side stays one linear partitioned
  * pass. For a benchmark too large to broadcast, drop the hint and the
  * same plan shuffles both sides on the gram.
  */
object Decontamination {

  /** One row per corpus doc: (id, is_contaminated). Grams come from
    * [[Dedup.wordShingles]] on both sides, so tokenization is identical. */
  def flagContaminated(
      corpus: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 8): DataFrame = {
    // grams hash to 64-bit BEFORE the join (the jaccardPairs convention):
    // an 8-word gram string is ~60 bytes, its hash 8 — the broadcast
    // table, the build-side hash map, and every probe shrink ~8x, and at
    // a real eval-set size (millions of distinct grams) that is the
    // difference between a broadcastable guard and an 80 MB+ ship.
    // Collision risk is the usual ~2^-64 per probe.
    def grams(df: DataFrame) = df.select(col(idCol).as("id"),
      explode(transform(Dedup.wordShingles(col(textCol), n),
        g => xxhash64(g))).as("gram"))
    val benchGrams = grams(benchmark).select(col("gram")).distinct()
    val hits = grams(corpus)
      .join(broadcast(benchGrams), Seq("gram"), "left_semi")
      .select(col("id")).distinct()
    corpus.select(col(idCol).as("id"))
      .join(hits.withColumn("c", lit(true)), Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("c"), lit(false)).as("is_contaminated"))
  }

  /** I7b-spans — WHERE the contamination sits: maximal word-index runs of
    * benchmark n-gram overlap per corpus document, so a curation pass can
    * cut the leaked passage instead of dropping the document (the same
    * surgical upgrade [[Dedup.duplicatedSpans]] gives exact dedup).
    * Positions are 1-based word indices; span_end is inclusive. The
    * benchmark gram table broadcasts; the corpus side is one positioned
    * explode (rows = corpus words) plus the [[Islands]] merge — nothing
    * quadratic, nothing driver-side. */
  def contaminatedSpans(
      corpus: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 8): DataFrame = {
    def positioned(df: DataFrame) = df
      .select(col(idCol).as("id"), Dedup.words(col(textCol)).as("ws"))
      .filter(size(col("ws")) >= n)
      .select(col("id"),
        explode(sequence(lit(1), size(col("ws")) - (n - 1))).as("i"),
        col("ws"))
      .select(col("id"), col("i"),
        // same hash-before-join shrink as [[flagContaminated]]
        xxhash64(concat_ws(" ", slice(col("ws"), col("i"), lit(n)))).as("gram"))
    val benchGrams = positioned(benchmark).select(col("gram")).distinct()
    val marked = positioned(corpus)
      .join(broadcast(benchGrams), Seq("gram"), "left_semi")
      .select(col("id"), col("i"))
    Islands.merge(marked, "id", "i", n)
      .select(col("id").as(idCol),
        col("span_start").as("word_start"),
        col("span_end").as("word_end"),
        col("n_hits").as("n_grams"))
  }
}
