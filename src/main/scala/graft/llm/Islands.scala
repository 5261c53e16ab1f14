package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shared island-merge kernel: coalesce per-document sorted hit positions
  * into maximal runs, where a new run starts when the gap to the previous
  * hit exceeds `gap`. Used by the char-shingle duplicated-span report
  * (gap = shingle length k) and the word-gram contamination-span report
  * (gap = gram order n) — both are "mark positions, merge overlapping
  * [p, p+gap-1] windows" problems. One window sort per document partition;
  * the null lag on a partition's first row falls through to the ELSE
  * branch, opening island 1 (same CASE semantics in DuckDB oracles).
  */
object Islands {

  /** Input: rows (docCol, posCol). Output: one row per maximal island:
    * (docCol, span_start = min pos, span_end = max pos + gap - 1,
    * n_hits). Positions are 1-based; span_end is inclusive. */
  def merge(hits: DataFrame, docCol: String, posCol: String, gap: Int): DataFrame = {
    val w = Window.partitionBy(col(docCol)).orderBy(col(posCol))
    hits
      .withColumn("__brk",
        when(col(posCol) - lag(col(posCol), 1).over(w) <= gap, lit(0))
          .otherwise(lit(1)))
      .withColumn("__island", sum(col("__brk"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(docCol), col("__island"))
      .agg(min(col(posCol)).as("span_start"),
        (max(col(posCol)) + (gap - 1)).as("span_end"),
        count(lit(1)).as("n_hits"))
      .select(col(docCol), col("span_start"), col("span_end"), col("n_hits"))
  }
}
