package graft.operators

import org.apache.spark.sql.{DataFrame, Row, Column}
import org.apache.spark.sql.types.LongType

/** Scalable total-order ranking (dense 1..n over an arbitrary sort key).
  *
  * `row_number() OVER (ORDER BY …)` — the naive formulation — plans an
  * empty-key window: Spark funnels the ENTIRE dataset through one task,
  * which is the definition of not surviving a 100× scale-up. This
  * operator instead range-partitions on the sort key (each partition owns
  * a contiguous key interval), sorts within partitions, and assigns
  * global indices with `zipWithIndex` — whose one extra job counts rows
  * per partition so every task can offset its local indices. Total cost:
  * one range exchange + one count job, no serial stage anywhere.
  *
  * The caller's `sortCols` must form a TOTAL order (append a unique
  * tiebreak column) — otherwise equal-key rows get nondeterministic
  * ranks across runs and engines.
  */
object GlobalRank {

  /** `df` plus a `rankCol` long column holding the 1-based global rank in
    * `sortCols` order. */
  def withGlobalRank(df: DataFrame, rankCol: String, sortCols: Column*): DataFrame = {
    val spark = df.sparkSession
    val parts = df.repartitionByRange(sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val schema = org.apache.spark.sql.types.StructType(
      df.schema.fields :+
        org.apache.spark.sql.types.StructField(rankCol, LongType, nullable = false))
    val ranked = parts.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    spark.createDataFrame(ranked, schema)
  }
}
