package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diff — the incremental-crawl primitive (SURVEY Group I
  * adjunct): given two versions of a document table, classify every id as
  * added / removed / changed / unchanged by content hash. This is the step
  * an incremental training-data pipeline runs between crawls to process
  * only the delta (re-curate changed docs, retire removed ones) instead of
  * re-running curation over the full 100 TB.
  *
  * Shape: one hash-partitioned full-outer join on the stable id; content
  * equality compares md5 digests, never the payloads, so the shuffle
  * carries 32 hex chars per row regardless of document size. With both
  * snapshots written through the bucketed catalog layout
  * ([[graft.sinks.Sinks]]) the join co-locates and the diff is
  * exchange-free.
  */
object Snapshots {

  /** One row per id in either snapshot: (idCol, change_type) where
    * change_type ∈ added | removed | changed | unchanged. Presence rides
    * on explicit flags — a null digest means NULL CONTENT, not an absent
    * row, so the two cannot be conflated; content comparison is null-safe
    * (null vs null = unchanged, null vs text = changed). */
  def diff(old: DataFrame, nw: DataFrame,
      idCol: String, contentCol: String): DataFrame = {
    val a = old.select(col(idCol).as("id"), md5(col(contentCol)).as("h_old"),
      lit(true).as("in_old"))
    val b = nw.select(col(idCol).as("id"), md5(col(contentCol)).as("h_new"),
      lit(true).as("in_new"))
    a.join(b, Seq("id"), "full_outer")
      .select(col("id").as(idCol),
        when(col("in_old").isNull, lit("added"))
          .when(col("in_new").isNull, lit("removed"))
          .when(!(col("h_old") <=> col("h_new")), lit("changed"))
          .otherwise(lit("unchanged")).as("change_type"))
  }
}
