package graft.spans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.{AttrCodec, SerializedData}
import graft.spans.SpansOps._

/** B7 — the legacy last-write-wins reader
  * (`composable_logs/tasks/task_opentelemetry_logging.py:63-87`): all
  * `artefact`/`named-value` spans sorted by start time DESC, first
  * occurrence per name wins. NOTE this is deliberately a different dedup
  * policy than the parser's B6 duplicate-name REJECTION — the reference
  * keeps both and so do we (SURVEY §7.4.2).
  */
object LegacyReader {

  private def readSerialized(spans: DataFrame, filterName: String): Map[String, Any] = {
    require(Seq("artefact", "named-value").contains(filterName))
    val w = Window.partitionBy(col("name_attr"))
      .orderBy(to_timestamp(col("start_time")).desc, col("span_id").desc)
    val rows = spans.filterNested(Seq("name"), filterName)
      .select(
        col("context.span_id").as("span_id"),
        col("start_time"),
        col("attributes").getItem("name").as("name_attr"),
        col("attributes").getItem("type").as("t"),
        col("attributes").getItem("encoding").as("e"),
        col("attributes").getItem("content_encoded").as("c"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .collect()
    rows.map { r =>
      val name = AttrCodec.parse(r.getString(2)).asInstanceOf[String]
      val sd = SerializedData(
        AttrCodec.parse(r.getString(3)).asInstanceOf[String],
        AttrCodec.parse(r.getString(4)).asInstanceOf[String],
        AttrCodec.parse(r.getString(5)).asInstanceOf[String])
      name -> sd.decode()
    }.toMap
  }

  def getLoggedValues(spans: DataFrame): Map[String, Any] =
    readSerialized(spans, "named-value")

  def getLoggedArtifacts(spans: DataFrame): Map[String, Any] =
    readSerialized(spans, "artefact")
}
