package graft.sinks

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Json

/** Training-data release sink (EXT, the operational tail of the I6
  * curation surface): the curated corpus lands as split-partitioned
  * parquet plus a `_MANIFEST.json` recording, per split, the row count
  * and an order-invariant content fingerprint — the artifact a consumer
  * checks BEFORE training ("is this the release the curation run
  * produced, bit for bit?") and after any copy/migration.
  *
  * The fingerprint is the `i6_table_fingerprint` kernel: md5 each row's
  * canonical field serialization, fold the first 15 hex digits to a
  * 60-bit integer, SUM exactly in decimal(38,0). Addition commutes, so
  * the value is invariant to partitioning, write order, task retries, and
  * file layout — verification never sorts the corpus.
  */
object ReleaseSink {

  private def fingerprints(df: DataFrame, splitCol: String,
      contentCols: Seq[String]): Map[String, (Long, String)] =
    df.select(col(splitCol).cast("string").as("__split"),
        conv(substring(md5(concat_ws("\u0001",
          contentCols.map(c => col(c).cast("string")): _*)), 1, 15), 16, 10)
          .cast("decimal(20,0)").as("__h"))
      .groupBy(col("__split"))
      .agg(count(lit(1)).as("n"),
        sum(col("__h").cast("decimal(38,0)")).cast("string").as("fp"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getString(2))))
      .toMap

  /** Write `df` under `dir` partitioned by `splitCol`, then the manifest.
    * Returns the per-split (rows, fingerprint) map. `contentCols` define
    * row identity for the fingerprint — include every column a consumer
    * depends on. */
  def writeRelease(df: DataFrame, dir: String, splitCol: String,
      contentCols: Seq[String]): Map[String, (Long, String)] = {
    df.write.mode("overwrite").partitionBy(splitCol).parquet(dir)
    val manifest = fingerprints(df, splitCol, contentCols)
    val body = ListMap(
      "split_col" -> splitCol,
      "content_cols" -> contentCols.toVector,
      "splits" -> ListMap(manifest.toSeq.sortBy(_._1).map {
        case (s, (n, fp)) =>
          s -> ListMap("n_rows" -> n, "fingerprint" -> fp)
      }: _*))
    Files.write(Paths.get(dir, "_MANIFEST.json"),
      Render.prettyJson(body).getBytes(StandardCharsets.UTF_8))
    manifest
  }

  /** Recompute the fingerprints from the WRITTEN files and compare to the
    * manifest — the post-copy/post-migration integrity check. Returns the
    * per-split verdicts (false = count or content drift). */
  def verifyRelease(spark: SparkSession, dir: String): Map[String, Boolean] = {
    val manifest = Json.parse(new String(
      Files.readAllBytes(Paths.get(dir, "_MANIFEST.json")),
      StandardCharsets.UTF_8)).asInstanceOf[collection.Map[String, Any]]
    val splitCol = manifest("split_col").asInstanceOf[String]
    val contentCols = manifest("content_cols")
      .asInstanceOf[Seq[Any]].map(_.toString)
    val expected = manifest("splits").asInstanceOf[collection.Map[String, Any]]
    val actual = fingerprints(spark.read.parquet(dir), splitCol, contentCols)
    expected.map { case (split, v) =>
      val m = v.asInstanceOf[collection.Map[String, Any]]
      val want = (m("n_rows") match {
        case n: Long => n
        case n: Double => n.toLong
        case other => other.toString.toLong
      }, m("fingerprint").toString)
      split -> actual.get(split).contains(want)
    }.toMap
  }
}
