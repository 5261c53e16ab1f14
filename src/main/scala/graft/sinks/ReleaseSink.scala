package graft.sinks

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Fingerprint
import graft.model.Json

/** Training-data release sink (EXT, the operational tail of the I6
  * curation surface): the curated corpus lands as split-partitioned
  * parquet plus a `_MANIFEST.json` recording, per split, the row count
  * and an order-invariant content fingerprint — the artifact a consumer
  * checks BEFORE training ("is this the release the curation run
  * produced?") and after any copy/migration.
  *
  * The fingerprint is the shared [[graft.functions.Fingerprint]] kernel
  * (injective null-safe row serialization, commutative decimal sum — no
  * sort at any size), computed over the WRITTEN files, so the manifest
  * describes the artifact on disk, not a second execution of the
  * possibly expensive (or nondeterministic) upstream pipeline.
  */
object ReleaseSink {

  private def fingerprints(df: DataFrame, splitCol: String,
      contentCols: Seq[String]): Map[String, (Long, String)] =
    df.select(col(splitCol).cast("string").as("__split"),
        Fingerprint.rowFold(contentCols.map(col)).as("__h"))
      .groupBy(col("__split"))
      .agg(count(lit(1)).as("n"), Fingerprint.sumFold(col("__h")).as("fp"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getString(2))))
      .toMap

  /** Write `df` under `dir` partitioned by `splitCol`, then the manifest
    * (fingerprinted from the written parquet). Returns the per-split
    * (rows, fingerprint) map. `contentCols` define row identity — include
    * every column a consumer depends on. Rejects null split values up
    * front: a null would land in Hive's default partition and escape the
    * manifest's accounting. */
  def writeRelease(df: DataFrame, dir: String, splitCol: String,
      contentCols: Seq[String]): Map[String, (Long, String)] = {
    require(contentCols.nonEmpty, "contentCols must not be empty")
    require(df.filter(col(splitCol).isNull).limit(1).count() == 0L,
      s"null $splitCol values are not releasable (they would land in the " +
        "hive default partition outside the manifest's accounting)")
    df.write.mode("overwrite").partitionBy(splitCol).parquet(dir)
    val manifest = fingerprints(df.sparkSession.read.parquet(dir),
      splitCol, contentCols)
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

  /** Recompute the fingerprints from the files and compare to the
    * manifest — the post-copy/post-migration integrity check. Returns a
    * verdict per split seen in EITHER the manifest or the files: false
    * means count/content drift, a manifest split missing from disk, or a
    * split on disk the manifest never vetted. */
  def verifyRelease(spark: SparkSession, dir: String): Map[String, Boolean] = {
    val manifest = Json.parse(new String(
      Files.readAllBytes(Paths.get(dir, "_MANIFEST.json")),
      StandardCharsets.UTF_8)).asInstanceOf[collection.Map[String, Any]]
    val splitCol = manifest("split_col").asInstanceOf[String]
    val contentCols = manifest("content_cols")
      .asInstanceOf[Seq[Any]].map(_.toString)
    val expected = manifest("splits").asInstanceOf[collection.Map[String, Any]]
      .map { case (split, v) =>
        val m = v.asInstanceOf[collection.Map[String, Any]]
        split -> ((m("n_rows") match {
          case n: Long => n
          case n: Double => n.toLong
          case other => other.toString.toLong
        }, m("fingerprint").toString))
      }
    val actual = fingerprints(spark.read.parquet(dir), splitCol, contentCols)
    (expected.keySet ++ actual.keySet).map { split =>
      split -> (expected.get(split) == actual.get(split))
    }.toMap
  }
}
