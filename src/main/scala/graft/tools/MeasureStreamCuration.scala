package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.llm.IncrementalCuration
import graft.llm.IncrementalCuration.StateTables
import graft.streaming.StreamCuration

/** Per-batch cost of the H14 streaming-curation handler
  * ([[graft.streaming.StreamCuration.applyBatch]]) — the FULL protocol
  * per micro-batch: progress-log read, implicit-change liveness probe,
  * v7 verdict chain, idempotent verdict-partition write, state fold,
  * done-row append. Run against 1×/16×/64× corpora with a FIXED batch
  * size: flat per-batch times across corpus scale prove the streaming
  * wrapper adds only metadata-sized legs on top of the v7 serve path it
  * composes (`MeasureV7Serve` reports that path's build/serve/update
  * split separately). Not part of the battery; recorded in BASELINE.md.
  *
  * Each batch is a disjoint slice of the doc_id%10==0 pool plus explicit
  * retire ops for a 0.1% corpus slice, so both the upsert and the retire
  * legs are on the measured path; the final batch re-upserts the first
  * batch's ids (CHANGED docs), putting the implicit-retire leg on the
  * clock too.
  *
  * Usage:
  *   sbt "runMain graft.tools.MeasureStreamCuration <sfDir> [batchCap]"
  */
object MeasureStreamCuration {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val batchCap = args.lift(1).map(_.toInt).getOrElse(500)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.driver.memory", "8g")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    val docs = graft.queries.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), col("source"))
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val pool = docs.filter(col("doc_id") % 10 === 0)
      .orderBy(col("doc_id")).limit(batchCap * 3).localCheckpoint()
    val slices = (0 to 2).map(i =>
      pool.filter(col("doc_id") % 3 === i).localCheckpoint())
    // batch 3 re-upserts batch 0's ids with perturbed text: every doc is
    // a CHANGED doc, so the implicit-retire leg carries the whole batch
    val changed = slices(0)
      .select(col("doc_id"), concat(col("text"), lit(" v2")).as("text"),
        col("source")).localCheckpoint()
    val retires = (0 to 3).map(i =>
      corpus.filter(col("doc_id") % 1000 === lit(i + 1))
        .select(col("doc_id")).localCheckpoint())

    val st = StateTables("msc_bands", "msc_feats", "msc_doctoks",
      "msc_srcstats", "msc_tombstones", "msc_meta",
      new java.io.File(sys.props("java.io.tmpdir"), "msc_lr").toString)
    val tBuild = time {
      IncrementalCuration.buildState(corpus, "doc_id", "text", "source", st)
    }
    val handler = StreamCuration.applyBatch(
      st, "msc_progress", "msc_verdicts") _
    def withOps(upserts: org.apache.spark.sql.DataFrame,
        retired: org.apache.spark.sql.DataFrame) =
      upserts.withColumn("op", lit("upsert")).unionByName(
        retired.select(col("doc_id"), lit(null).cast("string").as("text"),
          lit(null).cast("string").as("source"), lit("retire").as("op")))
    val batches = slices.zipWithIndex.map { case (s, i) =>
      withOps(s, retires(i))
    } :+ withOps(changed, retires(3))
    val times = batches.zipWithIndex.map { case (b, i) =>
      time { handler(b, i.toLong) }
    }
    val ts = times.map(t => f"$t%.2f").mkString(",")
    println(f"$dir batchCap=$batchCap build=$tBuild%.2f " +
      s"apply=[$ts] (last batch = all-changed docs)")
    spark.stop()
  }
}
