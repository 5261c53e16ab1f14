package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.llm.IncrementalCuration
import graft.llm.IncrementalCuration.StateTables

/** Build/serve split for the v7 INCREMENTAL curation composition
  * ([[graft.llm.IncrementalCuration]]) on a (possibly scale-audit) shard
  * dir. Two measurements, not part of the battery (recorded in
  * BASELINE.md):
  *
  *  1. `serve` — per-increment cost: state built once (timed separately),
  *     then median-of-3 timing of [[IncrementalCuration.processIncrement]]
  *     for a doc_id%10==0 batch, optionally CAPPED to a fixed doc count
  *     (second arg) so corpus scale and batch size vary independently —
  *     the "increment cost tracks increment size, not corpus size" check
  *     runs a FIXED batch against 1× and 16× corpora.
  *  2. `battery-acc` — the persisted-LR gate accuracy on the exact
  *     battery increment (the [[graft.queries.LlmOps.v7SnapshotB]]
  *     derivation), the measured basis for `V7AccFloors`.
  *
  * Usage:
  *   sbt "runMain graft.tools.MeasureV7Serve <sfDir> [batchCap]"
  */
object MeasureV7Serve {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val batchCap = args.lift(1).map(_.toInt)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.driver.memory", "8g")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.queries.{LlmOps, Tables}

    def time[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def median3(f: => Long): Double =
      (1 to 3).map(_ => time(f)).sorted.apply(1)

    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), col("source"))

    // ---- measurement 1: modulo-split corpus/batch, optional fixed cap
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val batchAll = docs.filter(col("doc_id") % 10 === 0)
    val batch = batchCap
      .map(n => batchAll.orderBy(col("doc_id")).limit(n))
      .getOrElse(batchAll)
      .localCheckpoint()
    // retire 1% of the standing corpus so the dead-id anti-join path is
    // on the measured serve, as it is in any real increment
    val retired = corpus.filter(col("doc_id") % 100 === lit(1))
      .select(col("doc_id")).localCheckpoint()
    val st = StateTables("msv7_bands", "msv7_feats", "msv7_doctoks",
      "msv7_srcstats", "msv7_tombstones", "msv7_meta",
      new java.io.File(sys.props("java.io.tmpdir"), "msv7_lr").toString)
    val tBuild = time {
      IncrementalCuration.buildState(corpus, "doc_id", "text", "source", st)
    }
    val state = IncrementalCuration.loadState(spark, st)
    val nBatch = batch.count()
    val tServe = median3 {
      IncrementalCuration.processIncrement(state, batch, retired,
        "doc_id", "text", "source")
        .queryExecution.toRdd.count()
    }
    val verdicts = IncrementalCuration.processIncrement(state, batch,
      retired, "doc_id", "text", "source").localCheckpoint()
    val tUpdate = time {
      IncrementalCuration.updateState(st, state, batch, verdicts, retired,
        "doc_id", "text", "source")
    }

    // ---- measurement 2: gate accuracy on the BATTERY increment
    val b = LlmOps.v7SnapshotB(docs)
    val diff = graft.llm.Snapshots.diff(docs, b, "doc_id", "text")
    val inc = b.join(
      diff.filter(col("change_type").isin("added", "changed")), Seq("doc_id"))
    val label = (size(split(trim(col("text")), " +")) >= 50)
    // the battery fits on the FULL snapshot A (not the modulo corpus), so
    // measure the gate with exactly that model
    val batteryModel = graft.llm.QualityClassifier.fit(
      docs, "text", label.cast("int"), iters = 200, trainPct = 80)
    val acc = graft.llm.QualityClassifier
      .score(inc, "text", batteryModel)
      .agg((sum(when(col("pred") === label, 1L).otherwise(0L))
        .cast("double") / count(lit(1)).cast("double")).as("acc"),
        count(lit(1)).as("n"))
      .head()

    println(f"$dir batch=$nBatch%d build=$tBuild%.2f serve=$tServe%.2f " +
      f"update=$tUpdate%.2f | battery_inc_n=${acc.getLong(1)}%d " +
      f"battery_gate_acc=${acc.getDouble(0)}%.4f")
    spark.stop()
  }
}
