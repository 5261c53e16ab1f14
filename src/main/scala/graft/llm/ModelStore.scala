package graft.llm

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Parquet persistence for trained curation models (EXT adjunct to I5):
  * a pipeline fits ONCE (an expensive corpus pass) and scores many later
  * runs — possibly on a different cluster — so the artifacts must
  * round-trip exactly. Both models are exact-integer, so persistence is
  * lossless by construction: a reloaded model scores bit-identically
  * (ModelStoreSpec pins it).
  *
  * Layout: one parquet per model. LR rows are (bucket, weight) with the
  * intercept at bucket = -1 — reconstruction fails loudly on a missing
  * intercept or bucket gaps rather than mis-indexing. BPE rows are
  * (rank, left, right, count) with a (rank = -1) metadata row carrying
  * `tokens_before`, so the conservation identity stays checkable after
  * reload.
  */
object ModelStore {

  def saveLr(spark: SparkSession, model: LrModel, path: String): Unit = {
    import spark.implicits._
    val rows = model.weights.zipWithIndex
      .map { case (w, i) => (i, w) }.toSeq :+ ((-1, model.intercept))
    rows.toDF("bucket", "weight")
      .repartition(1) // a few thousand longs — one file, not 32 shards
      .write.mode("overwrite").parquet(path)
  }

  def loadLr(spark: SparkSession, path: String): LrModel = {
    val raw = spark.read.parquet(path)
      .select(col("bucket").cast("int"), col("weight").cast("long"))
      .collect().map(r => r.getInt(0) -> r.getLong(1))
    val rows = raw.toMap
    // duplicate bucket rows would otherwise collapse last-write-wins in
    // collect order AND shift the inferred bucket count — fail loudly
    require(rows.size == raw.length,
      s"LR model at $path has duplicate bucket rows " +
        s"(${raw.length} rows, ${rows.size} distinct buckets)")
    require(rows.contains(-1), s"LR model at $path has no intercept row")
    val buckets = rows.size - 1
    val w = new Array[Long](buckets)
    (0 until buckets).foreach { i =>
      w(i) = rows.getOrElse(i,
        throw new IllegalArgumentException(
          s"LR model at $path is missing bucket $i of $buckets"))
    }
    LrModel(w, rows(-1))
  }

  def saveBpe(spark: SparkSession, model: Bpe.BpeModel, path: String): Unit = {
    import spark.implicits._
    val rows = model.merges.zip(model.counts).zipWithIndex.map {
      case (((l, r), c), i) => (i, l, r, c)
    } :+ ((-1, null.asInstanceOf[String], null.asInstanceOf[String],
      model.tokensBefore))
    rows.toDF("rank", "left", "right", "count")
      .repartition(1)
      .write.mode("overwrite").parquet(path)
  }

  def loadBpe(spark: SparkSession, path: String): Bpe.BpeModel = {
    val rows = spark.read.parquet(path)
      .select(col("rank").cast("int"), col("left"), col("right"),
        col("count").cast("long"))
      .collect()
    val meta = rows.filter(_.getInt(0) == -1)
    require(meta.length == 1, s"BPE model at $path needs exactly one meta row")
    val merges = rows.filter(_.getInt(0) >= 0).sortBy(_.getInt(0))
    require(merges.map(_.getInt(0)).toSeq == merges.indices,
      s"BPE model at $path has rank gaps")
    Bpe.BpeModel(
      merges.map(r => (r.getString(1), r.getString(2))).toSeq,
      merges.map(_.getLong(3)).toSeq,
      meta.head.getLong(3))
  }
}
