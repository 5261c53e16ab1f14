package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.llm.{Bpe, ModelStore, QualityClassifier}

/** Model persistence ([[graft.llm.ModelStore]]): exact round-trip and
  * bit-identical scoring after reload. */
class ModelStoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("LR model round-trips and scores bit-identically") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val label = (size(split(trim(col("text")), " +")) >= 50).cast("int")
    val m = QualityClassifier.fit(docs, "text", label, buckets = 256, iters = 30)
    val dir = Files.createTempDirectory("lrmodel").toString + "/m"
    ModelStore.saveLr(spark, m, dir)
    val m2 = ModelStore.loadLr(spark, dir)
    assert(m2.intercept == m.intercept)
    assert(java.util.Arrays.equals(m2.weights, m.weights))
    val a = QualityClassifier.score(docs, "text", m)
      .select(col("doc_id"), col("logit")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = QualityClassifier.score(docs, "text", m2)
      .select(col("doc_id"), col("logit")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
  }

  test("BPE model round-trips with the conservation metadata intact") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val m = Bpe.train(docs, "text", nMerges = 12)
    val dir = Files.createTempDirectory("bpemodel").toString + "/m"
    ModelStore.saveBpe(spark, m, dir)
    val m2 = ModelStore.loadBpe(spark, dir)
    assert(m2.merges == m.merges && m2.counts == m.counts &&
      m2.tokensBefore == m.tokensBefore)
    // the reloaded merges drive the encode kernel identically
    val after = docs.agg(sum(
      graft.functions.BpeExprs.encodeCount(col("text"), m2.merges)))
      .head().getLong(0)
    assert(after == m2.tokensBefore - m2.mergedTotal)
  }

  test("corrupt stores fail loudly") {
    val dir = Files.createTempDirectory("badmodel").toString + "/m"
    Seq((0, 5L), (1, 7L)).toDF("bucket", "weight")
      .write.mode("overwrite").parquet(dir) // no intercept row
    val e = intercept[IllegalArgumentException](ModelStore.loadLr(spark, dir))
    assert(e.getMessage.contains("intercept"))
    val dir2 = Files.createTempDirectory("badmodel2").toString + "/m"
    Seq((0, "a", "b", 3L), (2, "c", "d", 1L), (-1, null, null, 10L))
      .toDF("rank", "left", "right", "count")
      .write.mode("overwrite").parquet(dir2) // rank 1 missing
    val e2 = intercept[IllegalArgumentException](ModelStore.loadBpe(spark, dir2))
    assert(e2.getMessage.contains("rank gaps"))
  }
}
