package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.ReleaseSink

/** Release sink contract: split-partitioned layout, manifest counts and
  * fingerprints, partitioning-invariance of the fingerprint, and drift
  * detection on the verify path. */
class ReleaseSinkSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rows = Seq(
    (1L, "alpha", "train"), (2L, "beta", "train"), (3L, "gamma", "train"),
    (4L, "delta", "val"), (5L, "epsilon", "test"))

  private def df = rows.toDF("doc_id", "text", "split")

  test("writes split partitions + manifest; verify passes on the copy") {
    val dir = Files.createTempDirectory("graft-release").toString
    val manifest = ReleaseSink.writeRelease(df, dir, "split",
      Seq("doc_id", "text"))
    assert(manifest.keySet == Set("train", "val", "test"))
    assert(manifest("train")._1 == 3L && manifest("val")._1 == 1L)
    assert(Files.isDirectory(Paths.get(dir, "split=train")))
    assert(Files.exists(Paths.get(dir, "_MANIFEST.json")))
    assert(ReleaseSink.verifyRelease(spark, dir).values.forall(identity))
  }

  test("fingerprint is partitioning- and order-invariant") {
    val d1 = Files.createTempDirectory("graft-release-a").toString
    val d2 = Files.createTempDirectory("graft-release-b").toString
    val m1 = ReleaseSink.writeRelease(df.repartition(7), d1, "split",
      Seq("doc_id", "text"))
    val m2 = ReleaseSink.writeRelease(
      df.orderBy($"text".desc).coalesce(1), d2, "split", Seq("doc_id", "text"))
    assert(m1 == m2)
  }

  test("verify flags content drift after a partition is tampered with") {
    val dir = Files.createTempDirectory("graft-release-t").toString
    ReleaseSink.writeRelease(df, dir, "split", Seq("doc_id", "text"))
    // tamper: rewrite the val split with changed text, same row count
    Seq((4L, "DELTA-CHANGED")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/split=val")
    val verdicts = ReleaseSink.verifyRelease(spark, dir)
    assert(!verdicts("val"))
    assert(verdicts("train") && verdicts("test"))
  }
}
