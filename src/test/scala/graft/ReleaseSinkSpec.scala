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

  test("null-column rows do not collide (injective serialization)") {
    // concat_ws would have serialized (null,"x") and ("x",null) identically
    val d1 = Files.createTempDirectory("graft-release-n1").toString
    val d2 = Files.createTempDirectory("graft-release-n2").toString
    val m1 = ReleaseSink.writeRelease(
      Seq((Option.empty[String], Some("x"), "train"))
        .toDF("a", "b", "split"), d1, "split", Seq("a", "b"))
    val m2 = ReleaseSink.writeRelease(
      Seq((Some("x"), Option.empty[String], "train"))
        .toDF("a", "b", "split"), d2, "split", Seq("a", "b"))
    assert(m1("train")._2 != m2("train")._2)
  }

  test("an unvetted extra split on disk fails verification") {
    val dir = Files.createTempDirectory("graft-release-x").toString
    ReleaseSink.writeRelease(df, dir, "split", Seq("doc_id", "text"))
    Seq((99L, "smuggled")).toDF("doc_id", "text")
      .write.parquet(s"$dir/split=extra")
    val verdicts = ReleaseSink.verifyRelease(spark, dir)
    assert(!verdicts("extra"))
    assert(verdicts("train") && verdicts("val") && verdicts("test"))
  }

  test("null split values are rejected before anything is written") {
    val dir = Files.createTempDirectory("graft-release-ns").toString + "/out"
    val bad = Seq((1L, "x", Option.empty[String]), (2L, "y", Some("train")))
      .toDF("doc_id", "text", "split")
    intercept[IllegalArgumentException] {
      ReleaseSink.writeRelease(bad, dir, "split", Seq("doc_id", "text"))
    }
    assert(!Files.exists(Paths.get(dir)))
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
