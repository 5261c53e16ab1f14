package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Checkpoints

/** The supersede-slot lifecycle: release-on-supersede (storage hygiene)
  * and the round-12 generation guard — two concurrent invocations of the
  * same slot must fail LOUDLY on the loser's consumption, with the remedy
  * in the message, instead of surfacing Spark's block-not-found (or, in
  * the worst interleaving, silently reading half-released blocks). */
class CheckpointsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("supersede guard: the superseded invocation fails loudly, the winner serves") {
    // invocation A registers its checkpoint; B re-invokes the SAME slot
    // before A's result was consumed (the concurrent race, serialized
    // here for determinism)
    val cpA = Seq((1L, "a"), (2L, "b")).toDF("id", "v").localCheckpoint()
    val frameA = Checkpoints.supersede(spark, "spec.race.slot", cpA)
    val cpB = Seq((3L, "c")).toDF("id", "v").localCheckpoint()
    val frameB = Checkpoints.supersede(spark, "spec.race.slot", cpB)
    // the loser: every task's guard sees the newer generation BEFORE
    // touching the released blocks
    val e = intercept[Exception] { frameA.count() }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("superseded")),
      s"expected the generation-guard message, got: ${messages(e).mkString(" | ")}")
    // the winner is unaffected, and derived plans keep working
    assert(frameB.count() == 1L)
    assert(frameB.filter(col("id") === 3L).select(col("v")).head().getString(0) == "c")
  }

  test("supersede guard: serial reuse never trips — same frame consumed repeatedly") {
    val cp = Seq((1L, 10L), (2L, 20L)).toDF("k", "n").localCheckpoint()
    val frame = Checkpoints.supersede(spark, "spec.serial.slot", cp)
    // multiple actions on the CURRENT generation all pass (Bench's
    // 3-pass timing shape), including shuffling consumers
    assert(frame.count() == 2L)
    assert(frame.groupBy(col("k")).agg(sum(col("n"))).count() == 2L)
    assert(frame.agg(sum(col("n"))).head().getLong(0) == 30L)
  }
}
