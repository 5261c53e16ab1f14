package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.ZOrder

/** D1-EXT z-order layout ([[graft.operators.ZOrder]]): the interleave
  * kernel against an independent driver recompute, and the layout CLAIM —
  * a z-clustered corpus serves selective predicates on EITHER dimension
  * via parquet min/max stats, where a linear sort serves only its leading
  * column. */
class ZOrderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val sf = "/root/testdata/sf0.001"

  /** Reference Morton interleave, written independently of the column
    * formula (per-bit test-and-set, not mask-shift-or). */
  private def morton(x: Long, y: Long, bits: Int): Long = {
    var z = 0L
    for (i <- 0 until bits) {
      if (((x >> i) & 1L) == 1L) z |= 1L << (2 * i)
      if (((y >> i) & 1L) == 1L) z |= 1L << (2 * i + 1)
    }
    z
  }

  test("zvalue matches a driver Morton recompute over random in-range pairs") {
    import spark.implicits._
    val rnd = new scala.util.Random(4242)
    val pairs = Seq.fill(1000)((rnd.nextInt(1 << 16).toLong,
      rnd.nextInt(1 << 16).toLong)) ++
      Seq((0L, 0L), (65535L, 65535L), (0L, 65535L), (65535L, 0L))
    val got = pairs.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.zvalue(col("x"), col("y"), 16).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (x, y, z) =>
      assert(z == morton(x, y, 16), s"zvalue($x, $y)")
    }
    // the kernel is built-ins only: over a real (non-local) source the
    // projection must stay inside whole-stage codegen (the reason this is
    // not a CodegenFallback UDF); a local Seq would constant-fold away
    val plan = spark.range(2048)
      .select(ZOrder.zvalue(col("id") % 65536,
        (col("id") * 2654435761L) % 65536, 16).as("z"))
      .queryExecution.executedPlan
    val fused = plan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(fused.nonEmpty, plan.toString.take(1000))
  }

  test("zvalueSql mirrors zvalue through SparkSQL parsing of the same snippet") {
    // the DuckDB-side snippet is plain ANSI bit arithmetic — Spark's SQL
    // parser accepts it too, so the two engines' formulas can be pinned
    // equal INSIDE one engine (the oracle run then pins the engines)
    import spark.implicits._
    val rnd = new scala.util.Random(77)
    val df = Seq.fill(500)((rnd.nextInt(1 << 16).toLong,
      rnd.nextInt(1 << 16).toLong)).toDF("x", "y")
    val both = df.select(
      ZOrder.zvalue(col("x"), col("y"), 16).as("a"),
      expr(ZOrder.zvalueSql("x", "y", 16)).as("b"))
    assert(both.filter(col("a") =!= col("b")).count() == 0)
  }

  test("cluster rejects a dimension span that overflows the normalization product") {
    import spark.implicits._
    // span 2^50 at bits=16 exceeds Long.MaxValue/(2^16-1) ≈ 2^47: the
    // (x-lo)*m product would wrap negative and alias distant rows into one
    // cell — the guard must fail loud instead
    val df = Seq((0L, 0L), (1L << 50, 1L)).toDF("x", "y")
    val e = intercept[IllegalArgumentException] {
      ZOrder.cluster(df, 2, col("x"), col("y"), 16)
    }
    assert(e.getMessage.contains("span"))
    // an in-range span still clusters fine
    val ok = Seq((0L, 0L), (1000L, 1000L), (5L, 900L)).toDF("x", "y")
    assert(ZOrder.cluster(ok, 2, col("x"), col("y"), 16).count() == 3)
  }

  test("z-clustered layout skips row groups on BOTH dimensions; linear sort on one") {
    // 100 TB layout design: a corpus queried selectively by user AND by
    // time cannot be linearly sorted to serve both — z-order gives every
    // file a narrow min/max band on each dimension, so parquet stats
    // prune either predicate. Scan-node output rows measure it directly.
    import org.apache.spark.sql.execution.FileSourceScanExec
    // sf0.01: 10k events over 150 users — big enough that a 10% USER
    // RANGE probe appears in every linearly-time-sorted file with
    // near-certainty (a single-user probe can be skipped by luck at
    // ~300 rows/file), small enough to stay a unit test
    val ev = graft.queries.Tables.events(spark, "/root/testdata/sf0.01")
      .select(col("event_id"), col("ts"), col("user_id"), col("value"))
    val total = ev.count()
    val zDir = Files.createTempDirectory("graft-layout-z").toString
    val linDir = Files.createTempDirectory("graft-layout-lin").toString
    val tsTypeKey = "spark.sql.parquet.outputTimestampType"
    val prevTsType = spark.conf.get(tsTypeKey)
    try {
      spark.conf.set(tsTypeKey, "TIMESTAMP_MICROS")
      // 64 files → the top 6 z bits are fixed per file: an 8×8 grid,
      // 8 bands per dimension
      ZOrder.cluster(ev, 64, col("user_id"),
          expr("unix_micros(ts) div 60000000"), 16)
        .write.mode("overwrite").parquet(zDir)
      ev.repartitionByRange(64, col("ts")).sortWithinPartitions(col("ts"))
        .write.mode("overwrite").parquet(linDir)
    } finally spark.conf.set(tsTypeKey, prevTsType)

    val Array(lo, hi) = ev.withColumn("ts_us", unix_micros(col("ts")))
      .stat.approxQuantile("ts_us", Array(0.45, 0.55), 0.0)
    def scanned(dir: String, pred: org.apache.spark.sql.Column): Long = {
      val q = spark.read.parquet(dir).filter(pred)
      q.collect()
      q.queryExecution.executedPlan.collectLeaves()
        .collect { case s: FileSourceScanExec => s }
        .map(_.metrics("numOutputRows").value).sum
    }
    // both probes are ~10% RANGE slices of their dimension
    val userPred = col("user_id") >= 70 && col("user_id") < 85
    val timePred = col("ts") >= timestamp_micros(lit(lo.toLong)) &&
      col("ts") < timestamp_micros(lit(hi.toLong))

    val zUser = scanned(zDir, userPred)
    val zTime = scanned(zDir, timePred)
    val linUser = scanned(linDir, userPred)
    val linTime = scanned(linDir, timePred)

    // linear: serves its sort column, blind on the other
    assert(linTime <= total / 2, s"ts-sorted layout should skip on ts: $linTime of $total")
    assert(linUser >= (total * 9) / 10,
      s"ts-sorted layout cannot skip on user_id: $linUser of $total")
    // z-order: BOTH predicates skip most of the corpus
    assert(zUser <= total / 2, s"z layout should skip on user_id: $zUser of $total")
    assert(zTime <= total / 2, s"z layout should skip on ts: $zTime of $total")
    assert(zUser * 2 <= linUser,
      s"z should beat linear on the non-sort dimension: $zUser vs $linUser")
  }
}
