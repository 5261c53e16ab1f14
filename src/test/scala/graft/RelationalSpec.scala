package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.queries.Relational

/** Edge-semantics pins for the D-group reshaping/session operators — the
  * cases the sf0.01 oracle data may not exercise but the oracle SQL's
  * formulation assumes. */
class RelationalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("sessionize: boundary gaps merge, strictly-greater gaps split") {
    // Spark merges TOUCHING session windows: an event at exactly
    // last + gap still joins the session; only a strictly greater gap
    // splits. The DuckDB oracle's island formulation must therefore flag
    // a new session on ts > prev + gap (NOT >=) — this pin caught it.
    val events = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1.0),
      (1L, ts("2024-01-01 00:59:59.999999"), 1.0), // < gap → merges
      (1L, ts("2024-01-01 01:59:59.999999"), 1.0), // chain extends
      (2L, ts("2024-01-01 00:00:00"), 1.0),
      (2L, ts("2024-01-01 01:00:00"), 1.0), // exactly gap → still merges
      (2L, ts("2024-01-01 02:00:00.000001"), 1.0) // 1µs past gap → NEW
    ).toDF("user_id", "ts", "value")
    val out = Relational.sessionize(events, "1 hour")
      .select(col("user_id"), col("n_events")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toList.sorted
    assert(out == List((1L, 3L), (2L, 1L), (2L, 2L)))
  }

  test("pivotCounts: absent combos come back 0, matching COUNT FILTER") {
    val events = Seq(
      (0L, "click"), (0L, "click"), (0L, "view"),
      (1L, "view") // bucket 1 has no clicks at all
    ).toDF("user_id", "event_type")
    val out = Relational.pivotCounts(events,
      col("user_id").as("user_bucket"), "event_type", Seq("click", "view"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out == Map(0L -> ((2L, 1L)), 1L -> ((0L, 1L))))
  }

  test("unpivot inverts pivotCounts: round-trip recovers the long form with explicit zeros") {
    val events = Seq(
      (0L, "click"), (0L, "click"), (0L, "view"),
      (1L, "view") // bucket 1 has no clicks — pivot zero must survive
    ).toDF("user_id", "event_type")
    val types = Seq("click", "view")
    val wide = Relational.pivotCounts(events,
      col("user_id").as("user_bucket"), "event_type", types)
    val long = wide.unpivot(Array(col("user_bucket")),
      types.map(col).toArray, "event_type", "n")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toList.sorted
    assert(long == List((0L, "click", 2L), (0L, "view", 1L),
      (1L, "click", 0L), (1L, "view", 1L)))
  }

  test("window ntile/percent_rank: single-row partition yields 0.0 ranks") {
    // min orders-per-customer in the fixture is 1 — the oracle relies on
    // both engines defining percent_rank = 0 (not NULL/NaN) when n = 1
    val one = Seq((10L, 5L, 100.0)).toDF("o_orderkey", "o_custkey", "o_totalprice")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val r = one.select(
      ntile(4).over(w).as("q"),
      percent_rank().over(w).as("pr"),
      cume_dist().over(w).as("cd")).head()
    assert(r.getInt(0) == 1 && r.getDouble(1) == 0.0 && r.getDouble(2) == 1.0)
  }

  test("funnel: simultaneous purchase converts; earlier purchase does not") {
    // micro-tie: purchase at the SAME microsecond as the click must count
    // (RANGE frame includes ties regardless of row order); a purchase
    // strictly before the click never counts; exactly +1h counts (<=)
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), "click"),
      (1L, ts("2024-01-01 10:00:00"), "purchase"), // same instant → converts
      (2L, ts("2024-01-01 09:59:59"), "purchase"), // before the click
      (2L, ts("2024-01-01 10:00:00"), "click"), //    → no conversion
      (3L, ts("2024-01-01 10:00:00"), "click"),
      (3L, ts("2024-01-01 11:00:00"), "purchase"), // exactly 1h → converts
      (4L, ts("2024-01-01 10:00:00"), "click"),
      (4L, ts("2024-01-01 11:00:00.000001"), "purchase") // 1h+1µs → no
    ).toDF("user_id", "ts", "event_type")
    val out = Relational.funnelCounts(ev).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toList == List(("2024-01-01", 4L, 2L, 2L)))
  }

  test("retention cohorts: day-0 row counts every user once") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-03 10:00:00")),
      (2L, ts("2024-01-01 23:59:59")), (2L, ts("2024-01-02 00:00:01")),
      (3L, ts("2024-01-02 12:00:00"))
    ).toDF("user_id", "ts").withColumn("event_type", lit("view"))
      .withColumn("event_id", monotonically_increasing_id())
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
    val out = Relational.retentionFrom(ev).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(out == Set(
      ("2024-01-01", 0, 2L), ("2024-01-01", 1, 1L), ("2024-01-01", 2, 1L),
      ("2024-01-02", 0, 1L)))
  }

  private val sf = "/root/testdata/sf0.001"

  test("SQL-surface WITH RECURSIVE closure equals the grouped-walk operator") {
    // two independent engine paths over the same tree: the UnionLoop
    // recursion (spark.sql WITH RECURSIVE) and the library's one-shuffle
    // grouped walk — their (ancestor, descendant, depth) sets must agree
    // exactly, and depth must span past the trivial first level
    val viaSql = Relational.closureRecursiveSql(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val viaOp = Relational.closureTree(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(viaSql.nonEmpty)
    assert(viaSql == viaOp)
    assert(viaSql.map(_._3).max >= 3, "fixture tree should recurse ≥ 3 deep")
  }

  test("recursive-SQL path/bound_by rows agree with the closure operator") {
    // independent recompute: derive every probe verdict from the LIBRARY
    // operator's full closure (a different engine path than the UnionLoop
    // the queries run), and require exact per-user agreement
    val closure = Relational.closureTree(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val reach = closure.map(c => (c._1, c._2)).toSet
    val probes = spark.sql(
      s"""SELECT user_id,
         | MAX(CASE WHEN rn = 1 THEN event_id END) AS root_id,
         | MAX(CASE WHEN rn = 2 THEN event_id END) AS mid_id,
         | MAX_BY(event_id, rn) AS leaf_id
         |FROM (SELECT event_id, user_id, ROW_NUMBER() OVER (
         |   PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS rn
         |  FROM parquet.`$sf/events.parquet`)
         |GROUP BY user_id HAVING MAX(rn) >= 3""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(probes.nonEmpty)
    val expectedPath = probes.map { case (u, root, mid, leaf) =>
      (u, reach((root, mid)) && reach((mid, leaf)), reach((leaf, mid)))
    }.toSet
    val gotPath = Relational.pathRecursiveSql(spark, sf).collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2))).toSet
    assert(gotPath == expectedPath)
    assert(gotPath.exists(_._2) , "some probe path should hold")
    assert(gotPath.forall(!_._3), "reversed walks must all be rejected")

    val bySrc = closure.groupBy(_._1)
    val expectedBound = probes.map { case (u, _, mid, _) =>
      val under = bySrc.getOrElse(mid, Array.empty[(Long, Long, Int)])
      (u, under.length + 1L, if (under.isEmpty) 0 else under.map(_._3).max)
    }.toSet
    val gotBound = Relational.boundByRecursiveSql(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(gotBound == expectedBound)
    assert(gotBound.exists(_._3 >= 2), "some bounded subtree should be ≥2 deep")
  }

  test("registerAll exposes the fixture tables to pure-SQL consumers") {
    val registered = graft.queries.Tables.registerAll(spark, sf)
    assert(registered.toSet == graft.queries.Tables.names.toSet)
    // a pure spark.sql query over the views matches the DataFrame API
    val viaSql = spark.sql(
      """SELECT n_name, COUNT(*) AS n FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val viaApi = graft.queries.Tables.customer(spark, sf)
      .join(graft.queries.Tables.nation(spark, sf),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaSql == viaApi && viaSql.nonEmpty)
    // the events view carries the normalized timestamp layout
    assert(spark.sql("SELECT ts FROM events LIMIT 1").schema("ts")
      .dataType.typeName == "timestamp")
    // a directory with only some tables registers just those
    val partial = java.nio.file.Files.createTempDirectory("graft-partial").toString
    graft.queries.Tables.documents(spark, sf)
      .write.mode("overwrite").parquet(partial + "/documents.parquet")
    assert(graft.queries.Tables.registerAll(spark, partial) == Seq("documents"))
    // restore the full views for any later test in this session
    graft.queries.Tables.registerAll(spark, sf)
  }

  test("D17 variant_get path agrees with a get_json_object recompute") {
    // two independent semi-structured access paths: VARIANT (parse once,
    // binary probes) vs per-field string re-parse — identical results
    val viaVariant = Relational.variantShred(spark, sf).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toMap
    val viaString = graft.queries.Tables.events(spark, sf)
      .select(get_json_object(col("props"), "$.k").cast("int").as("k"),
        col("value"))
      .groupBy((col("k") % 10).as("k_mod"))
      .agg(count(lit(1)).as("n"), sum(col("k").cast("long")).as("k_sum"),
        min(col("value")).as("v_min"), max(col("value")).as("v_max"))
      .collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toMap
    assert(viaVariant == viaString && viaVariant.nonEmpty)
  }

  test("HLL registers match a driver-side md5 recompute and estimate well") {
    val got = Relational.hllRegisters(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap
    // independent recompute: JDK MessageDigest over the raw column
    val raw = graft.queries.Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_partkey")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val md = java.security.MessageDigest.getInstance("MD5")
    def hexOf(v: Long): String = {
      md.reset()
      md.digest(v.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    val expect = scala.collection.mutable.Map.empty[(String, Long), Int]
    val exactDistinct = scala.collection.mutable.Map
      .empty[String, scala.collection.mutable.Set[Long]]
    for ((flag, pk) <- raw) {
      val hex = hexOf(pk)
      val h1 = java.lang.Long.parseLong(hex.substring(0, 8), 16)
      val w = java.lang.Long.parseLong(hex.substring(8, 16), 16)
      val rho = if (w == 0) 33 else 33 - (64 - java.lang.Long.numberOfLeadingZeros(w))
      val k = (flag, h1 % 256)
      expect(k) = math.max(expect.getOrElse(k, 0), rho)
      exactDistinct.getOrElseUpdate(flag, scala.collection.mutable.Set.empty) += pk
    }
    assert(got == expect.toMap)
    // fold THESE registers through the standard estimator: within 3σ of
    // the exact distinct count (rsd = 1.04/√256 ≈ 6.5% → 19.5%)
    for ((flag, pks) <- exactDistinct) {
      val regs = new Array[Byte](256)
      got.foreach { case ((f, b), r) => if (f == flag) regs(b.toInt) = r.toByte }
      var sum = 0.0; var zeros = 0
      regs.foreach { r => sum += math.pow(2.0, -r.toDouble); if (r == 0) zeros += 1 }
      val alpha = 0.7213 / (1 + 1.079 / 256)
      val e = alpha * 256.0 * 256.0 / sum
      val est = if (e <= 2.5 * 256 && zeros > 0) 256 * math.log(256.0 / zeros) else e
      val exact = pks.size.toDouble
      assert(math.abs(est - exact) / exact < 0.195,
        s"$flag: est $est vs exact $exact")
    }
  }

  test("percentiles match a brute-force sorted-array interpolation") {
    val got = Relational.percentiles(spark, sf).collect()
      .map(r => r.getString(0) -> Seq(r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toMap
    val raw = graft.queries.Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_extendedprice")).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sorted }
    def q(xs: Seq[Double], p: Double): Double = {
      val pos = p * (xs.length - 1)
      val lo = math.floor(pos).toInt
      val hi = math.ceil(pos).toInt
      val v = xs(lo) + (pos - lo) * (xs(hi) - xs(lo))
      BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    for ((k, xs) <- raw)
      assert(got(k) == Seq(0.25, 0.5, 0.75, 0.99).map(q(xs, _)), k)
  }

  test("resample grid is dense per user and forward-fill carries values") {
    val rows = Relational.resampleFfill(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    val hourUs = 3600L * 1000 * 1000
    rows.groupBy(_._1).foreach { case (u, rs) =>
      val sorted = rs.sortBy(_._2)
      // dense hourly grid: every consecutive pair is exactly one hour apart
      assert(sorted.sliding(2).forall {
        case Array(a, b) => b._2 - a._2 == hourUs
        case _           => true
      }, u)
      // first grid point is the user's first observed bucket → never null;
      // thereafter v_filled is the last non-null v
      var carry: Option[Double] = None
      for ((_, _, v, filled) <- sorted) {
        if (v.isDefined) carry = v
        assert(carry.isDefined && filled == carry, u)
      }
    }
  }

  test("interval concurrency matches a per-user brute-force sweep") {
    val got = Relational.intervalConcurrency(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val events = graft.queries.Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts"))).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val win = 5L * 60 * 1000 * 1000
    val expect = events.groupBy(_._1).map { case (u, es) =>
      val bounds = es.flatMap { case (_, t) => Seq((t, 1), (t + win, -1)) }
        .sortBy { case (t, d) => (t, -d) } // starts before ends at ties
      var load = 0; var best = 0
      for ((_, d) <- bounds) { load += d; best = math.max(best, load) }
      u -> best
    }
    assert(got == expect)
  }

  test("count-min estimates stay within the eps bound on every key") {
    val rows = Relational.cmsGate(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getBoolean(2)),
      rows.filterNot(_.getBoolean(2)).mkString(","))
  }
}
