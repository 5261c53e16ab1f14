package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}

/** Scalable global prefix-scan: "running min over everything strictly
  * BEFORE this row in a global sort order" — the skyline/frontier
  * primitive (D11), same family as [[GlobalRank]].
  *
  * `min(v) OVER (ORDER BY … ROWS UNBOUNDED PRECEDING TO -1)` — the naive
  * formulation — plans an empty-key window: the ENTIRE input funnels
  * through one task. This operator instead range-partitions on the sort
  * key (each partition owns a contiguous key interval), scans each
  * partition imperatively, and stitches partitions with a per-partition
  * carry-in: job 1 collects one min per partition (|partitions| rows,
  * driver-bounded), a driver prefix fold turns them into carry-ins, and
  * job 2 emits every row with `carry-in ⊕ local running min`. Both jobs
  * re-read the materialized range-shuffle output, so the source is
  * scanned once; no serial stage anywhere.
  */
object PrefixScan {

  /** `df` plus a nullable `outCol` holding the minimum of `valueCol` over
    * all rows strictly before this one in global `sortCols` order (null
    * for the first row / when no preceding non-null value exists). The
    * value type must be `Comparable` (timestamps, decimals, numerics,
    * strings all qualify); null values are skipped by the min. For exact
    * "strictly before" semantics the sort must be a total order on the
    * rows the caller distinguishes (the pareto query guarantees this by
    * pre-aggregating to one row per distinct key). */
  def withMinBefore(df: DataFrame, outCol: String, valueCol: String,
      sortCols: Column*): DataFrame = {
    val spark = df.sparkSession
    val vi = df.schema.fieldIndex(valueCol)
    def lt(a: AnyRef, b: AnyRef): Boolean =
      a.asInstanceOf[Comparable[AnyRef]].compareTo(b) < 0
    val rdd = df.repartitionByRange(sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .rdd
    val partMins: Array[AnyRef] = rdd.mapPartitionsWithIndex { (pid, it) =>
      var mn: AnyRef = null
      it.foreach { r =>
        val v = r.get(vi).asInstanceOf[AnyRef]
        if (v != null && (mn == null || lt(v, mn))) mn = v
      }
      Iterator.single((pid, mn))
    }.collect().sortBy(_._1).map(_._2)
    val carry = new Array[AnyRef](partMins.length)
    var acc: AnyRef = null
    var p = 0
    while (p < partMins.length) {
      carry(p) = acc
      val v = partMins(p)
      if (v != null && (acc == null || lt(v, acc))) acc = v
      p += 1
    }
    // the carry rides in the task closure, NOT an explicit broadcast: Spark
    // ships each stage's closure as one auto-managed broadcast (cleaned by
    // ContextCleaner with the RDD), so an explicit sc.broadcast here would
    // only add a driver/executor block that leaks until session end unless
    // every caller materializes-then-unpersists. carry is |partitions|
    // scalars — closure-sized by construction.
    val schema = org.apache.spark.sql.types.StructType(
      df.schema.fields :+ org.apache.spark.sql.types.StructField(
        outCol, df.schema.fields(vi).dataType, nullable = true))
    val out = rdd.mapPartitionsWithIndex { (pid, it) =>
      var mn: AnyRef = if (pid < carry.length) carry(pid) else null
      it.map { r =>
        val before = mn
        val v = r.get(vi).asInstanceOf[AnyRef]
        if (v != null && (mn == null || lt(v, mn))) mn = v
        Row.fromSeq(r.toSeq :+ before)
      }
    }
    spark.createDataFrame(out, schema)
  }
}
