package graft.sinks

import org.apache.spark.sql.DataFrame

/** Bucketed storage layout (D1/D3's co-location path at scale).
  *
  * A join or aggregation on a bucketed key reads data already hash-
  * partitioned on disk, so Catalyst plans it WITHOUT a shuffle: at 100 TB
  * the dominant cost of a fact-fact join is the exchange of both sides,
  * and pre-bucketing the stored tables on their join keys (same bucket
  * count both sides) removes it from every downstream query — pay one
  * shuffle at write time, amortized across all reads. `sortBy` inside the
  * bucket additionally lets sort-merge join skip its per-task sort.
  *
  * BucketingSpec proves the contract on the physical plan: a same-key
  * equi-join of two tables written through [[writeBucketed]] contains no
  * ShuffleExchange, and per-key aggregation on the bucket key plans
  * shuffle-free.
  */
object Bucketing {

  /** Write `df` as a catalog table hash-bucketed (and bucket-sorted) on
    * `key`. Bucket count is the lever to size per-task work: pick
    * `buckets` so one bucket of the LARGEST co-bucketed table fits an
    * executor core's memory at target scale. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit = {
    clearOrphan(df, table)
    df.write
      .format("parquet") // managed: lives under spark.sql.warehouse.dir
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .saveAsTable(table)
  }

  /** Append to a table written by [[writeBucketed]] with the SAME key and
    * bucket count — the incremental-state write path: each appended batch
    * adds one bucketed file set, so downstream same-key joins stay
    * exchange-free while writes stay proportional to the BATCH, not the
    * table (the LSM-style alternative to rewriting corpus-sized state per
    * increment; compact occasionally via a fresh [[writeBucketed]]). */
  def appendBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit = {
    require(df.sparkSession.catalog.tableExists(table),
      s"appendBucketed: table '$table' must be created by writeBucketed first")
    df.write
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("append")
      .saveAsTable(table)
  }

  /** Overwrite a SMALL unbucketed catalog table (per-source stats,
    * tombstone id lists — state whose size is bounded by metadata, not
    * data). Same orphan-directory discipline as [[writeBucketed]]. */
  def writeSmallTable(df: DataFrame, table: String): Unit = {
    clearOrphan(df, table)
    df.write.format("parquet").mode("overwrite").saveAsTable(table)
  }

  /** Create-or-overwrite exactly the partitions present in `df` of a
    * `partCol`-partitioned catalog table — the IDEMPOTENT per-batch sink:
    * re-writing the same batch replaces its partition instead of
    * double-appending, so a streaming `foreachBatch` writer that re-runs a
    * batch after restart (Spark commits its checkpoint AFTER the batch
    * function returns, so the last batch always re-runs) converges to
    * exactly-once output. Dynamic partition overwrite is the write-side
    * option, honored per-write — untouched partitions stay. */
  def overwritePartition(df: DataFrame, table: String,
      partCol: String): Unit = {
    val spark = df.sparkSession
    if (!spark.catalog.tableExists(table)) {
      clearOrphan(df, table)
      df.write.format("parquet").partitionBy(partCol)
        .mode("overwrite").saveAsTable(table)
    } else {
      // insertInto matches columns BY POSITION (partition column last in
      // a partitioned table's schema) — reorder to the table's layout.
      // Dynamic mode must be set on the SESSION conf: the per-write
      // option is not honored on this path and a static overwrite with
      // no partition spec truncates the whole table.
      import org.apache.spark.sql.functions.col
      val key = "spark.sql.sources.partitionOverwriteMode"
      val prev = spark.conf.get(key)
      spark.conf.set(key, "dynamic")
      try df.select(spark.table(table).columns.map(col).toIndexedSeq: _*)
        .write.format("parquet").mode("overwrite").insertInto(table)
      finally spark.conf.set(key, prev)
    }
  }

  /** Clear a stale managed directory for `table` when the catalog has no
    * entry. An in-memory catalog forgets tables across sessions but their
    * managed directories survive; saveAsTable refuses to adopt an orphan
    * location, so clear it when the catalog has no entry (a CATALOGED
    * table is left for mode(overwrite) to replace atomically). This
    * assumes ONE live session owns the warehouse dir — with a shared
    * warehouse another session's cataloged table looks like an orphan
    * here; callers sharing a warehouse must pre-create the catalog entry.
    * Unqualified names only: the managed location is derived as
    * <warehouse>/<name> — a qualified db.table name would resolve to the
    * wrong directory (<wh>/<db>.db/<table>) and the delete could hit
    * another table's data. */
  private def clearOrphan(df: DataFrame, table: String): Unit = {
    val spark = df.sparkSession
    require(!table.contains("."),
      s"bucketing sink: unqualified table name required, got '$table'")
    if (!spark.catalog.tableExists(table)) {
      val wh = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
      val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(wh)) fs.delete(wh, true)
    }
  }
}
