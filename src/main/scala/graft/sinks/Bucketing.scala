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
    val spark = df.sparkSession
    // unqualified names only: the orphan-cleanup path below derives the
    // managed location as <warehouse>/<name> — a qualified db.table name
    // would resolve to the wrong directory (<wh>/<db>.db/<table>) and the
    // delete could hit another table's data
    require(!table.contains("."),
      s"writeBucketed: unqualified table name required, got '$table'")
    // an in-memory catalog forgets tables across sessions but their
    // managed directories survive; saveAsTable refuses to adopt an orphan
    // location, so clear it when the catalog has no entry (a CATALOGED
    // table is left for mode(overwrite) to replace atomically). This
    // assumes ONE live session owns the warehouse dir — with a shared
    // warehouse another session's cataloged table looks like an orphan
    // here; callers sharing a warehouse must pre-create the catalog entry.
    if (!spark.catalog.tableExists(table)) {
      val wh = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
      val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(wh)) fs.delete(wh, true)
    }
    df.write
      .format("parquet") // managed: lives under spark.sql.warehouse.dir
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .saveAsTable(table)
  }
}
