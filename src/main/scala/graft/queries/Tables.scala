package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated TPC-H-ish fixtures (see TESTDATA.md).
  *
  * Plain parquet scans — no eager caching. Predicate pushdown and column
  * pruning reach the parquet reader only when the scan stays a scan, which
  * is the behavior that survives a 100 TB scale-up (an `InMemoryRelation`
  * of the full input would not).
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  /** `ts` has shipped in two layouts across driver data generations:
    * parquet TIMESTAMP(NANOS) (rejected by Spark's vectorized reader — read
    * nanos as long via the legacy conf, truncate to micros like DuckDB
    * does) and plain TIMESTAMP(MICROS) with isAdjustedToUTC=false (inferred
    * as TIMESTAMP_NTZ — cast to session-local TIMESTAMP, identical wall
    * clock under the UTC session this engine pins). Dispatch on the
    * inferred type so both read identically.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = table(s, d, "events")
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Every fixture table under `dir`, by name. */
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Register each table present in `dir` as a session temp view (missing
    * files are skipped, so a corpus-only directory registers just its
    * corpus tables). This is the SQL-only consumer's entry point: with
    * the views registered and `GraftExtensions` on the session, the whole
    * SQL surface — including the custom functions and the recursive
    * closure — runs through `spark.sql` alone. Views stay plain scans
    * (same pushdown rationale as the loaders above); `events` goes
    * through its layout-normalizing reader. Returns the registered
    * names. */
  def registerAll(s: SparkSession, d: String): Seq[String] =
    names.filter { n =>
      val path = new org.apache.hadoop.fs.Path(s"$d/$n.parquet")
      val fs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
      val present = fs.exists(path)
      if (present) {
        val df = if (n == "events") events(s, d) else table(s, d, n)
        df.createOrReplaceTempView(n)
      }
      present
    }
}
