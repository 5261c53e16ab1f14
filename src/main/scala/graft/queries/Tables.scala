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
}
