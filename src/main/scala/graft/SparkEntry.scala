package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{CodecOps, GraphOps, LlmOps, Relational, SpanAlgebra, TpchShapes}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps every implemented SURVEY §2 operator to a DataFrame query
  * over the `/root/testdata` fixtures; `oracleSql` holds the DuckDB-runnable
  * equivalent for the driver's hash-compare. Names key into SURVEY §2 rows
  * (d07 = Group D row 7, a7 = Group A row 7, i1 = Group I row 1, ...).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.pricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ LlmOps.queries ++ SpanAlgebra.queries ++
      CodecOps.queries ++ TpchShapes.queries ++ GraphOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ LlmOps.oracles ++ SpanAlgebra.oracles ++
      CodecOps.oracles ++ TpchShapes.oracles ++ GraphOps.oracles
}
