package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** THE order-invariant content-fingerprint kernel, shared by the
  * `i6_table_fingerprint` query and [[graft.sinks.ReleaseSink]] — one
  * definition so a serialization fix can never desynchronize release
  * manifests from the oracle-checked fingerprint query.
  *
  * Row serialization is injective: each column becomes a FIXED-WIDTH
  * md5 of `'v' + value` (null → `'n'`), and the row hash is the md5 of
  * their plain concatenation. Fixed width removes separator ambiguity
  * (`("ab", "c")` vs `("a", "bc")` under a separator
  * scheme), and the `v`/`n` marker keeps SQL NULL distinct from every
  * real value including the string "n" — the two failure modes that
  * made a `concat_ws` fold collide (concat_ws SKIPS nulls entirely).
  *
  * The first 15 hex digits fold into a 60-bit integer (inside BIGINT in
  * every engine) and SUM exactly in decimal(38,0): addition commutes, so
  * the aggregate is invariant to partitioning, task order, and shuffle
  * nondeterminism — no sort at any size. Overflow needs ~10^19 rows.
  */
object Fingerprint {

  /** Per-row 60-bit fold of `cols` as a decimal(20,0) column. */
  def rowFold(cols: Seq[Column]): Column = {
    require(cols.nonEmpty, "fingerprint needs at least one column")
    val fixed = cols.map(c =>
      md5(coalesce(concat(lit("v"), c.cast("string")), lit("n"))))
    conv(substring(md5(concat(fixed: _*)), 1, 15), 16, 10)
      .cast("decimal(20,0)")
  }

  /** Exact commutative sum of [[rowFold]] values, rendered as a string
    * (decimal(38,0) has no engine-portable binary form). */
  def sumFold(fold: Column): Column =
    sum(fold.cast("decimal(38,0)")).cast("string")

  /** The matching DuckDB SQL for [[rowFold]] — `cols` are SQL
    * expressions. Kept next to the Spark definition for the same
    * no-desync reason. */
  def rowFoldSql(cols: Seq[String]): String = {
    val fixed = cols
      .map(c => s"md5(COALESCE('v' || CAST($c AS VARCHAR), 'n'))")
      .mkString(" || ")
    s"""list_reduce(
       | [CAST(CASE WHEN ascii(substr(md5($fixed), i, 1)) < 58
       |   THEN ascii(substr(md5($fixed), i, 1)) - 48
       |   ELSE ascii(substr(md5($fixed), i, 1)) - 87 END AS BIGINT)
       |  for i in range(1, 16)],
       | (acc, x) -> acc * 16 + x)""".stripMargin
  }
}
