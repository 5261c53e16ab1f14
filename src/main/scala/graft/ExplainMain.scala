package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit utility: prints the executed physical plan of each named
  * `SparkEntry` query (all of them when no args), for checking pushdown,
  * partial aggregation, broadcast choices, and codegen coverage. The
  * session config mirrors `Verify`'s (same excluded rules, timezone) so
  * the printed plan IS the plan the driver gate executes.
  *
  * Caveat: "printing the plan" still CONSTRUCTS each DataFrame, and a few
  * queries (the connected-components / span-walk ones) run eager
  * `localCheckpoint` jobs during construction — auditing those costs
  * their fixpoint runtime. `SPARK_GRAFT_SF_DIR` overrides the fixture dir.
  *
  *   sbt "runMain graft.ExplainMain i5_salient_terms d10_session_windows"
  */
object ExplainMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
      val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
      for (n <- names) {
        println(s"===== $n")
        SparkEntry.queries.get(n) match {
          case None => println(s"(unknown query: $n)")
          case Some(fn) =>
            try println(fn(spark, d).queryExecution.executedPlan.toString
              .linesIterator.map(_.take(160)).mkString("\n"))
            catch { case scala.util.control.NonFatal(e) =>
              println(s"(failed to plan: ${e.getMessage})")
            }
        }
      }
    } finally spark.stop()
  }
}
