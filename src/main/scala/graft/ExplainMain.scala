package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit utility: prints the executed physical plan of each named
  * `SparkEntry` query (all of them when no args), for checking pushdown,
  * partial aggregation, broadcast choices, and codegen coverage without
  * running the query. `SPARK_GRAFT_SF_DIR` overrides the fixture dir.
  *
  *   sbt "runMain graft.ExplainMain i5_salient_terms d10_session_windows"
  */
object ExplainMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    for (n <- names) {
      println(s"===== $n")
      println(SparkEntry.queries(n)(spark, d).queryExecution.executedPlan.toString
        .linesIterator.map(_.take(160)).mkString("\n"))
    }
    spark.stop()
  }
}
