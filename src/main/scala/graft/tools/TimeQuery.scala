package graft.tools

import org.apache.spark.sql.SparkSession

/** Minimal single-query timer — the adjudication instrument for bench
  * drift: unlike `graft.Bench` (which deliberately warms the FULL battery
  * to measure steady-state), this warms ONLY the named query, so a drift
  * that vanishes here but shows in Bench is harness-state pressure
  * (code cache, GC, broadcast registry) from the grown battery, while a
  * drift that reproduces here is the query's own path.
  *
  * Usage: sbt "runMain graft.tools.TimeQuery <name> <sfDir> [passes]"
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val passes = args.lift(2).map(_.toInt).getOrElse(5)
    // session config mirrors graft.Bench EXACTLY — the adjudication is
    // only valid if the solo number is comparable to the bench tails
    // (the InferFiltersFromGenerate exclusion alone is a >5x swing on
    // generate-heavy rows), so thread count and shuffle partitions come
    // from the SAME env var with the SAME default as Bench
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries(name)
    def once(): Double = {
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    (1 to 2).foreach(_ => once()) // query-only warmup
    val ts = (1 to passes).map(_ => once()).sorted
    println(f"[timequery] $name $dir passes=$passes " +
      f"median=${ts(passes / 2)}%.3f all=${ts.map(t => f"$t%.3f").mkString(",")}")
    spark.stop()
  }
}
