package graft

import org.apache.spark.sql.SparkSession

/** Per-query profiling harness: like Bench but prints each query's time as
  * it completes (and can run a single query by name). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val only = args.headOption
    val explain = args.contains("--explain")
    if (only.contains("scratch")) {
      import org.apache.spark.sql.functions._
      val docs = queries.Tables.documents(spark, sfDir)
      def time[A](label: String)(f: => A): A = {
        val t0 = System.nanoTime(); val r = f
        println(f"  ${(System.nanoTime() - t0) / 1e9}%7.2f  $label"); r
      }
      time("warmup count")(docs.count())
      val sh = docs.select(col("doc_id").as("doc"),
        llm.Dedup.charShingles(col("text"), 5).as("sh")).repartition(col("doc"))
      time("shingles only")(sh.count())
      val sig = sh.select(col("doc"), llm.Dedup.minHashSignature(col("sh"), 64).as("sig"))
      time("shingles+sig")(sig.count())
      val sigs2 = docs.select(col("doc_id").as("doc"),
        llm.Dedup.minHashSignature(llm.Dedup.charShingles(col("text"), 5), 64).as("sig"))
        .repartition(col("doc"))
      val bands = sigs2.select(col("doc"),
        posexplode(transform(sequence(lit(0), lit(15)),
          j => hash(concat_ws(",", slice(col("sig"), j * 4 + 1, lit(4))), j)))
          .as(Seq("band_idx", "band_hash")))
      time("bands count")(bands.count())
      val other = bands.select(col("doc").as("doc_b"), col("band_idx"), col("band_hash"))
      time("join pre-distinct")(bands.join(other, Seq("band_idx", "band_hash"))
        .filter(col("doc") < col("doc_b")).count())
      time("full candidates 1st")(
        llm.Dedup.minHashCandidates(docs, "doc_id", "text").count())
      time("full candidates 2nd")(
        llm.Dedup.minHashCandidates(docs, "doc_id", "text").count())
      spark.stop(); return
    }
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (only.forall(o => o == "--explain" || name.contains(o))) {
        if (explain) {
          println(s"==== $name")
          fn(spark, sfDir).explain("formatted")
        } else {
          val t0 = System.nanoTime()
          val n = try fn(spark, sfDir).count()
          catch { case e: Throwable => println(s"$name FAILED: ${e.getMessage}"); -1L }
          println(f"${(System.nanoTime() - t0) / 1e9}%8.2f  $name ($n rows)")
          Console.flush()
        }
      }
    }
    spark.stop()
  }
}
