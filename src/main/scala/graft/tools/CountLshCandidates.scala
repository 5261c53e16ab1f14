package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off adjudication probe for the session-14 LSH 16→64× segment:
  * counts the md5-MinHash-LSH candidate pairs (the `lshcand` set behind
  * `i2_canonical_keep_lsh` / `i6_curation_v6` / `i2_sig_verified_pairs`)
  * per scale-audit shard dir, so BASELINE.md can report seconds per
  * MILLION candidates alongside raw seconds — separating "the generator
  * got slower" from "the fixture manufactured more candidates". Usage:
  *   sbt "runMain graft.tools.CountLshCandidates dir1 dir2 ..."
  */
object CountLshCandidates {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.driver.memory", "16g")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { dir =>
      val docs = graft.queries.Tables.documents(spark, dir)
      val n = graft.llm.Dedup.minHashCandidates(
        docs, "doc_id", "text", hashFamily = "md5").count()
      println(s"$dir candidates=$n")
    }
    spark.stop()
  }
}
