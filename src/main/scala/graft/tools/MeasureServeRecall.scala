package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off calibration runner for the `i3_ivf_serve_gate` floor: rank-1
  * recall of [[graft.llm.Similarity.ivfServe]] vs exact
  * [[graft.llm.Similarity.batchTopK]] on the fixed 64-query batch split,
  * per sf dir. Not part of the battery; results recorded in LlmOps'
  * floor-table scaladoc. */
object MeasureServeRecall {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Seq("sf0.001", "sf0.01", "sf0.1").foreach { sf =>
      val d = s"/root/testdata/$sf"
      val e = graft.queries.Tables.embeddings(spark, d)
      val q = e.filter(col("vec_id") < 64)
      val c = e.filter(col("vec_id") >= 64)
      val exact1 = graft.llm.Similarity
        .batchTopK(q, c, "vec_id", "embedding", k = 5)
        .filter(col("rank") === 1).select(col("query_id"), col("neighbor_id"))
      val ann = graft.llm.Similarity
        .ivfServe(q, c, "vec_id", "embedding", k = 5)
        .select(col("query_id"), col("neighbor_id"))
      val annPq = graft.llm.Similarity
        .ivfPqServe(q, c, "vec_id", "embedding", k = 5)
        .select(col("query_id"), col("neighbor_id"))
      val n = exact1.count()
      val hits = exact1.join(ann, Seq("query_id", "neighbor_id"), "left_semi").count()
      val hitsPq = exact1.join(annPq, Seq("query_id", "neighbor_id"), "left_semi").count()
      println(f"$sf: n=$n ivf_recall=${hits.toDouble / n}%.3f ivfpq_recall=${hitsPq.toDouble / n}%.3f")
    }
    spark.stop()
  }
}
