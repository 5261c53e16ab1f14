package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the latest right row with the same
  * key and right.time <= left.time (SURVEY §2 D6; nearest reference analogue
  * is the last-write-wins reader at
  * `composable_logs/task_opentelemetry_logging.py:63-87`).
  *
  * Implementation is the scalable union+window trick, not a per-key loop or a
  * broadcast of the right side: tag both inputs, union them, and carry the
  * last right-side payload forward with `last(..., ignoreNulls=true)` over a
  * (key, time)-ordered window. One shuffle on the key, no join explosion, and
  * skew behaves like any other window (AQE-splittable). This is how the
  * operation stays linear at 100 TB.
  */
object AsOfJoin {

  /** @param left      probe side
    * @param right     reference side (its latest-at-or-before row is wanted)
    * @param key       equi-key column name present in both
    * @param leftTime  event-time column on left
    * @param rightTime event-time column on right
    * @param payload   right-side columns to carry (renamed `asof_<name>`)
    */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      payload: Seq[String]): DataFrame = {
    val leftCols = left.columns
    val payloadStruct = struct(payload.map(col): _*)

    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .withColumn("__payload", lit(null).cast(
        right.select(payloadStruct).schema.head.dataType))
    val r = right.select(
      col(key),
      col(rightTime).as("__t"),
      lit(0).as("__side"),
      payloadStruct.as("__payload"))

    val unioned = l.select(
      (Seq(col(key), col("__t"), col("__side"), col("__payload")) ++
        leftCols.filterNot(_ == key).map(c => col(c))): _*)
      .unionByName(r.select(
        (Seq(col(key), col("__t"), col("__side"), col("__payload")) ++
          leftCols.filterNot(_ == key).map(c =>
            lit(null).cast(left.schema(c).dataType).as(c))): _*))

    // Right rows sort before left rows at equal time (__side asc) so a right
    // row at exactly left.time is visible to that left row; the payload
    // struct is the final tie-break so ties among right rows at the same
    // timestamp resolve deterministically (to the max payload — the same
    // pick as an ORDER BY time DESC, id DESC LIMIT 1 oracle).
    val w = Window.partitionBy(col(key))
      .orderBy(col("__t"), col("__side"), col("__payload"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned.withColumn(
      "__last", last(col("__payload"), ignoreNulls = true).over(w))

    val out = carried.filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        payload.map(p => col(s"__last.$p").as(s"asof_$p")): _*)
    out
  }

  /** As-of join with a max-staleness bound — the point-in-time-correct
    * feature join of a training pipeline: a feature row older than
    * `maxStaleness` at the probe's event time must NOT leak in (a model
    * trained on it would see fresher data than serving ever will), so the
    * matched payload is nulled when `left.time − right.time` exceeds the
    * bound. Same single-shuffle union+window plan as [[asOf]] — the
    * match's own timestamp rides inside the carried payload struct and the
    * bound is one scan-level `when` on the way out. */
  def asOfWithin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      payload: Seq[String],
      maxStaleness: Column): DataFrame = {
    val rt = s"__rt_$rightTime"
    val joined = asOf(left, right.withColumn(rt, col(rightTime)),
      key, leftTime, rightTime, payload :+ rt)
    val fresh = col(s"asof_$rt") >= col(leftTime) - maxStaleness
    payload.foldLeft(joined) { (df, p) =>
      df.withColumn(s"asof_$p", when(fresh, col(s"asof_$p")))
    }.drop(s"asof_$rt")
  }
}
