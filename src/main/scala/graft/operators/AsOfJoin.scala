package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** Generic as-of join (SURVEY J9 generalized to two tables): for every
  * left row, the latest right row with `rightTime <= leftTime` within
  * the same key group — the standard event/state alignment operator
  * Spark has no native form of (DuckDB spells it ASOF JOIN, which is
  * exactly what the oracle uses).
  *
  * Composition, not a custom physical operator (SURVEY §4 decision):
  * tag both sides, UNION, then one window pass per key ordered by
  * (time, side) carrying the last-seen right payload. ALL payload
  * columns ride in ONE struct (`last(struct, ignoreNulls = true)`): the
  * struct is non-null exactly for right rows, so (a) every attached
  * value comes from the SAME matched right row, and (b) a right row
  * whose payload column is legitimately NULL attaches that NULL rather
  * than a value scavenged from an older right row — per-column carry
  * gets both of these wrong.
  * Cost: ONE shuffle on the key, one sort — same as a single window
  * query; no range join, no per-key loop. At equal timestamps the right
  * row sorts FIRST, so `rightTime == leftTime` matches (inclusive
  * as-of, DuckDB's `ON l.t >= r.t` semantics).
  *
  * Scale: partitions by the key columns — per-key data volume bounds a
  * task, same envelope as any window op; skewed keys lean on AQE.
  */
object AsOfJoin {

  /** @param left       probe side (each row gets matched)
    * @param right      reference side (rows carry the payload to attach)
    * @param keys       equi-key column names present on both sides
    * @param leftTime   event-time column on `left`
    * @param rightTime  event-time column on `right`
    * @param payload    right-side columns to attach (null when no right
    *                   row at or before the left row's time)
    */
  def apply(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      payload: Seq[String]): DataFrame = {
    val leftCols = left.columns
    val keyCols = keys.map(col)
    val payloadType = StructType(payload.map(c =>
      StructField(c, right.schema(c).dataType, nullable = true)))

    // common shape: keys ++ time ++ side ++ left payload ++ one struct
    // of the right payload (null struct on left rows)
    val lAligned = left
      .withColumn("_t", col(leftTime))
      .withColumn("_side", lit(1))
      .withColumn("_r", lit(null).cast(payloadType))

    var r = right
      .withColumn("_t", col(rightTime))
      .withColumn("_side", lit(0))
      .withColumn("_r", struct(payload.map(col): _*))
    for (c <- leftCols if !keys.contains(c)) r = r.withColumn(c, lit(null))
    val rAligned = r.select(lAligned.columns.map(col): _*)

    val w = Window.partitionBy(keyCols: _*)
      .orderBy(col("_t").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lAligned.unionByName(rAligned)
      .withColumn("_asof", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(leftCols.map(col) ++
        payload.map(c => col(s"_asof.$c").as(s"asof_$c")): _*)
  }
}
