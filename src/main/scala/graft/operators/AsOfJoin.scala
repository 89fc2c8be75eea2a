package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic as-of join (SURVEY J9 generalized to two tables): for every
  * left row, the latest right row with `rightTime <= leftTime` within
  * the same key group — the standard event/state alignment operator
  * Spark has no native form of (DuckDB spells it ASOF JOIN, which is
  * exactly what the oracle uses).
  *
  * Composition, not a custom physical operator (SURVEY §4 decision):
  * tag both sides, UNION, then one window pass per key ordered by
  * (time, side) carrying the last-seen right payload —
  * `last(col, ignoreNulls = true)` over an unbounded-preceding frame.
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

    // common shape: keys ++ time ++ side ++ left payload ++ right payload
    val l = left
      .withColumn("_t", col(leftTime))
      .withColumn("_side", lit(1))
    val lAligned = payload.foldLeft(l)((df, c) =>
      df.withColumn(s"_r_$c", lit(null).cast(right.schema(c).dataType)))

    var r = right
      .withColumn("_t", col(rightTime))
      .withColumn("_side", lit(0))
    for (c <- payload) r = r.withColumn(s"_r_$c", col(c))
    for (c <- leftCols if !keys.contains(c)) r = r.withColumn(c, lit(null))
    val rAligned = r.select(lAligned.columns.map(col): _*)

    val w = Window.partitionBy(keyCols: _*)
      .orderBy(col("_t").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val attached = payload.foldLeft(lAligned.unionByName(rAligned)) {
      (df, c) => df.withColumn(s"_asof_$c", last(col(s"_r_$c"), ignoreNulls = true).over(w))
    }

    attached
      .filter(col("_side") === 1)
      .select(leftCols.map(col) ++ payload.map(c => col(s"_asof_$c").as(s"asof_$c")): _*)
  }
}
