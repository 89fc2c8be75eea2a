package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Generic bucketed range join (SURVEY J7 generalized): pairs
  * (l, r) sharing `keys` with `r.time ∈ [l.time, l.time + window]` —
  * a CLOSED interval on both ends (DuckDB `BETWEEN` semantics, which is
  * what the j7 oracle states).
  *
  * The equi-join key is (keys..., TIME BUCKET of width `window`): every
  * match for a left row in bucket b lies in buckets {b, b+1}, so the
  * left side probes two bucket keys and the range predicate is a
  * residual on a plain hash join. Work per task is bounded by per-key
  * activity within one bucket width — a hot key cannot produce one
  * quadratic task, which raw (keys)-only joining would at 100 TB.
  *
  * Output columns: all of `left` then `right` MINUS the right-side
  * copies of `keys` (equal to the left copies by the join condition,
  * so dropping them costs nothing and keeps unqualified key references
  * unambiguous downstream). The right time column is kept — it differs
  * from the left one; qualify through the `l`/`r` aliases if the names
  * collide.
  */
object RangeJoin {

  /** @param windowMicros range width AND bucket width, µs. `leftTime`/
    *                     `rightTime` must be TimestampType columns. */
  def bucketed(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      windowMicros: Long,
      extraCondition: Column = lit(true)): DataFrame = {
    val l = left
      .withColumn("_b", (unix_micros(col(leftTime)) / windowMicros).cast("long"))
      .withColumn("_probe", explode(array(col("_b"), col("_b") + 1)))
      .as("l")
    val r = right
      .withColumn("_rb", (unix_micros(col(rightTime)) / windowMicros).cast("long"))
      .as("r")
    val keyCond = keys.map(k => col(s"l.$k") === col(s"r.$k")).reduce(_ && _)
    val joined = l.join(r,
        keyCond &&
          col("l._probe") === col("r._rb") &&
          col(s"r.$rightTime") >= col(s"l.$leftTime") &&
          col(s"r.$rightTime") <= col(s"l.$leftTime") + expr(s"INTERVAL $windowMicros MICROSECONDS") &&
          extraCondition)
      .drop("_b", "_probe", "_rb")
    keys.foldLeft(joined)((df, k) => df.drop(col(s"r.$k")))
  }
}
