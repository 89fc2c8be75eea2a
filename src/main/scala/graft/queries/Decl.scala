package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared, driver-checkable query (SURVEY.md §2.B).
  *
  * `build` constructs the DataFrame over the fixture dir; `oracle` is the
  * DuckDB-equivalent ANSI SQL over the same parquet tables (None for ops
  * whose result is not SQL-expressible — those get the driver's weaker
  * rows-only check and a dedicated ScalaTest instead).
  *
  * Determinism contract (SURVEY §5): every query ends in a total-order
  * ORDER BY; float aggregates are rounded at the query level on BOTH sides;
  * timestamps leave the query as epoch millis or DATE, never raw
  * TIMESTAMP (Spark µs-instant vs DuckDB ns-naive would drift).
  */
final case class Decl(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Decl {
  /** Declared query with a DuckDB oracle. */
  def apply(name: String, oracle: String)(
      build: (SparkSession, String) => DataFrame): Decl =
    Decl(name, build, Some(oracle))

  /** Declared query with rows-only check (non-SQL-expressible). */
  def rowsOnly(name: String)(build: (SparkSession, String) => DataFrame): Decl =
    Decl(name, build, None)
}
