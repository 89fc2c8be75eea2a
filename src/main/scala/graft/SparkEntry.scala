package graft

import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every declared-query module contributes its `decls` here; the driver
  * sees `queries` (name → builder) and `oracleSql` (name → DuckDB SQL).
  * A decl without an oracle gets the driver's weaker rows-only check and
  * a dedicated ScalaTest instead.
  */
object SparkEntry {

  /** All declared queries, one Seq per SURVEY §2.B module. */
  def all: Seq[Decl] =
    Flagship.decls ++
      Projections.decls ++
      Joins.decls ++
      Aggregations.decls ++
      Windows.decls ++
      Analytics.decls ++
      SetOps.decls ++
      Dedup.decls ++
      Similarity.decls ++
      Clustering.decls ++
      Decontam.decls ++
      Graph.decls ++
      Changelog.decls ++
      TextAnalysis.decls ++
      Multimodal.decls ++
      StreamingBatch.decls ++
      Sources.decls

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference pipeline end-to-end: events ⋉ allowlist → limit →
    * envelope → to_json (kafka-database-import.go:146-219, Spark form). */
  def entry(spark: SparkSession): DataFrame =
    Flagship.pipeline(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(d => d.name -> d.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
