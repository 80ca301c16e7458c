package graft

import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries are assembled from the per-category modules in
  * `graft.queries`; every entry with SQL-expressible semantics also
  * publishes the DuckDB oracle SQL the driver hash-compares against.
  */
object SparkEntry {
  private def allDefs: Seq[QueryDef] =
    RefSurface.defs ++ Relational.defs ++ TextAnalysis.defs ++
      Dedup.defs ++ Similarity.defs ++ StreamingWindows.defs ++
      MultimodalQueries.defs ++ Advanced.defs ++ Extended.defs ++
      TrainingPipeline.defs ++ Statistics.defs ++ Analytics.defs ++
      RuntimeFilters.defs ++ Incremental.defs ++ DataQuality.defs ++
      NativePlans.defs ++ Layout.defs ++ Graph.defs ++ Association.defs ++
      Hierarchy.defs ++ Sketches.defs ++ Geo.defs ++ SetSimilarity.defs ++
      SqlSurface.defs ++ Evaluation.defs ++ DriftStats.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RefSurface.fanout(spark, "/root/testdata/sf0.001")

  /** Every registered name in registration order — exposed so the
    * duplicate-shadowing guard (Wave12Spec) can see collisions the
    * Map form hides.
    */
  private[graft] def allQueryNames: Seq[String] = allDefs.map(_.name)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(d => d.name -> d.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
