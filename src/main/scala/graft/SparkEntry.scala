package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{DedupQueries, EventsQueries, MultimodalQueries, ProfileQueries, SimilarityQueries, TextQueries, TpchQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] has a DuckDB oracle twin in [[oracleSql]]
  * (identical column names/aliases — the driver's compare sorts columns
  * by name before hashing). Queries without an exact SQL-expressible
  * oracle (LSH-style approximations) are registered without an oracle
  * and get the driver's weaker rows-only check.
  */
object SparkEntry {

  private val registry: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] =
    (EventsQueries.all ++ TpchQueries.all ++ TextQueries.all ++
      DedupQueries.all ++ SimilarityQueries.all ++ MultimodalQueries.all ++
      ProfileQueries.all)
      .map { case (n, f, o) => (n, f, Option(o)) }

  // a name collision between modules would silently drop a query from
  // the whole suite via the toMap below — make it loud instead
  require(registry.size == registry.map(_._1).distinct.size, {
    val dups = registry.groupBy(_._1).collect { case (n, g) if g.size > 1 => n }
    s"duplicate query names across modules: ${dups.toSeq.sorted.mkString(", ")}"
  })

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    EventsQueries.hourlyMetrics(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (n, f, _) => n -> f }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.collect { case (n, _, Some(sql)) => n -> sql }.toMap
}
