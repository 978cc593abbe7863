package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries.GQuery

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are registered per operator-family module under
  * [[graft.queries]]; each carries its Spark plan builder and (when
  * SQL-expressible) a DuckDB oracle query for the correctness gate.
  */
object SparkEntry {

  def registry: Seq[GQuery] =
    graft.queries.Relational.all ++ graft.queries.Spikes.all ++
      graft.queries.Text.all ++ graft.queries.Vectors.all ++
      graft.queries.Engine.all ++ graft.queries.Media.all ++
      graft.queries.Tokenize.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
