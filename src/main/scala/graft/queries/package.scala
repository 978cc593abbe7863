package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

package object queries {

  /** One registered engine query: the Spark plan builder plus (when the
    * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle query
    * used by the driver's correctness gate.
    */
  final case class GQuery(
      name: String,
      fn: (SparkSession, String) => DataFrame,
      oracle: Option[String])

  object GQuery {
    def apply(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): GQuery =
      GQuery(name, fn, Some(oracle))
    def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): GQuery =
      GQuery(name, fn, None)
  }

  /** Order-independent exact double sum: route through decimal so partial
    * aggregation order (Spark) vs single-threaded order (DuckDB) cannot
    * produce differing floating-point results. DuckDB equivalent:
    * `CAST(SUM(CAST(x AS DECIMAL(20,6))) AS DOUBLE)`.
    */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(20, 6))).cast("double")

  /** Order-independent mean via exact decimal sum / count. DuckDB:
    * `CAST(SUM(CAST(x AS DECIMAL(20,6))) AS DOUBLE) / COUNT(x)`.
    */
  def davg(c: Column): Column =
    sum(c.cast(DecimalType(20, 6))).cast("double") / count(c)

  /** Order-independent mean at 1e-18 resolution — for intrinsically tiny
    * values (e.g. normalized PSTH bins ≈ rate × bin seconds, often
    * 1e-7..1e-4) where davg's 1e-6 per-value grid would distort or zero
    * them. DuckDB: `CAST(SUM(CAST(x AS DECIMAL(38,18))) AS DOUBLE) /
    * COUNT(x)`.
    */
  def davg18(c: Column): Column =
    sum(c.cast(DecimalType(38, 18))).cast("double") / count(c)
}
