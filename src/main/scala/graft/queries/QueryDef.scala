package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One named query: a Spark implementation over the testdata sf dir plus an
  * equivalent DuckDB-dialect ANSI SQL oracle (None → driver does a weaker
  * rows-only check).
  *
  * Conventions for oracle hash-parity (driver sorts columns by name, then
  * hashes values):
  *   - every aggregate / computed column is aliased identically on both sides
  *   - every query ends in a deterministic ORDER BY over a unique key set
  *     (so row order matches even if the driver does not sort rows)
  *   - double aggregations go through exact decimal sums then cast to double
  *     (see [[QueryDef.dsum]]) — double summation order is engine-dependent,
  *     decimal summation is exact on both engines
  *   - no raw timestamp output columns (physical annotation differs between
  *     writers); cast to date or string
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    benchmark: Boolean = true)

object QueryDef {
  /** Exact decimal sum of a double column, surfaced as double.
    * Equivalent DuckDB: CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE).
    */
  def dsum(c: Column, precision: Int = 18, scale: Int = 2): Column =
    sum(c.cast(DecimalType(precision, scale))).cast("double")
}
