package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** A bundle of named queries plus their DuckDB oracle SQL.
  * SparkEntry merges all modules; keys must be globally unique.
  */
trait QueryModule {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracleSql: Map[String, String]
}

/** Shared helpers that keep Spark results bit-identical to the DuckDB oracle.
  *
  * Floating-point SUMs are order-dependent; Spark and DuckDB aggregate in
  * different orders. We therefore do per-row arithmetic in DOUBLE (IEEE-754
  * deterministic for identical expressions), cast each row to an exact
  * DECIMAL, SUM exactly, and cast the final value back to DOUBLE. Both
  * engines then produce the identical double.
  *
  * Constraint: keep |sum| * 10^6 below 2^53 (i.e. |sum| < ~9e9). Above
  * that the final decimal→double conversion takes different rounding
  * paths (Spark: one correctly-rounded conversion; DuckDB: int128→double
  * then a division by 10^scale — two roundings) and can differ by 1 ulp.
  * Pre-scale large-magnitude inputs (see AggregatesSuite a04).
  */
object OracleSafe {
  /** Exact deterministic sum of a double expression. */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(25, 6))).cast("double")

  /** Exact deterministic average of a double expression. */
  def davg(c: Column): Column =
    (sum(c.cast(DecimalType(25, 6))).cast("double") / count(c))

  /** DuckDB-side equivalents (string SQL fragments). */
  def dsumSql(e: String): String =
    s"CAST(sum(CAST(($e) AS DECIMAL(25,6))) AS DOUBLE)"
  def davgSql(e: String): String =
    s"(CAST(sum(CAST(($e) AS DECIMAL(25,6))) AS DOUBLE) / count($e))"

  /** Floor-scaled exact sum — for terms whose decimal expansion exceeds
    * 6 digits (quotients, scaled values). dsum's double→DECIMAL cast
    * must ROUND such terms, and on an exact binary half Spark (HALF_UP
    * on the shortest decimal repr) and DuckDB (binary rounding) can
    * disagree by 1e-6 — observed at sf0.1 row counts, invisible at
    * sf0.01. floor() of the same IEEE double is identical in both
    * engines, tie-free by construction. Constraint: |term| * scale
    * summed must stay below 2^63 (long overflow).
    */
  def fsum(c: Column, scale: Double = 1e6): Column =
    sum(floor(c * scale).cast("long")).cast("double") / scale

  /** Floor-scaled exact average (see fsum). */
  def favg(c: Column, scale: Double = 1e6): Column = fsum(c, scale) / count(c)

  def fsumSql(e: String, scale: String = "1e6"): String =
    s"(CAST(sum(CAST(floor(($e) * $scale) AS BIGINT)) AS DOUBLE) / $scale)"
  def favgSql(e: String, scale: String = "1e6"): String =
    s"(${fsumSql(e, scale)} / count($e))"
}
