package graft.operators

import graft.{OracleSafe, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** TPC-DS-shaped query suite — the reference wires all 103 TPC-DS
  * queries as a correctness gate (SURVEY §5.4,
  * flink-end-to-end-tests/flink-tpcds-test); these exercise the same
  * DS-specific shapes (multi-CTE pipelines, rank-within-group over an
  * aggregated join, channel-style conditional aggregation, period-over-
  * period self-joins) on the TPC-H-ish testdata. All declarative:
  * broadcast dims, shuffled fact joins, partial+final aggregation.
  */
object DsParity extends QueryModule {
  import OracleSafe._

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // DS shape: CTE of aggregated 3-way join, then rank-per-group top 3.
    "ds01_brand_top_parts" -> { (s, dir) =>
      val rev = Tables.load(s, dir, "lineitem")
        .join(broadcast(Tables.load(s, dir, "part")),
          col("l_partkey") === col("p_partkey"))
        .join(Tables.load(s, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .where(col("o_orderdate") >= lit("1997-01-01").cast("timestamp_ntz"))
        .groupBy(col("p_brand"), col("l_partkey"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      val w = Window.partitionBy(col("p_brand"))
        .orderBy(col("revenue").desc, col("l_partkey"))
      rev.withColumn("rk", rank().over(w)).where(col("rk") <= 3)
        .select(col("p_brand"), col("l_partkey"), col("revenue"), col("rk"))
        .orderBy("p_brand", "rk", "l_partkey")
    },

    // DS shape: channel-style conditional aggregation with HAVING.
    "ds02_status_channels" -> { (s, dir) =>
      Tables.load(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(
          sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("n_f"),
          sum(when(col("o_orderstatus") === "O", 1L).otherwise(0L)).as("n_o"),
          sum(when(col("o_orderstatus") === "P", 1L).otherwise(0L)).as("n_p"),
          dsum(when(col("o_orderstatus") === "F", col("o_totalprice"))
            .otherwise(lit(0.0))).as("rev_f"),
          count(lit(1)).as("n"))
        .where(col("n") > 100)
        .select(col("o_orderpriority"), col("n_f"), col("n_o"), col("n_p"),
          col("rev_f"), col("n"))
        .orderBy("o_orderpriority")
    },

    // DS shape: period-over-period comparison via a self-joined CTE.
    "ds03_yoy_revenue" -> { (s, dir) =>
      val yr = Tables.load(s, dir, "orders")
        .join(Tables.load(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.load(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"), year(col("o_orderdate")).cast("int").as("y"))
        .agg(dsum(col("o_totalprice")).as("rev"))
      val prev = yr.select(col("n_name").as("pn"), (col("y") + 1).as("py"),
        col("rev").as("prev_rev"))
      yr.join(prev, col("n_name") === col("pn") && col("y") === col("py"))
        .select(col("n_name"), col("y"), col("rev"), col("prev_rev"),
          (col("rev") - col("prev_rev")).as("delta"))
        .orderBy("n_name", "y")
    }
  )

  override def oracleSql: Map[String, String] = Map(
    "ds01_brand_top_parts" -> s"""
      WITH rev AS (
        SELECT p_brand, l_partkey,
               ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        GROUP BY p_brand, l_partkey)
      SELECT p_brand, l_partkey, revenue, CAST(rk AS INT) AS rk FROM (
        SELECT *, rank() OVER (PARTITION BY p_brand
                   ORDER BY revenue DESC, l_partkey) AS rk
        FROM rev)
      WHERE rk <= 3
      ORDER BY p_brand, rk, l_partkey""",

    "ds02_status_channels" -> s"""
      SELECT o_orderpriority,
        CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
        CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
        CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p,
        ${dsumSql("CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0.0 END")} AS rev_f,
        count(1) AS n
      FROM orders
      GROUP BY o_orderpriority
      HAVING count(1) > 100
      ORDER BY o_orderpriority""",

    "ds03_yoy_revenue" -> s"""
      WITH yr AS (
        SELECT n_name, CAST(year(o_orderdate) AS INT) AS y,
               ${dsumSql("o_totalprice")} AS rev
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name, year(o_orderdate))
      SELECT a.n_name AS n_name, a.y AS y, a.rev AS rev,
             b.rev AS prev_rev, a.rev - b.rev AS delta
      FROM yr a JOIN yr b ON a.n_name = b.n_name AND a.y = b.y + 1
      ORDER BY n_name, y"""
  )
}
