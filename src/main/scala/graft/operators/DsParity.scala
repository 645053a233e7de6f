package graft.operators

import graft.{OracleSafe, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

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
    },

    // DS shape (q36/q86): ROLLUP with a grouping()-derived hierarchy
    // level and rank WITHIN each level/parent group — exercises Expand +
    // window-over-grouping-sets in one plan.
    "ds04_rollup_rank" -> { (s, dir) =>
      val base = Tables.load(s, dir, "orders")
        .join(Tables.load(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.load(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
      val r = base.rollup(col("n_name"), col("c_mktsegment"))
        .agg(dsum(col("o_totalprice")).as("rev"),
          (grouping(col("n_name")) + grouping(col("c_mktsegment")))
            .cast("int").as("lochierarchy"),
          grouping(col("c_mktsegment")).cast("int").as("gseg"))
      val w = Window
        .partitionBy(col("lochierarchy"),
          when(col("gseg") === 0, col("n_name")))
        .orderBy(col("rev").desc,
          coalesce(col("n_name"), lit("")), coalesce(col("c_mktsegment"), lit("")))
      r.withColumn("rk", rank().over(w).cast("int"))
        .select(coalesce(col("n_name"), lit("(all)")).as("nation"),
          coalesce(col("c_mktsegment"), lit("(all)")).as("segment"),
          col("lochierarchy"), col("rev"), col("rk"))
        .orderBy(col("lochierarchy").desc, col("nation"), col("segment"))
    },

    // DS shape (q93): returned-merchandise analysis — conditional
    // aggregation over the return flag per customer, HAVING on the
    // conditional sum.
    "ds05_returns" -> { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .join(Tables.load(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey"))
        .agg(
          dsum(when(col("l_returnflag") === "R", col("l_quantity"))
            .otherwise(lit(0.0))).as("ret_qty"),
          dsum(col("l_quantity")).as("tot_qty"),
          dsum(when(col("l_returnflag") === "R",
              col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .otherwise(lit(0.0))).as("ret_rev"),
          count(lit(1)).as("n_items"))
        .where(col("ret_qty") > 0.0)
        .orderBy("o_custkey")
    },

    // DS shape (q34/q73): frequent-buyer cohort — per-customer order
    // count in a date range, banded by HAVING, joined back to the
    // dimension for attributes.
    "ds06_order_cohort" -> { (s, dir) =>
      val cnt = Tables.load(s, dir, "orders")
        .where(col("o_orderdate") >= lit("1995-01-01").cast("timestamp_ntz") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp_ntz"))
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("cnt"))
        .where(col("cnt").between(4, 10))
      cnt.join(Tables.load(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_mktsegment"), col("cnt"))
        .orderBy(col("cnt").desc, col("c_custkey"))
    },

    // DS shape (q47): month-vs-year deviation — window aggregate over an
    // aggregated CTE, filtering months that beat the yearly average.
    // The comparison multiplies instead of dividing (rev*n > sum*1.1) so
    // both engines evaluate identical double arithmetic on identical
    // exact-decimal inputs.
    "ds07_month_vs_year" -> { (s, dir) =>
      val mo = Tables.load(s, dir, "orders")
        .join(Tables.load(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.load(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"),
          year(col("o_orderdate")).cast("int").as("y"),
          month(col("o_orderdate")).cast("int").as("m"))
        .agg(dsum(col("o_totalprice")).as("rev"))
      val w = Window.partitionBy(col("n_name"), col("y"))
      mo.withColumn("year_sum",
          sum(col("rev").cast(DecimalType(25, 6))).over(w).cast("double"))
        .withColumn("n_months", count(lit(1)).over(w))
        .where(col("rev") * col("n_months") > col("year_sum") * 1.1)
        .select(col("n_name"), col("y"), col("m"), col("rev"),
          col("year_sum"), col("n_months"))
        .orderBy("n_name", "y", "m")
    }
    ,

    // DS shape (q14): parts sold through ALL THREE "channels" (order
    // status classes) via INTERSECT, then revenue per brand over the
    // common set. Catalyst rewrites intersect to a distinct semi-join
    // chain — the same plan the reference reaches via Calcite's
    // INTERSECT_TO_DISTINCT rewrite.
    "ds08_cross_channel_parts" -> { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      val o = Tables.load(s, dir, "orders")
      def channel(st: String) =
        li.join(o.filter(col("o_orderstatus") === st),
          col("l_orderkey") === col("o_orderkey"))
          .select(col("l_partkey"))
      val common = channel("F").intersect(channel("O")).intersect(channel("P"))
      li.filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp_ntz") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp_ntz"))
        .join(common, Seq("l_partkey"))
        .join(broadcast(Tables.load(s, dir, "part")),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
          count(lit(1)).as("n_lines"))
        .orderBy("p_brand")
    },

    // DS shape (q35): customer profile gated by an EXISTS conjunction —
    // an open order AND a finished-or-pending order. OR-of-EXISTS folds
    // into one semi join against the union predicate.
    "ds09_customer_profile" -> { (s, dir) =>
      val o = Tables.load(s, dir, "orders")
      Tables.load(s, dir, "customer")
        .join(o.filter(col("o_orderstatus") === "O"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .join(o.filter(col("o_orderstatus").isin("F", "P")),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .join(broadcast(Tables.load(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"), col("c_mktsegment"))
        .agg(count(lit(1)).as("n_cust"))
        .orderBy("n_name", "c_mktsegment")
    },

    // DS shape (q51): FULL OUTER JOIN of two channels' per-day revenue,
    // exact-decimal running totals, keep days where one channel's
    // running total has overtaken the other.
    "ds10_running_overtake" -> { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      val o = Tables.load(s, dir, "orders")
      def daily(st: String) = li
        .join(o.filter(col("o_orderstatus") === st),
          col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_returnflag").isin("A", "R") &&
          col("l_shipdate") >= lit("1997-01-01").cast("timestamp_ntz") &&
          col("l_shipdate") < lit("1997-03-01").cast("timestamp_ntz"))
        .groupBy(col("l_returnflag").as("k"), to_date(col("l_shipdate")).as("d"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
      val f = daily("F").select(col("k").as("fk"), col("d").as("fd"), col("rev").as("f_rev0"))
      val oo = daily("O").select(col("k").as("ok"), col("d").as("od"), col("rev").as("o_rev0"))
      val j = f.join(oo, col("fk") === col("ok") && col("fd") === col("od"), "full_outer")
        .select(coalesce(col("fk"), col("ok")).as("k"),
          coalesce(col("fd"), col("od")).as("d"),
          coalesce(col("f_rev0"), lit(0.0)).as("f_rev"),
          coalesce(col("o_rev0"), lit(0.0)).as("o_rev"))
      val w = Window.partitionBy(col("k")).orderBy(col("d"))
      j.withColumn("f_run", sum(col("f_rev").cast(DecimalType(25, 6))).over(w).cast("double"))
        .withColumn("o_run", sum(col("o_rev").cast(DecimalType(25, 6))).over(w).cast("double"))
        .where(col("f_run") > col("o_run"))
        .select(col("k"), col("d"), col("f_run"), col("o_run"))
        .orderBy("k", "d")
    },

    // DS shape (q88): six independent single-row scalar aggregates
    // cross-joined into one row — six shared scans Catalyst schedules
    // in parallel, each reduced map-side to one value.
    "ds11_time_slots" -> { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      def slot(from: String, to: String, name: String) = li
        .filter(col("l_shipdate") >= lit(from).cast("timestamp_ntz") &&
          col("l_shipdate") < lit(to).cast("timestamp_ntz"))
        .agg(dsum(col("l_quantity")).as(name))
      slot("1997-01-01", "1997-02-01", "q_jan")
        .crossJoin(slot("1997-02-01", "1997-03-01", "q_feb"))
        .crossJoin(slot("1997-03-01", "1997-04-01", "q_mar"))
        .crossJoin(slot("1997-04-01", "1997-05-01", "q_apr"))
        .crossJoin(slot("1997-05-01", "1997-06-01", "q_may"))
        .crossJoin(slot("1997-06-01", "1997-07-01", "q_jun"))
    },

    // DS shape (q54): revenue in the 90 days after each customer's
    // FIRST order — min-date CTE joined back, cohort-year aggregate.
    "ds12_first_order_cohort" -> { (s, dir) =>
      val o = Tables.load(s, dir, "orders")
      val first = o.groupBy(col("o_custkey").as("ck"))
        .agg(min(col("o_orderdate")).as("fd"))
      o.join(first, col("o_custkey") === col("ck"))
        .where(col("o_orderdate") >= col("fd") &&
          col("o_orderdate") < col("fd") + expr("INTERVAL 90 DAYS"))
        .groupBy(year(col("fd")).cast("int").as("cohort_year"))
        .agg(countDistinct(col("o_custkey")).as("n_cust"),
          dsum(col("o_totalprice")).as("rev90"))
        .orderBy("cohort_year")
    }
  )

  override def oracleSql: Map[String, String] = Map(
    "ds08_cross_channel_parts" -> s"""
      WITH common AS (
        SELECT l_partkey FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderstatus = 'F'
        INTERSECT
        SELECT l_partkey FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderstatus = 'O'
        INTERSECT
        SELECT l_partkey FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderstatus = 'P')
      SELECT p_brand, ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue,
             CAST(count(1) AS BIGINT) AS n_lines
      FROM lineitem
      JOIN common USING (l_partkey)
      JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY p_brand
      ORDER BY p_brand""",

    "ds09_customer_profile" -> """
      SELECT n_name, c_mktsegment, CAST(count(1) AS BIGINT) AS n_cust
      FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      WHERE EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
        AND (EXISTS (SELECT 1 FROM orders
                     WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
          OR EXISTS (SELECT 1 FROM orders
                     WHERE o_custkey = c_custkey AND o_orderstatus = 'P'))
      GROUP BY n_name, c_mktsegment
      ORDER BY n_name, c_mktsegment""",

    "ds10_running_overtake" -> s"""
      WITH f AS (
        SELECT l_returnflag AS k, CAST(l_shipdate AS DATE) AS d,
               ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS rev
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderstatus = 'F' AND l_returnflag IN ('A','R')
          AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-03-01 00:00:00'
        GROUP BY 1, 2),
      o AS (
        SELECT l_returnflag AS k, CAST(l_shipdate AS DATE) AS d,
               ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS rev
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderstatus = 'O' AND l_returnflag IN ('A','R')
          AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-03-01 00:00:00'
        GROUP BY 1, 2),
      j AS (
        SELECT coalesce(f.k, o.k) AS k, coalesce(f.d, o.d) AS d,
               coalesce(f.rev, 0.0) AS f_rev, coalesce(o.rev, 0.0) AS o_rev
        FROM f FULL OUTER JOIN o ON f.k = o.k AND f.d = o.d),
      r AS (
        SELECT k, d,
               CAST(sum(CAST(f_rev AS DECIMAL(25,6))) OVER
                 (PARTITION BY k ORDER BY d) AS DOUBLE) AS f_run,
               CAST(sum(CAST(o_rev AS DECIMAL(25,6))) OVER
                 (PARTITION BY k ORDER BY d) AS DOUBLE) AS o_run
        FROM j)
      SELECT k, d, f_run, o_run
      FROM r
      WHERE f_run > o_run
      ORDER BY k, d""",

    "ds11_time_slots" -> s"""
      SELECT * FROM
        (SELECT ${dsumSql("l_quantity")} AS q_jan FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
           AND l_shipdate < TIMESTAMP '1997-02-01 00:00:00'),
        (SELECT ${dsumSql("l_quantity")} AS q_feb FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1997-02-01 00:00:00'
           AND l_shipdate < TIMESTAMP '1997-03-01 00:00:00'),
        (SELECT ${dsumSql("l_quantity")} AS q_mar FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
           AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'),
        (SELECT ${dsumSql("l_quantity")} AS q_apr FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1997-04-01 00:00:00'
           AND l_shipdate < TIMESTAMP '1997-05-01 00:00:00'),
        (SELECT ${dsumSql("l_quantity")} AS q_may FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1997-05-01 00:00:00'
           AND l_shipdate < TIMESTAMP '1997-06-01 00:00:00'),
        (SELECT ${dsumSql("l_quantity")} AS q_jun FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1997-06-01 00:00:00'
           AND l_shipdate < TIMESTAMP '1997-07-01 00:00:00')""",

    "ds12_first_order_cohort" -> s"""
      WITH first AS (
        SELECT o_custkey AS ck, min(o_orderdate) AS fd FROM orders GROUP BY 1),
      win AS (
        SELECT o_custkey, o_totalprice, fd
        FROM orders JOIN first ON o_custkey = ck
        WHERE o_orderdate >= fd AND o_orderdate < fd + INTERVAL 90 DAY)
      SELECT CAST(year(fd) AS INT) AS cohort_year,
             CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_cust,
             ${dsumSql("o_totalprice")} AS rev90
      FROM win
      GROUP BY year(fd)
      ORDER BY cohort_year""",

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
      ORDER BY n_name, y""",

    "ds04_rollup_rank" -> s"""
      WITH base AS (
        SELECT n_name, c_mktsegment, o_totalprice
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey),
      r AS (
        SELECT n_name, c_mktsegment, ${dsumSql("o_totalprice")} AS rev,
               CAST(GROUPING(n_name) + GROUPING(c_mktsegment) AS INT) AS lochierarchy,
               CAST(GROUPING(c_mktsegment) AS INT) AS gseg
        FROM base GROUP BY ROLLUP (n_name, c_mktsegment))
      SELECT coalesce(n_name, '(all)') AS nation,
             coalesce(c_mktsegment, '(all)') AS segment,
             lochierarchy, rev,
             CAST(rank() OVER (
               PARTITION BY lochierarchy, CASE WHEN gseg = 0 THEN n_name END
               ORDER BY rev DESC, coalesce(n_name, ''), coalesce(c_mktsegment, ''))
             AS INT) AS rk
      FROM r
      ORDER BY lochierarchy DESC, nation, segment""",

    "ds05_returns" -> s"""
      SELECT o_custkey,
        ${dsumSql("CASE WHEN l_returnflag = 'R' THEN l_quantity ELSE 0.0 END")} AS ret_qty,
        ${dsumSql("l_quantity")} AS tot_qty,
        ${dsumSql(
          "CASE WHEN l_returnflag = 'R' THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END")}
          AS ret_rev,
        count(1) AS n_items
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_custkey
      HAVING ${dsumSql("CASE WHEN l_returnflag = 'R' THEN l_quantity ELSE 0.0 END")} > 0.0
      ORDER BY o_custkey""",

    "ds06_order_cohort" -> """
      WITH cnt AS (
        SELECT o_custkey, count(1) AS cnt
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1995-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY o_custkey
        HAVING count(1) BETWEEN 4 AND 10)
      SELECT c_custkey, c_mktsegment, cnt
      FROM cnt JOIN customer ON o_custkey = c_custkey
      ORDER BY cnt DESC, c_custkey""",

    "ds07_month_vs_year" -> s"""
      WITH mo AS (
        SELECT n_name, CAST(year(o_orderdate) AS INT) AS y,
               CAST(month(o_orderdate) AS INT) AS m,
               ${dsumSql("o_totalprice")} AS rev
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name, year(o_orderdate), month(o_orderdate)),
      w AS (
        SELECT *, CAST(sum(CAST(rev AS DECIMAL(25,6))) OVER win AS DOUBLE) AS year_sum,
               count(1) OVER win AS n_months
        FROM mo WINDOW win AS (PARTITION BY n_name, y))
      SELECT n_name, y, m, rev, year_sum, n_months
      FROM w WHERE rev * n_months > year_sum * 1.1
      ORDER BY n_name, y, m"""
  )
}
