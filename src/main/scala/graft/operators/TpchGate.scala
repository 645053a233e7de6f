package graft.operators

import graft.{OracleSafe, QueryModule, Tables}
import graft.OracleSafe._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TPC-H query gate — the reference wires TPC-H as a per-query
  * result-compared correctness harness (flink-end-to-end-tests/
  * flink-tpch-test/src/main/java/org/apache/flink/table/tpch/
  * TpchResultComparator.java); this module mirrors that gate with the
  * classic queries re-expressed on the driver's reduced TPC-H schema.
  * Q1 and Q15 already exist as q01/q25; Q2/Q4/Q9/Q11/Q12/Q16/Q19/Q20/
  * Q21 need columns the testdata lacks (partsupp, commit/receipt
  * dates, ship mode/instruct, comments) and are out of scope; the
  * remaining ten are faithful modulo parameter domains.
  *
  * Scale notes: nation/region are broadcast explicitly (fixed-size
  * dims at any SF). supplier/part joins are left unhinted — they grow
  * with SF, so AQE's size-based broadcast decision is the right one at
  * every scale. Fact-fact joins (lineitem ⋈ orders ⋈ customer) shuffle
  * on their keys with partial aggregation where applicable.
  */
object TpchGate extends QueryModule {

  private def ts(s: String): Column = lit(s).cast("timestamp_ntz")
  private def revenue: Column = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
  private val revenueSql = "l_extendedprice * (1.0 - l_discount)"

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Q3: shipping priority — top unshipped orders by potential revenue.
    "th03_shipping_priority" -> { (s, dir) =>
      val c = Tables.load(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.load(s, dir, "orders").filter(col("o_orderdate") < ts("1998-01-01"))
      val li = Tables.load(s, dir, "lineitem").filter(col("l_shipdate") > ts("1998-01-01"))
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(dsum(revenue).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },

    // Q5: local supplier volume — revenue where supplier and customer
    // share a nation, per nation of one region.
    "th05_local_supplier_volume" -> { (s, dir) =>
      val c = Tables.load(s, dir, "customer")
      val o = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") >= ts("1996-01-01") && col("o_orderdate") < ts("1997-01-01"))
      val li = Tables.load(s, dir, "lineitem")
      val su = Tables.load(s, dir, "supplier")
      val n = Tables.load(s, dir, "nation")
      val r = Tables.load(s, dir, "region").filter(col("r_name") === "ASIA")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(su, col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(dsum(revenue).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },

    // Q6: forecasting revenue change — single-group filtered aggregate.
    "th06_revenue_change" -> { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= ts("1997-01-01") && col("l_shipdate") < ts("1998-01-01") &&
          col("l_discount") >= 0.03 && col("l_discount") <= 0.07 && col("l_quantity") < 24.0)
        .agg(dsum(col("l_extendedprice") * col("l_discount")).as("revenue"))
    },

    // Q7: volume shipping — revenue between two nations, both
    // directions, per year.
    "th07_volume_shipping" -> { (s, dir) =>
      val su = Tables.load(s, dir, "supplier")
      val li = Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= ts("1996-01-01") && col("l_shipdate") < ts("1998-01-01"))
      val o = Tables.load(s, dir, "orders")
      val c = Tables.load(s, dir, "customer")
      val n1 = Tables.load(s, dir, "nation")
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
      val n2 = Tables.load(s, dir, "nation")
        .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(su, col("l_suppkey") === col("s_suppkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
        .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
        .filter((col("supp_nation") === "NATION_11" && col("cust_nation") === "NATION_12") ||
          (col("supp_nation") === "NATION_12" && col("cust_nation") === "NATION_11"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("int").as("l_year"))
        .agg(dsum(revenue).as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    },

    // Q8: national market share — one nation's share of regional
    // revenue for a part type, per year.
    "th08_market_share" -> { (s, dir) =>
      val p = Tables.load(s, dir, "part").filter(col("p_type") === "PROMO")
      val li = Tables.load(s, dir, "lineitem")
      val o = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") >= ts("1996-01-01") && col("o_orderdate") < ts("1998-01-01"))
      val c = Tables.load(s, dir, "customer")
      val su = Tables.load(s, dir, "supplier")
      val n1 = Tables.load(s, dir, "nation")
        .select(col("n_nationkey").as("c_nk"), col("n_regionkey"))
      val n2 = Tables.load(s, dir, "nation")
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
      val r = Tables.load(s, dir, "region").filter(col("r_name") === "AMERICA")
      li.join(p, col("l_partkey") === col("p_partkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(su, col("l_suppkey") === col("s_suppkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n1), col("c_nationkey") === col("c_nk"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .join(broadcast(n2), col("s_nationkey") === col("s_nk"))
        .groupBy(year(col("o_orderdate")).cast("int").as("o_year"))
        .agg((dsum(when(col("supp_nation") === "NATION_3", revenue).otherwise(0.0)) /
          dsum(revenue)).as("mkt_share"))
        .orderBy("o_year")
    },

    // Q10: returned item reporting — top customers by lost revenue.
    "th10_returned_items" -> { (s, dir) =>
      val c = Tables.load(s, dir, "customer")
      val o = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") >= ts("1997-01-01") && col("o_orderdate") < ts("1997-04-01"))
      val li = Tables.load(s, dir, "lineitem").filter(col("l_returnflag") === "R")
      val n = Tables.load(s, dir, "nation")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
        .agg(dsum(revenue).as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },

    // Q13: customer distribution — how many customers placed N orders
    // (left outer join + two-level aggregation; the comment filter is
    // replaced by an order-priority predicate, same join shape).
    "th13_customer_distribution" -> { (s, dir) =>
      val c = Tables.load(s, dir, "customer")
      val o = Tables.load(s, dir, "orders").filter(col("o_orderpriority") =!= "1-URGENT")
      c.join(o, col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },

    // Q14: promotion effect — promo share of monthly revenue.
    "th14_promo_effect" -> { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= ts("1997-09-01") && col("l_shipdate") < ts("1997-10-01"))
      val p = Tables.load(s, dir, "part")
      li.join(p, col("l_partkey") === col("p_partkey"))
        .agg((lit(100.0) * dsum(when(col("p_type") === "PROMO", revenue).otherwise(0.0)) /
          dsum(revenue)).as("promo_revenue"))
    },

    // Q18: large volume customers — orders above a quantity threshold
    // via a grouped-HAVING semi join back onto the fact tables.
    "th18_large_volume" -> { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      val big = li.groupBy(col("l_orderkey").as("bk"))
        .agg(dsum(col("l_quantity")).as("sum_qty"))
        .filter(col("sum_qty") > 300.0)
      val o = Tables.load(s, dir, "orders")
      val c = Tables.load(s, dir, "customer")
      // `big` is tiny after the HAVING filter at every SF (the filter
      // keeps the extreme tail) — broadcast it to both fact joins.
      o.join(broadcast(big), col("o_orderkey") === col("bk"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"), col("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    },

    // Q22: global sales opportunity — well-funded customers with no
    // RECENT orders, banded by nation (phone country codes aren't in
    // the schema, nation keys band the same way; and since this data's
    // customers all have orders, "never ordered" becomes "no order in
    // the trailing window" — Q22's original 7-years-dormant spirit).
    // Scalar AVG subquery + anti join.
    "th22_global_sales" -> { (s, dir) =>
      val c = Tables.load(s, dir, "customer")
        .filter(col("c_nationkey").isin(1, 3, 5, 7, 9, 11, 13))
      val avgBal = c.filter(col("c_acctbal") > 0.0)
        .agg(davg(col("c_acctbal")).as("avg_bal"))
      val o = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") >= ts("1999-01-01"))
      c.crossJoin(broadcast(avgBal))
        .filter(col("c_acctbal") > col("avg_bal"))
        .join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("numcust"), dsum(col("c_acctbal")).as("totacctbal"))
        .orderBy("c_nationkey")
    }
  )

  override def oracleSql: Map[String, String] = Map(
    "th03_shipping_priority" -> s"""
      SELECT l_orderkey, o_orderdate, ${dsumSql(revenueSql)} AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l_orderkey, o_orderdate
      ORDER BY revenue DESC, l_orderkey
      LIMIT 10""",

    "th05_local_supplier_volume" -> s"""
      SELECT n_name, ${dsumSql(revenueSql)} AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY n_name
      ORDER BY revenue DESC, n_name""",

    "th06_revenue_change" -> s"""
      SELECT ${dsumSql("l_extendedprice * l_discount")} AS revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        AND l_discount >= 0.03 AND l_discount <= 0.07
        AND l_quantity < 24.0""",

    "th07_volume_shipping" -> s"""
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS INT) AS l_year,
             ${dsumSql(revenueSql)} AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        AND ((n1.n_name = 'NATION_11' AND n2.n_name = 'NATION_12')
          OR (n1.n_name = 'NATION_12' AND n2.n_name = 'NATION_11'))
      GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
      ORDER BY supp_nation, cust_nation, l_year""",

    "th08_market_share" -> s"""
      SELECT CAST(year(o_orderdate) AS INT) AS o_year,
             ${dsumSql(s"CASE WHEN n2.n_name = 'NATION_3' THEN $revenueSql ELSE 0.0 END")}
               / ${dsumSql(revenueSql)} AS mkt_share
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE p_type = 'PROMO' AND r_name = 'AMERICA'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY year(o_orderdate)
      ORDER BY o_year""",

    "th10_returned_items" -> s"""
      SELECT c_custkey, c_name, c_acctbal, n_name, ${dsumSql(revenueSql)} AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      WHERE l_returnflag = 'R'
        AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY c_custkey, c_name, c_acctbal, n_name
      ORDER BY revenue DESC, c_custkey
      LIMIT 20""",

    "th13_customer_distribution" -> """
      SELECT c_count, count(1) AS custdist
      FROM (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer
        LEFT JOIN orders ON c_custkey = o_custkey
          AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey)
      GROUP BY c_count
      ORDER BY custdist DESC, c_count DESC""",

    "th14_promo_effect" -> s"""
      SELECT 100.0 * ${dsumSql(s"CASE WHEN p_type = 'PROMO' THEN $revenueSql ELSE 0.0 END")}
               / ${dsumSql(revenueSql)} AS promo_revenue
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'""",

    "th18_large_volume" -> s"""
      SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
      FROM orders
      JOIN (SELECT l_orderkey AS bk, ${dsumSql("l_quantity")} AS sum_qty
            FROM lineitem GROUP BY l_orderkey
            HAVING ${dsumSql("l_quantity")} > 300.0) ON o_orderkey = bk
      JOIN customer ON o_custkey = c_custkey
      ORDER BY o_totalprice DESC, o_orderkey
      LIMIT 100""",

    "th22_global_sales" -> s"""
      SELECT c_nationkey, count(1) AS numcust, ${dsumSql("c_acctbal")} AS totacctbal
      FROM customer
      WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
        AND c_acctbal > (SELECT ${davgSql("c_acctbal")} FROM customer
                         WHERE c_acctbal > 0.0
                           AND c_nationkey IN (1, 3, 5, 7, 9, 11, 13))
        AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
      GROUP BY c_nationkey
      ORDER BY c_nationkey""")
}
