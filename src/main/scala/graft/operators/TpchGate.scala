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
  * Q1 and Q15 already exist as q01/q25; ten more (th03..th22 below)
  * are faithful modulo parameter domains. The remaining ten —
  * Q2/Q4/Q9/Q11/Q12/Q16/Q17/Q19/Q20/Q21 — need columns the testdata
  * lacks (partsupp, commit/receipt dates, ship mode/instruct,
  * container, comments) and are ADAPTED, preserving each query's
  * plan shape on the available columns:
  *   - partsupp is derived from lineitem — (l_partkey, l_suppkey)
  *     pairs, with supply cost = avg unit price (th02/th11/th16/th20);
  *   - "late delivery" (commit vs receipt date) becomes a shipdate-
  *     vs-orderdate gap (th04/th12/th21);
  *   - ship mode / container become l_returnflag / p_size bands
  *     (th12/th17/th19).
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
    // Q2 (adapted): minimum-cost supplier. partsupp is derived from
    // lineitem — supply cost of (part, supp) = exact avg unit price —
    // and the per-part min is taken within the EUROPE supplier pool.
    // Scale notes: ps is ONE shuffle of lineitem on (part, supp); the
    // per-part min is a second, far smaller aggregate joined back (no
    // correlated re-scan of the fact table); the double-equality join
    // is deterministic because both sides come from the same exact
    // decimal-sum average.
    "th02_min_cost_supplier" -> { (s, dir) =>
      // favg, not davg: the unit-price quotient has an unbounded
      // decimal expansion, and davg's decimal-cast rounding tie
      // diverged from DuckDB at sf0.1 (floor never ties).
      val ps = Tables.load(s, dir, "lineitem")
        .groupBy(col("l_partkey").as("ps_partkey"), col("l_suppkey").as("ps_suppkey"))
        .agg(favg(col("l_extendedprice") / col("l_quantity")).as("ps_supplycost"))
      val n = Tables.load(s, dir, "nation").filter(col("n_regionkey") === 3)
      val eur = ps
        .join(Tables.load(s, dir, "supplier"), col("ps_suppkey") === col("s_suppkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .select(col("ps_partkey"), col("ps_supplycost"), col("s_acctbal"),
          col("s_name"), col("n_name"))
      val mins = eur.groupBy(col("ps_partkey").as("mk"))
        .agg(min(col("ps_supplycost")).as("min_cost"))
      val p = Tables.load(s, dir, "part")
        .filter(col("p_type") === "STANDARD" && col("p_size") >= 40)
      eur.join(mins, col("ps_partkey") === col("mk") &&
          col("ps_supplycost") === col("min_cost"))
        .join(p, col("ps_partkey") === col("p_partkey"))
        .select(col("s_acctbal"), col("s_name"), col("n_name"),
          col("ps_partkey").as("p_partkey"), col("p_type"), col("p_size"),
          col("ps_supplycost"))
        .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
        .limit(100)
    },

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

    // Q4 (adapted): order priority checking — count orders per
    // priority having a lineitem delivered "late" (shipped more than
    // 365 days after the order date; the schema lacks commit/receipt
    // dates). Semi join preserves Q4's EXISTS shape.
    "th04_order_priority" -> { (s, dir) =>
      val o = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") >= ts("1996-01-01") && col("o_orderdate") < ts("1996-07-01"))
      val li = Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_shipdate"))
      o.join(li, col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 365 DAYS"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
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

    // Q9 (adapted): product type profit — profit per supplier nation
    // and year for one part family; supply cost (partsupp) is proxied
    // by 60% of the part's retail price.
    "th09_product_type_profit" -> { (s, dir) =>
      val p = Tables.load(s, dir, "part").filter(col("p_name").like("%red%"))
      Tables.load(s, dir, "lineitem")
        .join(p, col("l_partkey") === col("p_partkey"))
        .join(Tables.load(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(Tables.load(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.load(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"),
          year(col("o_orderdate")).cast("int").as("o_year"))
        .agg(dsum(revenue - lit(0.6) * col("p_retailprice") * col("l_quantity"))
          .as("sum_profit"))
        .orderBy(col("nation"), col("o_year").desc)
    },

    // Q11 (adapted): important stock — per-part shipped value from one
    // nation's suppliers, kept when above 1/1000 of that nation's
    // total (scalar-subquery threshold, broadcast as a 1-row join).
    "th11_important_stock" -> { (s, dir) =>
      val natLi = Tables.load(s, dir, "lineitem")
        .join(Tables.load(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.load(s, dir, "nation")
            .filter(col("n_name") === "NATION_7")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("l_partkey"), (col("l_extendedprice") * col("l_quantity")).as("val0"))
      val ps = natLi.groupBy(col("l_partkey").as("ps_partkey"))
        .agg(dsum(col("val0")).as("value"))
      val total = natLi.agg((dsum(col("val0")) * 0.001).as("threshold"))
      ps.crossJoin(broadcast(total))
        .filter(col("value") > col("threshold"))
        .select(col("ps_partkey"), col("value"))
        .orderBy(col("value").desc, col("ps_partkey"))
    },

    // Q12 (adapted): shipping modes & order priority — l_returnflag
    // plays the ship-mode class; "received late" = shipped more than
    // 180 days after the order date.
    "th12_shipping_modes" -> { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
        .filter(col("l_returnflag").isin("A", "R") &&
          col("l_shipdate") >= ts("1997-01-01") && col("l_shipdate") < ts("1998-01-01"))
      Tables.load(s, dir, "orders")
        .join(li, col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 180 DAYS"))
        .groupBy(col("l_returnflag").as("l_shipmode"))
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("high_line_count"),
          sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("low_line_count"))
        .orderBy("l_shipmode")
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

    // Q16 (adapted): parts/supplier relationship — distinct supplier
    // counts per (brand, type, size) over the lineitem-derived
    // partsupp, excluding "complaint" suppliers (negative balance —
    // the schema has no comments) via a broadcast anti join.
    "th16_parts_supplier" -> { (s, dir) =>
      val ps = Tables.load(s, dir, "lineitem")
        .select(col("l_partkey").as("ps_partkey"), col("l_suppkey").as("ps_suppkey"))
        .distinct()
      val p = Tables.load(s, dir, "part")
        .filter(col("p_brand") =!= "Brand#5" && col("p_type") =!= "ECONOMY" &&
          col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49))
      val bad = Tables.load(s, dir, "supplier").filter(col("s_acctbal") < 0.0)
        .select(col("s_suppkey"))
      ps.join(broadcast(bad), col("ps_suppkey") === col("s_suppkey"), "left_anti")
        .join(p, col("ps_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("ps_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
    },

    // Q17 (adapted): small-quantity-order revenue — lineitems under
    // half the part's average quantity, for one brand in a small size
    // band (container proxy). The per-part average is computed on the
    // part-filtered fact subset (equivalent to Q17's correlated
    // subquery, but never re-scans the full fact table).
    "th17_small_qty_revenue" -> { (s, dir) =>
      val p = Tables.load(s, dir, "part")
        .filter(col("p_brand") === "Brand#3" && col("p_size") < 10)
        .select(col("p_partkey"))
      val fli = Tables.load(s, dir, "lineitem")
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      val avgq = fli.groupBy(col("l_partkey").as("ak"))
        .agg((lit(0.5) * davg(col("l_quantity"))).as("half_avg_qty"))
      fli.join(broadcast(avgq), col("l_partkey") === col("ak"))
        .filter(col("l_quantity") < col("half_avg_qty"))
        .agg((dsum(col("l_extendedprice")) / 7.0).as("avg_yearly"))
    },

    // Q19 (adapted): discounted revenue — disjunction of brand/size/
    // quantity brackets as the join predicate (size bands proxy the
    // container classes).
    "th19_discounted_revenue" -> { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .join(Tables.load(s, dir, "part"),
          col("l_partkey") === col("p_partkey") && (
            (col("p_brand") === "Brand#12" && col("p_size").between(1, 15) &&
              col("l_quantity").between(1, 11)) ||
            (col("p_brand") === "Brand#23" && col("p_size").between(1, 25) &&
              col("l_quantity").between(10, 20)) ||
            (col("p_brand") === "Brand#34" && col("p_size").between(1, 35) &&
              col("l_quantity").between(20, 30))))
        .agg(dsum(revenue).as("revenue"))
    },

    // Q20 (adapted): part promotion — suppliers of 'red' parts whose
    // 1996 shipped quantity beats half their 1997 quantity (availqty
    // proxy), restricted to one region. The two year-windows are ONE
    // conditional aggregate over (supp, part) — no correlated rescan.
    "th20_part_promotion" -> { (s, dir) =>
      val redParts = Tables.load(s, dir, "part").filter(col("p_name").like("red%"))
        .select(col("p_partkey"))
      val qty = Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= ts("1996-01-01") && col("l_shipdate") < ts("1998-01-01"))
        .join(broadcast(redParts), col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_suppkey"), col("l_partkey"))
        .agg(
          dsum(when(col("l_shipdate") < ts("1997-01-01"), col("l_quantity"))
            .otherwise(0.0)).as("qty96"),
          dsum(when(col("l_shipdate") >= ts("1997-01-01"), col("l_quantity"))
            .otherwise(0.0)).as("qty97"))
      // a (supp, part) group with no 1996 rows has qty96 = 0, which
      // never beats 0.5*qty97 > 0 — matching the oracle's 1996-rows-
      // only grouping exactly.
      val promo = qty.filter(col("qty96") > lit(0.5) * col("qty97"))
        .select(col("l_suppkey")).distinct()
      Tables.load(s, dir, "supplier")
        .join(broadcast(Tables.load(s, dir, "nation").filter(col("n_regionkey") === 2)),
          col("s_nationkey") === col("n_nationkey"))
        .join(promo, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select(col("s_name"), col("s_acctbal"))
        .orderBy("s_name")
    },

    // Q21 (adapted): suppliers who kept orders waiting — the ONLY late
    // supplier (shipped >540 days after order date) on a multi-supplier
    // finished order. Q21's EXISTS/NOT EXISTS self-joins become one
    // per-order distinct-count aggregate joined back to the late rows.
    "th21_waiting_suppliers" -> { (s, dir) =>
      val o = Tables.load(s, dir, "orders").filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_orderdate"))
      val lo = Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .withColumn("late",
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 540 DAYS"))
      val stats = lo.groupBy(col("l_orderkey").as("sk"))
        .agg(countDistinct(col("l_suppkey")).as("n_supps"),
          countDistinct(when(col("late"), col("l_suppkey"))).as("n_late"))
      val su = Tables.load(s, dir, "supplier")
        .join(broadcast(Tables.load(s, dir, "nation")
            .filter(col("n_name") === "NATION_4")),
          col("s_nationkey") === col("n_nationkey"))
      lo.filter(col("late"))
        .join(su, col("l_suppkey") === col("s_suppkey"))
        .join(stats, col("l_orderkey") === col("sk"))
        .filter(col("n_supps") >= 2 && col("n_late") === 1)
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(100)
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
    "th02_min_cost_supplier" -> s"""
      WITH ps AS (
        SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
               ${favgSql("l_extendedprice / l_quantity")} AS ps_supplycost
        FROM lineitem GROUP BY 1, 2),
      eur AS (
        SELECT ps_partkey, ps_supplycost, s_acctbal, s_name, n_name
        FROM ps
        JOIN supplier ON ps_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_regionkey = 3),
      mins AS (SELECT ps_partkey AS mk, min(ps_supplycost) AS min_cost
               FROM eur GROUP BY 1)
      SELECT s_acctbal, s_name, n_name, ps_partkey AS p_partkey,
             p_type, p_size, ps_supplycost
      FROM eur
      JOIN mins ON ps_partkey = mk AND ps_supplycost = min_cost
      JOIN part ON ps_partkey = p_partkey
      WHERE p_type = 'STANDARD' AND p_size >= 40
      ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
      LIMIT 100""",

    "th04_order_priority" -> """
      SELECT o_orderpriority, count(1) AS order_count
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
        AND EXISTS (SELECT 1 FROM lineitem
                    WHERE l_orderkey = o_orderkey
                      AND l_shipdate > o_orderdate + INTERVAL 365 DAY)
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority""",

    "th09_product_type_profit" -> s"""
      SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
             ${dsumSql(s"$revenueSql - 0.6 * p_retailprice * l_quantity")} AS sum_profit
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%red%'
      GROUP BY n_name, year(o_orderdate)
      ORDER BY nation, o_year DESC""",

    "th11_important_stock" -> s"""
      WITH ps AS (
        SELECT l_partkey AS ps_partkey,
               ${dsumSql("l_extendedprice * l_quantity")} AS value
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_7'
        GROUP BY 1)
      SELECT ps_partkey, value
      FROM ps
      WHERE value > (SELECT ${dsumSql("l_extendedprice * l_quantity")} * 0.001
                     FROM lineitem
                     JOIN supplier ON l_suppkey = s_suppkey
                     JOIN nation ON s_nationkey = n_nationkey
                     WHERE n_name = 'NATION_7')
      ORDER BY value DESC, ps_partkey""",

    "th12_shipping_modes" -> """
      SELECT l_returnflag AS l_shipmode,
             CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                           THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
             CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                           THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      FROM orders
      JOIN lineitem ON o_orderkey = l_orderkey
      WHERE l_returnflag IN ('A', 'R')
        AND l_shipdate > o_orderdate + INTERVAL 180 DAY
        AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l_returnflag
      ORDER BY l_shipmode""",

    "th16_parts_supplier" -> """
      WITH ps AS (SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
                  FROM lineitem)
      SELECT p_brand, p_type, p_size,
             CAST(count(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
      FROM ps
      JOIN part ON p_partkey = ps_partkey
      WHERE p_brand <> 'Brand#5'
        AND p_type <> 'ECONOMY'
        AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
        AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
      GROUP BY p_brand, p_type, p_size
      ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""",

    "th17_small_qty_revenue" -> s"""
      SELECT ${dsumSql("l_extendedprice")} / 7.0 AS avg_yearly
      FROM lineitem
      JOIN part ON p_partkey = l_partkey
      WHERE p_brand = 'Brand#3' AND p_size < 10
        AND l_quantity < (SELECT 0.5 * ${davgSql("l_quantity")}
                          FROM lineitem l2 WHERE l2.l_partkey = p_partkey)""",

    "th19_discounted_revenue" -> s"""
      SELECT ${dsumSql(revenueSql)} AS revenue
      FROM lineitem
      JOIN part ON p_partkey = l_partkey
      WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
             AND l_quantity >= 1 AND l_quantity <= 11)
         OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
             AND l_quantity >= 10 AND l_quantity <= 20)
         OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
             AND l_quantity >= 20 AND l_quantity <= 30)""",

    "th20_part_promotion" -> s"""
      SELECT s_name, s_acctbal
      FROM supplier
      JOIN nation ON s_nationkey = n_nationkey
      WHERE n_regionkey = 2
        AND s_suppkey IN (
          SELECT l_suppkey FROM lineitem
          JOIN part ON l_partkey = p_partkey
          WHERE p_name LIKE 'red%'
            AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
            AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
          GROUP BY l_suppkey, l_partkey
          HAVING ${dsumSql("l_quantity")} > (
            SELECT 0.5 * coalesce(${dsumSql("l_quantity")}, 0.0)
            FROM lineitem l2
            WHERE l2.l_partkey = lineitem.l_partkey
              AND l2.l_suppkey = lineitem.l_suppkey
              AND l2.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
              AND l2.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'))
      ORDER BY s_name""",

    "th21_waiting_suppliers" -> """
      SELECT s_name, CAST(count(1) AS BIGINT) AS numwait
      FROM supplier
      JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      JOIN orders ON o_orderkey = l1.l_orderkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE o_orderstatus = 'F' AND n_name = 'NATION_4'
        AND l1.l_shipdate > o_orderdate + INTERVAL 540 DAY
        AND EXISTS (SELECT 1 FROM lineitem l2
                    WHERE l2.l_orderkey = l1.l_orderkey
                      AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM lineitem l3
                        WHERE l3.l_orderkey = l1.l_orderkey
                          AND l3.l_suppkey <> l1.l_suppkey
                          AND l3.l_shipdate > o_orderdate + INTERVAL 540 DAY)
      GROUP BY s_name
      ORDER BY numwait DESC, s_name
      LIMIT 100""",

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
