package graft.operators

import graft.{OracleSafe, QueryModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Batch relational parity suite (SURVEY.md §2.1-2.8): scan/filter/project,
  * hash aggregate, multi-way joins (broadcast + shuffle), semi/anti joins,
  * rollup/cube/grouping sets, over-windows with frames, top-n per group,
  * sort/limit, set operations, scalar subqueries, unnest/lateral.
  *
  * Reference semantics: Flink batch ExecNodes (e.g. BatchExecHashAggregate,
  * HashJoinOperator — flink-table-runtime/.../join/HashJoinOperator.java:58,
  * SortMergeJoinOperator.java:62, RankOperator.java:114) — all delegated to
  * Catalyst physical operators per SURVEY.md §4.2.
  *
  * Scale notes (100 TB): every query is fully declarative — filters and
  * projections push into the parquet scan, aggregates run partial+final,
  * small dimensions are broadcast explicitly, large joins shuffle on their
  * keys, and AQE handles skew. No driver-side state anywhere.
  */
object Relational extends QueryModule {
  import OracleSafe._

  private def ts(s: String): Column = lit(s).cast("timestamp_ntz")

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1 shape: scan → filter → project → hash agg → sort.
    "q01_pricing_summary" -> { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") <= ts("1998-09-02"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).as("sum_charge"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_extendedprice")).as("avg_price"),
          davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // Multi-way join: fact (lineitem) ⋈ orders ⋈ customer ⋈ nation ⋈ region.
    // nation/region broadcast; lineitem⋈orders shuffle on orderkey.
    "q02_revenue_by_nation" -> { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      val o = Tables.load(s, dir, "orders")
      val c = Tables.load(s, dir, "customer")
      val n = Tables.load(s, dir, "nation")
      val r = Tables.load(s, dir, "region")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .filter(col("o_orderdate") >= ts("1996-01-01") && col("o_orderdate") < ts("1999-01-01"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("r_name", "n_name")
    },

    // Semi join (EXISTS): customers having at least one big order.
    "q03_exists_semi" -> { (s, dir) =>
      val c = Tables.load(s, dir, "customer")
      val o = Tables.load(s, dir, "orders").filter(col("o_totalprice") > 150000.0)
      c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy("c_custkey")
    },

    // Anti join (NOT EXISTS): customers with no orders at all.
    "q04_no_orders_anti" -> { (s, dir) =>
      val c = Tables.load(s, dir, "customer")
      val o = Tables.load(s, dir, "orders")
      c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_acctbal"))
        .orderBy("c_custkey")
    },

    // ROLLUP with grouping() ids (Catalyst Expand node).
    "q05_rollup" -> { (s, dir) =>
      Tables.load(s, dir, "orders")
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(
          count(lit(1)).as("n_orders"),
          dsum(col("o_totalprice")).as("sum_price"),
          (grouping(col("o_orderstatus")).cast("int") * 2 +
            grouping(col("o_orderpriority")).cast("int")).as("gid"))
        .select(
          coalesce(col("o_orderstatus"), lit("(all)")).as("o_orderstatus"),
          coalesce(col("o_orderpriority"), lit("(all)")).as("o_orderpriority"),
          col("n_orders"), col("sum_price"), col("gid"))
        .orderBy("gid", "o_orderstatus", "o_orderpriority")
    },

    // CUBE over status × order year.
    "q06_cube" -> { (s, dir) =>
      Tables.load(s, dir, "orders")
        .withColumn("o_year", year(col("o_orderdate")))
        .cube(col("o_orderstatus"), col("o_year"))
        .agg(
          count(lit(1)).as("n_orders"),
          dsum(col("o_totalprice")).as("sum_price"),
          (grouping(col("o_orderstatus")).cast("int") * 2 +
            grouping(col("o_year")).cast("int")).as("gid"))
        .select(
          coalesce(col("o_orderstatus"), lit("(all)")).as("o_orderstatus"),
          coalesce(col("o_year"), lit(-1)).as("o_year"),
          col("n_orders"), col("sum_price"), col("gid"))
        .orderBy("gid", "o_orderstatus", "o_year")
    },

    // OVER windows: running sum / rank / lag / row_number per customer.
    // Running sum accumulates in exact decimal so frame evaluation order
    // cannot perturb the double result.
    "q07_over_running" -> { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.load(s, dir, "orders")
        .select(
          col("o_custkey"), col("o_orderkey"),
          sum(col("o_totalprice").cast(DecimalType(25, 6)))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("double").as("running_total"),
          rank().over(Window.partitionBy(col("o_custkey"))
            .orderBy(col("o_totalprice").desc, col("o_orderkey"))).as("price_rank"),
          lag(col("o_totalprice"), 1).over(w).as("prev_price"),
          lead(col("o_totalprice"), 1).over(w).as("next_price"),
          row_number().over(w).as("rn"))
        .orderBy("o_custkey", "rn")
    },

    // Sliding ROWS frame (2 preceding .. current) — exact decimal sum.
    "q08_over_sliding" -> { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(-2, Window.currentRow)
      Tables.load(s, dir, "orders")
        .select(
          col("o_custkey"), col("o_orderkey"),
          sum(col("o_totalprice").cast(DecimalType(25, 6))).over(w)
            .cast("double").as("sliding_sum"),
          count(lit(1)).over(w).as("sliding_n"))
        .orderBy("o_custkey", "o_orderkey")
    },

    // Set operations: INTERSECT / EXCEPT / UNION ALL with tags.
    "q09_setops" -> { (s, dir) =>
      val c = Tables.load(s, dir, "customer")
      val o = Tables.load(s, dir, "orders")
      val rich = c.filter(col("c_acctbal") > 5000.0).select(col("c_custkey"))
      val active = o.select(col("o_custkey").as("c_custkey")).distinct()
      val both = rich.intersect(active).withColumn("tag", lit("both"))
      val richOnly = rich.except(active).withColumn("tag", lit("rich_only"))
      val activeOnly = active.except(rich).withColumn("tag", lit("active_only"))
      both.unionAll(richOnly).unionAll(activeOnly).orderBy("tag", "c_custkey")
    },

    // Multiset set ops: INTERSECT ALL / EXCEPT ALL on non-unique keys.
    "q10_setops_all" -> { (s, dir) =>
      val o = Tables.load(s, dir, "orders")
      val a = o.filter(col("o_totalprice") > 100000.0).select(col("o_custkey"))
      val b = o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
      a.intersectAll(b).groupBy(col("o_custkey")).agg(count(lit(1)).as("n_inter"))
        .join(
          a.exceptAll(b).groupBy(col("o_custkey")).agg(count(lit(1)).as("n_exc")),
          Seq("o_custkey"), "full_outer")
        .select(col("o_custkey"),
          coalesce(col("n_inter"), lit(0L)).as("n_inter"),
          coalesce(col("n_exc"), lit(0L)).as("n_exc"))
        .orderBy("o_custkey")
    },

    // Top-N per group (Flink RankOperator / StreamExecRank batch analogue).
    "q11_topn_per_customer" -> { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.load(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          row_number().over(w).as("rn"))
        .filter(col("rn") <= 3)
        .orderBy("o_custkey", "rn")
    },

    // Global sort + limit (TakeOrderedAndProject).
    "q12_top10_orders" -> { (s, dir) =>
      Tables.load(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    },

    // Scalar-subquery shape: parts above their brand's average price
    // (window-average formulation; exact decimal avg).
    "q13_above_brand_avg" -> { (s, dir) =>
      val wb = Window.partitionBy(col("p_brand"))
      Tables.load(s, dir, "part")
        .withColumn("brand_avg",
          sum(col("p_retailprice").cast(DecimalType(25, 6))).over(wb).cast("double")
            / count(lit(1)).over(wb))
        .filter(col("p_retailprice") > col("brand_avg"))
        .select(col("p_partkey"), col("p_brand"), col("p_retailprice"), col("brand_avg"))
        .orderBy("p_partkey")
    },

    // Full outer join of two aggregates.
    "q14_full_outer" -> { (s, dir) =>
      val c = Tables.load(s, dir, "customer")
        .groupBy(col("c_nationkey").as("nationkey")).agg(count(lit(1)).as("n_cust"))
      val sup = Tables.load(s, dir, "supplier")
        .groupBy(col("s_nationkey").as("nationkey")).agg(count(lit(1)).as("n_supp"))
      c.join(sup, Seq("nationkey"), "full_outer")
        .select(col("nationkey"),
          coalesce(col("n_cust"), lit(0L)).as("n_cust"),
          coalesce(col("n_supp"), lit(0L)).as("n_supp"))
        .orderBy("nationkey")
    },

    // Cross join (BroadcastNestedLoop/Cartesian).
    "q15_cross_join" -> { (s, dir) =>
      val r = Tables.load(s, dir, "region").select(col("r_name"))
      val st = Tables.load(s, dir, "orders").select(col("o_orderstatus")).distinct()
      r.crossJoin(st).orderBy("r_name", "o_orderstatus")
    },

    // UNNEST / lateral: explode words of p_type with position.
    "q16_unnest_words" -> { (s, dir) =>
      Tables.load(s, dir, "part")
        .select(col("p_partkey"), posexplode(split(col("p_name"), " ")).as(Seq("pos", "word")))
        .groupBy(col("word")).agg(count(lit(1)).as("n"), min(col("pos")).as("min_pos"))
        .orderBy("word")
    },

    // UDTF through SQL: the native SplitToRows Generator (§2.11
    // TableFunction parity) via LATERAL VIEW — Flink's
    // `LATERAL TABLE(split(...))` shape with multi-column output.
    "q26_udtf_lateral" -> { (s, dir) =>
      Tables.load(s, dir, "documents").createOrReplaceTempView("docs_q26")
      s.sql("""
        SELECT doc_id, pos, word
        FROM docs_q26 LATERAL VIEW split_to_rows(text, ' ') t AS pos, word
        WHERE doc_id < 50
        ORDER BY doc_id, pos""")
    },

    // Multiple DISTINCT aggregates (Catalyst Expand-based distinct split).
    "q17_distinct_aggs" -> { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(col("l_partkey")).as("n_part"),
          count(lit(1)).as("n_rows"),
          dsum(col("l_quantity")).as("sum_qty"))
        .orderBy("l_returnflag")
    },

    // Conditional expression matrix: CASE/NULLIF/COALESCE/GREATEST/LEAST/IN.
    "q18_conditionals" -> { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .select(
          col("l_orderkey"), col("l_linenumber"),
          when(col("l_quantity") < 10, "low")
            .when(col("l_quantity") < 30, "mid")
            .otherwise("high").as("qty_band"),
          nullif(col("l_returnflag"), lit("N")).as("flag_or_null"),
          coalesce(nullif(col("l_linestatus"), lit("O")), lit("open")).as("status2"),
          greatest(col("l_discount"), col("l_tax")).as("max_rate"),
          least(col("l_discount"), col("l_tax")).as("min_rate"),
          col("l_returnflag").isin("A", "R").as("is_returned"))
        .groupBy(col("qty_band"), col("flag_or_null"), col("status2"), col("is_returned"))
        .agg(count(lit(1)).as("n"),
          dsum(col("max_rate") - col("min_rate")).as("sum_spread"))
        .orderBy("qty_band", "flag_or_null", "status2", "is_returned")
    },

    // GROUPING SETS via the SQL surface (parity with Flink SQL).
    "q19_grouping_sets" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(s"""
        SELECT coalesce(o_orderstatus, '(all)') AS o_orderstatus,
               coalesce(o_orderpriority, '(all)') AS o_orderpriority,
               count(1) AS n_orders,
               ${dsumSql("o_totalprice")} AS sum_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY o_orderstatus, o_orderpriority
      """)
    },

    // Correlated EXISTS with extra predicate (SQL surface; Catalyst
    // RewritePredicateSubquery → semi join).
    "q20_correlated_exists" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql("""
        SELECT o_orderkey, o_totalprice
        FROM orders o
        WHERE EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
        ORDER BY o_orderkey
      """)
    },

    // TPC-H Q15 shape: aggregated revenue view + equality against its
    // own global max (scalar aggregate broadcast back over the view).
    "q25_top_supplier" -> { (s, dir) =>
      val rev = Tables.load(s, dir, "lineitem")
        .where(col("l_shipdate") >= ts("1996-01-01") &&
          col("l_shipdate") < ts("1996-04-01"))
        .groupBy(col("l_suppkey"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("total_revenue"))
      val mx = rev.agg(max(col("total_revenue")).as("mx"))
      rev.join(broadcast(mx), col("total_revenue") === col("mx"))
        .join(Tables.load(s, dir, "supplier"),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
        .orderBy("s_suppkey")
    }
  )

  override def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" -> s"""
      SELECT l_returnflag, l_linestatus,
        ${dsumSql("l_quantity")} AS sum_qty,
        ${dsumSql("l_extendedprice")} AS sum_base_price,
        ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
        ${dsumSql("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)")} AS sum_charge,
        ${davgSql("l_quantity")} AS avg_qty,
        ${davgSql("l_extendedprice")} AS avg_price,
        ${davgSql("l_discount")} AS avg_disc,
        count(1) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""",

    "q02_revenue_by_nation" -> s"""
      SELECT r_name, n_name,
        ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue,
        count(1) AS n_items
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
      GROUP BY r_name, n_name
      ORDER BY r_name, n_name""",

    "q03_exists_semi" -> """
      SELECT c_custkey, c_name FROM customer
      WHERE EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey AND o_totalprice > 150000.0)
      ORDER BY c_custkey""",

    "q04_no_orders_anti" -> """
      SELECT c_custkey, c_acctbal FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      ORDER BY c_custkey""",

    "q05_rollup" -> s"""
      SELECT coalesce(o_orderstatus, '(all)') AS o_orderstatus,
             coalesce(o_orderpriority, '(all)') AS o_orderpriority,
             count(1) AS n_orders,
             ${dsumSql("o_totalprice")} AS sum_price,
             (CAST(grouping(o_orderstatus) AS INT) * 2
              + CAST(grouping(o_orderpriority) AS INT)) AS gid
      FROM orders
      GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
      ORDER BY gid, o_orderstatus, o_orderpriority""",

    "q06_cube" -> s"""
      SELECT coalesce(o_orderstatus, '(all)') AS o_orderstatus,
             coalesce(CAST(year(o_orderdate) AS INT), -1) AS o_year,
             count(1) AS n_orders,
             ${dsumSql("o_totalprice")} AS sum_price,
             (CAST(grouping(o_orderstatus) AS INT) * 2
              + CAST(grouping(year(o_orderdate)) AS INT)) AS gid
      FROM orders
      GROUP BY CUBE (o_orderstatus, year(o_orderdate))
      ORDER BY gid, o_orderstatus, o_year""",

    "q07_over_running" -> """
      SELECT o_custkey, o_orderkey,
        CAST(sum(CAST(o_totalprice AS DECIMAL(25,6)))
             OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
          AS running_total,
        rank() OVER (PARTITION BY o_custkey
                     ORDER BY o_totalprice DESC, o_orderkey) AS price_rank,
        lag(o_totalprice, 1) OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate, o_orderkey) AS prev_price,
        lead(o_totalprice, 1) OVER (PARTITION BY o_custkey
                                    ORDER BY o_orderdate, o_orderkey) AS next_price,
        row_number() OVER (PARTITION BY o_custkey
                           ORDER BY o_orderdate, o_orderkey) AS rn
      FROM orders
      ORDER BY o_custkey, rn""",

    "q08_over_sliding" -> """
      SELECT o_custkey, o_orderkey,
        CAST(sum(CAST(o_totalprice AS DECIMAL(25,6)))
             OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
          AS sliding_sum,
        count(1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                       ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS sliding_n
      FROM orders
      ORDER BY o_custkey, o_orderkey""",

    "q09_setops" -> """
      WITH rich AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0),
           active AS (SELECT DISTINCT o_custkey AS c_custkey FROM orders)
      SELECT c_custkey, 'both' AS tag FROM (SELECT c_custkey FROM rich INTERSECT SELECT c_custkey FROM active)
      UNION ALL
      SELECT c_custkey, 'rich_only' AS tag FROM (SELECT c_custkey FROM rich EXCEPT SELECT c_custkey FROM active)
      UNION ALL
      SELECT c_custkey, 'active_only' AS tag FROM (SELECT c_custkey FROM active EXCEPT SELECT c_custkey FROM rich)
      ORDER BY tag, c_custkey""",

    "q10_setops_all" -> """
      WITH a AS (SELECT o_custkey FROM orders WHERE o_totalprice > 100000.0),
           b AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'),
           inter AS (SELECT o_custkey, count(1) AS n_inter
                     FROM (SELECT o_custkey FROM a INTERSECT ALL SELECT o_custkey FROM b)
                     GROUP BY o_custkey),
           exc AS (SELECT o_custkey, count(1) AS n_exc
                   FROM (SELECT o_custkey FROM a EXCEPT ALL SELECT o_custkey FROM b)
                   GROUP BY o_custkey)
      SELECT coalesce(inter.o_custkey, exc.o_custkey) AS o_custkey,
             coalesce(n_inter, 0) AS n_inter,
             coalesce(n_exc, 0) AS n_exc
      FROM inter FULL OUTER JOIN exc ON inter.o_custkey = exc.o_custkey
      ORDER BY o_custkey""",

    "q11_topn_per_customer" -> """
      SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders)
      WHERE rn <= 3
      ORDER BY o_custkey, rn""",

    "q12_top10_orders" -> """
      SELECT o_orderkey, o_custkey, o_totalprice
      FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",

    "q13_above_brand_avg" -> """
      SELECT p_partkey, p_brand, p_retailprice, brand_avg FROM (
        SELECT p_partkey, p_brand, p_retailprice,
          CAST(sum(CAST(p_retailprice AS DECIMAL(25,6))) OVER (PARTITION BY p_brand) AS DOUBLE)
            / count(1) OVER (PARTITION BY p_brand) AS brand_avg
        FROM part)
      WHERE p_retailprice > brand_avg
      ORDER BY p_partkey""",

    "q14_full_outer" -> """
      WITH c AS (SELECT c_nationkey AS nationkey, count(1) AS n_cust
                 FROM customer GROUP BY c_nationkey),
           s AS (SELECT s_nationkey AS nationkey, count(1) AS n_supp
                 FROM supplier GROUP BY s_nationkey)
      SELECT coalesce(c.nationkey, s.nationkey) AS nationkey,
             coalesce(n_cust, 0) AS n_cust,
             coalesce(n_supp, 0) AS n_supp
      FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey
      ORDER BY nationkey""",

    "q15_cross_join" -> """
      SELECT r_name, o_orderstatus
      FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders)
      ORDER BY r_name, o_orderstatus""",

    "q16_unnest_words" -> """
      SELECT word, count(1) AS n, min(pos) AS min_pos FROM (
        SELECT CAST(unnest(range(len(string_split(p_name, ' ')))) AS INT) AS pos,
               unnest(string_split(p_name, ' ')) AS word
        FROM part)
      GROUP BY word
      ORDER BY word""",

    "q26_udtf_lateral" -> """
      SELECT doc_id, CAST(unnest(range(len(string_split(text, ' ')))) AS INT) AS pos,
             unnest(string_split(text, ' ')) AS word
      FROM documents
      WHERE doc_id < 50
      ORDER BY doc_id, pos""",

    "q17_distinct_aggs" -> s"""
      SELECT l_returnflag,
             count(DISTINCT l_suppkey) AS n_supp,
             count(DISTINCT l_partkey) AS n_part,
             count(1) AS n_rows,
             ${dsumSql("l_quantity")} AS sum_qty
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag""",

    "q18_conditionals" -> s"""
      SELECT qty_band, flag_or_null, status2, is_returned,
             count(1) AS n,
             ${dsumSql("max_rate - min_rate")} AS sum_spread
      FROM (
        SELECT l_orderkey, l_linenumber,
          CASE WHEN l_quantity < 10 THEN 'low'
               WHEN l_quantity < 30 THEN 'mid'
               ELSE 'high' END AS qty_band,
          nullif(l_returnflag, 'N') AS flag_or_null,
          coalesce(nullif(l_linestatus, 'O'), 'open') AS status2,
          greatest(l_discount, l_tax) AS max_rate,
          least(l_discount, l_tax) AS min_rate,
          l_returnflag IN ('A', 'R') AS is_returned
        FROM lineitem)
      GROUP BY qty_band, flag_or_null, status2, is_returned
      ORDER BY qty_band, flag_or_null, status2, is_returned""",

    "q19_grouping_sets" -> s"""
      SELECT coalesce(o_orderstatus, '(all)') AS o_orderstatus,
             coalesce(o_orderpriority, '(all)') AS o_orderpriority,
             count(1) AS n_orders,
             ${dsumSql("o_totalprice")} AS sum_price
      FROM orders
      GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      ORDER BY o_orderstatus, o_orderpriority""",

    "q20_correlated_exists" -> """
      SELECT o_orderkey, o_totalprice
      FROM orders o
      WHERE EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
      ORDER BY o_orderkey""",

    "q25_top_supplier" -> s"""
      WITH rev AS (
        SELECT l_suppkey,
               ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey)
      SELECT s_suppkey, s_name, total_revenue
      FROM rev JOIN supplier ON l_suppkey = s_suppkey
      WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
      ORDER BY s_suppkey"""
  )
}
