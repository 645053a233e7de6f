package graft.operators

import graft.{OracleSafe, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** TPC-DS-shaped query suite, part 3 (ds35–ds49) — fifteen further DS
  * families re-keyed to the testdata: q9 (scalar-subquery CASE
  * buckets), q32/q92 (excess discount), q38 (INTERSECT customer sets),
  * q59 (period-over-period day-of-week pivot), q61 (promo ratio), q66
  * (month-pivot wide aggregate), q67 (top-N over ROLLUP), q72
  * (inequality join against a derived next-period aggregate), q75
  * (declining brands, two measures), q90 (scalar count ratio), q95
  * (EXISTS-twice order filter), q97 (FULL OUTER set-overlap counts),
  * q98 (share-of-parent via window), q13/q48 (OR-of-band predicates),
  * q21/q40 (before/after pivot-date balance). Reference gate:
  * flink-end-to-end-tests/flink-tpcds-test. Determinism and scale
  * conventions as in DsParityExt.
  */
object DsParityExt2 extends QueryModule {
  import OracleSafe._

  private def rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
  private def ts(d: String) = lit(d).cast("timestamp_ntz")

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // q9 shape: CASE over scalar-subquery thresholds — each bucket
    // reports one of two averages depending on its own row count.
    "ds35_bucket_case_stats" -> { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      def band(lo: Double, hi: Double) = col("l_quantity").between(lo, hi)
      val agg = li.agg(
        count(when(band(1, 10), lit(1))).as("n1"),
        count(when(band(11, 30), lit(1))).as("n2"),
        count(when(band(31, 50), lit(1))).as("n3"),
        davg(when(band(1, 10), col("l_extendedprice"))).as("p1"),
        davg(when(band(11, 30), col("l_extendedprice"))).as("p2"),
        davg(when(band(31, 50), col("l_extendedprice"))).as("p3"),
        davg(when(band(1, 10), col("l_discount"))).as("d1"),
        davg(when(band(11, 30), col("l_discount"))).as("d2"),
        davg(when(band(31, 50), col("l_discount"))).as("d3"))
      agg.select(
        col("n1"), col("n2"), col("n3"),
        when(col("n1") > 15000, col("p1")).otherwise(col("d1")).as("b1"),
        when(col("n2") > 15000, col("p2")).otherwise(col("d2")).as("b2"),
        when(col("n3") > 15000, col("p3")).otherwise(col("d3")).as("b3"))
    },

    // q32/q92 shape: lineitems whose discount exceeds 1.3× their
    // part's average discount (fact joined to its own aggregate),
    // "excess" revenue per return flag.
    "ds36_excess_discount" -> { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      val pa = li.groupBy(col("l_partkey").as("pk"))
        .agg(davg(col("l_discount")).as("ad"))
      li.join(pa, col("l_partkey") === col("pk"))
        .where(col("l_discount") > col("ad") * 1.3)
        .groupBy(col("l_returnflag"))
        .agg(dsum(col("l_extendedprice")).as("excess_rev"), count(lit(1)).as("n_lines"))
        .orderBy("l_returnflag")
    },

    // q38 shape: customers active in all three years (INTERSECT
    // chain), counted per nation.
    "ds37_retained_customers_intersect" -> { (s, dir) =>
      val o = Tables.load(s, dir, "orders")
      def yr(y: Int) = o.where(year(col("o_orderdate")) === y).select(col("o_custkey"))
      yr(1995).intersect(yr(1996)).intersect(yr(1997))
        .join(Tables.load(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.load(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name")).agg(count(lit(1)).as("n_cust"))
        .orderBy("n_name")
    },

    // q59 shape: first-half vs second-half revenue per (nation,
    // ISO day-of-week) from one aggregated CTE self-joined; ratio of
    // exact sums.
    "ds38_dow_half_year" -> { (s, dir) =>
      val base = Tables.load(s, dir, "lineitem")
        .join(Tables.load(s, dir, "orders").select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.load(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.load(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .where(col("l_shipdate") >= ts("1997-01-01") && col("l_shipdate") < ts("1998-01-01"))
        .groupBy(col("n_name"), (expr("weekday(l_shipdate)") + 1).cast("int").as("dow"),
          (col("l_shipdate") < ts("1997-07-01")).as("h1"))
        .agg(dsum(rev).as("r"))
      val a = base.where(col("h1"))
        .select(col("n_name").as("n1"), col("dow").as("dow1"), col("r").as("rev_h1"))
      val b = base.where(!col("h1"))
        .select(col("n_name").as("n2"), col("dow").as("dow2"), col("r").as("rev_h2"))
      a.join(b, col("n1") === col("n2") && col("dow1") === col("dow2"))
        .select(col("n1").as("n_name"), col("dow1").as("dow"),
          col("rev_h1"), col("rev_h2"),
          (col("rev_h2") / col("rev_h1")).as("ratio"))
        .orderBy("n_name", "dow")
    },

    // q61 shape: promotional share of total revenue — two conditional
    // exact sums in one pass, percentage from the same exact operands.
    "ds39_promo_ratio" -> { (s, dir) =>
      Tables.load(s, dir, "orders")
        .where(year(col("o_orderdate")) === 1997)
        .agg(dsum(when(col("o_orderpriority") === "1-URGENT", col("o_totalprice"))
            .otherwise(lit(0.0))).as("promo_rev"),
          dsum(col("o_totalprice")).as("total_rev"))
        .select(col("promo_rev"), col("total_rev"),
          (col("promo_rev") * 100 / col("total_rev")).as("pct"))
    },

    // q66 shape: wide month-pivot aggregate — twelve conditional sums
    // per supplier nation in one scan.
    "ds40_month_pivot" -> { (s, dir) =>
      val monthCols = (1 to 12).map(m =>
        dsum(when(month(col("l_shipdate")) === m, rev).otherwise(lit(0.0)))
          .as(f"m$m%02d"))
      Tables.load(s, dir, "lineitem")
        .where(col("l_shipdate") >= ts("1997-01-01") && col("l_shipdate") < ts("1998-01-01"))
        .join(broadcast(Tables.load(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.load(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(monthCols.head, monthCols.tail :+ dsum(rev).as("total"): _*)
        .orderBy("n_name")
    },

    // q67 shape: top-N within each parent of a ROLLUP — rank over the
    // Expand output partitioned by the (coalesced) brand.
    "ds41_rollup_topn" -> { (s, dir) =>
      val r = Tables.load(s, dir, "lineitem")
        .join(broadcast(Tables.load(s, dir, "part")), col("l_partkey") === col("p_partkey"))
        .rollup(col("p_brand"), col("p_type"))
        .agg(dsum(rev).as("rev"))
      val w = Window.partitionBy(coalesce(col("p_brand"), lit("(all)")))
        .orderBy(col("rev").desc, coalesce(col("p_type"), lit("")))
      r.withColumn("rk", rank().over(w).cast("int")).where(col("rk") <= 3)
        .select(coalesce(col("p_brand"), lit("(all)")).as("brand"),
          coalesce(col("p_type"), lit("(all)")).as("ptype"),
          col("rev"), col("rk"))
        .orderBy("brand", "rk", "ptype")
    },

    // q72 shape: inequality join against a derived next-period
    // aggregate — lines whose quantity exceeds 5% of their part's
    // next-month volume.
    "ds42_next_month_supply" -> { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
        .where(col("l_shipdate") >= ts("1997-01-01") && col("l_shipdate") < ts("1998-01-01"))
      val supply = li.groupBy(col("l_partkey").as("pk"),
          month(col("l_shipdate")).cast("int").as("m"))
        .agg(dsum(col("l_quantity")).as("sq"))
      li.join(supply, col("l_partkey") === col("pk") &&
          col("m") === month(col("l_shipdate")).cast("int") + 1)
        .where(col("l_quantity") * 20 > col("sq"))
        .groupBy(month(col("l_shipdate")).cast("int").as("ship_m"))
        .agg(count(lit(1)).as("n_lines"), dsum(col("l_extendedprice")).as("rev"))
        .orderBy("ship_m")
    },

    // q75 shape: year-over-year per brand with TWO measures, kept
    // where quantity declines.
    "ds43_declining_brands" -> { (s, dir) =>
      val by = Tables.load(s, dir, "lineitem")
        .join(broadcast(Tables.load(s, dir, "part")), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), year(col("l_shipdate")).cast("int").as("y"))
        .agg(dsum(col("l_quantity")).as("q"), dsum(col("l_extendedprice")).as("r"))
      val a = by.where(col("y") === 1996)
        .select(col("p_brand").as("b1"), col("q").as("qty96"), col("r").as("rev96"))
      val b = by.where(col("y") === 1997)
        .select(col("p_brand").as("b2"), col("q").as("qty97"), col("r").as("rev97"))
      a.join(b, col("b1") === col("b2"))
        .where(col("qty97") < col("qty96"))
        .select(col("b1").as("p_brand"), col("qty96"), col("qty97"),
          col("rev96"), col("rev97"), (col("rev97") - col("rev96")).as("rev_delta"))
        .orderBy("p_brand")
    },

    // q90 shape: ratio of two window counts (first half vs second
    // half of the year) — integer counts, one-row output.
    "ds44_half_count_ratio" -> { (s, dir) =>
      Tables.load(s, dir, "orders")
        .where(year(col("o_orderdate")) === 1997)
        .agg(sum(when(col("o_orderdate") < ts("1997-07-01"), 1L).otherwise(0L)).as("n_h1"),
          sum(when(col("o_orderdate") >= ts("1997-07-01"), 1L).otherwise(0L)).as("n_h2"))
        .select(col("n_h1"), col("n_h2"), (col("n_h1") / col("n_h2")).as("ratio"))
    },

    // q95 shape: orders gated by two EXISTS over the fact — at least
    // two distinct suppliers AND at least one returned line.
    "ds45_multi_supplier_returned" -> { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      val multi = li.groupBy(col("l_orderkey"))
        .agg(countDistinct(col("l_suppkey")).as("ns")).where(col("ns") >= 2)
        .select(col("l_orderkey"))
      val ret = li.where(col("l_returnflag") === "R").select(col("l_orderkey")).distinct()
      Tables.load(s, dir, "orders")
        .join(multi, col("o_orderkey") === multi("l_orderkey"), "left_semi")
        .join(ret, col("o_orderkey") === ret("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("rev"))
        .orderBy("o_orderpriority")
    },

    // q97 shape: FULL OUTER overlap of two periods' (customer, part)
    // sets — both/left-only/right-only counts from the null pattern.
    "ds46_set_overlap_counts" -> { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
        .join(Tables.load(s, dir, "orders").select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
      def half(from: String, to: String, a: String, b: String) =
        li.where(col("l_shipdate") >= ts(from) && col("l_shipdate") < ts(to))
          .select(col("o_custkey").as(a), col("l_partkey").as(b)).distinct()
      val h1 = half("1997-01-01", "1997-07-01", "ck1", "pk1")
      val h2 = half("1997-07-01", "1998-01-01", "ck2", "pk2")
      h1.join(h2, col("ck1") === col("ck2") && col("pk1") === col("pk2"), "full_outer")
        .agg(
          sum(when(col("ck1").isNotNull && col("ck2").isNotNull, 1L).otherwise(0L)).as("n_both"),
          sum(when(col("ck2").isNull, 1L).otherwise(0L)).as("n_h1_only"),
          sum(when(col("ck1").isNull, 1L).otherwise(0L)).as("n_h2_only"))
    },

    // q98 shape: share-of-parent — part revenue as a percentage of its
    // brand's total via an exact-decimal window sum over the aggregate.
    "ds47_share_within_brand" -> { (s, dir) =>
      val base = Tables.load(s, dir, "lineitem")
        .join(broadcast(Tables.load(s, dir, "part")), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("l_partkey"))
        .agg(dsum(rev).as("rev"))
      val w = Window.partitionBy(col("p_brand"))
      base
        .withColumn("brand_sum",
          sum(col("rev").cast(DecimalType(25, 6))).over(w).cast("double"))
        .withColumn("n_parts", count(lit(1)).over(w))
        .withColumn("share", col("rev") * 100 / col("brand_sum"))
        // above 1.2× the brand's mean part share — scale-independent,
        // so the query stays non-vacuous at every SF (cross-multiplied)
        .where(col("rev") * col("n_parts") > col("brand_sum") * 1.2)
        .select(col("p_brand"), col("l_partkey"), col("rev"), col("share"))
        .orderBy("p_brand", "l_partkey")
    },

    // q13/q48 shape: OR of (status, quantity-band, discount-band)
    // conjunctions over the joined fact, grouped stats.
    "ds48_or_band_stats" -> { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .join(Tables.load(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .where(
          (col("o_orderstatus") === "F" && col("l_quantity").between(1, 15) &&
            col("l_discount") <= 0.05) ||
          (col("o_orderstatus") === "O" && col("l_quantity").between(16, 35) &&
            col("l_discount").between(0.03, 0.08)) ||
          (col("o_orderstatus") === "P" && col("l_quantity").between(36, 50) &&
            col("l_discount") >= 0.06))
        .groupBy(col("l_linestatus"))
        .agg(count(lit(1)).as("n"), davg(col("l_quantity")).as("avg_qty"),
          dsum(col("l_extendedprice")).as("rev"))
        .orderBy("l_linestatus")
    },

    // q21/q40 shape: per-supplier shipped quantity before vs after a
    // pivot date, kept when balanced (after within ±25% of before).
    "ds49_pivot_date_balance" -> { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .where(col("l_shipdate") >= ts("1997-01-01") && col("l_shipdate") < ts("1998-01-01"))
        .groupBy(col("l_suppkey"))
        .agg(dsum(when(col("l_shipdate") < ts("1997-07-01"), col("l_quantity"))
            .otherwise(lit(0.0))).as("q_before"),
          dsum(when(col("l_shipdate") >= ts("1997-07-01"), col("l_quantity"))
            .otherwise(lit(0.0))).as("q_after"))
        .where(col("q_after") * 4 >= col("q_before") * 3 &&
          col("q_after") * 4 <= col("q_before") * 5)
        .orderBy("l_suppkey")
    }
  )

  override def oracleSql: Map[String, String] = Map(
    "ds35_bucket_case_stats" -> s"""
      SELECT
        (SELECT count(CASE WHEN l_quantity BETWEEN 1 AND 10 THEN 1 END)
         FROM lineitem) AS n1,
        (SELECT count(CASE WHEN l_quantity BETWEEN 11 AND 30 THEN 1 END)
         FROM lineitem) AS n2,
        (SELECT count(CASE WHEN l_quantity BETWEEN 31 AND 50 THEN 1 END)
         FROM lineitem) AS n3,
        CASE WHEN (SELECT count(1) FROM lineitem WHERE l_quantity BETWEEN 1 AND 10) > 15000
             THEN (SELECT ${davgSql("l_extendedprice")} FROM lineitem
                   WHERE l_quantity BETWEEN 1 AND 10)
             ELSE (SELECT ${davgSql("l_discount")} FROM lineitem
                   WHERE l_quantity BETWEEN 1 AND 10) END AS b1,
        CASE WHEN (SELECT count(1) FROM lineitem WHERE l_quantity BETWEEN 11 AND 30) > 15000
             THEN (SELECT ${davgSql("l_extendedprice")} FROM lineitem
                   WHERE l_quantity BETWEEN 11 AND 30)
             ELSE (SELECT ${davgSql("l_discount")} FROM lineitem
                   WHERE l_quantity BETWEEN 11 AND 30) END AS b2,
        CASE WHEN (SELECT count(1) FROM lineitem WHERE l_quantity BETWEEN 31 AND 50) > 15000
             THEN (SELECT ${davgSql("l_extendedprice")} FROM lineitem
                   WHERE l_quantity BETWEEN 31 AND 50)
             ELSE (SELECT ${davgSql("l_discount")} FROM lineitem
                   WHERE l_quantity BETWEEN 31 AND 50) END AS b3""",

    "ds36_excess_discount" -> s"""
      WITH pa AS (
        SELECT l_partkey AS pk, ${davgSql("l_discount")} AS ad
        FROM lineitem GROUP BY 1)
      SELECT l_returnflag, ${dsumSql("l_extendedprice")} AS excess_rev,
             count(1) AS n_lines
      FROM lineitem JOIN pa ON l_partkey = pk
      WHERE l_discount > ad * 1.3
      GROUP BY l_returnflag
      ORDER BY l_returnflag""",

    "ds37_retained_customers_intersect" -> """
      WITH retained AS (
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
        INTERSECT
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
        INTERSECT
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997)
      SELECT n_name, count(1) AS n_cust
      FROM retained
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name
      ORDER BY n_name""",

    "ds38_dow_half_year" -> s"""
      WITH base AS (
        SELECT n_name, CAST(isodow(l_shipdate) AS INT) AS dow,
               l_shipdate < TIMESTAMP '1997-07-01' AS h1,
               ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS r
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY 1, 2, 3)
      SELECT a.n_name AS n_name, a.dow AS dow, a.r AS rev_h1, b.r AS rev_h2,
             b.r / a.r AS ratio
      FROM base a JOIN base b ON a.n_name = b.n_name AND a.dow = b.dow
      WHERE a.h1 AND NOT b.h1
      ORDER BY n_name, dow""",

    "ds39_promo_ratio" -> s"""
      SELECT promo_rev, total_rev, promo_rev * 100 / total_rev AS pct
      FROM (
        SELECT ${dsumSql(
          "CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice ELSE 0.0 END")}
            AS promo_rev,
          ${dsumSql("o_totalprice")} AS total_rev
        FROM orders WHERE year(o_orderdate) = 1997)""",

    "ds40_month_pivot" -> {
      val cols = (1 to 12).map { m =>
        val alias = f"m$m%02d"
        s"${dsumSql(s"CASE WHEN month(l_shipdate) = $m THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END")} AS $alias"
      }.mkString(",\n        ")
      s"""
      SELECT n_name,
        $cols,
        ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS total
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
      GROUP BY n_name
      ORDER BY n_name"""
    },

    "ds41_rollup_topn" -> s"""
      WITH r AS (
        SELECT p_brand, p_type,
               ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS rev
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY ROLLUP (p_brand, p_type)),
      rk AS (
        SELECT coalesce(p_brand, '(all)') AS brand,
               coalesce(p_type, '(all)') AS ptype, rev,
               CAST(rank() OVER (PARTITION BY coalesce(p_brand, '(all)')
                 ORDER BY rev DESC, coalesce(p_type, '')) AS INT) AS rk
        FROM r)
      SELECT brand, ptype, rev, rk
      FROM rk WHERE rk <= 3
      ORDER BY brand, rk, ptype""",

    "ds42_next_month_supply" -> s"""
      WITH li AS (
        SELECT * FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'),
      supply AS (
        SELECT l_partkey AS pk, CAST(month(l_shipdate) AS INT) AS m,
               ${dsumSql("l_quantity")} AS sq
        FROM li GROUP BY 1, 2)
      SELECT CAST(month(l_shipdate) AS INT) AS ship_m, count(1) AS n_lines,
             ${dsumSql("l_extendedprice")} AS rev
      FROM li JOIN supply
        ON l_partkey = pk AND m = CAST(month(l_shipdate) AS INT) + 1
      WHERE l_quantity * 20 > sq
      GROUP BY month(l_shipdate)
      ORDER BY ship_m""",

    "ds43_declining_brands" -> s"""
      WITH by AS (
        SELECT p_brand, CAST(year(l_shipdate) AS INT) AS y,
               ${dsumSql("l_quantity")} AS q, ${dsumSql("l_extendedprice")} AS r
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY 1, 2)
      SELECT a.p_brand AS p_brand, a.q AS qty96, b.q AS qty97,
             a.r AS rev96, b.r AS rev97, b.r - a.r AS rev_delta
      FROM by a JOIN by b ON a.p_brand = b.p_brand
      WHERE a.y = 1996 AND b.y = 1997 AND b.q < a.q
      ORDER BY p_brand""",

    "ds44_half_count_ratio" -> """
      SELECT n_h1, n_h2, n_h1 / n_h2 AS ratio
      FROM (
        SELECT
          CAST(sum(CASE WHEN o_orderdate < TIMESTAMP '1997-07-01'
                   THEN 1 ELSE 0 END) AS BIGINT) AS n_h1,
          CAST(sum(CASE WHEN o_orderdate >= TIMESTAMP '1997-07-01'
                   THEN 1 ELSE 0 END) AS BIGINT) AS n_h2
        FROM orders WHERE year(o_orderdate) = 1997)""",

    "ds45_multi_supplier_returned" -> s"""
      SELECT o_orderpriority, count(1) AS n_orders,
             ${dsumSql("o_totalprice")} AS rev
      FROM orders
      WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                           GROUP BY 1 HAVING count(DISTINCT l_suppkey) >= 2)
        AND o_orderkey IN (SELECT l_orderkey FROM lineitem
                           WHERE l_returnflag = 'R')
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority""",

    "ds46_set_overlap_counts" -> """
      WITH h1 AS (
        SELECT DISTINCT o_custkey AS ck, l_partkey AS pk
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1997-07-01'),
      h2 AS (
        SELECT DISTINCT o_custkey AS ck, l_partkey AS pk
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1997-07-01'
          AND l_shipdate < TIMESTAMP '1998-01-01')
      SELECT
        CAST(sum(CASE WHEN h1.ck IS NOT NULL AND h2.ck IS NOT NULL
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_both,
        CAST(sum(CASE WHEN h2.ck IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_h1_only,
        CAST(sum(CASE WHEN h1.ck IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_h2_only
      FROM h1 FULL OUTER JOIN h2 ON h1.ck = h2.ck AND h1.pk = h2.pk""",

    "ds47_share_within_brand" -> s"""
      WITH base AS (
        SELECT p_brand, l_partkey,
               ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS rev
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand, l_partkey),
      w AS (
        SELECT *, CAST(sum(CAST(rev AS DECIMAL(25,6))) OVER
                 (PARTITION BY p_brand) AS DOUBLE) AS brand_sum,
               count(1) OVER (PARTITION BY p_brand) AS n_parts
        FROM base)
      SELECT p_brand, l_partkey, rev, rev * 100 / brand_sum AS share
      FROM w WHERE rev * n_parts > brand_sum * 1.2
      ORDER BY p_brand, l_partkey""",

    "ds48_or_band_stats" -> s"""
      SELECT l_linestatus, count(1) AS n, ${davgSql("l_quantity")} AS avg_qty,
             ${dsumSql("l_extendedprice")} AS rev
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE (o_orderstatus = 'F' AND l_quantity BETWEEN 1 AND 15
             AND l_discount <= 0.05)
         OR (o_orderstatus = 'O' AND l_quantity BETWEEN 16 AND 35
             AND l_discount BETWEEN 0.03 AND 0.08)
         OR (o_orderstatus = 'P' AND l_quantity BETWEEN 36 AND 50
             AND l_discount >= 0.06)
      GROUP BY l_linestatus
      ORDER BY l_linestatus""",

    "ds49_pivot_date_balance" -> s"""
      WITH ba AS (
        SELECT l_suppkey,
          ${dsumSql("CASE WHEN l_shipdate < TIMESTAMP '1997-07-01' THEN l_quantity ELSE 0.0 END")}
            AS q_before,
          ${dsumSql("CASE WHEN l_shipdate >= TIMESTAMP '1997-07-01' THEN l_quantity ELSE 0.0 END")}
            AS q_after
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY l_suppkey)
      SELECT l_suppkey, q_before, q_after
      FROM ba
      WHERE q_after * 4 >= q_before * 3 AND q_after * 4 <= q_before * 5
      ORDER BY l_suppkey"""
  )
}
