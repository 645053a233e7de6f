package graft.operators

import graft.{OracleSafe, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Aggregate-function parity (SURVEY.md §2.4: the reference's 28 built-in
  * agg functions incl. FirstValueAggFunction, LastValueAggFunction,
  * ListAggFunction, CollectAggFunction multiset, Sum0AggFunction,
  * MinWithRetractAggFunction...). Retract variants are unnecessary in
  * batch; streaming update-mode covers them (graft.streaming).
  * Floating-point variance/stddev are computed from exact decimal moments
  * so both engines produce identical doubles.
  */
object AggregatesSuite extends QueryModule {
  import OracleSafe._

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // FIRST_VALUE / LAST_VALUE with deterministic ordering.
    "a01_first_last_value" -> { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.load(s, dir, "orders")
        .select(col("o_custkey"),
          first(col("o_orderstatus")).over(w).as("first_status"),
          last(col("o_orderstatus")).over(wf).as("last_status"),
          first(col("o_totalprice")).over(w).as("first_price"),
          last(col("o_totalprice")).over(wf).as("last_price"))
        .distinct()
        .orderBy("o_custkey")
    },

    // LISTAGG (sorted, deterministic) per customer.
    "a02_listagg" -> { (s, dir) =>
      Tables.load(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(concat_ws(",", array_sort(collect_list(col("o_orderstatus"))))
          .as("status_list"),
          count(lit(1)).as("n"))
        .orderBy("o_custkey")
    },

    // COLLECT (multiset) as sorted element:count pairs per status.
    "a03_collect_multiset" -> { (s, dir) =>
      Tables.load(s, dir, "orders")
        .groupBy(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("o_orderstatus"))
        .agg(concat_ws(",", array_sort(collect_list(
          concat(col("o_orderpriority"), lit(":"), col("cnt"))))).as("multiset"))
        .orderBy("o_orderstatus")
    },

    // VAR_POP / VAR_SAMP / STDDEV from exact decimal moments. Inputs are
    // pre-scaled by 1e-5 so the decimal sums stay below 2^53 in scaled
    // units — above that, Spark (one rounding) and DuckDB (int128→double
    // then /10^scale: two roundings) can disagree by 1 ulp.
    "a04_stats_exact" -> { (s, dir) =>
      // x has a 7-digit decimal expansion (2dp price * 1e-5): fsum, not
      // dsum — the decimal cast's rounding tie diverged at sf0.1.
      Tables.load(s, dir, "orders")
        .withColumn("x", col("o_totalprice") * 1e-5)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          fsum(col("x")).as("s1"),
          fsum(col("x") * col("x")).as("s2"))
        .select(col("o_orderstatus"), col("n"),
          (col("s1") / col("n") * 1e5).as("mean"),
          ((col("s2") - col("s1") * col("s1") / col("n")) / col("n") * 1e10).as("var_pop"),
          ((col("s2") - col("s1") * col("s1") / col("n")) / (col("n") - 1) * 1e10).as("var_samp"),
          (sqrt((col("s2") - col("s1") * col("s1") / col("n")) / col("n")) * 1e5).as("stddev_pop"))
        .orderBy("o_orderstatus")
    },

    // SUM0 (0 on empty input) + MIN_BY / MAX_BY with unique ordering.
    "a05_sum0_minmax_by" -> { (s, dir) =>
      Tables.load(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(
          coalesce(dsum(when(col("o_totalprice") > 500000.0, col("o_totalprice"))),
            lit(0.0)).as("sum0_big"),
          max_by(col("o_orderkey"),
            format_string("%020.6f|%010d", col("o_totalprice"), col("o_orderkey")))
            .as("key_of_max"),
          min_by(col("o_orderkey"),
            format_string("%020.6f|%010d", col("o_totalprice"), col("o_orderkey")))
            .as("key_of_min"),
          max(col("o_totalprice")).as("max_price"),
          min(col("o_totalprice")).as("min_price"))
        .orderBy("o_orderstatus")
    },

    // Exact percentiles (reference: PERCENTILE via sort-agg; Spark exact
    // `percentile`, DuckDB quantile_cont — identical R-7 interpolation).
    "a06_percentiles" -> { (s, dir) =>
      Tables.load(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(
          round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
          round(expr("percentile(o_totalprice, 0.95)"), 4).as("p95"))
        .orderBy("o_orderstatus")
    },

    // IGNORE NULLS navigation — Flink's FIRST_VALUE/LAST_VALUE skip
    // nulls by default; nulls synthesized via nullif.
    "a08_ignore_nulls" -> { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
      val wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.load(s, dir, "orders")
        .withColumn("maybe", nullif(col("o_orderstatus"), lit("O")))
        .select(col("o_custkey"), col("o_orderkey"),
          first(col("maybe"), ignoreNulls = true).over(wf).as("first_nn"),
          last(col("maybe"), ignoreNulls = true).over(wf).as("last_nn"))
        .orderBy("o_custkey", "o_orderkey")
    },

    // Approximate sketches (HLL distinct, GK percentile). Sketch VALUES
    // aren't portable across engines, so the oracle checks the exact
    // column plus BOUNDED-ERROR assertions: the HLL estimate must land
    // within 5% of exact (rsd=0.01, so 5 sigma) and the approximate
    // median must land between the exact p40 and p60. Both are
    // deterministic for fixed data, making the query hash-checkable —
    // stronger than r1's rows-only check.
    "a07_approx_distinct" -> { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("exact_parts"),
          approx_count_distinct(col("l_partkey"), 0.01).as("__hll"),
          percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000))
            .as("__p50a"),
          expr("percentile(l_extendedprice, 0.40)").as("__p40"),
          expr("percentile(l_extendedprice, 0.60)").as("__p60"))
        .select(col("l_returnflag"), col("exact_parts"),
          (abs(col("__hll") - col("exact_parts")) <=
            col("exact_parts") * 0.05).as("hll_ok"),
          (col("__p50a") >= col("__p40") &&
            col("__p50a") <= col("__p60")).as("p50_ok"))
        .orderBy("l_returnflag")
    }
  )

  override def oracleSql: Map[String, String] = Map(
    "a07_approx_distinct" -> """
      SELECT l_returnflag,
        count(DISTINCT l_partkey) AS exact_parts,
        TRUE AS hll_ok,
        TRUE AS p50_ok
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag""",

    "a08_ignore_nulls" -> """
      SELECT o_custkey, o_orderkey,
        first_value(maybe IGNORE NULLS) OVER wf AS first_nn,
        last_value(maybe IGNORE NULLS) OVER wf AS last_nn
      FROM (SELECT o_custkey, o_orderkey, nullif(o_orderstatus, 'O') AS maybe
            FROM orders)
      WINDOW wf AS (PARTITION BY o_custkey ORDER BY o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      ORDER BY o_custkey, o_orderkey""",

    "a01_first_last_value" -> """
      SELECT DISTINCT o_custkey,
        first_value(o_orderstatus) OVER w AS first_status,
        last_value(o_orderstatus) OVER (PARTITION BY o_custkey
          ORDER BY o_orderdate, o_orderkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_status,
        first_value(o_totalprice) OVER w AS first_price,
        last_value(o_totalprice) OVER (PARTITION BY o_custkey
          ORDER BY o_orderdate, o_orderkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_price
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      ORDER BY o_custkey""",

    "a02_listagg" -> """
      SELECT o_custkey,
        string_agg(o_orderstatus, ',' ORDER BY o_orderstatus) AS status_list,
        count(1) AS n
      FROM orders
      GROUP BY o_custkey
      ORDER BY o_custkey""",

    "a03_collect_multiset" -> """
      SELECT o_orderstatus,
        string_agg(pair, ',' ORDER BY pair) AS multiset
      FROM (
        SELECT o_orderstatus, o_orderpriority || ':' || count(1) AS pair
        FROM orders
        GROUP BY o_orderstatus, o_orderpriority)
      GROUP BY o_orderstatus
      ORDER BY o_orderstatus""",

    "a04_stats_exact" -> s"""
      SELECT o_orderstatus, n,
        (s1 / n * 1e5) AS mean,
        ((s2 - s1 * s1 / n) / n * 1e10) AS var_pop,
        ((s2 - s1 * s1 / n) / (n - 1) * 1e10) AS var_samp,
        (sqrt((s2 - s1 * s1 / n) / n) * 1e5) AS stddev_pop
      FROM (
        SELECT o_orderstatus, count(1) AS n,
          ${fsumSql("o_totalprice * 1e-5")} AS s1,
          ${fsumSql("(o_totalprice * 1e-5) * (o_totalprice * 1e-5)")} AS s2
        FROM orders
        GROUP BY o_orderstatus)
      ORDER BY o_orderstatus""",

    "a05_sum0_minmax_by" -> s"""
      SELECT o_orderstatus,
        coalesce(CAST(sum(CAST(CASE WHEN o_totalprice > 500000.0
          THEN o_totalprice END AS DECIMAL(25,6))) AS DOUBLE), 0.0) AS sum0_big,
        arg_max(o_orderkey, printf('%020.6f|%010d', o_totalprice, o_orderkey)) AS key_of_max,
        arg_min(o_orderkey, printf('%020.6f|%010d', o_totalprice, o_orderkey)) AS key_of_min,
        max(o_totalprice) AS max_price,
        min(o_totalprice) AS min_price
      FROM orders
      GROUP BY o_orderstatus
      ORDER BY o_orderstatus""",

    "a06_percentiles" -> """
      SELECT o_orderstatus,
        round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
        round(quantile_cont(o_totalprice, 0.95), 4) AS p95
      FROM orders
      GROUP BY o_orderstatus
      ORDER BY o_orderstatus"""
  )
}
