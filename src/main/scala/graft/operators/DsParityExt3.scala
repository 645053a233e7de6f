package graft.operators

import graft.{OracleSafe, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TPC-DS-shaped query suite, part 4 (ds50–ds54) — the last distinct
  * plan families expressible on the testdata: q16 (distinct-count over
  * an anti-joined fact with a correlated NOT EXISTS), q37/q82
  * (price-band dimension filter against a derived supply-quantity
  * band), q46/q68 (mixed-attribute basket analysis — per-order lines
  * whose supplier nation differs from the customer's), q44 (best and
  * worst ranked subqueries equi-joined on rank position), q28 (banded
  * scalar aggregates with DISTINCT counts cross-joined into one row).
  * Conventions as in DsParityExt. (q71's hour-of-day grouping is
  * impossible here — every testdata timestamp is midnight — and q76's
  * null-key unions have no natural analogue; both documented in
  * COVERAGE.md's per-query disposition table rather than contrived.)
  */
object DsParityExt3 extends QueryModule {
  import OracleSafe._

  private def ts(d: String) = lit(d).cast("timestamp_ntz")

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // q16 shape: distinct suppliers per (brand, size band) counting only
    // parts with NO line from a blacklisted (negative-balance) supplier
    // — correlated NOT EXISTS = anti join against the flagged part set.
    "ds50_untainted_supplier_counts" -> { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      val tainted = li
        .join(broadcast(Tables.load(s, dir, "supplier").where(col("s_acctbal") < 0)),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("l_partkey")).distinct()
      li.join(broadcast(Tables.load(s, dir, "part")), col("l_partkey") === col("p_partkey"))
        .join(tainted, Seq("l_partkey"), "left_anti")
        .groupBy(col("p_brand"), (col("p_size") / 10).cast("int").as("szband"))
        .agg(countDistinct(col("l_suppkey")).as("n_supp"), count(lit(1)).as("n_lines"))
        .orderBy("p_brand", "szband")
    },

    // q37/q82 shape: dimension price band × derived supply-quantity
    // band — the fact aggregates into a per-part "inventory" the
    // dimension filter then bands.
    "ds51_price_supply_band" -> { (s, dir) =>
      Tables.load(s, dir, "part")
        .where(col("p_retailprice").between(920.0, 960.0))
        .join(Tables.load(s, dir, "lineitem")
            .where(col("l_shipdate") >= ts("1997-01-01") &&
              col("l_shipdate") < ts("1997-07-01")),
          col("p_partkey") === col("l_partkey"))
        .groupBy(col("p_partkey"))
        .agg(first(col("p_retailprice")).as("price"), dsum(col("l_quantity")).as("qty"))
        .where(col("qty").between(40.0, 120.0))
        .orderBy("p_partkey")
    },

    // q46/q68 shape: mixed-origin baskets — customers whose orders mix
    // home-nation and cross-nation supply lines, with the cross-line
    // share and revenue.
    "ds52_cross_nation_baskets" -> { (s, dir) =>
      val base = Tables.load(s, dir, "lineitem")
        .join(Tables.load(s, dir, "orders").select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.load(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.load(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("o_custkey"))
        .agg(
          sum(when(col("s_nationkey") =!= col("c_nationkey"), 1L).otherwise(0L)).as("cross_n"),
          count(lit(1)).as("n"),
          dsum(when(col("s_nationkey") =!= col("c_nationkey"),
            col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .otherwise(lit(0.0))).as("cross_rev"))
      base.where(col("cross_n") > 0 && col("cross_n") < col("n"))
        .orderBy("o_custkey")
    },

    // q44 shape: best and worst performers joined ON RANK — two
    // window-ranked copies of one per-part aggregate, equi-joined on
    // rank position. The rank windows are global but run over the
    // PART-cardinality aggregate (dimension-sized — fine at any fact
    // scale), and the name lookups broadcast.
    "ds53_rank_extremes_join" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val perPart = Tables.load(s, dir, "lineitem")
        .groupBy(col("l_partkey"))
        .agg(davg(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("avg_rev"))
      val best = perPart.select(col("l_partkey").as("best_pk"),
        row_number().over(Window.orderBy(col("avg_rev").desc, col("l_partkey").desc)).as("rk"))
        .where(col("rk") <= 10)
      val worst = perPart.select(col("l_partkey").as("worst_pk"),
        row_number().over(Window.orderBy(col("avg_rev").asc, col("l_partkey").asc)).as("rk"))
        .where(col("rk") <= 10)
      val names = Tables.load(s, dir, "part").select(col("p_partkey"), col("p_name"))
      best.join(worst, "rk")
        .join(broadcast(names.withColumnRenamed("p_name", "best_name")),
          col("best_pk") === col("p_partkey")).drop("p_partkey")
        .join(broadcast(names.withColumnRenamed("p_name", "worst_name")),
          col("worst_pk") === col("p_partkey")).drop("p_partkey")
        .select(col("rk"), col("best_name"), col("worst_name"))
        .orderBy("rk")
    },

    // q28 shape: six quantity-band scalar aggregates — avg, row count
    // and DISTINCT part count per band — cross-joined into one row.
    // Each band is a single-row aggregate, so every join is a broadcast
    // of one row; the fact is scanned once per band map-side.
    "ds54_band_scalar_stats" -> { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
        .select(col("l_quantity"), col("l_extendedprice"), col("l_partkey"))
      def band(lo: Int, hi: Int, n: String) =
        li.where(col("l_quantity") >= lo && col("l_quantity") < hi)
          .agg(davg(col("l_extendedprice")).as(s"avg_$n"),
            count(lit(1)).as(s"cnt_$n"),
            countDistinct(col("l_partkey")).as(s"parts_$n"))
      band(1, 10, "b1").crossJoin(band(10, 20, "b2")).crossJoin(band(20, 30, "b3"))
        .crossJoin(band(30, 40, "b4")).crossJoin(band(40, 50, "b5"))
        .crossJoin(band(50, 60, "b6"))
    }
  )

  override def oracleSql: Map[String, String] = Map(
    "ds50_untainted_supplier_counts" -> """
      SELECT p_brand, CAST(p_size // 10 AS INT) AS szband,
             CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supp,
             count(1) AS n_lines
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE NOT EXISTS (
        SELECT 1 FROM lineitem l2 JOIN supplier s ON l2.l_suppkey = s.s_suppkey
        WHERE l2.l_partkey = part.p_partkey AND s.s_acctbal < 0)
      GROUP BY p_brand, p_size // 10
      ORDER BY p_brand, szband""",

    "ds51_price_supply_band" -> s"""
      SELECT p_partkey, any_value(p_retailprice) AS price,
             ${dsumSql("l_quantity")} AS qty
      FROM part JOIN lineitem ON l_partkey = p_partkey
      WHERE p_retailprice BETWEEN 920.0 AND 960.0
        AND l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1997-07-01'
      GROUP BY p_partkey
      HAVING ${dsumSql("l_quantity")} BETWEEN 40.0 AND 120.0
      ORDER BY p_partkey""",

    "ds52_cross_nation_baskets" -> s"""
      SELECT o_custkey,
        CAST(sum(CASE WHEN s_nationkey <> c_nationkey THEN 1 ELSE 0 END) AS BIGINT)
          AS cross_n,
        count(1) AS n,
        ${dsumSql(
          "CASE WHEN s_nationkey <> c_nationkey THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END")}
          AS cross_rev
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey
      GROUP BY o_custkey
      HAVING sum(CASE WHEN s_nationkey <> c_nationkey THEN 1 ELSE 0 END) > 0
         AND sum(CASE WHEN s_nationkey <> c_nationkey THEN 1 ELSE 0 END) < count(1)
      ORDER BY o_custkey""",

    "ds53_rank_extremes_join" -> s"""
      WITH pp AS (
        SELECT l_partkey,
               ${davgSql("l_extendedprice * (1.0 - l_discount)")} AS avg_rev
        FROM lineitem GROUP BY l_partkey),
      best AS (
        SELECT l_partkey AS best_pk,
               row_number() OVER (ORDER BY avg_rev DESC, l_partkey DESC) AS rk
        FROM pp),
      worst AS (
        SELECT l_partkey AS worst_pk,
               row_number() OVER (ORDER BY avg_rev ASC, l_partkey ASC) AS rk
        FROM pp)
      SELECT CAST(b.rk AS INT) AS rk, pb.p_name AS best_name, pw.p_name AS worst_name
      FROM best b JOIN worst w ON b.rk = w.rk
      JOIN part pb ON b.best_pk = pb.p_partkey
      JOIN part pw ON w.worst_pk = pw.p_partkey
      WHERE b.rk <= 10
      ORDER BY rk""",

    "ds54_band_scalar_stats" -> s"""
      SELECT
        b1.avg_b1, b1.cnt_b1, b1.parts_b1,
        b2.avg_b2, b2.cnt_b2, b2.parts_b2,
        b3.avg_b3, b3.cnt_b3, b3.parts_b3,
        b4.avg_b4, b4.cnt_b4, b4.parts_b4,
        b5.avg_b5, b5.cnt_b5, b5.parts_b5,
        b6.avg_b6, b6.cnt_b6, b6.parts_b6
      FROM
        (SELECT ${davgSql("l_extendedprice")} AS avg_b1, count(1) AS cnt_b1,
                CAST(count(DISTINCT l_partkey) AS BIGINT) AS parts_b1
         FROM lineitem WHERE l_quantity >= 1 AND l_quantity < 10) b1,
        (SELECT ${davgSql("l_extendedprice")} AS avg_b2, count(1) AS cnt_b2,
                CAST(count(DISTINCT l_partkey) AS BIGINT) AS parts_b2
         FROM lineitem WHERE l_quantity >= 10 AND l_quantity < 20) b2,
        (SELECT ${davgSql("l_extendedprice")} AS avg_b3, count(1) AS cnt_b3,
                CAST(count(DISTINCT l_partkey) AS BIGINT) AS parts_b3
         FROM lineitem WHERE l_quantity >= 20 AND l_quantity < 30) b3,
        (SELECT ${davgSql("l_extendedprice")} AS avg_b4, count(1) AS cnt_b4,
                CAST(count(DISTINCT l_partkey) AS BIGINT) AS parts_b4
         FROM lineitem WHERE l_quantity >= 30 AND l_quantity < 40) b4,
        (SELECT ${davgSql("l_extendedprice")} AS avg_b5, count(1) AS cnt_b5,
                CAST(count(DISTINCT l_partkey) AS BIGINT) AS parts_b5
         FROM lineitem WHERE l_quantity >= 40 AND l_quantity < 50) b5,
        (SELECT ${davgSql("l_extendedprice")} AS avg_b6, count(1) AS cnt_b6,
                CAST(count(DISTINCT l_partkey) AS BIGINT) AS parts_b6
         FROM lineitem WHERE l_quantity >= 50 AND l_quantity < 60) b6"""
  )
}
