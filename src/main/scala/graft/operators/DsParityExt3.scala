package graft.operators

import graft.{OracleSafe, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TPC-DS-shaped query suite, part 4 (ds50–ds52) — the last distinct
  * plan families expressible on the testdata: q16 (distinct-count over
  * an anti-joined fact with a correlated NOT EXISTS), q37/q82
  * (price-band dimension filter against a derived supply-quantity
  * band), q46/q68 (mixed-attribute basket analysis — per-order lines
  * whose supplier nation differs from the customer's). Conventions as
  * in DsParityExt. (q71's hour-of-day grouping is impossible here —
  * every testdata timestamp is midnight — and q76's null-key unions
  * have no natural analogue; both documented rather than contrived.)
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
      ORDER BY o_custkey"""
  )
}
