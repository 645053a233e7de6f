package graft.operators

import graft.{OracleSafe, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Remaining parity details: full ranking-function set (§2.5),
  * collection/array function matrix (§2.9 collection category), and
  * explicit left/right outer joins (§2.3).
  */
object MoreParity extends QueryModule {
  import OracleSafe._

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // percent_rank / cume_dist / ntile / dense_rank / nth-style first.
    "q21_rank_functions" -> { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      Tables.load(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          dense_rank().over(w).as("drk"),
          round(percent_rank().over(w), 8).as("prk"),
          round(cume_dist().over(w), 8).as("cd"),
          ntile(4).over(w).as("quartile"))
        .orderBy("o_custkey", "o_orderkey")
    },

    // Correlated scalar subquery in the SELECT list, through the SQL
    // string surface — Catalyst decorrelates it to an aggregate + outer
    // join (the reference runs Calcite decorrelation rules, SURVEY §4.1).
    "q24_scalar_subquery" -> { (s, dir) =>
      Tables.load(s, dir, "part").createOrReplaceTempView("part")
      Tables.load(s, dir, "lineitem").createOrReplaceTempView("lineitem")
      s.sql("""
        SELECT p_partkey, p_retailprice,
          (SELECT count(1) FROM lineitem WHERE l_partkey = p_partkey) AS n_li,
          (SELECT CAST(max(l_quantity) AS DOUBLE) FROM lineitem
            WHERE l_partkey = p_partkey) AS max_qty
        FROM part
        ORDER BY p_partkey""")
    },

    // Array/collection function matrix (scalar outputs for comparison).
    "f10_array_funcs" -> { (s, dir) =>
      Tables.load(s, dir, "part")
        .withColumn("ws", split(col("p_name"), " "))
        .select(col("p_partkey"),
          size(col("ws")).as("n"),
          array_contains(col("ws"), "red").as("has_red"),
          array_position(col("ws"), "red").cast("int").as("pos_red"),
          element_at(col("ws"), 1).as("first_word"),
          element_at(col("ws"), -1).as("last_word"),
          array_join(array_sort(col("ws")), "|").as("sorted_words"),
          array_max(col("ws")).as("max_word"),
          array_min(col("ws")).as("min_word"),
          size(array_distinct(flatten(array(col("ws"), col("ws"))))).as("n_uniq"),
          array_join(array_repeat(col("p_brand"), 2), ",").as("brand2"),
          array_join(slice(col("ws"), 1, 1), "").as("sliced"))
        .orderBy("p_partkey")
    },

    // LIKE / ILIKE / RLIKE / SIMILAR operator matrix.
    "f11_like_regexp" -> { (s, dir) =>
      Tables.load(s, dir, "part")
        .select(col("p_partkey"),
          col("p_name").like("%red%").as("has_red"),
          col("p_name").like("s_all%").as("sml"),
          (!col("p_name").like("%bolt")).as("not_bolt"),
          col("p_brand").ilike("BRAND#1%").as("b1"),
          col("p_name").rlike("^[a-z]+ (ring|bolt)$").as("ring_or_bolt"),
          regexp_like(col("p_type"), lit("^(ECONOMY|STANDARD)$")).as("econ_std"))
        .orderBy("p_partkey")
    },

    // Bitwise operator matrix (§2.9 math/misc: BIN/HEX live in f02).
    "f12_bitwise" -> { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_orderkey").bitwiseAND(col("l_linenumber").cast("bigint")).as("band"),
          col("l_orderkey").bitwiseOR(col("l_linenumber").cast("bigint")).as("bor"),
          col("l_orderkey").bitwiseXOR(col("l_linenumber").cast("bigint")).as("bxor"),
          shiftleft(col("l_orderkey"), 2).as("shl"),
          shiftright(col("l_orderkey"), 1).as("shr"),
          bit_count(col("l_orderkey")).as("bc"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    // IN-subquery (rewritten to semi join) + HAVING clause.
    "q23_in_subquery_having" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(s"""
        SELECT o_custkey, count(1) AS n_orders,
               ${OracleSafe.dsumSql("o_totalprice")} AS total
        FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 7000.0)
        GROUP BY o_custkey
        HAVING count(1) >= 12
        ORDER BY o_custkey
      """)
    },

    // Window Top-N (§2.6 WindowRankProcessor): top-2 events by value
    // per (user, 1h tumbling window).
    "wt01_window_topn" -> { (s, dir) =>
      val w = Window.partitionBy(col("win"), col("user_id"))
        .orderBy(col("value").desc, col("event_id"))
      Tables.load(s, dir, "events")
        .withColumn("win",
          unix_timestamp(WindowOps.tumble(col("ts"), "1 hour").getField("start")))
        .select(col("win"), col("user_id"), col("event_id"), col("value"))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 2)
        .orderBy("win", "user_id", "rn")
    },

    // Explicit LEFT / RIGHT outer joins with null-producing sides.
    "q22_outer_joins" -> { (s, dir) =>
      val n = Tables.load(s, dir, "nation")
      val sup = Tables.load(s, dir, "supplier")
        .filter(col("s_acctbal") > 4000.0)
        .groupBy(col("s_nationkey")).agg(count(lit(1)).as("n_rich"))
      val left = n.join(sup, col("n_nationkey") === col("s_nationkey"), "left")
        .select(col("n_nationkey"), col("n_name"),
          coalesce(col("n_rich"), lit(0L)).as("n_rich"))
      val right = sup.join(n, col("s_nationkey") === col("n_nationkey"), "right")
        .select(col("n_nationkey").as("rk"),
          coalesce(col("n_rich"), lit(0L)).as("r_rich"))
      left.join(right, col("n_nationkey") === col("rk"))
        .select(col("n_nationkey"), col("n_name"), col("n_rich"), col("r_rich"))
        .orderBy("n_nationkey")
    },

    // Window deduplication (§2.6, StreamExecWindowDeduplicate): keep the
    // FIRST event per (1h tumbling window, user) — the window-TVF
    // variant of dedup, a distinct ExecNode in the reference.
    "wd01_window_dedup" -> { (s, dir) =>
      val w = Window.partitionBy(col("win"), col("user_id"))
        .orderBy(col("tus"), col("event_id"))
      Tables.load(s, dir, "events")
        .withColumn("win",
          unix_timestamp(WindowOps.tumble(col("ts"), "1 hour").getField("start")))
        .select(col("win"), col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("tus"))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("win"), col("user_id"), col("event_id"), col("tus"))
        .orderBy("win", "user_id")
    },

    // LEFT OUTER interval join (§2.3 TimeIntervalJoin supports all outer
    // variants): every click, with purchases within 30 min after it, or
    // nulls (coalesced for deterministic compare) when none arrives.
    "j03_interval_join_left" -> { (s, dir) =>
      val e = Tables.load(s, dir, "events").select(col("event_id"),
        unix_micros(col("ts")).as("tus"), col("user_id"), col("event_type"))
      val c = e.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("tus").as("ctus"), col("user_id"))
      val p = e.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("tus").as("ptus"),
          col("user_id").as("p_user"))
      c.join(p, col("user_id") === col("p_user")
          && col("ptus") > col("ctus")
          && col("ptus") <= col("ctus") + lit(1800000000L), "left")
        .select(col("click_id"),
          coalesce(col("purchase_id"), lit(-1L)).as("purchase_id"),
          coalesce(col("ptus") - col("ctus"), lit(-1L)).as("gap_us"))
        .orderBy("click_id", "purchase_id")
    },

    // KEY-LESS interval join — every purchase inside any error's
    // 5-minute incident window, no equality conjunct. Spark alone
    // plans this as a nested-loop; RangeJoin.pointInInterval restores
    // a shuffle-hash shape via bin bucketing (RangeJoinSpec asserts the
    // plan). Bin width = the interval span, so each interval lands in
    // at most 2 bins.
    "j04_range_join_keyless" -> { (s, dir) =>
      val e = Tables.load(s, dir, "events").select(col("event_id"),
        unix_micros(col("ts")).as("tus"), col("event_type"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("tus").as("ptus"))
      val incidents = e.filter(col("event_type") === "error")
        .select(col("event_id").as("error_id"), col("tus").as("lo"),
          (col("tus") + 300000000L).as("hi"))
      RangeJoin.pointInInterval(purchases, incidents,
          col("ptus"), col("lo"), col("hi"), binWidth = 300000000L)
        .select(col("error_id"), col("purchase_id"),
          (col("ptus") - col("lo")).as("gap_us"))
        .orderBy("error_id", "purchase_id")
    },

    // The same key-less interval join written as a PLAIN range join on
    // the public surface — no RangeJoin helper. The injected
    // RangeJoinRule (graft.plans) rewrites it to the binned equi-join
    // at optimization time; the conf lives in an isolated child
    // session so the opt-in never leaks to other queries.
    "j06_range_join_auto" -> { (s0, dir) =>
      val s = s0.newSession()
      s.conf.set("spark.graft.rangeJoin.binWidth", "300000000")
      val e = Tables.load(s, dir, "events").select(col("event_id"),
        unix_micros(col("ts")).as("tus"), col("event_type"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("tus").as("ptus"))
      val incidents = e.filter(col("event_type") === "error")
        .select(col("event_id").as("error_id"), col("tus").as("lo"),
          (col("tus") + 300000000L).as("hi"))
      purchases.join(incidents,
          col("ptus") >= col("lo") && col("ptus") <= col("hi"))
        .select(col("error_id"), col("purchase_id"),
          (col("ptus") - col("lo")).as("gap_us"))
        .orderBy("error_id", "purchase_id")
    }
  )

  override def oracleSql: Map[String, String] = Map(
    "f12_bitwise" -> """
      SELECT l_orderkey, l_linenumber,
        l_orderkey & CAST(l_linenumber AS BIGINT) AS band,
        l_orderkey | CAST(l_linenumber AS BIGINT) AS bor,
        xor(l_orderkey, CAST(l_linenumber AS BIGINT)) AS bxor,
        l_orderkey << 2 AS shl,
        l_orderkey >> 1 AS shr,
        CAST(bit_count(l_orderkey) AS INT) AS bc
      FROM lineitem
      ORDER BY l_orderkey, l_linenumber""",

    "q24_scalar_subquery" -> """
      SELECT p_partkey, p_retailprice,
        (SELECT count(1) FROM lineitem WHERE l_partkey = p_partkey) AS n_li,
        (SELECT CAST(max(l_quantity) AS DOUBLE) FROM lineitem
          WHERE l_partkey = p_partkey) AS max_qty
      FROM part
      ORDER BY p_partkey""",

    "q21_rank_functions" -> """
      SELECT o_custkey, o_orderkey,
        CAST(dense_rank() OVER w AS INT) AS drk,
        round(percent_rank() OVER w, 8) AS prk,
        round(cume_dist() OVER w, 8) AS cd,
        CAST(ntile(4) OVER w AS INT) AS quartile
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
      ORDER BY o_custkey, o_orderkey""",

    "f10_array_funcs" -> """
      SELECT p_partkey,
        CAST(len(ws) AS INT) AS n,
        list_contains(ws, 'red') AS has_red,
        CAST(coalesce(list_position(ws, 'red'), 0) AS INT) AS pos_red,
        ws[1] AS first_word,
        ws[-1] AS last_word,
        array_to_string(list_sort(ws), '|') AS sorted_words,
        list_max(ws) AS max_word,
        list_min(ws) AS min_word,
        CAST(len(list_distinct(list_concat(ws, ws))) AS INT) AS n_uniq,
        p_brand || ',' || p_brand AS brand2,
        ws[1] AS sliced
      FROM (SELECT p_partkey, p_brand, string_split(p_name, ' ') AS ws FROM part)
      ORDER BY p_partkey""",

    "f11_like_regexp" -> """
      SELECT p_partkey,
        p_name LIKE '%red%' AS has_red,
        p_name LIKE 's_all%' AS sml,
        p_name NOT LIKE '%bolt' AS not_bolt,
        p_brand ILIKE 'BRAND#1%' AS b1,
        regexp_matches(p_name, '^[a-z]+ (ring|bolt)$') AS ring_or_bolt,
        regexp_matches(p_type, '^(ECONOMY|STANDARD)$') AS econ_std
      FROM part
      ORDER BY p_partkey""",

    "q23_in_subquery_having" -> s"""
      SELECT o_custkey, count(1) AS n_orders,
             ${dsumSql("o_totalprice")} AS total
      FROM orders
      WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 7000.0)
      GROUP BY o_custkey
      HAVING count(1) >= 12
      ORDER BY o_custkey""",

    "wt01_window_topn" -> """
      SELECT win, user_id, event_id, value, rn FROM (
        SELECT CAST(floor(epoch_us(ts)/3600000000)*3600 AS BIGINT) AS win,
               user_id, event_id, value,
               row_number() OVER (
                 PARTITION BY CAST(floor(epoch_us(ts)/3600000000)*3600 AS BIGINT), user_id
                 ORDER BY value DESC, event_id) AS rn
        FROM events)
      WHERE rn <= 2
      ORDER BY win, user_id, rn""",

    "q22_outer_joins" -> """
      WITH sup AS (
        SELECT s_nationkey, count(1) AS n_rich FROM supplier
        WHERE s_acctbal > 4000.0 GROUP BY s_nationkey),
      l AS (
        SELECT n_nationkey, n_name, coalesce(n_rich, 0) AS n_rich
        FROM nation LEFT JOIN sup ON n_nationkey = s_nationkey),
      r AS (
        SELECT n_nationkey AS rk, coalesce(n_rich, 0) AS r_rich
        FROM sup RIGHT JOIN nation ON s_nationkey = n_nationkey)
      SELECT n_nationkey, n_name, n_rich, r_rich
      FROM l JOIN r ON n_nationkey = rk
      ORDER BY n_nationkey""",

    "wd01_window_dedup" -> """
      SELECT win, user_id, event_id, tus FROM (
        SELECT CAST(floor(epoch_us(ts)/3600000000)*3600 AS BIGINT) AS win,
               user_id, event_id, epoch_us(ts) AS tus,
               row_number() OVER (
                 PARTITION BY CAST(floor(epoch_us(ts)/3600000000) AS BIGINT), user_id
                 ORDER BY epoch_us(ts), event_id) AS rn
        FROM events)
      WHERE rn = 1
      ORDER BY win, user_id""",

    "j03_interval_join_left" -> """
      WITH e AS (SELECT event_id, epoch_us(ts) AS tus, user_id, event_type FROM events),
      c AS (SELECT event_id AS click_id, tus AS ctus, user_id FROM e
            WHERE event_type = 'click'),
      p AS (SELECT event_id AS purchase_id, tus AS ptus, user_id FROM e
            WHERE event_type = 'purchase')
      SELECT c.click_id,
             coalesce(p.purchase_id, -1) AS purchase_id,
             coalesce(p.ptus - c.ctus, -1) AS gap_us
      FROM c LEFT JOIN p ON c.user_id = p.user_id
        AND p.ptus > c.ctus AND p.ptus <= c.ctus + 1800000000
      ORDER BY click_id, purchase_id""",

    "j04_range_join_keyless" -> """
      WITH e AS (SELECT event_id, epoch_us(ts) AS tus, event_type FROM events)
      SELECT i.event_id AS error_id, p.event_id AS purchase_id,
             p.tus - i.tus AS gap_us
      FROM e i JOIN e p ON i.event_type = 'error' AND p.event_type = 'purchase'
        AND p.tus >= i.tus AND p.tus <= i.tus + 300000000
      ORDER BY error_id, purchase_id""",

    // The rewrite is invisible to results: the auto-binned plan must
    // produce exactly the j04 answer.
    "j06_range_join_auto" -> """
      WITH e AS (SELECT event_id, epoch_us(ts) AS tus, event_type FROM events)
      SELECT i.event_id AS error_id, p.event_id AS purchase_id,
             p.tus - i.tus AS gap_us
      FROM e i JOIN e p ON i.event_type = 'error' AND p.event_type = 'purchase'
        AND p.tus >= i.tus AND p.tus <= i.tus + 300000000
      ORDER BY error_id, purchase_id"""
  )
}
