package graft.operators

import graft.{OracleSafe, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Remaining §2 inventory items: window join (§2.3 WindowJoinOperator),
  * changelog normalize + drop-update-before (§2.2), lookup join (§2.3,
  * per-partition connector probe with LRU cache).
  */
object MiscParity extends QueryModule {
  import OracleSafe._

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Compiled-plan round trip (pp01): CREATE TABLE (filesystem over
    // the corpus parquet) → compilePlanSql → JSON file → executePlan
    // in a FRESH environment with the view dropped first — the
    // reference's ExecNodeGraph JSON round trip
    // (flink-table-planner .../plan/nodes/exec/serde/, test corpus
    // src/test/resources/jsonplan/), correctness-gated end to end.
    "pp01_compiled_plan" -> { (s, dir) =>
      val env = graft.GraftTableEnvironment.create(s)
      env.executeSql(s"""
        CREATE TABLE pp01_orders (o_orderkey BIGINT) WITH (
          'connector' = 'filesystem', 'path' = '$dir/orders.parquet',
          'format' = 'parquet')""")
      val q = "SELECT o_orderpriority, count(1) AS n, " +
        dsumSql("o_totalprice") + " AS sum_price " +
        "FROM pp01_orders GROUP BY o_orderpriority ORDER BY o_orderpriority"
      val plan = env.compilePlanSql(q)
      val f = java.io.File.createTempFile("graft-pp01", ".json")
      plan.writeToFile(f.getAbsolutePath)
      s.catalog.dropTempView("pp01_orders") // restore must recreate it
      graft.GraftTableEnvironment.create(s).executePlan(f.getAbsolutePath)
    },

    // Window join: clicks ⋈ purchases of the same user in the same
    // 1-hour tumbling window (equi-join on (window, key) — native).
    "wj01_window_join" -> { (s, dir) =>
      val e = Tables.load(s, dir, "events")
        .withColumn("win", unix_timestamp(WindowOps.tumble(col("ts"), "1 hour")
          .getField("start")))
      val c = e.filter(col("event_type") === "click")
        .select(col("win"), col("user_id"), col("event_id").as("click_id"))
      val p = e.filter(col("event_type") === "purchase")
        .select(col("win"), col("user_id"), col("event_id").as("purchase_id"))
      c.join(p, Seq("win", "user_id"))
        .groupBy(col("win"))
        .agg(count(lit(1)).as("n_pairs"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy("win")
    },

    // ChangelogNormalize: collapse a +I/+U/-D changelog (derived from
    // events) to current state by primary key.
    "cn01_changelog_normalize" -> { (s, dir) =>
      val changelog = Tables.load(s, dir, "events")
        .withColumn("__rowkind",
          when(col("event_type") === "signup", "+I")
            .when(col("event_type") === "error", "-D")
            .otherwise("+U"))
      ChangelogOps.normalize(changelog,
          Seq(col("user_id")), Seq(col("ts"), col("event_id")), col("__rowkind"))
        .select(col("user_id"), col("event_id"), col("__rowkind"),
          unix_micros(col("ts")).as("tus"))
        .orderBy("user_id")
    },

    // DropUpdateBefore: strip -U rows from a retract stream.
    "cn02_drop_update_before" -> { (s, dir) =>
      val changelog = Tables.load(s, dir, "events")
        .withColumn("__rowkind",
          when(col("event_type") === "click", "-U")
            .when(col("event_type") === "view", "+U")
            .otherwise("+I"))
      ChangelogOps.dropUpdateBefore(changelog, col("__rowkind"))
        .groupBy(col("__rowkind"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .orderBy("__rowkind")
    },

    // Lookup join: per-partition connector probe with LRU cache. The
    // "external service" here is a deterministic pure function so the
    // oracle can mirror it; real deployments pass a client factory.
    "lj01_lookup_join" -> { (s, dir) =>
      import s.implicits._
      val e = Tables.load(s, dir, "events")
        .select(col("event_id"), col("user_id")).as[(Long, Long)]
      LookupJoin.lookup[(Long, Long), Long, String](
          e, _._2,
          () => k => if (k % 10 == 0) None else Some(s"segment-${k % 7}"),
          cacheSize = 1000)
        .map { case ((eid, uid), seg) => (eid, uid, seg.getOrElse("unknown")) }
        .toDF("event_id", "user_id", "segment")
        .orderBy("event_id")
    }
  )

  override def oracleSql: Map[String, String] = Map(
    "pp01_compiled_plan" -> s"""
      SELECT o_orderpriority, count(1) AS n,
             ${dsumSql("o_totalprice")} AS sum_price
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "wj01_window_join" -> """
      WITH e AS (SELECT CAST(floor(epoch_us(ts)/3600000000)*3600 AS BIGINT) AS win,
                        user_id, event_id, event_type
                 FROM events)
      SELECT win, count(1) AS n_pairs, count(DISTINCT c.user_id) AS n_users
      FROM (SELECT win, user_id, event_id AS click_id FROM e
            WHERE event_type = 'click') c
      JOIN (SELECT win, user_id, event_id AS purchase_id FROM e
            WHERE event_type = 'purchase') p
      USING (win, user_id)
      GROUP BY win
      ORDER BY win""",

    "cn01_changelog_normalize" -> """
      SELECT user_id, event_id, __rowkind, tus FROM (
        SELECT user_id, event_id, epoch_us(ts) AS tus,
          CASE WHEN event_type = 'signup' THEN '+I'
               WHEN event_type = 'error' THEN '-D'
               ELSE '+U' END AS __rowkind,
          row_number() OVER (PARTITION BY user_id
                             ORDER BY ts DESC, event_id DESC) AS rn
        FROM events)
      WHERE rn = 1 AND __rowkind <> '-D'
      ORDER BY user_id""",

    "cn02_drop_update_before" -> s"""
      SELECT __rowkind, count(1) AS n, ${dsumSql("value")} AS sum_value
      FROM (
        SELECT value,
          CASE WHEN event_type = 'click' THEN '-U'
               WHEN event_type = 'view' THEN '+U'
               ELSE '+I' END AS __rowkind
        FROM events)
      WHERE __rowkind <> '-U'
      GROUP BY __rowkind
      ORDER BY __rowkind""",

    "lj01_lookup_join" -> """
      SELECT event_id, user_id,
        CASE WHEN user_id % 10 = 0 THEN 'unknown'
             ELSE 'segment-' || (user_id % 7) END AS segment
      FROM events
      ORDER BY event_id"""
  )
}
