package graft.operators

import graft.{OracleSafe, QueryModule, Tables}
import graft.cep.Nfa
import graft.cep.Nfa.{AfterMatch, Contiguity, Pattern, Quantifier, Step}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Event record used by the typed CEP queries. */
case class Ev(event_id: Long, tus: Long, user_id: Long, event_type: String)

/** Batch-checkable parity suite for the reference's event-time streaming
  * operators (SURVEY.md §2.4 window aggs, §2.5 streaming OVER, §2.6
  * rank/dedup, §2.3 interval/temporal joins, §2.10 CEP). Each query runs
  * the same operator library that the streaming layer uses, on the
  * `events` table, with a DuckDB oracle. The genuinely streaming
  * (stateful, watermark-driven) executions of the same operators live in
  * graft.streaming and are covered by ScalaTest specs.
  */
object EventTimeParity extends QueryModule {
  import OracleSafe._

  private def ev(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Tumbling window aggregate (GROUP BY TUMBLE / window TVF).
    "w01_tumble_agg" -> { (s, dir) =>
      ev(s, dir)
        .groupBy(WindowOps.tumble(col("ts"), "1 hour").as("win"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .select(unix_timestamp(col("win.start")).as("win_start"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy("win_start", "event_type")
    },

    // Hopping window aggregate (HOP: 30 min size, 10 min slide).
    "w02_hop_agg" -> { (s, dir) =>
      ev(s, dir)
        .groupBy(WindowOps.hop(col("ts"), "30 minutes", "10 minutes").as("win"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .select(unix_timestamp(col("win.start")).as("win_start"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy("win_start", "event_type")
    },

    // The same tumbling aggregate THROUGH THE FLINK SQL DIALECT: the
    // query text is what a reference user runs verbatim (GROUP BY
    // TUMBLE + TUMBLE_START); FlinkSqlWindows rewrites it to Spark's
    // window() spelling inside GraftTableEnvironment.executeSql.
    "w09_sql_group_window" -> { (s, dir) =>
      val env = graft.GraftTableEnvironment.create(s)
      env.registerTestTables(dir)
      env.sqlQuery("""
        SELECT CAST(unix_timestamp(TUMBLE_START(ts, INTERVAL '1' HOUR)) AS BIGINT) AS win_start,
               event_type, count(1) AS n,
               CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sum_value
        FROM events
        GROUP BY TUMBLE(ts, INTERVAL '1' HOUR), event_type
        ORDER BY win_start, event_type""")
    },

    // HOP and CUMULATE through the verbatim Flink window-TVF SQL —
    // FlinkSqlWindows explodes the per-row windows inside executeSql.
    "w10_sql_hop_tvf" -> { (s, dir) =>
      val env = graft.GraftTableEnvironment.create(s)
      env.registerTestTables(dir)
      env.sqlQuery("""
        SELECT CAST(unix_timestamp(window_start) AS BIGINT) AS win_start,
               event_type, count(1) AS n,
               CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sum_value
        FROM TABLE(HOP(TABLE events, DESCRIPTOR(ts),
                       INTERVAL '10' MINUTE, INTERVAL '30' MINUTE))
        GROUP BY window_start, event_type
        ORDER BY win_start, event_type""")
    },

    "w11_sql_cumulate_tvf" -> { (s, dir) =>
      val env = graft.GraftTableEnvironment.create(s)
      env.registerTestTables(dir)
      env.sqlQuery("""
        SELECT CAST(unix_timestamp(window_start) AS BIGINT) AS win_start,
               CAST(unix_timestamp(window_end) AS BIGINT) AS win_end,
               event_type, count(1) AS n,
               CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sum_value
        FROM TABLE(CUMULATE(TABLE events, DESCRIPTOR(ts),
                            INTERVAL '1' HOUR, INTERVAL '4' HOUR))
        GROUP BY window_start, window_end, event_type
        ORDER BY win_start, win_end, event_type""")
    },

    // Session window aggregate per user (10-minute gap).
    "w03_session_agg" -> { (s, dir) =>
      ev(s, dir)
        .groupBy(WindowOps.session(col("ts"), "10 minutes").as("win"), col("user_id"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .select(col("user_id"),
          unix_micros(col("win.start")).as("sess_start_us"),
          unix_micros(col("win.end")).as("sess_end_us"),
          col("n"), col("sum_value"))
        .orderBy("user_id", "sess_start_us")
    },

    // Tumbling window with an alignment offset (Flink
    // TumblingEventTimeWindows.of(size, offset)): 1h windows starting
    // at :15 past the hour.
    "w08_tumble_offset" -> { (s, dir) =>
      ev(s, dir)
        .groupBy(WindowOps.tumble(col("ts"), "1 hour", "15 minutes").as("win"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .select(unix_timestamp(col("win.start")).as("win_start"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy("win_start", "event_type")
    },

    // Session windows with a per-row DYNAMIC gap (click/view cool off in
    // 5 minutes, the rest in 15) — Flink's withDynamicGap.
    "w06_session_dynamic_gap" -> { (s, dir) =>
      val gap = when(col("event_type").isin("click", "view"), lit("5 minutes"))
        .otherwise(lit("15 minutes"))
      ev(s, dir)
        .groupBy(WindowOps.sessionDynamic(col("ts"), gap).as("win"), col("user_id"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .select(col("user_id"),
          unix_micros(col("win.start")).as("sess_start_us"),
          unix_micros(col("win.end")).as("sess_end_us"),
          col("n"), col("sum_value"))
        .orderBy("user_id", "sess_start_us")
    },

    // CUMULATE window aggregate (step 1h, max 4h) — no Spark built-in.
    "w04_cumulate_agg" -> { (s, dir) =>
      WindowOps.cumulate(ev(s, dir), col("ts"), 3600L, 14400L)
        .groupBy(col("win_start"), col("win_end"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .orderBy("win_start", "win_end", "event_type")
    },

    // Count-tumbling windows (50 events per user in event-time order).
    "w05_count_windows" -> { (s, dir) =>
      WindowOps.countTumble(ev(s, dir),
          Seq(col("user_id")), Seq(col("ts"), col("event_id")), 50)
        .groupBy(col("user_id"), col("win_id"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"),
          min(col("event_id")).as("first_event"))
        .orderBy("user_id", "win_id")
    },

    // Count-sliding windows, batch form (fire every 25 events over the
    // last 50, per user in event-time order) — CountSlidingWindowAssigner.
    "w07_count_slide" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val frame = w.rowsBetween(-49, 0)
      ev(s, dir)
        .withColumn("rn", row_number().over(w))
        .withColumn("sum_value",
          sum(col("value").cast(org.apache.spark.sql.types.DecimalType(25, 6)))
            .over(frame).cast("double"))
        .where(col("rn") % 25 === 0)
        .select(col("user_id"), col("rn").as("fire_at"),
          least(col("rn"), lit(50)).as("n_in_win"), col("sum_value"))
        .orderBy("user_id", "fire_at")
    },

    // Deduplication keep-first by (user, type) in event-time order.
    "d01_dedup_keep_first" -> { (s, dir) =>
      Dedup.keepFirst(ev(s, dir),
          Seq(col("user_id"), col("event_type")), Seq(col("ts"), col("event_id")))
        .select(col("user_id"), col("event_type"), col("event_id"),
          unix_micros(col("ts")).as("tus"))
        .orderBy("user_id", "event_type")
    },

    // Deduplication keep-last (upsert semantics, batch view).
    "d02_dedup_keep_last" -> { (s, dir) =>
      Dedup.keepLast(ev(s, dir),
          Seq(col("user_id"), col("event_type")), Seq(col("ts"), col("event_id")))
        .select(col("user_id"), col("event_type"), col("event_id"),
          unix_micros(col("ts")).as("tus"))
        .orderBy("user_id", "event_type")
    },

    // Interval join: purchases within 30 min after a click, same user.
    "j01_interval_join" -> { (s, dir) =>
      val e = ev(s, dir).select(col("event_id"),
        unix_micros(col("ts")).as("tus"), col("user_id"), col("event_type"))
      val c = e.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("tus").as("ctus"), col("user_id"))
      val p = e.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("tus").as("ptus"),
          col("user_id").as("p_user"))
      c.join(p, col("user_id") === col("p_user")
          && col("ptus") > col("ctus")
          && col("ptus") <= col("ctus") + lit(1800000000L))
        .select(col("click_id"), col("purchase_id"),
          (col("ptus") - col("ctus")).as("gap_us"))
        .orderBy("click_id", "purchase_id")
    },

    // Event-time as-of (temporal) join: each purchase matched to the
    // latest click of the same user at or before it.
    "j02_asof_join" -> { (s, dir) =>
      val e = ev(s, dir).select(col("event_id"),
        unix_micros(col("ts")).as("tus"), col("user_id"),
        col("event_type"), col("value"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("tus"))
      val clicks0 = e.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"),
          col("tus"), col("value").as("click_value"))
      val clicks = Dedup.keepLast(clicks0,
        Seq(col("user_id"), col("tus")), Seq(col("click_id")))
      AsOfJoin.asOf(purchases, clicks, "user_id", "tus", "tus",
          Seq("click_id", "click_value"))
        .select(col("event_id").as("purchase_id"), col("user_id"), col("tus"),
          col("asof.click_id").as("click_id"),
          col("asof.click_value").as("click_value"))
        .orderBy("purchase_id")
    },

    // Temporal-join SQL surface: the same versioned-table join as j02
    // spelled `FOR SYSTEM_TIME AS OF` and routed through the façade's
    // TemporalSql rewrite (the reference's StreamExecTemporalJoin SQL
    // spelling; inner semantics — unmatched probes drop).
    "j05_temporal_sql" -> { (s, dir) =>
      val env = graft.GraftTableEnvironment.create(s)
      val e = ev(s, dir).select(col("event_id"),
        unix_micros(col("ts")).as("tus"), col("user_id"),
        col("event_type"), col("value"))
      e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("tus"))
        .createOrReplaceTempView("j05_purchases")
      val versions = Dedup.keepLast(
        e.filter(col("event_type") === "click")
          .select(col("event_id").as("click_id"), col("user_id"),
            col("tus"), col("value").as("click_value")),
        Seq(col("user_id"), col("tus")), Seq(col("click_id")))
      env.createTemporaryView("j05_rates", versions,
        watermark = Some(("tus", "0 seconds")), primaryKey = Seq("user_id"))
      env.executeSql("""
        SELECT p.event_id AS purchase_id, p.user_id, p.tus,
               r.click_id, r.click_value
        FROM j05_purchases p
        JOIN j05_rates FOR SYSTEM_TIME AS OF p.tus AS r
        ON p.user_id = r.user_id
        ORDER BY purchase_id""")
    },

    // Streaming-OVER parity: time-range bounded preceding aggregate
    // (RowTimeRangeBoundedPrecedingFunction semantics, batch view).
    "o01_over_time_range" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("tus"))
        .rangeBetween(-1800000000L, 0)
      ev(s, dir)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("tus"), col("value"))
        .select(col("user_id"), col("event_id"), col("tus"),
          sum(col("value").cast(DecimalType(25, 6))).over(w)
            .cast("double").as("win_sum"),
          count(lit(1)).over(w).as("win_n"))
        .orderBy("user_id", "tus", "event_id")
    },

    // Streaming-OVER parity: BOUNDED ROWS frame (ROWS 3 PRECEDING) via
    // the SAME accumulate/retract fold the streaming operator runs
    // (StatefulOps.rowsBoundedFold; RowTimeRowsBoundedPrecedingFunction
    // semantics). Long-scaled sums: add/retract in integers is exact,
    // so both engines agree in any evaluation order.
    "o02_over_rows_bounded" -> { (s, dir) =>
      import s.implicits._
      val ds = ev(s, dir).select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("tus"), col("value"))
        .as[(Long, Long, Long, Double)]
      ds.groupByKey(_._1)
        .flatMapGroups { (uid, it) =>
          val sorted = it.toIndexedSeq.sortBy(r => (r._3, r._2))
          val (outs, _, _) = graft.streaming.StatefulOps
            .rowsBoundedFold[(Long, Long, Long, Double), (Long, Long)](
              sorted, Seq.empty, (0L, 0L), 3,
              (a, t) => (a._1 + math.floor(t._4 * 1e6).toLong, a._2 + 1),
              (a, t) => (a._1 - math.floor(t._4 * 1e6).toLong, a._2 - 1))
          outs.iterator.map { case (t, (sc, n)) =>
            (uid, t._2, t._3, sc.toDouble / 1e6, n)
          }
        }
        .toDF("user_id", "event_id", "tus", "win_sum", "win_n")
        .orderBy("user_id", "tus", "event_id")
    },

    // Streaming-OVER parity: BOUNDED RANGE frame (30 min preceding) via
    // StatefulOps.rangeBoundedFold — same-timestamp peers share one
    // aggregate, exactly the SQL RANGE frame the oracle computes
    // (RowTimeRangeBoundedPrecedingFunction semantics).
    "o03_over_range_bounded" -> { (s, dir) =>
      import s.implicits._
      val ds = ev(s, dir).select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("tus"), col("value"))
        .as[(Long, Long, Long, Double)]
      ds.groupByKey(_._1)
        .flatMapGroups { (uid, it) =>
          val sorted = it.toIndexedSeq.sortBy(r => (r._3, r._2))
          val (outs, _, _) = graft.streaming.StatefulOps
            .rangeBoundedFold[(Long, Long, Long, Double), (Long, Long)](
              sorted, _._3, Seq.empty, (0L, 0L), 1800000000L,
              (a, t) => (a._1 + math.floor(t._4 * 1e6).toLong, a._2 + 1),
              (a, t) => (a._1 - math.floor(t._4 * 1e6).toLong, a._2 - 1))
          outs.iterator.map { case (t, (sc, n)) =>
            (uid, t._2, t._3, sc.toDouble / 1e6, n)
          }
        }
        .toDF("user_id", "event_id", "tus", "win_sum", "win_n")
        .orderBy("user_id", "tus", "event_id")
    },

    // CEP strict contiguity: view -> click -> purchase, immediately
    // consecutive in the user's FUNNEL sub-stream (error/signup events
    // filtered out first — CEP on a filtered stream, the reference's
    // PatternStream over DataStream.filter), within 24 hours. On the
    // raw stream the strict triple is absent at sf0.01, which made the
    // r2 cross-engine gate vacuous (0 == 0).
    "m01_cep_strict" -> { (s, dir) =>
      import s.implicits._
      val ds = ev(s, dir)
        .where(col("event_type").isin("view", "click", "purchase"))
        .select(col("event_id"), unix_micros(col("ts")).as("tus"),
          col("user_id"), col("event_type")).as[Ev]
      val pat = Pattern[Ev](Vector(
        Step("v", (_: Ev).event_type == "view"),
        Step("c", (_: Ev).event_type == "click"),
        Step("p", (_: Ev).event_type == "purchase")),
        withinMicros = Some(86400000000L),
        afterMatch = AfterMatch.SkipPastLast)
      ds.groupByKey(_.user_id)
        .flatMapGroups { (uid, it) =>
          val evs = it.toIndexedSeq.sortBy(e => (e.tus, e.event_id))
          Nfa.run[Ev](evs, _.tus, pat).iterator.map { m =>
            (uid, m.first("v").event_id, m.first("c").event_id,
              m.first("p").event_id, m.first("v").tus)
          }
        }
        .toDF("user_id", "view_id", "click_id", "purchase_id", "view_tus")
        .orderBy("user_id", "view_tus")
    },

    // CEP relaxed contiguity (followedBy): each signup's first purchase
    // within 24h, skipping unrelated events; NoSkip after-match.
    "m02_cep_followed_by" -> { (s, dir) =>
      import s.implicits._
      val ds = ev(s, dir)
        .select(col("event_id"), unix_micros(col("ts")).as("tus"),
          col("user_id"), col("event_type")).as[Ev]
      val pat = Pattern[Ev](Vector(
        Step("s", (_: Ev).event_type == "signup"),
        Step("p", (_: Ev).event_type == "purchase",
          contiguity = Contiguity.Relaxed)),
        withinMicros = Some(86400000000L),
        afterMatch = AfterMatch.NoSkip)
      ds.groupByKey(_.user_id)
        .flatMapGroups { (uid, it) =>
          val evs = it.toIndexedSeq.sortBy(e => (e.tus, e.event_id))
          Nfa.run[Ev](evs, _.tus, pat).iterator.map { m =>
            (uid, m.first("s").event_id, m.first("p").event_id,
              m.first("p").tus - m.first("s").tus)
          }
        }
        .toDF("user_id", "signup_id", "purchase_id", "gap_us")
        .orderBy("user_id", "signup_id")
    },

    // SQL MATCH_RECOGNIZE surface (StreamExecMatch.java:89): the same
    // NFA engine as m01-m03 but reached through the string syntax the
    // reference's SQL planner exposes — one-or-more consecutive clicks
    // (greedy) ending in a purchase, within 1 hour of the first click.
    "m04_match_recognize" -> { (s, dir) =>
      val env = graft.GraftTableEnvironment.create(s)
      ev(s, dir).select(col("event_id"), unix_micros(col("ts")).as("tus"),
        col("user_id"), col("event_type")).createOrReplaceTempView("m04_events")
      env.sqlQuery("""
        SELECT user_id, first_click_id, last_click_id, n_clicks,
               purchase_id, first_click_tus
        FROM m04_events MATCH_RECOGNIZE (
          PARTITION BY user_id
          ORDER BY tus, event_id
          MEASURES FIRST(C.event_id) AS first_click_id,
                   LAST(C.event_id) AS last_click_id, COUNT(C.event_id) AS n_clicks,
                   P.event_id AS purchase_id, FIRST(C.tus) AS first_click_tus
          ONE ROW PER MATCH
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN (C+ P) WITHIN INTERVAL '1' HOUR
          DEFINE C AS C.event_type = 'click',
                 P AS P.event_type = 'purchase'
        ) ORDER BY user_id, first_click_tus, first_click_id""")
    },

    // AFTER MATCH SKIP TO NEXT ROW (flink-cep SkipToNextStrategy):
    // every adjacent click pair — matches OVERLAP (a run of n clicks
    // yields n-1 pairs), where SKIP PAST LAST ROW would yield only
    // floor(n/2). Exercises the resume-at-start+1 strategy end to end
    // through the MATCH_RECOGNIZE surface.
    "m05_skip_to_next" -> { (s, dir) =>
      val env = graft.GraftTableEnvironment.create(s)
      ev(s, dir).select(col("event_id"), unix_micros(col("ts")).as("tus"),
        col("user_id"), col("event_type")).createOrReplaceTempView("m05_events")
      env.sqlQuery("""
        SELECT user_id, first_click_id, second_click_id, first_tus
        FROM m05_events MATCH_RECOGNIZE (
          PARTITION BY user_id
          ORDER BY tus, event_id
          MEASURES FIRST(C.event_id) AS first_click_id,
                   LAST(C.event_id) AS second_click_id,
                   FIRST(C.tus) AS first_tus
          ONE ROW PER MATCH
          AFTER MATCH SKIP TO NEXT ROW
          PATTERN (C{2})
          DEFINE C AS C.event_type = 'click'
        ) ORDER BY user_id, first_tus, first_click_id""")
    },

    // AFTER MATCH SKIP TO LAST <var> (flink-cep SkipToLastStrategy):
    // a greedy view-run + purchase emits the full-run match, then the
    // scan re-enters AT the run's last view, which matches again as a
    // 1-view run with the same purchase — overlapping matches sharing
    // consumed events, the semantics SKIP PAST LAST ROW cannot express.
    "m06_skip_to_last" -> { (s, dir) =>
      val env = graft.GraftTableEnvironment.create(s)
      ev(s, dir).select(col("event_id"), unix_micros(col("ts")).as("tus"),
        col("user_id"), col("event_type")).createOrReplaceTempView("m06_events")
      env.sqlQuery("""
        SELECT user_id, first_view_id, n_views, purchase_id, first_tus
        FROM m06_events MATCH_RECOGNIZE (
          PARTITION BY user_id
          ORDER BY tus, event_id
          MEASURES FIRST(V.event_id) AS first_view_id,
                   COUNT(V.event_id) AS n_views,
                   P.event_id AS purchase_id,
                   FIRST(V.tus) AS first_tus
          ONE ROW PER MATCH
          AFTER MATCH SKIP TO LAST V
          PATTERN (V+ P) WITHIN INTERVAL '24' HOUR
          DEFINE V AS V.event_type = 'view',
                 P AS P.event_type = 'purchase'
        ) ORDER BY user_id, first_tus, first_view_id""")
    },

    // Multi-column PARTITION BY (the reference's MatchRecognizeITCase
    // partitions on two keys): within each (user, event_type)
    // substream, an immediately-consecutive low→high value crossing.
    // The L/H predicates are disjoint, so SKIP PAST LAST ROW can never
    // drop a candidate and the lead() oracle is exact.
    "m07_multi_partition" -> { (s, dir) =>
      val env = graft.GraftTableEnvironment.create(s)
      ev(s, dir).select(col("event_id"), unix_micros(col("ts")).as("tus"),
        col("user_id"), col("event_type"), col("value"))
        .createOrReplaceTempView("m07_events")
      env.sqlQuery("""
        SELECT user_id, event_type, low_id, high_id, low_tus
        FROM m07_events MATCH_RECOGNIZE (
          PARTITION BY user_id, event_type
          ORDER BY tus, event_id
          MEASURES L.event_id AS low_id, H.event_id AS high_id,
                   FIRST(L.tus) AS low_tus
          ONE ROW PER MATCH
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN (L H)
          DEFINE L AS L.value < 50.0, H AS H.value >= 50.0
        ) ORDER BY user_id, event_type, low_tus, low_id""")
    },

    // AFTER MATCH SKIP TO FIRST <var> (flink-cep SkipToFirstStrategy):
    // greedy view-run + purchase, re-entering at the run's FIRST view
    // (= one past the match start, the strategy's no-regress guard), so
    // EVERY in-window suffix of the run re-matches with the same
    // purchase — n overlapping matches where SKIP PAST LAST ROW emits
    // one and SKIP TO LAST V (m06) emits two.
    "m08_skip_to_first" -> { (s, dir) =>
      val env = graft.GraftTableEnvironment.create(s)
      ev(s, dir).select(col("event_id"), unix_micros(col("ts")).as("tus"),
        col("user_id"), col("event_type")).createOrReplaceTempView("m08_events")
      env.sqlQuery("""
        SELECT user_id, first_view_id, n_views, purchase_id, first_tus
        FROM m08_events MATCH_RECOGNIZE (
          PARTITION BY user_id
          ORDER BY tus, event_id
          MEASURES FIRST(V.event_id) AS first_view_id,
                   COUNT(V.event_id) AS n_views,
                   P.event_id AS purchase_id,
                   FIRST(V.tus) AS first_tus
          ONE ROW PER MATCH
          AFTER MATCH SKIP TO FIRST V
          PATTERN (V+ P) WITHIN INTERVAL '24' HOUR
          DEFINE V AS V.event_type = 'view',
                 P AS P.event_type = 'purchase'
        ) ORDER BY user_id, first_tus, first_view_id""")
    },

    // Bounded-range quantifier E{2,3} (greedy, so a long error run
    // binds its LAST three errors — the earliest start from which
    // {2,3}-then-signup can complete) with a BINDING 24h WITHIN (the
    // median 3-error-suffix-to-signup span is ~30h): when the last-3
    // suffix overruns the window the NFA advances one error and
    // matches the last-2 suffix instead.
    "m09_times_range" -> { (s, dir) =>
      val env = graft.GraftTableEnvironment.create(s)
      ev(s, dir).select(col("event_id"), unix_micros(col("ts")).as("tus"),
        col("user_id"), col("event_type")).createOrReplaceTempView("m09_events")
      env.sqlQuery("""
        SELECT user_id, first_err_id, n_errs, signup_id, first_tus
        FROM m09_events MATCH_RECOGNIZE (
          PARTITION BY user_id
          ORDER BY tus, event_id
          MEASURES FIRST(E.event_id) AS first_err_id,
                   COUNT(E.event_id) AS n_errs,
                   R.event_id AS signup_id,
                   FIRST(E.tus) AS first_tus
          ONE ROW PER MATCH
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN (E{2,3} R) WITHIN INTERVAL '24' HOUR
          DEFINE E AS E.event_type = 'error',
                 R AS R.event_type = 'signup'
        ) ORDER BY user_id, first_tus, first_err_id""")
    },

    // Three-step pattern with a NEGATION define (X is any non-signup
    // row — the "wildcard gap" idiom): signup, one arbitrary event,
    // purchase, strictly consecutive. X <> signup also makes candidate
    // overlap impossible, so the two-lead oracle is exact.
    "m10_wildcard_gap" -> { (s, dir) =>
      val env = graft.GraftTableEnvironment.create(s)
      ev(s, dir).select(col("event_id"), unix_micros(col("ts")).as("tus"),
        col("user_id"), col("event_type")).createOrReplaceTempView("m10_events")
      env.sqlQuery("""
        SELECT user_id, signup_id, gap_id, gap_type, purchase_id, signup_tus
        FROM m10_events MATCH_RECOGNIZE (
          PARTITION BY user_id
          ORDER BY tus, event_id
          MEASURES S.event_id AS signup_id, X.event_id AS gap_id,
                   X.event_type AS gap_type, P.event_id AS purchase_id,
                   S.tus AS signup_tus
          ONE ROW PER MATCH
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN (S X P)
          DEFINE S AS S.event_type = 'signup',
                 X AS X.event_type <> 'signup',
                 P AS P.event_type = 'purchase'
        ) ORDER BY user_id, signup_tus, signup_id""")
    },

    // PREV() navigation in DEFINE (SQL:2016 §R020; the reference's
    // MatchRecognizeITCase "Ticker" V-shape): a strict down-tick
    // immediately followed by an up-tick. PREV is PHYSICAL row
    // navigation, lowered to one lag() window pass before the NFA —
    // see MatchRecognize.navColName. D and U are row-disjoint
    // (value < prev vs value > prev), so SKIP PAST LAST ROW can never
    // suppress a candidate and the self-join oracle is exact.
    "m11_prev_navigation" -> { (s, dir) =>
      val env = graft.GraftTableEnvironment.create(s)
      ev(s, dir).select(col("event_id"), unix_micros(col("ts")).as("tus"),
        col("user_id"), col("value")).createOrReplaceTempView("m11_events")
      env.sqlQuery("""
        SELECT user_id, down_id, up_id, down_value, down_tus
        FROM m11_events MATCH_RECOGNIZE (
          PARTITION BY user_id
          ORDER BY tus, event_id
          MEASURES D.event_id AS down_id, U.event_id AS up_id,
                   D.value AS down_value, FIRST(D.tus) AS down_tus
          ONE ROW PER MATCH
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN (D U)
          DEFINE D AS D.value < PREV(D.value),
                 U AS U.value > PREV(U.value)
        ) ORDER BY user_id, down_tus, down_id""")
    },

    // RUNNING vs FINAL measure semantics plus LAST(V.x, 1) logical
    // offset over a quantified variable: under ONE ROW PER MATCH both
    // prefixes evaluate on the complete match (RUNNING LAST ==
    // FINAL LAST — the oracle asserts the equality by computing the
    // same value for both output columns); the offset navigates to the
    // second-to-last bound row, NULL when the run has a single view.
    "m12_final_running_measures" -> { (s, dir) =>
      val env = graft.GraftTableEnvironment.create(s)
      ev(s, dir).select(col("event_id"), unix_micros(col("ts")).as("tus"),
        col("user_id"), col("event_type")).createOrReplaceTempView("m12_events")
      env.sqlQuery("""
        SELECT user_id, first_view_id, last_view_id, run_last_view_id,
               penult_view_id, n_views, first_tus
        FROM m12_events MATCH_RECOGNIZE (
          PARTITION BY user_id
          ORDER BY tus, event_id
          MEASURES FIRST(V.event_id) AS first_view_id,
                   FINAL LAST(V.event_id) AS last_view_id,
                   RUNNING LAST(V.event_id) AS run_last_view_id,
                   FINAL LAST(V.event_id, 1) AS penult_view_id,
                   FINAL COUNT(V.event_id) AS n_views,
                   FIRST(V.tus) AS first_tus
          ONE ROW PER MATCH
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN (V+ P)
          DEFINE V AS V.event_type = 'view',
                 P AS P.event_type = 'purchase'
        ) ORDER BY user_id, first_tus, first_view_id""")
    },

    // PREV with an explicit offset of 2 AND forward NEXT navigation in
    // one DEFINE: a local "peak" — strictly above the value two rows
    // back and above the next row. Single-variable pattern, so every
    // qualifying row is its own match and the lag/lead oracle is
    // trivially exact; partition heads (no 2-back row) and tails (no
    // next row) fail the null-comparison, matching SQL semantics.
    "m13_prev_offset_next" -> { (s, dir) =>
      val env = graft.GraftTableEnvironment.create(s)
      ev(s, dir).select(col("event_id"), unix_micros(col("ts")).as("tus"),
        col("user_id"), col("value")).createOrReplaceTempView("m13_events")
      env.sqlQuery("""
        SELECT user_id, peak_id, peak_value, peak_tus
        FROM m13_events MATCH_RECOGNIZE (
          PARTITION BY user_id
          ORDER BY tus, event_id
          MEASURES S.event_id AS peak_id, S.value AS peak_value,
                   FIRST(S.tus) AS peak_tus
          ONE ROW PER MATCH
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN (S)
          DEFINE S AS S.value > PREV(S.value, 2) AND S.value > NEXT(S.value)
        ) ORDER BY user_id, peak_tus, peak_id""")
    }
  )

  override def oracleSql: Map[String, String] = Map(
    "w01_tumble_agg" -> s"""
      SELECT CAST(floor(epoch_us(ts)/3600000000)*3600 AS BIGINT) AS win_start,
             event_type, count(1) AS n, ${dsumSql("value")} AS sum_value
      FROM events
      GROUP BY 1, 2
      ORDER BY win_start, event_type""",

    "w09_sql_group_window" -> s"""
      SELECT CAST(floor(epoch_us(ts)/3600000000)*3600 AS BIGINT) AS win_start,
             event_type, count(1) AS n, ${dsumSql("value")} AS sum_value
      FROM events
      GROUP BY 1, 2
      ORDER BY win_start, event_type""",

    "w08_tumble_offset" -> s"""
      SELECT CAST(floor((epoch_us(ts) - 900000000)/3600000000)*3600 + 900 AS BIGINT)
               AS win_start,
             event_type, count(1) AS n, ${dsumSql("value")} AS sum_value
      FROM events
      GROUP BY 1, 2
      ORDER BY win_start, event_type""",

    "w02_hop_agg" -> s"""
      SELECT win_start, event_type, count(1) AS n, ${dsumSql("value")} AS sum_value
      FROM (
        SELECT (CAST(floor(epoch_us(ts)/600000000) AS BIGINT) - t.k) * 600 AS win_start,
               event_type, value
        FROM events, unnest([0, 1, 2]) AS t(k))
      GROUP BY win_start, event_type
      ORDER BY win_start, event_type""",

    "w10_sql_hop_tvf" -> s"""
      SELECT win_start, event_type, count(1) AS n, ${dsumSql("value")} AS sum_value
      FROM (
        SELECT (CAST(floor(epoch_us(ts)/600000000) AS BIGINT) - t.k) * 600 AS win_start,
               event_type, value
        FROM events, unnest([0, 1, 2]) AS t(k))
      GROUP BY win_start, event_type
      ORDER BY win_start, event_type""",

    "w11_sql_cumulate_tvf" -> s"""
      SELECT win_start, win_end, event_type, count(1) AS n,
             ${dsumSql("value")} AS sum_value
      FROM (
        SELECT CAST(floor(epoch_us(ts)/14400000000)*14400 AS BIGINT) AS win_start,
               CAST(floor(epoch_us(ts)/14400000000)*14400 AS BIGINT) + t.k*3600 AS win_end,
               event_type, value, epoch_us(ts) AS tus
        FROM events, unnest([1, 2, 3, 4]) AS t(k))
      WHERE tus < win_end * 1000000
      GROUP BY win_start, win_end, event_type
      ORDER BY win_start, win_end, event_type""",

    "w03_session_agg" -> s"""
      WITH e AS (
        SELECT user_id, value, epoch_us(ts) AS tus FROM events),
      marked AS (
        SELECT *, CASE WHEN lag(tus) OVER w IS NULL
                         OR tus - lag(tus) OVER w >= 600000000
                       THEN 1 ELSE 0 END AS new_s
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus)),
      grouped AS (
        SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY tus
                                   ROWS UNBOUNDED PRECEDING) AS sid
        FROM marked)
      SELECT user_id, min(tus) AS sess_start_us,
             max(tus) + 600000000 AS sess_end_us,
             count(1) AS n, ${dsumSql("value")} AS sum_value
      FROM grouped
      GROUP BY user_id, sid
      ORDER BY user_id, sess_start_us""",

    "w07_count_slide" -> """
      SELECT user_id, rn AS fire_at,
             CAST(CASE WHEN rn < 50 THEN rn ELSE 50 END AS INT) AS n_in_win,
             sum_value
      FROM (
        SELECT user_id,
          CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS INT) AS rn,
          CAST(sum(CAST(value AS DECIMAL(25,6))) OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN 49 PRECEDING AND CURRENT ROW) AS DOUBLE) AS sum_value
        FROM events)
      WHERE rn % 25 = 0
      ORDER BY user_id, fire_at""",

    "w06_session_dynamic_gap" -> s"""
      WITH e AS (
        SELECT user_id, value, epoch_us(ts) AS tus,
               CASE WHEN event_type IN ('click', 'view')
                    THEN 300000000 ELSE 900000000 END AS gap
        FROM events),
      marked AS (
        SELECT *, CASE WHEN max(tus + gap) OVER wprev IS NULL
                         OR tus >= max(tus + gap) OVER wprev
                       THEN 1 ELSE 0 END AS new_s
        FROM e WINDOW wprev AS (PARTITION BY user_id ORDER BY tus
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
      grouped AS (
        SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY tus
                                   ROWS UNBOUNDED PRECEDING) AS sid
        FROM marked)
      SELECT user_id, min(tus) AS sess_start_us,
             max(tus + gap) AS sess_end_us,
             count(1) AS n, ${dsumSql("value")} AS sum_value
      FROM grouped
      GROUP BY user_id, sid
      ORDER BY user_id, sess_start_us""",

    "w04_cumulate_agg" -> s"""
      SELECT win_start, win_end, event_type, count(1) AS n,
             ${dsumSql("value")} AS sum_value
      FROM (
        SELECT CAST(floor(epoch_us(ts)/14400000000)*14400 AS BIGINT) AS win_start,
               CAST(floor(epoch_us(ts)/14400000000)*14400 AS BIGINT) + t.k*3600 AS win_end,
               event_type, value, epoch_us(ts) AS tus
        FROM events, unnest([1, 2, 3, 4]) AS t(k))
      WHERE tus < win_end * 1000000
      GROUP BY win_start, win_end, event_type
      ORDER BY win_start, win_end, event_type""",

    "w05_count_windows" -> s"""
      SELECT user_id, win_id, count(1) AS n, ${dsumSql("value")} AS sum_value,
             min(event_id) AS first_event
      FROM (
        SELECT user_id, event_id, value,
               CAST(floor((row_number() OVER (PARTITION BY user_id
                 ORDER BY ts, event_id) - 1) / 50) AS BIGINT) AS win_id
        FROM events)
      GROUP BY user_id, win_id
      ORDER BY user_id, win_id""",

    "d01_dedup_keep_first" -> """
      SELECT user_id, event_type, event_id, epoch_us(ts) AS tus FROM (
        SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                                     ORDER BY ts, event_id) AS rn
        FROM events)
      WHERE rn = 1
      ORDER BY user_id, event_type""",

    "d02_dedup_keep_last" -> """
      SELECT user_id, event_type, event_id, epoch_us(ts) AS tus FROM (
        SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                                     ORDER BY ts DESC, event_id DESC) AS rn
        FROM events)
      WHERE rn = 1
      ORDER BY user_id, event_type""",

    "j01_interval_join" -> """
      WITH e AS (SELECT event_id, epoch_us(ts) AS tus, user_id, event_type FROM events),
           c AS (SELECT event_id AS click_id, tus AS ctus, user_id FROM e
                 WHERE event_type = 'click'),
           p AS (SELECT event_id AS purchase_id, tus AS ptus, user_id FROM e
                 WHERE event_type = 'purchase')
      SELECT click_id, purchase_id, ptus - ctus AS gap_us
      FROM c JOIN p ON c.user_id = p.user_id
        AND p.ptus > c.ctus AND p.ptus <= c.ctus + 1800000000
      ORDER BY click_id, purchase_id""",

    "j02_asof_join" -> """
      WITH e AS (SELECT event_id, epoch_us(ts) AS tus, user_id, event_type, value
                 FROM events),
           p AS (SELECT event_id, user_id, tus FROM e WHERE event_type = 'purchase'),
           c0 AS (SELECT event_id AS click_id, user_id, tus, value AS click_value
                  FROM e WHERE event_type = 'click'),
           c AS (SELECT click_id, user_id, tus, click_value FROM (
                   SELECT *, row_number() OVER (PARTITION BY user_id, tus
                                                ORDER BY click_id DESC) AS rn
                   FROM c0)
                 WHERE rn = 1)
      SELECT p.event_id AS purchase_id, p.user_id, p.tus,
             c.click_id, c.click_value
      FROM p ASOF LEFT JOIN c
        ON p.user_id = c.user_id AND p.tus >= c.tus
      ORDER BY purchase_id""",

    "j05_temporal_sql" -> """
      WITH e AS (SELECT event_id, epoch_us(ts) AS tus, user_id, event_type, value
                 FROM events),
           p AS (SELECT event_id, user_id, tus FROM e WHERE event_type = 'purchase'),
           c0 AS (SELECT event_id AS click_id, user_id, tus, value AS click_value
                  FROM e WHERE event_type = 'click'),
           c AS (SELECT click_id, user_id, tus, click_value FROM (
                   SELECT *, row_number() OVER (PARTITION BY user_id, tus
                                                ORDER BY click_id DESC) AS rn
                   FROM c0)
                 WHERE rn = 1)
      SELECT p.event_id AS purchase_id, p.user_id, p.tus,
             c.click_id, c.click_value
      FROM p ASOF JOIN c
        ON p.user_id = c.user_id AND p.tus >= c.tus
      ORDER BY purchase_id""",

    "o01_over_time_range" -> """
      SELECT user_id, event_id, tus,
        CAST(sum(CAST(value AS DECIMAL(25,6)))
             OVER (PARTITION BY user_id ORDER BY tus
                   RANGE BETWEEN 1800000000 PRECEDING AND CURRENT ROW) AS DOUBLE)
          AS win_sum,
        count(1) OVER (PARTITION BY user_id ORDER BY tus
                       RANGE BETWEEN 1800000000 PRECEDING AND CURRENT ROW) AS win_n
      FROM (SELECT user_id, event_id, epoch_us(ts) AS tus, value FROM events)
      ORDER BY user_id, tus, event_id""",

    "o02_over_rows_bounded" -> """
      SELECT user_id, event_id, tus,
        CAST(sum(CAST(floor(value * 1e6) AS BIGINT)) OVER w AS DOUBLE) / 1e6
          AS win_sum,
        count(1) OVER w AS win_n
      FROM (SELECT user_id, event_id, epoch_us(ts) AS tus, value FROM events)
      WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id
                   ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
      ORDER BY user_id, tus, event_id""",

    "o03_over_range_bounded" -> """
      SELECT user_id, event_id, tus,
        CAST(sum(CAST(floor(value * 1e6) AS BIGINT)) OVER w AS DOUBLE) / 1e6
          AS win_sum,
        count(1) OVER w AS win_n
      FROM (SELECT user_id, event_id, epoch_us(ts) AS tus, value FROM events)
      WINDOW w AS (PARTITION BY user_id ORDER BY tus
                   RANGE BETWEEN 1800000000 PRECEDING AND CURRENT ROW)
      ORDER BY user_id, tus, event_id""",

    "m01_cep_strict" -> """
      SELECT user_id, view_id, click_id, purchase_id, view_tus FROM (
        SELECT user_id, event_id AS view_id, event_type, tus AS view_tus,
               lead(event_type, 1) OVER w AS t1,
               lead(event_id, 1) OVER w AS click_id,
               lead(event_type, 2) OVER w AS t2,
               lead(event_id, 2) OVER w AS purchase_id,
               lead(tus, 2) OVER w AS tus2
        FROM (SELECT user_id, event_id, event_type, epoch_us(ts) AS tus FROM events
              WHERE event_type IN ('view', 'click', 'purchase'))
        WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id))
      WHERE event_type = 'view' AND t1 = 'click' AND t2 = 'purchase'
        AND tus2 - view_tus < 86400000000
      ORDER BY user_id, view_tus""",

    "m02_cep_followed_by" -> """
      WITH e AS (SELECT event_id, epoch_us(ts) AS tus, user_id, event_type FROM events),
           s AS (SELECT event_id AS signup_id, tus AS stus, user_id FROM e
                 WHERE event_type = 'signup'),
           p AS (SELECT event_id AS purchase_id, tus AS ptus, user_id FROM e
                 WHERE event_type = 'purchase')
      SELECT user_id, signup_id, purchase_id, gap_us FROM (
        SELECT s.user_id, s.signup_id, p.purchase_id,
               p.ptus - s.stus AS gap_us,
               row_number() OVER (PARTITION BY s.user_id, s.signup_id
                                  ORDER BY p.ptus, p.purchase_id) AS rn
        FROM s JOIN p ON s.user_id = p.user_id
          AND (p.ptus > s.stus OR (p.ptus = s.stus AND p.purchase_id > s.signup_id))
          AND p.ptus - s.stus < 86400000000)
      WHERE rn = 1
      ORDER BY user_id, signup_id""",

    // Run-based reformulation of PATTERN (C+ P): maximal consecutive
    // click runs ended by a purchase; the NFA's within-clock starts at
    // the first BOUND click, so the match is the longest suffix of the
    // run whose first click is within 1h of the purchase (same shape as
    // m03's oracle). SKIP PAST LAST ROW can't create overlap (every row
    // in a span is a bound click or the consumed purchase).
    "m04_match_recognize" -> """
      WITH s AS (
        SELECT user_id, event_id, event_type, epoch_us(ts) AS tus,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY epoch_us(ts), event_id) AS pos,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY epoch_us(ts), event_id) AS prev_type
        FROM events),
      g AS (
        SELECT *, sum(CASE WHEN coalesce(prev_type, '') <> 'click' THEN 1 ELSE 0 END)
                 OVER (PARTITION BY user_id ORDER BY pos) AS run_id
        FROM s WHERE event_type = 'click'),
      runs AS (
        SELECT user_id, run_id, max(pos) AS p1
        FROM g GROUP BY user_id, run_id),
      matches AS (
        SELECT r.user_id, r.run_id, r.p1, nxt.event_id AS purchase_id,
               nxt.tus AS ptus
        FROM runs r
        JOIN s nxt ON nxt.user_id = r.user_id AND nxt.pos = r.p1 + 1
        WHERE nxt.event_type = 'purchase')
      SELECT m.user_id,
             arg_min(g.event_id, g.pos) AS first_click_id,
             arg_max(g.event_id, g.pos) AS last_click_id,
             CAST(m.p1 - min(g.pos) + 1 AS BIGINT) AS n_clicks,
             m.purchase_id,
             min(g.tus) AS first_click_tus
      FROM matches m
      JOIN g ON g.user_id = m.user_id AND g.run_id = m.run_id
      WHERE m.ptus - g.tus < 3600000000
      GROUP BY m.user_id, m.run_id, m.p1, m.purchase_id
      ORDER BY m.user_id, first_click_tus, first_click_id""",

    // SKIP TO NEXT ROW re-enters one past each match's start, so every
    // adjacent (click, click) row pair is its own match — exactly the
    // lead() self-pairing.
    "m05_skip_to_next" -> """
      SELECT user_id, event_id AS first_click_id, id1 AS second_click_id,
             tus AS first_tus
      FROM (
        SELECT user_id, event_id, event_type, epoch_us(ts) AS tus,
               lead(event_type) OVER w AS t1, lead(event_id) OVER w AS id1
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id))
      WHERE event_type = 'click' AND t1 = 'click'
      ORDER BY user_id, first_tus, first_click_id""",

    // SKIP TO LAST V: per maximal view-run followed immediately by a
    // purchase, the greedy NFA emits (a) the run-suffix match whose
    // first view sits inside the 24h `within` of the purchase, then —
    // re-entering at the last view — (b) a 1-view match with the same
    // purchase, only when the first match bound ≥2 views (re-entry at
    // the start makes no progress otherwise).
    "m06_skip_to_last" -> """
      WITH s AS (
        SELECT user_id, event_id, event_type, epoch_us(ts) AS tus,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY epoch_us(ts), event_id) AS pos,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY epoch_us(ts), event_id) AS prev_type
        FROM events),
      g AS (
        SELECT *, sum(CASE WHEN coalesce(prev_type, '') <> 'view' THEN 1 ELSE 0 END)
                 OVER (PARTITION BY user_id ORDER BY pos) AS run_id
        FROM s WHERE event_type = 'view'),
      runs AS (
        SELECT user_id, run_id, max(pos) AS p1
        FROM g GROUP BY user_id, run_id),
      matches AS (
        SELECT r.user_id, r.run_id, r.p1, nxt.event_id AS purchase_id,
               nxt.tus AS ptus
        FROM runs r
        JOIN s nxt ON nxt.user_id = r.user_id AND nxt.pos = r.p1 + 1
        WHERE nxt.event_type = 'purchase'),
      full_matches AS (
        SELECT m.user_id,
               arg_min(g.event_id, g.pos) AS first_view_id,
               arg_max(g.event_id, g.pos) AS last_view_id,
               CAST(count(1) AS BIGINT) AS n_views,
               m.purchase_id,
               min(g.tus) AS first_tus,
               max(g.tus) AS last_tus
        FROM matches m
        JOIN g ON g.user_id = m.user_id AND g.run_id = m.run_id
        WHERE m.ptus - g.tus < 86400000000
        GROUP BY m.user_id, m.run_id, m.p1, m.purchase_id)
      SELECT user_id, first_view_id, n_views, purchase_id, first_tus
      FROM full_matches
      UNION ALL
      SELECT user_id, last_view_id AS first_view_id, CAST(1 AS BIGINT) AS n_views,
             purchase_id, last_tus AS first_tus
      FROM full_matches WHERE n_views >= 2
      ORDER BY user_id, first_tus, first_view_id""",

    // L and H have disjoint predicates, so matches can't overlap and
    // every (low, next-is-high) row pair is a match: plain lead()
    // within the two-key partition.
    "m07_multi_partition" -> """
      SELECT user_id, event_type, event_id AS low_id, id1 AS high_id,
             tus AS low_tus
      FROM (
        SELECT user_id, event_type, event_id, value, epoch_us(ts) AS tus,
               lead(value) OVER w AS v1, lead(event_id) OVER w AS id1
        FROM events
        WINDOW w AS (PARTITION BY user_id, event_type
                     ORDER BY epoch_us(ts), event_id))
      WHERE value < 50.0 AND v1 >= 50.0
      ORDER BY user_id, event_type, low_tus, low_id""",

    // SKIP TO FIRST V re-enters one past each match's start (the
    // strategy's no-regress guard, first V = start), so every view of
    // the run whose own suffix fits the 24h window emits a match with
    // the shared purchase — one row per in-window view.
    "m08_skip_to_first" -> """
      WITH s AS (
        SELECT user_id, event_id, event_type, epoch_us(ts) AS tus,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY epoch_us(ts), event_id) AS pos,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY epoch_us(ts), event_id) AS prev_type
        FROM events),
      g AS (
        SELECT *, sum(CASE WHEN coalesce(prev_type, '') <> 'view' THEN 1 ELSE 0 END)
                 OVER (PARTITION BY user_id ORDER BY pos) AS run_id
        FROM s WHERE event_type = 'view'),
      runs AS (
        SELECT user_id, run_id, max(pos) AS p1
        FROM g GROUP BY user_id, run_id),
      matches AS (
        SELECT r.user_id, r.run_id, r.p1, nxt.event_id AS purchase_id,
               nxt.tus AS ptus
        FROM runs r
        JOIN s nxt ON nxt.user_id = r.user_id AND nxt.pos = r.p1 + 1
        WHERE nxt.event_type = 'purchase')
      SELECT m.user_id, g.event_id AS first_view_id,
             CAST(m.p1 - g.pos + 1 AS BIGINT) AS n_views,
             m.purchase_id, g.tus AS first_tus
      FROM matches m
      JOIN g ON g.user_id = m.user_id AND g.run_id = m.run_id
      WHERE m.ptus - g.tus < 86400000000
      ORDER BY m.user_id, first_tus, first_view_id""",

    // Greedy E{2,3}: the match is the last-3 suffix of the error run
    // when its span to the signup fits WITHIN 24 hours, else the NFA
    // advances one error and takes the last-2 suffix; runs of 2 bind
    // both errors. One match per run (SKIP PAST LAST ROW).
    "m09_times_range" -> """
      WITH s AS (
        SELECT user_id, event_id, event_type, epoch_us(ts) AS tus,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY epoch_us(ts), event_id) AS pos,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY epoch_us(ts), event_id) AS prev_type
        FROM events),
      g AS (
        SELECT *, sum(CASE WHEN coalesce(prev_type, '') <> 'error' THEN 1 ELSE 0 END)
                 OVER (PARTITION BY user_id ORDER BY pos) AS run_id
        FROM s WHERE event_type = 'error'),
      runs AS (
        SELECT user_id, run_id, max(pos) AS p1, count(1) AS n
        FROM g GROUP BY user_id, run_id),
      cand AS (
        SELECT r.user_id, r.n, nxt.event_id AS signup_id, nxt.tus AS ptus,
               max(CASE WHEN g.pos = r.p1 - 2 THEN g.tus END) AS t3,
               max(CASE WHEN g.pos = r.p1 - 2 THEN g.event_id END) AS id3,
               max(CASE WHEN g.pos = r.p1 - 1 THEN g.tus END) AS t2,
               max(CASE WHEN g.pos = r.p1 - 1 THEN g.event_id END) AS id2
        FROM runs r
        JOIN s nxt ON nxt.user_id = r.user_id AND nxt.pos = r.p1 + 1
          AND nxt.event_type = 'signup'
        JOIN g ON g.user_id = r.user_id AND g.run_id = r.run_id
        GROUP BY r.user_id, r.run_id, r.p1, r.n, nxt.event_id, nxt.tus)
      SELECT user_id,
             CASE WHEN n >= 3 AND ptus - t3 < 86400000000
                  THEN id3 ELSE id2 END AS first_err_id,
             CAST(CASE WHEN n >= 3 AND ptus - t3 < 86400000000
                  THEN 3 ELSE 2 END AS BIGINT) AS n_errs,
             signup_id,
             CASE WHEN n >= 3 AND ptus - t3 < 86400000000
                  THEN t3 ELSE t2 END AS first_tus
      FROM cand
      WHERE (n >= 3 AND ptus - t3 < 86400000000)
         OR (n >= 2 AND ptus - t2 < 86400000000)
      ORDER BY user_id, first_tus, first_err_id""",

    // X <> signup makes overlap impossible (no candidate can start on
    // a consumed X or P row), so the two-lead formulation is exact.
    "m10_wildcard_gap" -> """
      SELECT user_id, event_id AS signup_id, id1 AS gap_id, t1 AS gap_type,
             id2 AS purchase_id, tus AS signup_tus
      FROM (
        SELECT user_id, event_id, event_type, epoch_us(ts) AS tus,
               lead(event_type, 1) OVER w AS t1, lead(event_id, 1) OVER w AS id1,
               lead(event_type, 2) OVER w AS t2, lead(event_id, 2) OVER w AS id2
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id))
      WHERE event_type = 'signup' AND t1 <> 'signup' AND t2 = 'purchase'
      ORDER BY user_id, signup_tus, signup_id""",

    // Down-tick/up-tick pairs: PREV is lag() over the same
    // (partition, order); D/U predicates are row-disjoint so every
    // qualifying (i, i+1) pair is an emitted match.
    "m11_prev_navigation" -> """
      WITH s AS (
        SELECT user_id, event_id, epoch_us(ts) AS tus, value,
               row_number() OVER w AS pos, lag(value) OVER w AS pv
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id))
      SELECT a.user_id, a.event_id AS down_id, b.event_id AS up_id,
             a.value AS down_value, a.tus AS down_tus
      FROM s a JOIN s b ON b.user_id = a.user_id AND b.pos = a.pos + 1
      WHERE a.pv IS NOT NULL AND a.value < a.pv AND b.value > b.pv
      ORDER BY 1, 5, 2""",

    // Maximal view-runs followed immediately by a purchase; RUNNING
    // LAST == FINAL LAST under ONE ROW PER MATCH (same arg_max twice),
    // LAST(V, 1) is the run's second-to-last view (NULL on singleton
    // runs — the CASE max).
    "m12_final_running_measures" -> """
      WITH s AS (
        SELECT user_id, event_id, event_type, epoch_us(ts) AS tus,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY epoch_us(ts), event_id) AS pos,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY epoch_us(ts), event_id) AS prev_type
        FROM events),
      g AS (
        SELECT *, sum(CASE WHEN coalesce(prev_type, '') <> 'view' THEN 1 ELSE 0 END)
                 OVER (PARTITION BY user_id ORDER BY pos) AS run_id
        FROM s WHERE event_type = 'view'),
      runs AS (
        SELECT user_id, run_id, max(pos) AS p1
        FROM g GROUP BY user_id, run_id),
      matches AS (
        SELECT r.user_id, r.run_id, r.p1, nxt.event_id AS purchase_id
        FROM runs r
        JOIN s nxt ON nxt.user_id = r.user_id AND nxt.pos = r.p1 + 1
        WHERE nxt.event_type = 'purchase')
      SELECT m.user_id,
             arg_min(g.event_id, g.pos) AS first_view_id,
             arg_max(g.event_id, g.pos) AS last_view_id,
             arg_max(g.event_id, g.pos) AS run_last_view_id,
             max(CASE WHEN g.pos = m.p1 - 1 THEN g.event_id END) AS penult_view_id,
             CAST(count(1) AS BIGINT) AS n_views,
             min(g.tus) AS first_tus
      FROM matches m
      JOIN g ON g.user_id = m.user_id AND g.run_id = m.run_id
      GROUP BY m.user_id, m.run_id, m.p1, m.purchase_id
      ORDER BY 1, 7, 2""",

    // Local peaks: above the value two rows back (PREV offset 2) and
    // above the next row (NEXT); null navigation at partition
    // heads/tails fails the predicate in both engines.
    "m13_prev_offset_next" -> """
      WITH s AS (
        SELECT user_id, event_id, epoch_us(ts) AS tus, value,
               lag(value, 2) OVER w AS pv2, lead(value) OVER w AS nv
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id))
      SELECT user_id, event_id AS peak_id, value AS peak_value, tus AS peak_tus
      FROM s
      WHERE pv2 IS NOT NULL AND nv IS NOT NULL AND value > pv2 AND value > nv
      ORDER BY user_id, peak_tus, peak_id"""
  )
}
