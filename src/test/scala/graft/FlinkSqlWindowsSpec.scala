package graft

import graft.sql.FlinkSqlWindows
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Flink group-window SQL dialect rewriting (SURVEY §2.4 legacy group
  * windows + window TVFs): a reference user's SQL runs verbatim through
  * GraftTableEnvironment and matches the DataFrame-API plan's result.
  */
class FlinkSqlWindowsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(4)
  lazy val env: GraftTableEnvironment = {
    val e = GraftTableEnvironment.create(spark)
    e.registerTestTables("/root/testdata/sf0.001")
    e
  }

  test("rewrite spellings") {
    assert(FlinkSqlWindows.rewrite("GROUP BY TUMBLE(ts, INTERVAL '1' HOUR)")
      == "GROUP BY window(ts, '1 hours')")
    // Flink HOP takes (slide, size); Spark window takes (size, slide).
    assert(FlinkSqlWindows.rewrite(
      "GROUP BY HOP(ts, INTERVAL '10' MINUTE, INTERVAL '30' MINUTES)")
      == "GROUP BY window(ts, '30 minutes', '10 minutes')")
    assert(FlinkSqlWindows.rewrite("GROUP BY SESSION(ts, INTERVAL '5' MINUTE)")
      == "GROUP BY session_window(ts, '5 minutes')")
    assert(FlinkSqlWindows.rewrite("SELECT TUMBLE_END(ts, INTERVAL '1' DAY)")
      == "SELECT window.end")
    assert(FlinkSqlWindows.rewrite(
      "SELECT HOP_START(ts, INTERVAL '10' MINUTE, INTERVAL '30' MINUTE)")
      == "SELECT window.start")
    assert(FlinkSqlWindows.rewrite("SESSION_END(ts, INTERVAL '5' MINUTE)")
      == "session_window.end")
    assert(FlinkSqlWindows.rewrite("TUMBLE_ROWTIME(ts, INTERVAL '1' HOUR)")
      == "window.end - INTERVAL 1 MILLISECOND")
    // offset variant
    assert(FlinkSqlWindows.rewrite(
      "TUMBLE(ts, INTERVAL '1' HOUR, INTERVAL '15' MINUTE)")
      == "window(ts, '1 hours', '1 hours', '15 minutes')")
    // untouched SQL passes through byte-identical
    val plain = "SELECT a, count(1) FROM t GROUP BY a"
    assert(FlinkSqlWindows.rewrite(plain) == plain)
  }

  test("legacy GROUP BY TUMBLE matches the DataFrame window() plan") {
    val viaSql = env.sqlQuery("""
      SELECT TUMBLE_START(ts, INTERVAL '1' HOUR) AS ws, event_type,
             count(1) AS n
      FROM events GROUP BY TUMBLE(ts, INTERVAL '1' HOUR), event_type
      ORDER BY ws, event_type""").collect()
    val viaDf = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("ws"), col("event_type"), col("n"))
      .orderBy("ws", "event_type").collect()
    assert(viaSql.sameElements(viaDf))
  }

  test("HOP arg order swaps slide/size correctly") {
    val viaSql = env.sqlQuery("""
      SELECT HOP_START(ts, INTERVAL '10' MINUTE, INTERVAL '30' MINUTE) AS ws,
             count(1) AS n
      FROM events GROUP BY HOP(ts, INTERVAL '10' MINUTE, INTERVAL '30' MINUTE)
      ORDER BY ws""").collect()
    val viaDf = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .groupBy(window(col("ts"), "30 minutes", "10 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("ws"), col("n")).orderBy("ws").collect()
    assert(viaSql.sameElements(viaDf))
  }

  test("SESSION window SQL matches session_window() plan") {
    val viaSql = env.sqlQuery("""
      SELECT user_id, SESSION_START(ts, INTERVAL '10' MINUTE) AS ss,
             count(1) AS n
      FROM events GROUP BY user_id, SESSION(ts, INTERVAL '10' MINUTE)
      ORDER BY user_id, ss""").collect()
    val viaDf = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .groupBy(col("user_id"), session_window(col("ts"), "10 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("w.start").as("ss"), col("n"))
      .orderBy("user_id", "ss").collect()
    assert(viaSql.sameElements(viaDf))
  }

  test("HOP window TVF explodes size/slide windows per row") {
    val viaSql = env.sqlQuery("""
      SELECT window_start, count(1) AS n
      FROM TABLE(HOP(TABLE events, DESCRIPTOR(ts),
                     INTERVAL '10' MINUTE, INTERVAL '30' MINUTE))
      GROUP BY window_start ORDER BY window_start""").collect()
    val viaDf = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .groupBy(window(col("ts"), "30 minutes", "10 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("n"))
      .orderBy("window_start").collect()
    assert(viaSql.sameElements(viaDf))
  }

  test("CUMULATE window TVF matches WindowOps.cumulate") {
    val viaSql = env.sqlQuery("""
      SELECT CAST(unix_timestamp(window_start) AS BIGINT) AS ws,
             CAST(unix_timestamp(window_end) AS BIGINT) AS we, count(1) AS n
      FROM TABLE(CUMULATE(TABLE events, DESCRIPTOR(ts),
                          INTERVAL '1' HOUR, INTERVAL '4' HOUR))
      GROUP BY window_start, window_end ORDER BY ws, we""").collect()
    val viaDf = graft.operators.WindowOps
      .cumulate(Tables.load(spark, "/root/testdata/sf0.001", "events"),
        col("ts"), 3600L, 14400L)
      .groupBy(col("win_start").as("ws"), col("win_end").as("we"))
      .agg(count(lit(1)).as("n"))
      .orderBy("ws", "we").collect()
    assert(viaSql.sameElements(viaDf))
  }

  test("TUMBLE window TVF yields window_start/window_end columns") {
    val viaSql = env.sqlQuery("""
      SELECT window_start, window_end, count(1) AS n
      FROM TABLE(TUMBLE(TABLE events, DESCRIPTOR(ts), INTERVAL '1' HOUR))
      GROUP BY window_start, window_end
      ORDER BY window_start""").collect()
    val viaDf = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("n"))
      .orderBy("window_start").collect()
    assert(viaSql.sameElements(viaDf))
  }
}
