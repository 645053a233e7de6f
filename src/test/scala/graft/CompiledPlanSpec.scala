package graft

import graft.sql.GraftCompiledPlan
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Compiled-plan persistence (COMPILE PLAN / EXECUTE PLAN parity —
  * reference ExecNodeGraph JSON serde, flink-table-planner
  * `.../plan/nodes/exec/serde/` + `src/test/resources/jsonplan/`):
  * the artifact must be stable, file-round-trippable, and restore the
  * full catalog + lowered query into a FRESH environment with
  * identical results.
  */
class CompiledPlanSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(4)

  private val ddl = """
    CREATE TABLE cp_lineitem (
      l_orderkey BIGINT, l_partkey BIGINT, l_suppkey BIGINT,
      l_linenumber INT, l_quantity DOUBLE, l_extendedprice DOUBLE,
      l_discount DOUBLE, l_tax DOUBLE, l_returnflag STRING,
      l_linestatus STRING, l_shipdate DATE, l_commitdate DATE,
      l_receiptdate DATE, l_shipinstruct STRING, l_shipmode STRING,
      l_comment STRING
    ) WITH (
      'connector' = 'filesystem',
      'path' = '/root/testdata/sf0.001/lineitem.parquet',
      'format' = 'parquet'
    )"""

  private val query = """
    SELECT l_returnflag, count(1) AS n, sum(CAST(l_quantity AS BIGINT)) AS q
    FROM cp_lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""

  test("compiled plan JSON is stable and restores into a fresh environment") {
    val env = GraftTableEnvironment.create(spark)
    env.executeSql(ddl)
    val direct = env.executeSql(query).collect().toSeq

    val plan = env.compilePlanSql(query)
    val plan2 = env.compilePlanSql(query)
    assert(plan.toJson == plan2.toJson, "same catalog + query must compile to byte-identical JSON")
    assert(plan.tables.exists(_.name == "cp_lineitem"))

    // restore in a FRESH environment (no DDL executed on it)
    spark.catalog.dropTempView("cp_lineitem")
    val fresh = GraftTableEnvironment.create(spark)
    val restored = fresh.executePlan(plan).collect().toSeq
    assert(restored == direct)
  }

  test("compiled plan file round-trip preserves results and rejects unknown versions") {
    val env = GraftTableEnvironment.create(spark)
    env.executeSql(ddl)
    val plan = env.compilePlanSql(query)
    val f = java.io.File.createTempFile("graft-plan", ".json")
    plan.writeToFile(f.getAbsolutePath)
    val loaded = GraftCompiledPlan.loadFromFile(f.getAbsolutePath)
    assert(loaded == plan)
    val fresh = GraftTableEnvironment.create(spark)
    assert(fresh.executePlan(f.getAbsolutePath).collect().toSeq ==
      env.executeSql(query).collect().toSeq)
    // version gate fails loudly
    val bad = plan.copy(version = 999).toJson
    val ex = intercept[IllegalArgumentException] {
      GraftCompiledPlan.fromJson(bad)
    }
    assert(ex.getMessage.contains("version"))
    f.delete(); ()
  }

  test("compiled plan pins the LOWERED dialect: group windows restore without the façade's rewriter state") {
    val env = GraftTableEnvironment.create(spark)
    env.registerTestTables("/root/testdata/sf0.001")
    val winSql = """
      SELECT TUMBLE_START(ts, INTERVAL '1' HOUR) AS wstart, count(1) AS n
      FROM events GROUP BY TUMBLE(ts, INTERVAL '1' HOUR)"""
    val plan = env.compilePlanSql(winSql)
    // the artifact must carry the Spark spelling, not the Flink one
    assert(!plan.loweredSql.toUpperCase.contains("TUMBLE"))
    assert(plan.loweredSql.contains("window"))
    val direct = env.executeSql(winSql).collect().toSeq
    // fresh env: events view still registered on the shared session,
    // but the plan executes through runLowered without re-rewriting
    val fresh = GraftTableEnvironment.create(spark)
    assert(fresh.executePlan(plan).collect().toSeq == direct)
  }

  test("MATCH_RECOGNIZE plans compile and execute (NFA lowering re-derives at run time)") {
    import spark.implicits._
    val env = GraftTableEnvironment.create(spark)
    Seq((1L, 1, 10.0), (1L, 2, 8.0), (1L, 3, 6.0), (1L, 4, 9.0))
      .toDF("sym", "seq", "price").createOrReplaceTempView("cp_ticks")
    val sql = """
      SELECT * FROM cp_ticks MATCH_RECOGNIZE (
        PARTITION BY sym ORDER BY seq
        MEASURES FIRST(D.price) AS first_down, LAST(D.price) AS last_down
        ONE ROW PER MATCH
        AFTER MATCH SKIP PAST LAST ROW
        PATTERN (D D)
        DEFINE D AS price < PREV(price)
      )"""
    val plan = env.compilePlanSql(sql)
    // MATCH_RECOGNIZE has no Spark parser slot: it survives lowering
    // verbatim and executePlan routes it onto the NFA
    assert(plan.loweredSql.toUpperCase.contains("MATCH_RECOGNIZE"))
    val direct = env.executeSql(sql).collect().toSeq
    assert(direct.nonEmpty)
    assert(GraftTableEnvironment.create(spark).executePlan(plan)
      .collect().toSeq == direct)
  }

  test("temporal table function registrations travel inside the plan") {
    import spark.implicits._
    val env = GraftTableEnvironment.create(spark)
    Seq((1L, "2024-01-01 00:00:00", 100.0), (1L, "2024-01-01 02:00:00", 120.0))
      .toDF("rid", "rts", "rate")
      .withColumn("rts", $"rts".cast("timestamp"))
      .createOrReplaceTempView("cp_rates")
    Seq((1L, "2024-01-01 01:00:00", 10.0))
      .toDF("oid", "ots", "amount")
      .withColumn("ots", $"ots".cast("timestamp"))
      .createOrReplaceTempView("cp_orders")
    env.createTemporalTableFunction("cp_rate_fn", "cp_rates", "rts", Seq("rid"))
    val sql = """
      SELECT o.oid, o.amount * r.rate AS converted
      FROM cp_orders o, LATERAL TABLE (cp_rate_fn(o.ots)) AS r
      WHERE o.oid = r.rid"""
    val plan = env.compilePlanSql(sql)
    assert(plan.temporalFunctions.exists(_.name == "cp_rate_fn"))
    val fresh = GraftTableEnvironment.create(spark)
    val rows = fresh.executePlan(plan).collect().toSeq
    assert(rows == env.executeSql(sql).collect().toSeq)
    assert(rows.head.getDouble(1) == 1000.0) // 10 * 100 (the 00:00 version)
  }
}
