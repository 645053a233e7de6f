package graft

import graft.operators.LookupJoin
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.util.concurrent.atomic.AtomicInteger

object LookupCounter {
  val probes = new AtomicInteger(0)
}

class FacadeSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(4)
  import spark.implicits._

  test("table environment registers tables, watermarks, and gap functions") {
    val env = GraftTableEnvironment.create(spark)
    env.registerTestTables("/root/testdata/sf0.001")
    val q1 = env.sqlQuery(
      "SELECT l_returnflag, count(1) AS n FROM lineitem GROUP BY 1")
    assert(q1.count() > 0)
    assert(env.declaredWatermark("events").contains(("ts", "10 minutes")))
    // gap functions available in SQL through the façade
    val r = env.executeSql("SELECT split_index(c_name, '#', 1) AS id FROM customer LIMIT 1")
    assert(r.columns.sameElements(Array("id")))
    // watermark injection resolves (on batch frames Spark elides the
    // node — it only takes effect in streaming mode, like the reference)
    assert(env.fromWithWatermark("events").columns.contains("ts"))
  }

  test("statement set runs multiple inserts off one shared scan") {
    val env = GraftTableEnvironment.create(spark)
    env.registerTestTables("/root/testdata/sf0.001")
    Seq("sink_a", "sink_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val p = new java.io.File(spark.conf.get("spark.sql.warehouse.dir")
        .stripPrefix("file:"), t)
      if (p.exists()) org.apache.commons.io.FileUtils.deleteDirectory(p)
    }
    val ss = env.createStatementSet()
    val base = ss.shareScan(
      env.from("lineitem").groupBy("l_returnflag").count())
    base.createOrReplaceTempView("flag_counts")
    ss.addInsertSql("CREATE TABLE sink_a AS SELECT * FROM flag_counts WHERE count > 0")
      .addInsertSql("CREATE TABLE sink_b AS SELECT sum(count) AS total FROM flag_counts")
      .execute()
    assert(spark.table("sink_a").count() == base.count())
    assert(spark.table("sink_b").as[Long].head() ==
      env.from("lineitem").count())
  }

  test("fromChangelogStream registers normalized state; toChangelogStream tags kinds") {
    val env = GraftTableEnvironment.create(spark)
    val log = Seq(
      ("+I", 1L, "a", 1L), ("+I", 2L, "b", 1L),
      ("-U", 1L, "a", 2L), ("+U", 1L, "a2", 2L),
      ("+I", 3L, "c", 1L), ("-D", 2L, "b", 2L))
      .toDF("__rowkind", "id", "v", "ver")
    env.fromChangelogStream("state", log, Seq("id"), Seq("ver"))
    val state = spark.table("state").select("id", "v")
      .as[(Long, String)].collect().toSet
    // latest version per key; key 2 deleted
    assert(state == Set((1L, "a2"), (3L, "c")))
    assert(env.primaryKey("state") == Seq("id"))
    val out = env.toChangelogStream(spark.table("state"))
    assert(out.columns.head == "__rowkind")
    assert(out.select("__rowkind").distinct().as[String].collect().toSeq == Seq("+I"))
  }

  test("CREATE TABLE DDL registers a watermarked filesystem table; TVF query runs over it") {
    val env = GraftTableEnvironment.create(spark)
    val r = env.executeSql("""
      CREATE TABLE ddl_orders (
        o_orderkey BIGINT,
        o_custkey BIGINT,
        o_orderstatus STRING,
        o_totalprice DOUBLE,
        o_orderdate TIMESTAMP(3),
        o_orderpriority STRING,
        is_big AS o_totalprice > 200000.0,
        PRIMARY KEY (o_orderkey) NOT ENFORCED,
        WATERMARK FOR o_orderdate AS o_orderdate - INTERVAL '5' SECOND
      ) WITH (
        'connector' = 'filesystem',
        'path' = '/root/testdata/sf0.001/orders.parquet',
        'format' = 'parquet'
      )""")
    assert(r.as[String].head() == "OK")
    assert(env.declaredWatermark("ddl_orders").contains(("o_orderdate", "5 second")))
    assert(env.primaryKey("ddl_orders") == Seq("o_orderkey"))
    // computed column materialized
    assert(spark.table("ddl_orders").columns.contains("is_big"))
    // Flink TVF window SQL over the DDL-registered table
    val win = env.executeSql("""
      SELECT window_start, count(1) AS n
      FROM TABLE(TUMBLE(TABLE ddl_orders, DESCRIPTOR(o_orderdate), INTERVAL '30' DAY))
      GROUP BY window_start""")
    assert(win.count() > 0)
    env.executeSql("DROP TABLE ddl_orders")
    assert(!spark.catalog.tableExists("ddl_orders"))
    assert(env.declaredWatermark("ddl_orders").isEmpty)
  }

  test("DDL TIMESTAMP(3) maps to timestamp_ntz end-to-end (csv schema + watermark + TVF window)") {
    import org.apache.spark.sql.types.TimestampNTZType
    val env = GraftTableEnvironment.create(spark)
    val dir = java.nio.file.Files.createTempDirectory("graft-ntz-ddl").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "d.csv"),
      "1,2024-01-01T00:00:01\n2,2024-01-01T00:30:00\n3,2024-01-01T01:10:00\n"
        .getBytes("UTF-8"))
    env.executeSql(s"""
      CREATE TABLE ntz_ev (
        id BIGINT,
        ts TIMESTAMP(3),
        WATERMARK FOR ts AS ts - INTERVAL '5' SECOND
      ) WITH ('connector' = 'filesystem', 'path' = '$dir', 'format' = 'csv')""")
    // csv takes the DECLARED schema — TIMESTAMP(3) must land as ntz
    assert(spark.table("ntz_ev").schema("ts").dataType == TimestampNTZType)
    // the declared watermark applies cleanly over the ntz column
    val wm = env.fromWithWatermark("ntz_ev")
    assert(wm.schema("ts").dataType == TimestampNTZType)
    assert(wm.count() == 3)
    // and a Flink TVF window groups the ntz event time correctly
    val win = env.executeSql("""
      SELECT window_start, count(1) AS n
      FROM TABLE(TUMBLE(TABLE ntz_ev, DESCRIPTOR(ts), INTERVAL '1' HOUR))
      GROUP BY window_start""")
    assert(win.select("n").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    env.executeSql("DROP TABLE ntz_ev")
  }

  test("EXPLAIN PLAN FOR INSERT plans the write without executing it") {
    val env = GraftTableEnvironment.create(spark.newSession())
    val dir = java.nio.file.Files.createTempDirectory("graft-explins").toString
    env.executeSql(s"""
      CREATE TABLE ei_sink (k INT, v STRING, region STRING)
      PARTITIONED BY (region)
      WITH ('connector' = 'filesystem', 'path' = '$dir', 'format' = 'parquet')""")
    // the reference's dql/SqlRichExplain accepts INSERT bodies: plan
    // shows the sink binding + the aligned query plan, and NO data lands
    val plan = env.executeSql("EXPLAIN PLAN FOR INSERT INTO ei_sink " +
      "PARTITION (region = 'eu') (k, v) SELECT 1, 'a'")
      .collect()(0).getString(0)
    assert(plan.contains("== Sink =="), plan)
    assert(plan.contains("connector=[filesystem]") && plan.contains("INTO"), plan)
    assert(plan.contains("Physical Plan"), plan)
    assert(env.from("ei_sink").count() == 0) // nothing was written
    // OVERWRITE spelling explains too, still without writing
    env.executeSql("INSERT INTO ei_sink VALUES (1, 'a', 'eu')")
    val plan2 = env.executeSql(
      "EXPLAIN PLAN FOR INSERT OVERWRITE ei_sink SELECT 2, 'b', 'us'")
      .collect()(0).getString(0)
    assert(plan2.contains("mode=[OVERWRITE]"), plan2)
    assert(env.from("ei_sink").count() == 1) // overwrite did not run
  }

  test("explainSql shows the rewritten Spark plan; catalog listings work") {
    val env = GraftTableEnvironment.create(spark)
    env.registerTestTables("/root/testdata/sf0.001")
    // a Flink group-window spelling must explain as the REWRITTEN plan
    val plan = env.explainSql("""
      SELECT TUMBLE_START(ts, INTERVAL '1' HOUR) AS ws, count(1) AS n
      FROM events GROUP BY TUMBLE(ts, INTERVAL '1' HOUR)""")
    assert(plan.contains("Physical Plan"))
    assert(!plan.toUpperCase.contains("TUMBLE(")) // dialect rewritten away
    assert(env.listTables().contains("events"))
    assert(env.listFunctions().contains("split_index")) // gap function registered
  }

  test("SHOW TABLES / SHOW FUNCTIONS / DESCRIBE / EXPLAIN PLAN FOR sql statements") {
    val env = GraftTableEnvironment.create(spark)
    env.registerTestTables("/root/testdata/sf0.001")
    env.executeSql("""
      CREATE TABLE sf_show_t (k BIGINT, v STRING, ts TIMESTAMP_LTZ(3),
        WATERMARK FOR ts AS ts - INTERVAL '5' SECOND,
        PRIMARY KEY (k) NOT ENFORCED)
      WITH ('connector' = 'datagen', 'number-of-rows' = '3')""")
    val tables = env.executeSql("SHOW TABLES").collect().map(_.getString(0))
    assert(tables.contains("sf_show_t") && tables.contains("events"))
    val fns = env.executeSql("SHOW FUNCTIONS").collect().map(_.getString(0))
    assert(fns.contains("split_index"))
    val desc = env.executeSql("DESCRIBE sf_show_t").collect()
      .map(r => r.getString(0) -> ((r.getString(3), r.getString(4)))).toMap
    assert(desc("k") == (("PRI", null)))
    assert(desc("ts")._2 != null) // watermark expression surfaces
    assert(desc("v") == ((null, null)))
    val plan = env.executeSql(
      "EXPLAIN PLAN FOR SELECT count(1) FROM sf_show_t").collect()
    assert(plan.length == 1 && plan.head.getString(0).contains("Physical Plan"))
  }

  test("CREATE TABLE DDL with datagen and values connectors") {
    val env = GraftTableEnvironment.create(spark)
    env.executeSql("""
      CREATE TABLE ddl_gen (id BIGINT, name STRING)
      WITH ('connector' = 'datagen', 'number-of-rows' = '25')""")
    assert(spark.table("ddl_gen").count() == 25)
    env.executeSql("""
      CREATE TABLE ddl_empty (
        k INT NOT NULL,
        tags ARRAY<STRING>,
        props MAP<STRING, INT>,
        PRIMARY KEY (k) NOT ENFORCED)""")
    val empty = spark.table("ddl_empty")
    assert(empty.count() == 0)
    assert(empty.schema("tags").dataType.typeName == "array")
    assert(empty.schema("props").dataType.typeName == "map")
    assert(env.primaryKey("ddl_empty") == Seq("k"))
    // IF NOT EXISTS is a no-op on the existing table
    env.executeSql("""
      CREATE TABLE IF NOT EXISTS ddl_gen (other INT)
      WITH ('connector' = 'datagen', 'number-of-rows' = '5')""")
    assert(spark.table("ddl_gen").count() == 25)
    env.executeSql("DROP TABLE IF EXISTS ddl_gen")
    env.executeSql("DROP TABLE IF EXISTS ddl_empty")
  }

  test("kafka-dialect DDL binds the log emulation with json and CDC formats") {
    val env = GraftTableEnvironment.create(spark)
    val base = java.nio.file.Files.createTempDirectory("graft-ddl-kafka").toString
    graft.sources.LogSource.append(s"$base/t1", 0, Seq(
      """{"id":1,"name":"a"}""", """{"id":2,"name":"b"}"""))
    env.executeSql(s"""
      CREATE TABLE k_json (id BIGINT, name STRING)
      WITH ('connector' = 'kafka', 'path' = '$base', 'topic' = 't1',
            'format' = 'json')""")
    assert(spark.table("k_json").orderBy("id")
      .collect().map(_.getLong(0)).toSeq == Seq(1L, 2L))

    graft.sources.LogSource.append(s"$base/t2", 0, Seq(
      """{"after":{"id":1,"name":"a"},"op":"c"}""",
      """{"before":{"id":1,"name":"a"},"after":{"id":1,"name":"a2"},"op":"u"}"""))
    env.executeSql(s"""
      CREATE TABLE k_dbz (id BIGINT, name STRING)
      WITH ('connector' = 'kafka', 'path' = '$base', 'topic' = 't2',
            'format' = 'debezium-json')""")
    val kinds = spark.table("k_dbz").select("__rowkind", "name")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq.sorted
    assert(kinds == Seq(("+I", "a"), ("+U", "a2"), ("-U", "a")))

    env.executeSql("DROP TABLE IF EXISTS k_json")
    env.executeSql("DROP TABLE IF EXISTS k_dbz")
  }

  test("upsert-kafka DDL materializes keep-last state with tombstones") {
    val env = GraftTableEnvironment.create(spark)
    val base = java.nio.file.Files.createTempDirectory("graft-ddl-upsert").toString
    graft.sources.LogSource.append(base, 0, Seq(
      """1|{"id":1,"v":10}""", """2|{"id":2,"v":20}""",
      """1|{"id":1,"v":11}""", "2|"))
    env.executeSql(s"""
      CREATE TABLE uk (id BIGINT, v INT, PRIMARY KEY (id) NOT ENFORCED)
      WITH ('connector' = 'upsert-kafka', 'path' = '$base')""")
    val rows = spark.table("uk").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(rows == Seq((1L, 11)))
    env.executeSql("DROP TABLE IF EXISTS uk")
  }

  test("FOR SYSTEM_TIME AS OF rewrites to the versioned-interval join") {
    val env = GraftTableEnvironment.create(spark)
    // versioned rates: currency EUR at t=10 rate 1.0, t=20 rate 2.0
    Seq((1L, "EUR", 5L), (2L, "EUR", 10L), (3L, "EUR", 15L),
      (4L, "EUR", 25L), (5L, "USD", 12L))
      .toDF("order_id", "currency", "ts")
      .createOrReplaceTempView("t_orders")
    env.createTemporaryView("t_rates",
      Seq(("EUR", 10L, 1.0), ("EUR", 20L, 2.0), ("USD", 15L, 3.0))
        .toDF("currency", "vt", "rate"),
      watermark = Some(("vt", "0 seconds")), primaryKey = Seq("currency"))
    val got = env.executeSql("""
      SELECT o.order_id, r.rate
      FROM t_orders o
      JOIN t_rates FOR SYSTEM_TIME AS OF o.ts AS r
      ON o.currency = r.currency
      ORDER BY o.order_id""")
      .as[(Long, Double)].collect().toSeq
    // order 1 (t=5): no version yet -> dropped (inner); order 2 (t=10):
    // inclusive boundary -> 1.0; order 3 (t=15): still 1.0; order 4
    // (t=25): latest version 2.0; order 5 (USD t=12): no version -> drop.
    assert(got == Seq((2L, 1.0), (3L, 1.0), (4L, 2.0)))
  }

  test("legacy LATERAL TABLE temporal function join matches FOR SYSTEM_TIME") {
    val env = GraftTableEnvironment.create(spark)
    Seq((1L, "EUR", 5L), (2L, "EUR", 10L), (3L, "EUR", 15L),
      (4L, "EUR", 25L), (5L, "USD", 12L))
      .toDF("order_id", "currency", "ts")
      .createOrReplaceTempView("tf_orders")
    Seq(("EUR", 10L, 1.0), ("EUR", 20L, 2.0), ("USD", 15L, 3.0))
      .toDF("currency", "vt", "rate")
      .createOrReplaceTempView("tf_rates")
    // Table.createTemporalTableFunction(vt, currency) +
    // createTemporarySystemFunction("Rates", ...) equivalent:
    env.createTemporalTableFunction("Rates", "tf_rates", "vt", Seq("currency"))
    val got = env.executeSql("""
      SELECT o.order_id, r.rate
      FROM tf_orders o, LATERAL TABLE (Rates(o.ts)) AS r
      WHERE o.currency = r.currency
      ORDER BY o.order_id""")
      .as[(Long, Double)].collect().toSeq
    assert(got == Seq((2L, 1.0), (3L, 1.0), (4L, 2.0)))
    // An unregistered function name must pass through untouched.
    assert(graft.sql.TemporalSql.rewriteFunctions(
      "SELECT * FROM t, LATERAL TABLE (Other(x))", _ => None)
      .contains("LATERAL TABLE (Other(x))"))
    // ... but a REGISTERED temporal function LATER in the same
    // statement must still rewrite (the scan keeps going past the
    // unknown match instead of bailing out).
    val mixed = graft.sql.TemporalSql.rewriteFunctions(
      "SELECT * FROM t, LATERAL TABLE (Other(x)), LATERAL TABLE (Rates(t.ts)) AS r",
      fn => if (fn == "Rates") Some(("tf_rates", Seq("currency"), "vt")) else None)
    assert(mixed.contains("LATERAL TABLE (Other(x))"))
    assert(mixed.contains("__vt_from"), s"registered fn left unrewritten: $mixed")
    // Alias-less spelling followed by a clause keyword: WHERE must not
    // be captured as the alias (the table name becomes the alias).
    val aliasless = graft.sql.TemporalSql.rewriteFunctions(
      "SELECT * FROM tf_orders o, LATERAL TABLE (Rates(o.ts)) WHERE o.currency = tf_rates.currency",
      fn => if (fn == "Rates") Some(("tf_rates", Seq("currency"), "vt")) else None)
    assert(aliasless.contains("WHERE o.currency"), s"WHERE swallowed: $aliasless")
    assert(aliasless.contains("AS tf_rates"), s"default alias missing: $aliasless")
  }

  test("lookup join probes once per distinct key within a partition (LRU cache)") {
    LookupCounter.probes.set(0)
    val ds = spark.range(100).as[Long].map(i => (i, i % 5)) // 5 distinct keys
      .repartition(1)
    val out = LookupJoin.lookup[(Long, Long), Long, String](
      ds, _._2,
      () => k => { LookupCounter.probes.incrementAndGet(); Some(s"v$k") },
      cacheSize = 10)
    val rows = out.collect()
    assert(rows.length == 100)
    assert(rows.forall { case ((_, k), v) => v.contains(s"v$k") })
    assert(LookupCounter.probes.get() == 5) // cache absorbed the rest
  }

  test("lookup join LRU evicts beyond capacity") {
    LookupCounter.probes.set(0)
    // keys cycle 0..9 twice with cache of 5 → evictions force re-probes
    val ds = spark.createDataset((0 until 20).map(i => (i.toLong, (i % 10).toLong)))
      .repartition(1)
    LookupJoin.lookup[(Long, Long), Long, String](
      ds, _._2,
      () => k => { LookupCounter.probes.incrementAndGet(); Some(s"v$k") },
      cacheSize = 5).collect()
    assert(LookupCounter.probes.get() > 10) // misses beyond first pass
  }

  test("CREATE VIEW lowers Flink-dialect bodies; DROP VIEW unregisters") {
    val env = GraftTableEnvironment.create(spark)
    env.registerTestTables("/root/testdata/sf0.001")
    // group-window syntax inside the view body — Spark SQL alone would
    // reject TUMBLE_START; the façade lowers it first (SqlCreateView)
    env.executeSql("""
      CREATE TEMPORARY VIEW hourly AS
      SELECT TUMBLE_START(ts, INTERVAL '1' HOUR) AS wstart, count(1) AS n
      FROM events GROUP BY TUMBLE(ts, INTERVAL '1' HOUR)""")
    val n = env.sqlQuery("SELECT count(1) AS c FROM hourly").head().getLong(0)
    assert(n > 0)
    env.executeSql("DROP VIEW hourly")
    intercept[Exception] { env.sqlQuery("SELECT count(1) FROM hourly").head() }
    // IF EXISTS tolerates the missing view; bare DROP does not
    env.executeSql("DROP VIEW IF EXISTS hourly")
    intercept[IllegalArgumentException] { env.executeSql("DROP VIEW hourly") }
  }

  test("plain CREATE VIEW refuses an existing name; OR REPLACE replaces") {
    val env = GraftTableEnvironment.create(spark)
    env.executeSql("CREATE VIEW cv_once AS SELECT 1 AS x")
    val ex = intercept[IllegalArgumentException] {
      env.executeSql("CREATE VIEW cv_once AS SELECT 2 AS x")
    }
    assert(ex.getMessage.contains("already exists"))
    env.executeSql("CREATE OR REPLACE VIEW cv_once AS SELECT 2 AS x")
    assert(env.sqlQuery("SELECT x FROM cv_once").head().getInt(0) == 2)
    env.executeSql("DROP VIEW cv_once")
  }

  test("SHOW CREATE TABLE replays DDL that re-executes to an equivalent table") {
    val env = GraftTableEnvironment.create(spark)
    val dir = java.nio.file.Files.createTempDirectory("graft-sct").toString
    val ddl = s"""
      CREATE TABLE sct_t (k BIGINT, v STRING, PRIMARY KEY (k) NOT ENFORCED)
      WITH ('connector' = 'filesystem', 'path' = '$dir/t', 'format' = 'parquet')"""
    env.executeSql(ddl)
    Seq((1L, "a")).toDF("k", "v").createOrReplaceTempView("sct_src")
    env.executeSql("INSERT INTO sct_t SELECT k, v FROM sct_src")
    val shown = env.executeSql("SHOW CREATE TABLE sct_t").head().getString(0)
    assert(shown.trim == ddl.trim)
    // the shown text re-executes in a FRESH environment to the same table
    val env2 = GraftTableEnvironment.create(spark)
    env2.executeSql(shown)
    assert(env2.sqlQuery("SELECT k, v FROM sct_t").as[(Long, String)]
      .collect().toSeq == Seq((1L, "a")))
    assert(env2.primaryKey("sct_t") == Seq("k"))
    intercept[IllegalArgumentException] {
      env.executeSql("SHOW CREATE TABLE not_a_ddl_table")
    }
  }

  test("CREATE FUNCTION aliases a registered function; DROP FUNCTION removes it") {
    val env = GraftTableEnvironment.create(spark)
    env.executeSql("CREATE TEMPORARY FUNCTION my_split AS 'split_index'")
    val r = env.sqlQuery("SELECT my_split('a#b#c', '#', 1) AS x").head().getString(0)
    assert(r == "b")
    // duplicate without IF NOT EXISTS fails; with it, no-op
    intercept[IllegalArgumentException] {
      env.executeSql("CREATE FUNCTION my_split AS 'upper'")
    }
    env.executeSql("CREATE FUNCTION IF NOT EXISTS my_split AS 'upper'")
    assert(env.sqlQuery("SELECT my_split('a#b#c', '#', 1) AS x")
      .head().getString(0) == "b")
    // unknown target is a loud error (no classloading)
    val ex = intercept[IllegalArgumentException] {
      env.executeSql("CREATE FUNCTION f2 AS 'com.example.NoSuch'")
    }
    assert(ex.getMessage.contains("not a registered function"))
    env.executeSql("DROP FUNCTION my_split")
    intercept[Exception] { env.sqlQuery("SELECT my_split('a', '#', 0)").head() }
    env.executeSql("DROP FUNCTION IF EXISTS my_split")
    intercept[IllegalArgumentException] { env.executeSql("DROP FUNCTION my_split") }
  }

  test("ALTER TABLE SET re-binds connector options and updates SHOW CREATE TABLE") {
    val env = GraftTableEnvironment.create(spark)
    val dir = java.nio.file.Files.createTempDirectory("graft-alter").toString
    Seq((1L, "one")).toDF("k", "v").write.parquet(s"$dir/a")
    Seq((2L, "two")).toDF("k", "v").write.parquet(s"$dir/b")
    env.executeSql(s"""
      CREATE TABLE alt_t (k BIGINT, v STRING) WITH (
        'connector' = 'filesystem', 'path' = '$dir/a', 'format' = 'parquet')""")
    assert(env.sqlQuery("SELECT k FROM alt_t").head().getLong(0) == 1L)
    env.executeSql(s"ALTER TABLE alt_t SET ('path' = '$dir/b')")
    assert(env.sqlQuery("SELECT k FROM alt_t").head().getLong(0) == 2L)
    val shown = env.executeSql("SHOW CREATE TABLE alt_t").head().getString(0)
    assert(shown.contains(s"'path' = '$dir/b'"))
    // the altered snapshot re-executes to the altered binding
    val env2 = GraftTableEnvironment.create(spark)
    env2.executeSql(shown)
    assert(env2.sqlQuery("SELECT k FROM alt_t").head().getLong(0) == 2L)
    intercept[IllegalArgumentException] {
      env.executeSql("ALTER TABLE nope SET ('a' = 'b')")
    }
  }

  test("DROP VIEW refuses a DDL-defined connector table (view vs table)") {
    val env = GraftTableEnvironment.create(spark)
    val dir = java.nio.file.Files.createTempDirectory("graft-dv").toString
    env.executeSql(s"""
      CREATE TABLE dv_t (k BIGINT) WITH (
        'connector' = 'filesystem', 'path' = '$dir/t', 'format' = 'parquet')""")
    val ex = intercept[IllegalArgumentException] {
      env.executeSql("DROP VIEW dv_t")
    }
    assert(ex.getMessage.contains("DROP TABLE"))
    // the table binding is intact after the refused drop
    env.executeSql("DROP TABLE dv_t")
  }
}
