package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Catalog-object / module / config SQL statements
  * (GraftTableEnvironment.catalogStatement): catalogs, databases,
  * CREATE TABLE LIKE, ALTER TABLE RENAME, SET/RESET, modules,
  * partitions DDL. Each test runs on its own `newSession` so the
  * namespace and function-registry mutations stay isolated from
  * concurrently-running suites (the JVM-wide session is shared).
  */
class CatalogSqlSpec extends AnyFunSuite {
  lazy val root: SparkSession = GraftSession.local(4)

  private def freshEnv(): (SparkSession, GraftTableEnvironment) = {
    val s = root.newSession()
    (s, GraftTableEnvironment.create(s))
  }

  private def strings(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.getString(0)).toSeq

  test("catalogs and databases: create, use, show, drop semantics") {
    val (_, env) = freshEnv()
    assert(strings(env.executeSql("SHOW CATALOGS")) == Seq("default_catalog"))
    assert(strings(env.executeSql("SHOW CURRENT CATALOG")) == Seq("default_catalog"))
    assert(strings(env.executeSql("SHOW CURRENT DATABASE")) == Seq("default_database"))

    env.executeSql("CREATE CATALOG cat2 WITH ('type' = 'generic_in_memory')")
    assert(strings(env.executeSql("SHOW CATALOGS")) == Seq("cat2", "default_catalog"))
    assertThrows[IllegalArgumentException](env.executeSql("CREATE CATALOG cat2"))
    assertThrows[IllegalArgumentException](
      env.executeSql("CREATE CATALOG c3 WITH ('type' = 'hive')"))

    env.executeSql("CREATE DATABASE db1")
    env.executeSql("CREATE DATABASE IF NOT EXISTS db1")
    assertThrows[IllegalArgumentException](env.executeSql("CREATE DATABASE db1"))
    assert(strings(env.executeSql("SHOW DATABASES")) == Seq("db1", "default_database"))

    env.executeSql("USE db1")
    assert(strings(env.executeSql("SHOW CURRENT DATABASE")) == Seq("db1"))
    // a table created while db1 is current belongs to db1
    env.executeSql("CREATE TABLE t_in_db1 (a INT) WITH ('connector' = 'values')")
    assert(strings(env.executeSql("SHOW TABLES")) == Seq("t_in_db1"))
    env.executeSql("USE default_database")
    assert(!strings(env.executeSql("SHOW TABLES")).contains("t_in_db1"))

    // RESTRICT (default) refuses a non-empty database; CASCADE drops members
    assertThrows[IllegalArgumentException](env.executeSql("DROP DATABASE db1"))
    env.executeSql("DROP DATABASE db1 CASCADE")
    assert(strings(env.executeSql("SHOW DATABASES")) == Seq("default_database"))
    assert(!env.spark.catalog.tableExists("t_in_db1"))
    // cannot drop the database in use
    assertThrows[IllegalArgumentException](
      env.executeSql("DROP DATABASE default_database"))

    // USE CATALOG switches namespaces entirely
    env.executeSql("USE CATALOG cat2")
    assert(strings(env.executeSql("SHOW CURRENT CATALOG")) == Seq("cat2"))
    assert(strings(env.executeSql("SHOW DATABASES")) == Seq("default"))
  }

  test("SHOW VIEWS lists exactly CREATE VIEW objects") {
    val (_, env) = freshEnv()
    env.executeSql("CREATE TABLE sv_t (a INT) WITH ('connector' = 'values')")
    env.executeSql("CREATE VIEW sv_v AS SELECT a FROM sv_t")
    assert(strings(env.executeSql("SHOW VIEWS")) == Seq("sv_v"))
    env.executeSql("DROP VIEW sv_v")
    assert(strings(env.executeSql("SHOW VIEWS")).isEmpty)
  }

  test("CREATE TABLE LIKE inherits schema/options; merge strategies apply") {
    val (s, env) = freshEnv()
    val dir = java.nio.file.Files.createTempDirectory("graft-like").toString
    import s.implicits._
    Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "name", "v")
      .write.mode("overwrite").parquet(dir)
    env.executeSql(s"""
      CREATE TABLE like_base (
        id BIGINT, name STRING, v BIGINT,
        doubled AS v * 2,
        PRIMARY KEY (id) NOT ENFORCED
      ) WITH ('connector' = 'filesystem', 'path' = '$dir', 'format' = 'parquet')""")

    // default INCLUDING ALL: same data, inherited computed col + PK,
    // plus the child's extra column (null-padded by the scan? no — a
    // new PHYSICAL column must exist in the files; use a computed one)
    env.executeSql("CREATE TABLE like_all (extra AS v + 1) LIKE like_base")
    val r = env.from("like_all").orderBy("id")
      .selectExpr("id", "doubled", "extra").collect()
    assert(r.map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSeq ==
      Seq((1L, 20L, 11L), (2L, 40L, 21L)))
    assert(env.primaryKey("like_all") == Seq("id"))
    // the catalog snapshot is self-contained (no LIKE in the stored DDL)
    val show = env.executeSql("SHOW CREATE TABLE like_all").collect()(0).getString(0)
    assert(!show.toUpperCase.contains(" LIKE "))
    assert(show.contains("doubled AS v * 2") && show.contains("extra AS v + 1"))

    // INCLUDING OPTIONS + conflicting value → error; OVERWRITING wins
    assertThrows[IllegalArgumentException](env.executeSql(
      "CREATE TABLE like_conflict WITH ('format' = 'csv') LIKE like_base"))
    env.executeSql("""CREATE TABLE like_ovr WITH ('connector' = 'values')
      LIKE like_base (OVERWRITING OPTIONS EXCLUDING GENERATED)""")
    assert(env.from("like_ovr").columns.sameElements(Array("id", "name", "v")))
    assert(env.from("like_ovr").count() == 0) // values connector = empty

    // watermark conflicts: INCLUDING errors, OVERWRITING takes the child's
    val dir2 = java.nio.file.Files.createTempDirectory("graft-like2").toString
    Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("id", "ts").write.mode("overwrite").parquet(dir2)
    env.executeSql(s"""
      CREATE TABLE like_wm_base (id BIGINT, ts TIMESTAMP_LTZ(3),
        WATERMARK FOR ts AS ts - INTERVAL '5' SECOND)
      WITH ('connector' = 'filesystem', 'path' = '$dir2', 'format' = 'parquet')""")
    assertThrows[IllegalArgumentException](env.executeSql(
      """CREATE TABLE like_wm_bad (WATERMARK FOR ts AS ts - INTERVAL '9' SECOND)
         LIKE like_wm_base"""))
    env.executeSql(
      """CREATE TABLE like_wm_new (WATERMARK FOR ts AS ts - INTERVAL '9' SECOND)
         LIKE like_wm_base (OVERWRITING WATERMARKS)""")
    assert(env.declaredWatermark("like_wm_new").contains(("ts", "9 second")))

    // constraints/partitions cannot be OVERWRITING (reference MergeTableLikeUtil)
    assertThrows[IllegalArgumentException](env.executeSql(
      "CREATE TABLE like_bad LIKE like_base (OVERWRITING CONSTRAINTS)"))
  }

  test("ALTER TABLE RENAME moves data binding, sink binding, and metadata") {
    val (s, env) = freshEnv()
    val dir = java.nio.file.Files.createTempDirectory("graft-ren").toString
    env.executeSql(s"""
      CREATE TABLE ren_a (k INT, v STRING, PRIMARY KEY (k) NOT ENFORCED)
      WITH ('connector' = 'filesystem', 'path' = '$dir', 'format' = 'parquet')""")
    env.executeSql("INSERT INTO ren_a VALUES (1, 'x'), (2, 'y')")
    env.executeSql("ALTER TABLE ren_a RENAME TO ren_b")
    assert(!s.catalog.tableExists("ren_a"))
    assert(env.from("ren_b").count() == 2)
    assert(env.primaryKey("ren_b") == Seq("k"))
    // the sink binding moved: INSERT through the NEW name lands files
    env.executeSql("INSERT INTO ren_b VALUES (3, 'z')")
    assert(env.from("ren_b").count() == 3)
    // old name no longer a DDL table
    assertThrows[IllegalArgumentException](
      env.executeSql("SHOW CREATE TABLE ren_a"))
    assert(env.executeSql("SHOW CREATE TABLE ren_b").collect()(0)
      .getString(0).contains("ren_b"))
  }

  test("SET/RESET drive session config and restore Spark conf") {
    val (s, env) = freshEnv()
    val tz0 = s.conf.get("spark.sql.session.timeZone")
    env.executeSql("SET 'table.local-time-zone' = 'Asia/Tokyo'")
    assert(s.conf.get("spark.sql.session.timeZone") == "Asia/Tokyo")
    val listed = env.executeSql("SET").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(listed("table.local-time-zone") == "Asia/Tokyo")
    env.executeSql("RESET 'table.local-time-zone'")
    assert(s.conf.get("spark.sql.session.timeZone") == tz0)
    // a spark.* key round-trips directly
    env.executeSql("SET 'spark.sql.shuffle.partitions' = '7'")
    assert(s.conf.get("spark.sql.shuffle.partitions") == "7")
    env.executeSql("RESET")
    assert(s.conf.get("spark.sql.shuffle.partitions") != "7")
    assert(env.executeSql("SET").count() == 0)
  }

  test("modules gate the gap-function library") {
    val (s, env) = freshEnv()
    assert(strings(env.executeSql("SHOW MODULES")) == Seq("core"))
    assert(env.executeSql("SELECT split_index('a#b', '#', 1) AS x")
      .collect()(0).getString(0) == "b")
    env.executeSql("UNLOAD MODULE core")
    assert(strings(env.executeSql("SHOW MODULES")).isEmpty)
    // resolution is gated: the gap function no longer resolves
    assertThrows[Exception](
      s.sql("SELECT split_index('a#b', '#', 1)").collect())
    env.executeSql("LOAD MODULE core")
    assert(env.executeSql("SELECT split_index('a#b', '#', 1) AS x")
      .collect()(0).getString(0) == "b")
    // USE MODULES without core disables (still loaded, not used)
    assertThrows[IllegalArgumentException](env.executeSql("USE MODULES hive"))
    env.executeSql("USE MODULES core")
    val full = env.executeSql("SHOW FULL MODULES").collect()
      .map(r => (r.getString(0), r.getBoolean(1))).toSeq
    assert(full == Seq(("core", true)))
    assertThrows[IllegalArgumentException](
      env.executeSql("LOAD MODULE core")) // already loaded
    assertThrows[IllegalArgumentException](
      env.executeSql("LOAD MODULE hive")) // no factory
  }

  test("partition DDL: SHOW PARTITIONS, ADD/DROP PARTITION on a partitioned table") {
    val (_, env) = freshEnv()
    val dir = java.nio.file.Files.createTempDirectory("graft-parts").toString
    env.executeSql(s"""
      CREATE TABLE pt (k INT, v STRING, dt STRING)
      PARTITIONED BY (dt)
      WITH ('connector' = 'filesystem', 'path' = '$dir', 'format' = 'parquet')""")
    env.executeSql(
      "INSERT INTO pt VALUES (1, 'a', '2024-01-01'), (2, 'b', '2024-01-02')")
    assert(strings(env.executeSql("SHOW PARTITIONS pt")) ==
      Seq("dt=2024-01-01", "dt=2024-01-02"))
    // ADD PARTITION creates the (empty) hive-style directory
    env.executeSql("ALTER TABLE pt ADD PARTITION (dt = '2024-01-03')")
    assert(strings(env.executeSql("SHOW PARTITIONS pt")) ==
      Seq("dt=2024-01-01", "dt=2024-01-02", "dt=2024-01-03"))
    assertThrows[IllegalArgumentException](
      env.executeSql("ALTER TABLE pt ADD PARTITION (dt = '2024-01-03')"))
    env.executeSql("ALTER TABLE pt ADD IF NOT EXISTS PARTITION (dt = '2024-01-03')")
    // DROP PARTITION removes data and re-binds the read
    env.executeSql("ALTER TABLE pt DROP PARTITION (dt = '2024-01-01')")
    assert(strings(env.executeSql("SHOW PARTITIONS pt")) ==
      Seq("dt=2024-01-02", "dt=2024-01-03"))
    assert(env.from("pt").count() == 1)
    assertThrows[IllegalArgumentException](
      env.executeSql("ALTER TABLE pt DROP PARTITION (dt = 'nope')"))
    env.executeSql("ALTER TABLE pt DROP IF EXISTS PARTITION (dt = 'nope')")
    // spec must cover every partition column
    assertThrows[IllegalArgumentException](
      env.executeSql("ALTER TABLE pt ADD PARTITION (other = '1')"))
  }
}
