package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** `INSERT INTO/OVERWRITE <ddl table>` — the reference's primary
  * write path (CommonExecSink binding the statement's target to the
  * CREATE TABLE connector's DynamicTableSink): filesystem append +
  * overwrite, kafka-log json with PK-hash partitioning, upsert-kafka
  * with tombstones, and the refresh contract (a post-insert read sees
  * the new rows through the same registered view).
  */
class InsertSqlSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(4)
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("filesystem sink: INSERT INTO appends, INSERT OVERWRITE replaces, view refreshes") {
    val env = GraftTableEnvironment.create(spark)
    val dir = tmp("graft-ins-fs")
    env.executeSql(s"""
      CREATE TABLE fs_sink (k BIGINT, v STRING) WITH (
        'connector' = 'filesystem', 'path' = '$dir/t', 'format' = 'parquet')""")
    Seq((1L, "a"), (2L, "b")).toDF("k", "v").createOrReplaceTempView("ins_src")
    env.executeSql("INSERT INTO fs_sink SELECT k, v FROM ins_src")
    assert(env.sqlQuery("SELECT count(1) AS n FROM fs_sink").head().getLong(0) == 2L)
    env.executeSql("INSERT INTO fs_sink SELECT k + 10, v FROM ins_src")
    assert(env.sqlQuery("SELECT count(1) AS n FROM fs_sink").head().getLong(0) == 4L)
    env.executeSql("INSERT OVERWRITE fs_sink SELECT k, v FROM ins_src WHERE k = 1")
    assert(env.sqlQuery("SELECT k, v FROM fs_sink").as[(Long, String)]
      .collect().toSeq == Seq((1L, "a")))
    // positional mapping + cast at the sink boundary
    val ex = intercept[IllegalArgumentException] {
      env.executeSql("INSERT INTO fs_sink SELECT k FROM ins_src")
    }
    assert(ex.getMessage.contains("INSERT schema mismatch"))
  }

  test("kafka-log sink: json values land PK-hash partitioned and read back through the same table") {
    val env = GraftTableEnvironment.create(spark)
    val dir = tmp("graft-ins-kafka")
    env.executeSql(s"""
      CREATE TABLE klog (k BIGINT, v STRING, PRIMARY KEY (k) NOT ENFORCED) WITH (
        'connector' = 'kafka', 'path' = '$dir/log', 'format' = 'json',
        'sink.partitions' = '4')""")
    (1L to 40L).map(i => (i, s"v$i")).toDF("k", "v")
      .createOrReplaceTempView("ins_src2")
    env.executeSql("INSERT INTO klog SELECT k, v FROM ins_src2")
    val back = env.sqlQuery("SELECT k, v FROM klog").as[(Long, String)]
      .collect().sortBy(_._1)
    assert(back.toSeq == (1L to 40L).map(i => (i, s"v$i")))
    // multiple log partitions actually used (PK-hash routing)
    val parts = new java.io.File(s"$dir/log").listFiles()
      .filter(_.getName.startsWith("partition=")).map(_.getName).toSet
    assert(parts.size > 1, s"expected PK-hash spread, got $parts")
    // append-only contract
    val ex = intercept[IllegalArgumentException] {
      env.executeSql("INSERT OVERWRITE klog SELECT k, v FROM ins_src2")
    }
    assert(ex.getMessage.contains("append-only"))
  }

  test("upsert-kafka sink: latest image wins and __rowkind -D tombstones delete the key") {
    val env = GraftTableEnvironment.create(spark)
    val dir = tmp("graft-ins-upsert")
    env.executeSql(s"""
      CREATE TABLE ulog (k BIGINT, v STRING, PRIMARY KEY (k) NOT ENFORCED) WITH (
        'connector' = 'upsert-kafka', 'path' = '$dir/log', 'format' = 'json')""")
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
      .createOrReplaceTempView("u_src1")
    env.executeSql("INSERT INTO ulog SELECT k, v FROM u_src1")
    // second wave: update 1, tombstone 2 via the __rowkind column
    Seq((1L, "a2", "+U"), (2L, "b", "-D")).toDF("k", "v", "__rowkind")
      .createOrReplaceTempView("u_src2")
    env.executeSql("INSERT INTO ulog SELECT k, v, __rowkind FROM u_src2")
    val state = env.sqlQuery("SELECT k, v FROM ulog").as[(Long, String)]
      .collect().sortBy(_._1).toSeq
    assert(state == Seq((1L, "a2"), (3L, "c")))
  }

  test("jdbc sink: INSERT INTO appends through the connector") {
    val env = GraftTableEnvironment.create(spark)
    val db = tmp("graft-ins-jdbc") + "/db"
    val url = s"jdbc:derby:$db;create=true"
    // create the physical table via a direct connection
    val c = java.sql.DriverManager.getConnection(url)
    c.createStatement().execute("CREATE TABLE jt (k BIGINT, v VARCHAR(20))")
    c.close()
    env.executeSql(s"""
      CREATE TABLE jsink (k BIGINT, v STRING) WITH (
        'connector' = 'jdbc', 'url' = '$url', 'table-name' = 'jt')""")
    Seq((5L, "x"), (6L, "y")).toDF("k", "v").createOrReplaceTempView("j_src")
    env.executeSql("INSERT INTO jsink SELECT k, v FROM j_src")
    val n = env.sqlQuery("SELECT count(1) AS n FROM jsink").head().getLong(0)
    assert(n == 2L)
  }

  test("avro filesystem sink: INSERT INTO appends, INSERT OVERWRITE replaces") {
    val env = GraftTableEnvironment.create(spark)
    val dir = tmp("graft-ins-avro")
    env.executeSql(s"""
      CREATE TABLE av_sink (k BIGINT, v STRING) WITH (
        'connector' = 'filesystem', 'path' = '$dir/t', 'format' = 'avro')""")
    Seq((1L, "a"), (2L, "b")).toDF("k", "v").createOrReplaceTempView("av_src")
    env.executeSql("INSERT INTO av_sink SELECT k, v FROM av_src")
    env.executeSql("INSERT INTO av_sink SELECT k + 10, v FROM av_src")
    assert(env.sqlQuery("SELECT k, v FROM av_sink").as[(Long, String)]
      .collect().sortBy(_._1).toSeq ==
      Seq((1L, "a"), (2L, "b"), (11L, "a"), (12L, "b")))
    env.executeSql("INSERT OVERWRITE av_sink SELECT k, v FROM av_src")
    assert(env.sqlQuery("SELECT k, v FROM av_sink").as[(Long, String)]
      .collect().sortBy(_._1).toSeq == Seq((1L, "a"), (2L, "b")))
  }

  test("INSERT resolves its DDL target case-insensitively, like Spark's view resolution") {
    val env = GraftTableEnvironment.create(spark)
    val dir = tmp("graft-ins-case")
    env.executeSql(s"""
      CREATE TABLE case_sink (k BIGINT) WITH (
        'connector' = 'filesystem', 'path' = '$dir/t', 'format' = 'parquet')""")
    (1L to 3L).toDF("k").createOrReplaceTempView("case_src")
    env.executeSql("INSERT INTO CASE_SINK SELECT k FROM case_src")
    assert(env.sqlQuery("SELECT count(1) AS n FROM case_sink").head().getLong(0) == 3L)
  }

  test("__rowkind is re-positioned before the positional sink mapping") {
    val env = GraftTableEnvironment.create(spark)
    val dir = tmp("graft-ins-kindpos") + "/db"
    val url = s"jdbc:derby:$dir;create=true"
    val c = java.sql.DriverManager.getConnection(url)
    c.createStatement().execute("CREATE TABLE kt (k BIGINT, v VARCHAR(20))")
    c.close()
    env.executeSql(s"""
      CREATE TABLE ksink (k BIGINT, v STRING, PRIMARY KEY (k) NOT ENFORCED) WITH (
        'connector' = 'jdbc', 'url' = '$url', 'table-name' = 'kt')""")
    // __rowkind FIRST — the toChangelogStream column order; were it
    // positionally mis-mapped, "+U" would land in k and corrupt rows
    Seq(("+U", 1L, "a"), ("+U", 2L, "b"))
      .toDF("__rowkind", "k", "v").createOrReplaceTempView("kind_src")
    env.executeSql("INSERT INTO ksink SELECT __rowkind, k, v FROM kind_src")
    assert(env.sqlQuery("SELECT k, v FROM ksink").as[(Long, String)]
      .collect().sortBy(_._1).toSeq == Seq((1L, "a"), (2L, "b")))
  }

  test("jdbc sink rejects INSERT OVERWRITE (no SupportsOverwrite)") {
    val env = GraftTableEnvironment.create(spark)
    val dir = tmp("graft-ins-jdbc-ow") + "/db"
    val url = s"jdbc:derby:$dir;create=true"
    val c = java.sql.DriverManager.getConnection(url)
    c.createStatement().execute("CREATE TABLE ot (k BIGINT)")
    c.close()
    env.executeSql(s"""
      CREATE TABLE osink (k BIGINT) WITH (
        'connector' = 'jdbc', 'url' = '$url', 'table-name' = 'ot')""")
    (1L to 3L).toDF("k").createOrReplaceTempView("ow_src")
    val ex = intercept[IllegalArgumentException] {
      env.executeSql("INSERT OVERWRITE osink SELECT k FROM ow_src")
    }
    assert(ex.getMessage.contains("INSERT OVERWRITE"))
  }

  test("column-list INSERT maps by name and null-fills omitted columns") {
    val env = GraftTableEnvironment.create(spark)
    val dir = tmp("graft-ins-collist")
    env.executeSql(s"""
      CREATE TABLE cl_sink (k BIGINT, v STRING, w DOUBLE) WITH (
        'connector' = 'filesystem', 'path' = '$dir/t', 'format' = 'parquet')""")
    // reversed order + omitted w → (k, v, null)
    env.executeSql("INSERT INTO cl_sink (v, k) SELECT 'a', 7")
    val r = env.sqlQuery("SELECT k, v, w FROM cl_sink").collect()
    assert(r.length == 1 && r(0).getLong(0) == 7L &&
      r(0).getString(1) == "a" && r(0).isNullAt(2))
    // unknown column → loud error
    val ex = intercept[IllegalArgumentException] {
      env.executeSql("INSERT INTO cl_sink (nope) SELECT 1")
    }
    assert(ex.getMessage.contains("not a physical column"))
    // a parenthesized subquery is NOT a column list
    env.executeSql("INSERT INTO cl_sink (SELECT k + 1, v, 1.5 FROM cl_sink)")
    assert(env.sqlQuery("SELECT count(1) AS n FROM cl_sink").head().getLong(0) == 2L)
  }

  test("partitioned filesystem table: INSERT lands partition dirs; read prunes on the partition filter") {
    val env = GraftTableEnvironment.create(spark)
    val dir = tmp("graft-ins-part")
    env.executeSql(s"""
      CREATE TABLE pt (k BIGINT, v STRING, dt STRING)
      PARTITIONED BY (dt) WITH (
        'connector' = 'filesystem', 'path' = '$dir/t', 'format' = 'parquet')""")
    Seq((1L, "a", "d1"), (2L, "b", "d1"), (3L, "c", "d2"))
      .toDF("k", "v", "dt").createOrReplaceTempView("pt_src")
    env.executeSql("INSERT INTO pt SELECT k, v, dt FROM pt_src")
    // partition directories on disk
    val dirs = new java.io.File(s"$dir/t").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dirs == Set("dt=d1", "dt=d2"), s"got $dirs")
    // declared column order and types survive the round trip
    assert(env.sqlQuery("SELECT k, v, dt FROM pt ORDER BY k")
      .as[(Long, String, String)].collect().toSeq ==
      Seq((1L, "a", "d1"), (2L, "b", "d1"), (3L, "c", "d2")))
    // the partition predicate reaches the scan as a PartitionFilters
    // entry (pruning, not a data filter)
    val plan = env.sqlQuery("SELECT k FROM pt WHERE dt = 'd1'")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("dt"),
      s"expected partition pruning in:\n$plan")
    // dynamic partition OVERWRITE touches only written partitions
    env.executeSql("INSERT OVERWRITE pt SELECT 9, 'z', 'd1'")
    assert(env.sqlQuery("SELECT k, dt FROM pt ORDER BY k")
      .as[(Long, String)].collect().toSeq == Seq((3L, "d2"), (9L, "d1")))
  }

  test("static PARTITION spec injects literals; composes with a column list") {
    val env = GraftTableEnvironment.create(spark)
    val dir = tmp("graft-ins-statpart")
    env.executeSql(s"""
      CREATE TABLE sp (k BIGINT, v STRING, dt STRING)
      PARTITIONED BY (dt) WITH (
        'connector' = 'filesystem', 'path' = '$dir/t', 'format' = 'parquet')""")
    Seq((1L, "a"), (2L, "b")).toDF("k", "v").createOrReplaceTempView("sp_src")
    env.executeSql("INSERT INTO sp PARTITION (dt = 'd7') SELECT k, v FROM sp_src")
    env.executeSql("INSERT INTO sp PARTITION (dt = 'd8') (v, k) SELECT v, k + 10 FROM sp_src")
    assert(env.sqlQuery("SELECT k, v, dt FROM sp ORDER BY k")
      .as[(Long, String, String)].collect().toSeq ==
      Seq((1L, "a", "d7"), (2L, "b", "d7"), (11L, "a", "d8"), (12L, "b", "d8")))
    // static key must be a declared partition column
    val ex = intercept[IllegalArgumentException] {
      env.executeSql("INSERT INTO sp PARTITION (v = 'x') SELECT k, dt FROM sp_src")
    }
    assert(ex.getMessage.contains("PARTITIONED BY"))
  }

  test("filesystem metadata columns bind to the _metadata struct; excluded from INSERT") {
    val env = GraftTableEnvironment.create(spark)
    val dir = tmp("graft-ins-fsmeta")
    env.executeSql(s"""
      CREATE TABLE fm (k BIGINT, fname STRING METADATA FROM 'file.name' VIRTUAL,
                       v STRING) WITH (
        'connector' = 'filesystem', 'path' = '$dir/t', 'format' = 'parquet')""")
    // INSERT maps the two PHYSICAL columns only
    Seq((1L, "a"), (2L, "b")).toDF("k", "v").createOrReplaceTempView("fm_src")
    env.executeSql("INSERT INTO fm SELECT k, v FROM fm_src")
    val rows = env.sqlQuery("SELECT k, fname, v FROM fm ORDER BY k").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(rows.forall(_.getString(1).endsWith(".parquet")))
    assert(rows.map(_.getString(2)).toSeq == Seq("a", "b"))
    // a metadata column cannot appear in an INSERT column list
    val ex = intercept[IllegalArgumentException] {
      env.executeSql("INSERT INTO fm (k, fname, v) SELECT 3, 'x', 'c' FROM fm_src")
    }
    assert(ex.getMessage.contains("not a physical column"))
  }

  test("STATEMENT SET SQL spellings route members through the multi-sink path") {
    val env = GraftTableEnvironment.create(spark)
    val dir = tmp("graft-ins-sset")
    env.executeSql(s"""
      CREATE TABLE sset_a (k BIGINT) WITH (
        'connector' = 'filesystem', 'path' = '$dir/a', 'format' = 'parquet')""")
    env.executeSql(s"""
      CREATE TABLE sset_b (k BIGINT) WITH (
        'connector' = 'filesystem', 'path' = '$dir/b', 'format' = 'parquet')""")
    (1L to 10L).toDF("k").createOrReplaceTempView("sset_src")
    // TableEnvironment spelling
    env.executeSql("""
      EXECUTE STATEMENT SET BEGIN
        INSERT INTO sset_a SELECT k FROM sset_src WHERE k <= 4;
        INSERT INTO sset_b SELECT k FROM sset_src WHERE k > 4;
      END""")
    assert(env.sqlQuery("SELECT count(1) AS n FROM sset_a").head().getLong(0) == 4L)
    assert(env.sqlQuery("SELECT count(1) AS n FROM sset_b").head().getLong(0) == 6L)
    // SQL-client script spelling
    env.executeSql("""
      BEGIN STATEMENT SET;
        INSERT INTO sset_a SELECT k + 100 FROM sset_src WHERE k <= 2;
      END;""")
    assert(env.sqlQuery("SELECT count(1) AS n FROM sset_a").head().getLong(0) == 6L)
    // non-INSERT member is rejected
    val ex = intercept[IllegalArgumentException] {
      env.executeSql("EXECUTE STATEMENT SET BEGIN SELECT 1; END")
    }
    assert(ex.getMessage.contains("only INSERT"))
  }

  test("statement set batches connector-table inserts off one shared scan") {
    val env = GraftTableEnvironment.create(spark)
    val dir = tmp("graft-ins-ss")
    env.executeSql(s"""
      CREATE TABLE ss_a (k BIGINT) WITH (
        'connector' = 'filesystem', 'path' = '$dir/a', 'format' = 'parquet')""")
    env.executeSql(s"""
      CREATE TABLE ss_b (k BIGINT) WITH (
        'connector' = 'filesystem', 'path' = '$dir/b', 'format' = 'parquet')""")
    (1L to 10L).toDF("k").createOrReplaceTempView("ss_src")
    env.createStatementSet()
      .addInsertSql("INSERT INTO ss_a SELECT k FROM ss_src WHERE k <= 5")
      .addInsertSql("INSERT INTO ss_b SELECT k FROM ss_src WHERE k > 5")
      .execute()
    assert(env.sqlQuery("SELECT count(1) AS n FROM ss_a").head().getLong(0) == 5L)
    assert(env.sqlQuery("SELECT count(1) AS n FROM ss_b").head().getLong(0) == 5L)
  }
}
