package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Day-2 DDL (GraftTableEnvironment.alterStatement): schema evolution
  * (ADD/REPLACE COLUMNS, CHANGE COLUMN, RESET, constraints), ALTER
  * VIEW/DATABASE/FUNCTION, DESCRIBE CATALOG/DATABASE, and the
  * timestamp-render round-trip. Each test runs on its own session.
  */
class SchemaEvolutionSpec extends AnyFunSuite {
  lazy val root: SparkSession = GraftSession.local(4)

  private def freshEnv(): (SparkSession, GraftTableEnvironment) = {
    val s = root.newSession()
    (s, GraftTableEnvironment.create(s))
  }

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("ADD COLUMNS: old files null-fill, new inserts carry the column") {
    val (_, env) = freshEnv()
    val dir = tmp("graft-addcol")
    env.executeSql(s"""
      CREATE TABLE ac (k INT, v STRING)
      WITH ('connector' = 'filesystem', 'path' = '$dir', 'format' = 'parquet')""")
    env.executeSql("INSERT INTO ac VALUES (1, 'a'), (2, 'b')")
    env.executeSql("ALTER TABLE ac ADD COLUMNS (score BIGINT, tagged AS k * 10)")
    // rows written BEFORE the evolution read back with score = null
    val r0 = env.from("ac").orderBy("k")
      .selectExpr("k", "v", "score", "tagged").collect()
    assert(r0.map(x => (x.getInt(0), x.getString(1), x.isNullAt(2), x.getInt(3)))
      .toSeq == Seq((1, "a", true, 10), (2, "b", true, 20)))
    // new INSERTs provide the evolved width
    env.executeSql("INSERT INTO ac VALUES (3, 'c', 99)")
    val r1 = env.from("ac").where("k = 3")
      .selectExpr("score", "tagged").collect()
    assert(r1.map(x => (x.getLong(0), x.getInt(1))).toSeq == Seq((99L, 30)))
    // SHOW CREATE TABLE reflects the evolution
    val show = env.executeSql("SHOW CREATE TABLE ac").collect()(0).getString(0)
    assert(show.contains("score bigint") && show.contains("tagged AS k * 10"))
    // duplicate name rejected
    assertThrows[IllegalArgumentException](
      env.executeSql("ALTER TABLE ac ADD COLUMNS (v INT)"))
    assertThrows[IllegalArgumentException](
      env.executeSql("ALTER TABLE ac ADD COLUMNS (tagged INT)"))
    // ADD CONSTRAINT through ADD COLUMNS-style pk works on pk-less table
    env.executeSql(
      "ALTER TABLE ac ADD CONSTRAINT pk_ac PRIMARY KEY (k) NOT ENFORCED")
    assert(env.primaryKey("ac") == Seq("k"))
    assertThrows[IllegalArgumentException](env.executeSql(
      "ALTER TABLE ac ADD CONSTRAINT pk2 PRIMARY KEY (v) NOT ENFORCED"))
    env.executeSql("ALTER TABLE ac DROP PRIMARY KEY")
    assert(env.primaryKey("ac").isEmpty)
  }

  test("REPLACE COLUMNS: retained types must match; drop + append works") {
    val (_, env) = freshEnv()
    val dir = tmp("graft-repcol")
    env.executeSql(s"""
      CREATE TABLE rc (k INT, v STRING, extra DOUBLE)
      WITH ('connector' = 'filesystem', 'path' = '$dir', 'format' = 'parquet')""")
    env.executeSql("INSERT INTO rc VALUES (1, 'a', 1.5)")
    // type change rejected loudly
    val e = intercept[IllegalArgumentException](
      env.executeSql("ALTER TABLE rc REPLACE COLUMNS (k STRING, v STRING)"))
    assert(e.getMessage.contains("cannot change the type"))
    // drop `extra`, append `added`
    env.executeSql("ALTER TABLE rc REPLACE COLUMNS (k INT, v STRING, added BIGINT)")
    val r = env.from("rc").orderBy("k").collect()
    assert(r.map(x => (x.getInt(0), x.getString(1), x.isNullAt(2))).toSeq ==
      Seq((1, "a", true)))
    assert(!env.from("rc").columns.contains("extra"))
  }

  test("CHANGE COLUMN: rename rewrites data; type change rejected") {
    val (_, env) = freshEnv()
    val dir = tmp("graft-chgcol")
    env.executeSql(s"""
      CREATE TABLE cc (k INT, v STRING)
      WITH ('connector' = 'filesystem', 'path' = '$dir', 'format' = 'parquet')""")
    env.executeSql("INSERT INTO cc VALUES (1, 'a'), (2, 'b')")
    val e = intercept[IllegalArgumentException](
      env.executeSql("ALTER TABLE cc CHANGE COLUMN v v BIGINT"))
    assert(e.getMessage.contains("cannot change the type"))
    env.executeSql("ALTER TABLE cc CHANGE COLUMN v label STRING")
    // data survives the rename (files rewritten under the new name)
    val r = env.from("cc").orderBy("k").selectExpr("k", "label").collect()
    assert(r.map(x => (x.getInt(0), x.getString(1))).toSeq ==
      Seq((1, "a"), (2, "b")))
    assert(env.executeSql("SHOW CREATE TABLE cc").collect()(0).getString(0)
      .contains("label string"))
    // FIRST/AFTER repositioning is not supported
    assertThrows[IllegalArgumentException](
      env.executeSql("ALTER TABLE cc CHANGE COLUMN k k INT AFTER label"))
  }

  test("ALTER TABLE RESET removes options; connector protected") {
    val (_, env) = freshEnv()
    val dir = tmp("graft-reset")
    env.executeSql(s"""
      CREATE TABLE rs (k INT, v STRING)
      WITH ('connector' = 'filesystem', 'path' = '$dir',
            'format' = 'csv', 'csv.include-header' = 'true')""")
    env.executeSql("INSERT INTO rs VALUES (1, 'a')")
    env.executeSql("ALTER TABLE rs RESET ('csv.include-header')")
    val show = env.executeSql("SHOW CREATE TABLE rs").collect()(0).getString(0)
    assert(!show.contains("csv.include-header"))
    assertThrows[IllegalArgumentException](
      env.executeSql("ALTER TABLE rs RESET ('connector')"))
    assertThrows[IllegalArgumentException](env.executeSql("ALTER TABLE rs RESET ()"))
  }

  test("ALTER VIEW AS re-binds; ALTER VIEW RENAME moves the view") {
    val (_, env) = freshEnv()
    env.executeSql("CREATE TABLE av_t (a INT) WITH ('connector' = 'values')")
    env.executeSql("CREATE VIEW av_v AS SELECT a FROM av_t")
    env.executeSql("ALTER VIEW av_v AS SELECT a + 1 AS b FROM av_t")
    assert(env.from("av_v").columns.sameElements(Array("b")))
    env.executeSql("ALTER VIEW av_v RENAME TO av_w")
    assert(env.executeSql("SHOW VIEWS").collect().map(_.getString(0)).toSeq ==
      Seq("av_w"))
    assert(!env.spark.catalog.tableExists("av_v"))
    // not a view → rejected
    assertThrows[IllegalArgumentException](
      env.executeSql("ALTER VIEW av_t AS SELECT 1"))
  }

  test("ALTER DATABASE SET + DESCRIBE DATABASE/CATALOG") {
    val (_, env) = freshEnv()
    env.executeSql("CREATE DATABASE dd COMMENT 'docs db' WITH ('owner' = 'me')")
    env.executeSql("ALTER DATABASE dd SET ('retention' = '30d')")
    // plain form: name/catalog/comment only; properties need EXTENDED
    val plain = env.executeSql("DESCRIBE DATABASE dd").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(plain("name") == "dd" && plain("comment") == "docs db")
    assert(!plain.keys.exists(_.startsWith("property.")))
    val info = env.executeSql("DESCRIBE DATABASE EXTENDED dd").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(info("property.owner") == "me" && info("property.retention") == "30d")
    assertThrows[IllegalArgumentException](
      env.executeSql("ALTER DATABASE nope SET ('a' = 'b')"))
    val cat = env.executeSql("DESCRIBE CATALOG default_catalog").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(cat("name") == "default_catalog" && cat("type") == "generic_in_memory")
  }

  test("ALTER FUNCTION re-binds an alias to a different implementation") {
    val (_, env) = freshEnv()
    env.executeSql("CREATE FUNCTION my_fn AS 'upper'")
    assert(env.executeSql("SELECT my_fn('ab') AS x").collect()(0)
      .getString(0) == "AB")
    env.executeSql("ALTER FUNCTION my_fn AS 'lower'")
    assert(env.executeSql("SELECT my_fn('AB') AS x").collect()(0)
      .getString(0) == "ab")
    assertThrows[IllegalArgumentException](
      env.executeSql("ALTER FUNCTION no_such_fn AS 'upper'"))
    env.executeSql("ALTER FUNCTION IF EXISTS no_such_fn AS 'upper'") // no-op
  }

  test("TIMESTAMP_LTZ survives the render round-trip (no ntz drift)") {
    val (_, env) = freshEnv()
    val dir = tmp("graft-tsrt")
    env.executeSql(s"""
      CREATE TABLE ts_rt (k INT, lt TIMESTAMP_LTZ(3), nt TIMESTAMP(3))
      WITH ('connector' = 'filesystem', 'path' = '$dir', 'format' = 'parquet')""")
    // force a snapshot re-render + re-parse through RENAME
    env.executeSql("ALTER TABLE ts_rt RENAME TO ts_rt2")
    val sch = env.from("ts_rt2").schema
    assert(sch("lt").dataType == org.apache.spark.sql.types.TimestampType)
    assert(sch("nt").dataType == org.apache.spark.sql.types.TimestampNTZType)
    val show = env.executeSql("SHOW CREATE TABLE ts_rt2").collect()(0).getString(0)
    assert(show.contains("TIMESTAMP_LTZ(3)") && show.contains("TIMESTAMP(3)"))
  }

  test("LIKE: option typos rejected; cross-kind column collisions rejected") {
    val (_, env) = freshEnv()
    env.executeSql("""CREATE TABLE lb (id BIGINT, v BIGINT, d AS v * 2)
      WITH ('connector' = 'values')""")
    // a typo'd like-option must error, not default to INCLUDING ALL
    assertThrows[IllegalArgumentException](env.executeSql(
      "CREATE TABLE l1 LIKE lb (INCLUDNG OPTIONS)"))
    // child physical column colliding with a base COMPUTED column
    assertThrows[IllegalArgumentException](env.executeSql(
      "CREATE TABLE l2 (d INT) LIKE lb"))
    // child computed column colliding with a base PHYSICAL column
    assertThrows[IllegalArgumentException](env.executeSql(
      "CREATE TABLE l3 (v AS id + 1) LIKE lb"))
  }

  test("ALTER VIEW SET merges options; SHOW CREATE VIEW round-trips") {
    val (_, env) = freshEnv()
    env.executeSql("CREATE TABLE vp_t (a INT) WITH ('connector' = 'values')")
    env.executeSql("CREATE VIEW vp_v AS SELECT a FROM vp_t")
    env.executeSql("ALTER VIEW vp_v SET ('owner' = 'me')")
    env.executeSql("ALTER VIEW vp_v SET ('ttl' = '7d', 'owner' = 'you')")
    val show = env.executeSql("SHOW CREATE VIEW vp_v").collect()(0).getString(0)
    assert(show.contains("'owner' = 'you'") && show.contains("'ttl' = '7d'"))
    assert(show.contains("AS SELECT a FROM vp_t"))
    // the snapshot re-executes (WITH clause accepted by CREATE VIEW)
    env.executeSql("DROP VIEW vp_v")
    env.executeSql(show)
    val show2 = env.executeSql("SHOW CREATE VIEW vp_v").collect()(0).getString(0)
    assert(show2 == show)
    // options survive RENAME; ALTER VIEW AS keeps them but re-binds the body
    env.executeSql("ALTER VIEW vp_v RENAME TO vp_w")
    val show3 = env.executeSql("SHOW CREATE VIEW vp_w").collect()(0).getString(0)
    assert(show3.contains("'owner' = 'you'"))
    env.executeSql("ALTER VIEW vp_w AS SELECT a + 1 AS b FROM vp_t")
    val show4 = env.executeSql("SHOW CREATE VIEW vp_w").collect()(0).getString(0)
    assert(show4.contains("a + 1") && show4.contains("'ttl' = '7d'"))
    // not a view / empty SET rejected
    assertThrows[IllegalArgumentException](
      env.executeSql("ALTER VIEW vp_t SET ('a' = 'b')"))
    assertThrows[IllegalArgumentException](
      env.executeSql("ALTER VIEW vp_w SET ()"))
  }

  test("view options containing quotes and parens round-trip exactly") {
    val (_, env) = freshEnv()
    env.executeSql("CREATE TABLE vq_t (a INT) WITH ('connector' = 'values')")
    // a quote (SQL-doubled) and a close-paren inside option values must
    // neither truncate the WITH clause nor mis-parse the kv pairs
    env.executeSql("CREATE VIEW vq_v WITH ('note' = 'it''s (v1)', " +
      "'paren' = ')') AS SELECT a FROM vq_t")
    val show = env.executeSql("SHOW CREATE VIEW vq_v").collect()(0).getString(0)
    assert(show.contains("'note' = 'it''s (v1)'"), show)
    assert(show.contains("'paren' = ')'"), show)
    // the snapshot re-executes and is a fixed point
    env.executeSql("DROP VIEW vq_v")
    env.executeSql(show)
    val show2 = env.executeSql("SHOW CREATE VIEW vq_v").collect()(0).getString(0)
    assert(show2 == show)
    // ALTER VIEW SET with quote/paren values merges instead of falling
    // through to an unrelated handler
    env.executeSql("ALTER VIEW vq_v SET ('note' = 'don''t stop)', 'k2' = '(a)')")
    val show3 = env.executeSql("SHOW CREATE VIEW vq_v").collect()(0).getString(0)
    assert(show3.contains("'note' = 'don''t stop)'"), show3)
    assert(show3.contains("'k2' = '(a)'"), show3)
    env.executeSql("DROP VIEW vq_v")
    env.executeSql(show3)
    assert(env.executeSql("SHOW CREATE VIEW vq_v").collect()(0).getString(0)
      == show3)
  }

  test("CHANGE COLUMN crash recovery: stranded __graft_old is restored") {
    val (_, env) = freshEnv()
    val dir = tmp("graft-crashrec")
    env.executeSql(s"""
      CREATE TABLE cr (k INT, v STRING)
      WITH ('connector' = 'filesystem', 'path' = '$dir', 'format' = 'parquet')""")
    env.executeSql("INSERT INTO cr VALUES (1, 'a'), (2, 'b')")
    // simulate a crash between rename(root -> old) and
    // rename(stage -> root): table path absent, data stranded in
    // __graft_old, plus a stale stage directory from the dead writer
    val root = new java.io.File(dir)
    val old = new java.io.File(root.getParent, root.getName + "__graft_old")
    val stage = new java.io.File(root.getParent, root.getName + "__graft_stage")
    assert(stage.mkdirs())
    assert(root.renameTo(old))
    // the next CHANGE COLUMN heals the swap first, then proceeds
    env.executeSql("ALTER TABLE cr CHANGE COLUMN v label STRING")
    val r = env.from("cr").orderBy("k").selectExpr("k", "label").collect()
    assert(r.map(x => (x.getInt(0), x.getString(1))).toSeq ==
      Seq((1, "a"), (2, "b")))
    assert(!old.exists() && !stage.exists())
    // bind-time recovery too: strand again, then a fresh CREATE TABLE
    // over the same path sees the healed data
    assert(root.renameTo(old))
    val (_, env2) = freshEnv()
    env2.executeSql(s"""
      CREATE TABLE cr2 (k INT, label STRING)
      WITH ('connector' = 'filesystem', 'path' = '$dir', 'format' = 'parquet')""")
    assert(env2.from("cr2").count() == 2)
    assert(!old.exists())
  }

  test("REPLACE COLUMNS on csv: append-only (positional binding guard)") {
    val (_, env) = freshEnv()
    val dir = tmp("graft-repcsv")
    env.executeSql(s"""
      CREATE TABLE rcsv (k INT, mid STRING, v DOUBLE)
      WITH ('connector' = 'filesystem', 'path' = '$dir', 'format' = 'csv')""")
    env.executeSql("INSERT INTO rcsv VALUES (1, 'a', 1.5)")
    // dropping the middle column would misbind old files → rejected
    val e = intercept[IllegalArgumentException](
      env.executeSql("ALTER TABLE rcsv REPLACE COLUMNS (k INT, v DOUBLE)"))
    assert(e.getMessage.contains("positionally"))
    // reordering likewise
    assertThrows[IllegalArgumentException](env.executeSql(
      "ALTER TABLE rcsv REPLACE COLUMNS (mid STRING, k INT, v DOUBLE)"))
    // appending a trailing column is the safe evolution: old rows null-fill
    env.executeSql(
      "ALTER TABLE rcsv REPLACE COLUMNS (k INT, mid STRING, v DOUBLE, tag STRING)")
    val r = env.from("rcsv").orderBy("k").collect()
    assert(r.map(x => (x.getInt(0), x.getString(1), x.getDouble(2), x.isNullAt(3)))
      .toSeq == Seq((1, "a", 1.5, true)))
  }

  test("CHANGE COLUMN on a partitioned table: stage-and-swap keeps data + layout") {
    val (_, env) = freshEnv()
    val dir = tmp("graft-chgpart")
    env.executeSql(s"""
      CREATE TABLE cp (k INT, v STRING, region STRING)
      PARTITIONED BY (region)
      WITH ('connector' = 'filesystem', 'path' = '$dir', 'format' = 'parquet')""")
    env.executeSql(
      "INSERT INTO cp VALUES (1, 'a', 'eu'), (2, 'b', 'us'), (3, 'c', 'eu')")
    // rename a DATA column: rewrite keeps the partition layout
    env.executeSql("ALTER TABLE cp CHANGE COLUMN v label STRING")
    val r = env.from("cp").orderBy("k").selectExpr("k", "label", "region").collect()
    assert(r.map(x => (x.getInt(0), x.getString(1), x.getString(2))).toSeq ==
      Seq((1, "a", "eu"), (2, "b", "us"), (3, "c", "eu")))
    assert(env.executeSql("SHOW PARTITIONS cp").collect().map(_.getString(0))
      .sorted.toSeq == Seq("region=eu", "region=us"))
    // rename the PARTITION column: directories re-derive under the new name
    env.executeSql("ALTER TABLE cp CHANGE COLUMN region zone STRING")
    assert(env.executeSql("SHOW PARTITIONS cp").collect().map(_.getString(0))
      .sorted.toSeq == Seq("zone=eu", "zone=us"))
    assert(env.from("cp").where("zone = 'eu'").count() == 2)
    // no staging leftovers next to the table directory
    val siblings = new java.io.File(dir).getParentFile.list()
      .filter(_.startsWith(new java.io.File(dir).getName + "__graft"))
    assert(siblings.isEmpty)
  }

  test("declared timestamp precision survives render round-trips") {
    val (_, env) = freshEnv()
    env.executeSql("""
      CREATE TABLE tsp (k INT, hi TIMESTAMP_LTZ(9), lo TIMESTAMP(0),
                        dflt TIMESTAMP_LTZ(3))
      WITH ('connector' = 'values')""")
    // RENAME forces a render + re-parse cycle
    env.executeSql("ALTER TABLE tsp RENAME TO tsp2")
    env.executeSql("ALTER TABLE tsp2 RENAME TO tsp3")
    val show = env.executeSql("SHOW CREATE TABLE tsp3").collect()(0).getString(0)
    assert(show.contains("hi TIMESTAMP_LTZ(9)"), show)
    assert(show.contains("lo TIMESTAMP(0)"), show)
    assert(show.contains("dflt TIMESTAMP_LTZ(3)"), show)
    // LIKE inherits the declared precision
    env.executeSql("CREATE TABLE tsp_like (extra INT) LIKE tsp3")
    val showL = env.executeSql("SHOW CREATE TABLE tsp_like").collect()(0).getString(0)
    assert(showL.contains("hi TIMESTAMP_LTZ(9)") && showL.contains("lo TIMESTAMP(0)"))
    // CHANGE COLUMN carries precision under the new name
    env.executeSql("ALTER TABLE tsp3 CHANGE COLUMN hi hi9 TIMESTAMP_LTZ(9)")
    val showC = env.executeSql("SHOW CREATE TABLE tsp3").collect()(0).getString(0)
    assert(showC.contains("hi9 TIMESTAMP_LTZ(9)"), showC)
  }

  test("SHOW VIEWS is scoped to the current database") {
    val (_, env) = freshEnv()
    env.executeSql("CREATE TABLE svt (a INT) WITH ('connector' = 'values')")
    env.executeSql("CREATE VIEW sv_scope AS SELECT a FROM svt")
    assert(env.executeSql("SHOW VIEWS").collect().map(_.getString(0)).toSeq ==
      Seq("sv_scope"))
    env.executeSql("CREATE DATABASE sv_db")
    env.executeSql("USE sv_db")
    assert(env.executeSql("SHOW VIEWS").count() == 0)
    env.executeSql("USE default_database")
    // case-insensitive rename keeps tracking consistent
    env.executeSql("ALTER VIEW SV_SCOPE RENAME TO sv_scope2")
    assert(env.executeSql("SHOW VIEWS").collect().map(_.getString(0)).toSeq ==
      Seq("sv_scope2"))
  }
}
