package graft

import graft.sql.FlinkDdl
import org.scalatest.funsuite.AnyFunSuite

/** Unit tests for the Flink DDL parser's edge cases (reference grammar
  * flink-sql-parser .../ddl/SqlCreateTable.java, SqlWatermark.java).
  */
class FlinkDdlSpec extends AnyFunSuite {

  test("parses the full clause set") {
    val stmt = FlinkDdl.parse("""
      CREATE TABLE IF NOT EXISTS t1 (
        id BIGINT NOT NULL,
        name VARCHAR(50) COMMENT 'display name',
        price DECIMAL(10, 2),
        tags ARRAY<STRING>,
        props MAP<STRING, ARRAY<INT>>,
        big AS price > 100,
        ts TIMESTAMP(3),
        CONSTRAINT pk_t1 PRIMARY KEY (id, name) NOT ENFORCED,
        WATERMARK FOR ts AS ts - INTERVAL '5' SECOND
      ) WITH ('connector' = 'values', 'k' = 'v with spaces')""")
    assert(stmt.name == "t1" && stmt.ifNotExists)
    assert(stmt.columns == Seq("id" -> "bigint", "name" -> "string",
      "price" -> "decimal(10, 2)", "tags" -> "array<string>",
      "props" -> "map<string,array<int>>", "ts" -> "timestamp_ntz"))
    assert(stmt.computed == Seq("big" -> "price > 100"))
    assert(stmt.primaryKey == Seq("id", "name"))
    assert(stmt.watermark.contains(("ts", "5 second")))
    assert(stmt.options == Map("connector" -> "values", "k" -> "v with spaces"))
  }

  test("computed column with a bare comparison doesn't break splitting") {
    val stmt = FlinkDdl.parse("""
      CREATE TABLE t2 (
        a INT,
        flag AS a > 3,
        b STRING,
        PRIMARY KEY (a) NOT ENFORCED
      )""")
    assert(stmt.columns.map(_._1) == Seq("a", "b"))
    assert(stmt.computed == Seq("flag" -> "a > 3"))
  }

  test("strictly-ascending watermark (bare column) means zero delay") {
    val stmt = FlinkDdl.parse(
      "CREATE TABLE t3 (ts TIMESTAMP(3), WATERMARK FOR ts AS ts) WITH ('connector'='values')")
    assert(stmt.watermark.contains(("ts", "0 seconds")))
  }

  test("rejects a watermark over a different column, loudly") {
    val e = intercept[IllegalArgumentException](FlinkDdl.parse(
      "CREATE TABLE t4 (a TIMESTAMP(3), b TIMESTAMP(3), WATERMARK FOR a AS b - INTERVAL '1' MINUTE)"))
    assert(e.getMessage.contains("must reference its own column"))
  }

  test("only Flink-flavored CREATE TABLE is intercepted") {
    assert(FlinkDdl.isFlinkCreateTable(
      "CREATE TABLE x (a INT) WITH ('connector'='values')"))
    assert(FlinkDdl.isFlinkCreateTable(
      "CREATE TABLE x (a INT, WATERMARK FOR a AS a)"))
    // plain Spark DDL stays with Spark
    assert(!FlinkDdl.isFlinkCreateTable("CREATE TABLE x (a INT) USING parquet"))
    assert(!FlinkDdl.isFlinkCreateTable("CREATE TABLE x AS SELECT 1"))
  }

  test("ROW, MULTISET and timestamp flavors map per the reference type roots") {
    // ROW<...> → struct<...>, nested generics intact
    assert(FlinkDdl.sparkType("ROW<f0 INT, f1 STRING>") == "struct<f0:int,f1:string>")
    assert(FlinkDdl.sparkType("ROW<a ROW<x DOUBLE, y DOUBLE>, b ARRAY<BIGINT>>") ==
      "struct<a:struct<x:double,y:double>,b:array<bigint>>")
    assert(FlinkDdl.sparkType("ARRAY<ROW<k STRING, v INT>>") ==
      "array<struct<k:string,v:int>>")
    // MULTISET<e> → element→multiplicity map (reference CollectAggFunction's
    // external Map<T, Integer> representation)
    assert(FlinkDdl.sparkType("MULTISET<STRING>") == "map<string,int>")
    assert(FlinkDdl.sparkType("MAP<STRING, MULTISET<INT>>") ==
      "map<string,map<int,int>>")
    // TIMESTAMP(p) is WITHOUT time zone → timestamp_ntz; only the LTZ
    // flavors map to Spark's instant `timestamp`
    assert(FlinkDdl.sparkType("TIMESTAMP(3)") == "timestamp_ntz")
    assert(FlinkDdl.sparkType("TIMESTAMP") == "timestamp_ntz")
    assert(FlinkDdl.sparkType("TIMESTAMP_LTZ(3)") == "timestamp")
    assert(FlinkDdl.sparkType("TIMESTAMP(3) WITH LOCAL TIME ZONE") == "timestamp")
    // a ROW column parses inside a full statement
    val stmt = FlinkDdl.parse(
      "CREATE TABLE tr (id INT, pt ROW<lat DOUBLE, lon DOUBLE>, ms MULTISET<STRING>, PRIMARY KEY (id) NOT ENFORCED)")
    assert(stmt.columns == Seq("id" -> "int",
      "pt" -> "struct<lat:double,lon:double>", "ms" -> "map<string,int>"))
  }

  test("drop statement forms") {
    assert(FlinkDdl.isDropTable("DROP TABLE t"))
    assert(FlinkDdl.parseDrop("DROP TABLE IF EXISTS db.t") == ("db.t", true))
    assert(!FlinkDdl.isDropTable("DROP VIEW v"))
  }

  test("PARTITIONED BY parses in order and validates against physical columns") {
    val stmt = FlinkDdl.parse("""
      CREATE TABLE p (k BIGINT, v STRING, dt STRING, hh STRING)
      PARTITIONED BY (dt, hh)
      WITH ('connector'='filesystem', 'path'='/x', 'format'='parquet')""")
    assert(stmt.partitionedBy == Seq("dt", "hh"))
    assert(stmt.columns.map(_._1) == Seq("k", "v", "dt", "hh"))
    val ex = intercept[IllegalArgumentException] {
      FlinkDdl.parse(
        "CREATE TABLE p (k BIGINT) PARTITIONED BY (nope) WITH ('connector'='filesystem')")
    }
    assert(ex.getMessage.contains("not a physical column"))
  }

  test("METADATA columns parse with FROM keys, VIRTUAL flags, and declared order") {
    val stmt = FlinkDdl.parse("""
      CREATE TABLE k (
        k BIGINT,
        off BIGINT METADATA FROM 'offset' VIRTUAL,
        part INT METADATA FROM 'partition' VIRTUAL,
        topic STRING METADATA,
        v STRING,
        PRIMARY KEY (k) NOT ENFORCED
      ) WITH ('connector'='kafka', 'path'='/x', 'format'='json')""")
    assert(stmt.columns.map(_._1) == Seq("k", "v"))
    assert(stmt.metadataCols == Seq(
      FlinkDdl.MetadataCol("off", "bigint", "offset", virtual = true),
      FlinkDdl.MetadataCol("part", "int", "partition", virtual = true),
      FlinkDdl.MetadataCol("topic", "string", "topic", virtual = false)))
    assert(stmt.declaredOrder == Seq("k", "off", "part", "topic", "v"))
  }

  test("unknown trailing clauses are rejected loudly, not silently dropped") {
    val ex = intercept[IllegalArgumentException] {
      FlinkDdl.parse(
        "CREATE TABLE t (k BIGINT) CLUSTERED BY (k) WITH ('connector'='filesystem')")
    }
    assert(ex.getMessage.contains("unsupported trailing clause"))
    // COMMENT between body and WITH is tolerated (and discarded)
    val stmt = FlinkDdl.parse(
      "CREATE TABLE t (k BIGINT) COMMENT 'doc' WITH ('connector'='values')")
    assert(stmt.options("connector") == "values")
  }
}
