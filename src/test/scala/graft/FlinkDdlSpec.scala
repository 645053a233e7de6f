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
      "props" -> "map<string,array<int>>", "ts" -> "timestamp"))
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

  test("drop statement forms") {
    assert(FlinkDdl.isDropTable("DROP TABLE t"))
    assert(FlinkDdl.parseDrop("DROP TABLE IF EXISTS db.t") == ("db.t", true))
    assert(!FlinkDdl.isDropTable("DROP VIEW v"))
  }
}
