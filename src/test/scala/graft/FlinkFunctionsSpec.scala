package graft

import graft.functions.FlinkFunctions
import graft.functions.FlinkFunctions._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FlinkFunctionsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(4)
  import spark.implicits._

  test("gap expressions evaluate correctly (interpreted + codegen paths)") {
    val df = Seq("a#b#c", "123", "abc", "").toDF("s")
    val got = df.select(col("s"),
      split_index(col("s"), lit("#"), lit(1)).as("si"),
      is_alpha(col("s")).as("al"),
      is_digit(col("s")).as("dg"),
      is_decimal(col("s")).as("dc"),
      hash_code(col("s")).as("hc"))
      .collect().map(r => r.getString(0) ->
        ((Option(r.getString(1)), r.getBoolean(2), r.getBoolean(3),
          r.getBoolean(4), r.getInt(5)))).toMap
    val byKey = got
    assert(byKey("a#b#c") == (Some("b"), false, false, false, "a#b#c".hashCode))
    assert(byKey("123") == (None, false, true, true, "123".hashCode))
    assert(byKey("abc") == (None, true, false, false, "abc".hashCode))
    assert(byKey("") == (None, false, false, false, 0))
  }

  test("gap functions are usable from SQL after registration") {
    FlinkFunctions.registerAll(spark)
    val r = spark.sql(
      "SELECT split_index('x,y,z', ',', 2) AS a, hash_code('abc') AS b, " +
        "is_alpha('Graft') AS c, is_digit('42') AS d, is_decimal('-4e2') AS e")
      .collect().head
    assert(r.getString(0) == "z" && r.getInt(1) == 96354
      && r.getBoolean(2) && r.getBoolean(3) && r.getBoolean(4))
  }

  test("gap functions ride SparkSessionExtensions into fresh sessions") {
    // newSession() gets a fresh SessionState: temp-function registration
    // would be lost, extension-injected functions re-apply.
    val fresh = spark.newSession()
    val r = fresh.sql(
      """SELECT split_index('a#b#c', '#', 2), json_value('{"a":1}', '$.a')""")
      .collect().head
    assert(r.getString(0) == "c" && r.getString(1) == "1")
  }

  test("split_to_rows UDTF emits (pos, word) rows via LATERAL VIEW") {
    FlinkFunctions.registerAll(spark)
    val rows = spark.sql("""
      SELECT pos, word FROM (SELECT 'a b  c ' AS s)
      LATERAL VIEW split_to_rows(s, ' ') t AS pos, word""")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    // consecutive and trailing delimiters keep their empty tokens
    // (DuckDB string_split / Spark split() semantics)
    assert(rows == Seq((0, "a"), (1, "b"), (2, ""), (3, "c"), (4, "")))
  }

  test("json_value / json_exists registered for SQL with default-on-empty") {
    FlinkFunctions.registerAll(spark)
    val r = spark.sql("""
      SELECT json_exists('{"a":1}', '$.a'),
             json_exists('{"a":1}', '$.b'),
             json_value('{"a":"x"}', '$.a'),
             json_value('{"a":"x"}', '$.b', 'dflt')
    """).collect().head
    assert(r.getBoolean(0) && !r.getBoolean(1))
    assert(r.getString(2) == "x" && r.getString(3) == "dflt")
  }

  test("translateDatePattern maps tokens but never quoted literals") {
    assert(FlinkFunctions.translateDatePattern("yyyy-MM-dd HH:mm:ss")
      == "yyyy-MM-dd HH:mm:ss")
    assert(FlinkFunctions.translateDatePattern("u") == "e")
    assert(FlinkFunctions.translateDatePattern("uu E ZZ") == "ee E xx")
    // quoted literals pass through untouched
    assert(FlinkFunctions.translateDatePattern("'UTC' u") == "'UTC' e")
    assert(FlinkFunctions.translateDatePattern("'u and Z' yyyy") == "'u and Z' yyyy")
    // Z runs other than ZZ keep their SDF spelling
    assert(FlinkFunctions.translateDatePattern("Z") == "Z")
  }

  test("temporal_overlaps normalizes endpoints and is inclusive") {
    import org.apache.spark.sql.functions._
    val df = Seq((1, 0L, 10L, 5L, 15L),   // plain overlap
      (2, 0L, 10L, 10L, 20L),             // touching endpoints -> true
      (3, 0L, 10L, 11L, 20L),             // disjoint
      (4, 10L, 0L, 20L, 11L))             // both reversed, disjoint
      .toDF("id", "ls", "le", "rs", "re")
    val r = df.select(col("id"), FlinkFunctions.temporal_overlaps(
        col("ls"), col("le"), col("rs"), col("re")).as("ov"))
      .as[(Int, Boolean)].collect().toMap
    assert(r == Map(1 -> true, 2 -> true, 3 -> false, 4 -> false))
  }

  test("type_of reports the column's SQL type") {
    import org.apache.spark.sql.functions._
    val df = Seq((1L, "x", 1.5)).toDF("a", "b", "c")
    val row = df.select(FlinkFunctions.type_of(df, "a"),
      FlinkFunctions.type_of(df, "b"), FlinkFunctions.type_of(df, "c")).head
    assert(row.getString(0) == "BIGINT" && row.getString(1) == "STRING" &&
      row.getString(2) == "DOUBLE")
  }

  test("split_index survives whole-stage codegen over many rows") {
    val n = spark.range(1000)
      .select(split_index(concat(lit("p#"), col("id")), lit("#"), lit(1)).as("v"))
      .filter(col("v") === "500").count()
    assert(n == 1)
  }
}
