package graft

import graft.sources.CdcFormats
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** CDC format corner semantics (SURVEY §1.1/§2.1, flink-json debezium/
  * canal/maxwell): tombstone skip, schema-include unwrap, unknown-op
  * strict vs lenient handling, partial-`old` before-image merge, DDL
  * event skip, and the serialize half's kind mapping.
  */
class CdcFormatsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(4)
  import spark.implicits._

  private val physical = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("v", DoubleType)))

  private def kinds(df: org.apache.spark.sql.DataFrame): Seq[(String, Long, String)] =
    df.select(col("__rowkind"), col("id"), col("name"))
      .as[(String, Long, String)].collect().toSeq.sortBy(r => (r._2, r._1))

  test("debezium ops map to +I/-U/+U/-D and tombstones are skipped") {
    val events = Seq(
      """{"before":null,"after":{"id":1,"name":"a","v":1.5},"op":"c"}""",
      """{"after":{"id":2,"name":"b","v":2.0},"op":"r"}""",
      """{"before":{"id":1,"name":"a","v":1.5},"after":{"id":1,"name":"a2","v":1.6},"op":"u"}""",
      """{"before":{"id":2,"name":"b","v":2.0},"op":"d"}""",
      null
    ).toDF("json")
    val out = CdcFormats.debeziumJson(events, col("json"), physical)
    assert(kinds(out) == Seq(
      ("+I", 1L, "a"), ("+U", 1L, "a2"), ("-U", 1L, "a"),
      ("+I", 2L, "b"), ("-D", 2L, "b")))
  }

  test("debezium schemaInclude unwraps the payload envelope") {
    val events = Seq(
      """{"schema":{},"payload":{"after":{"id":7,"name":"x","v":0.5},"op":"c"}}"""
    ).toDF("json")
    val out = CdcFormats.debeziumJson(events, col("json"), physical,
      schemaInclude = true)
    assert(kinds(out) == Seq(("+I", 7L, "x")))
  }

  test("debezium unknown op raises in strict mode, drops when lenient") {
    val events = Seq("""{"after":{"id":1,"name":"a","v":1.0},"op":"zz"}""").toDF("json")
    val lenient = CdcFormats.debeziumJson(events, col("json"), physical,
      ignoreParseErrors = true)
    assert(lenient.count() == 0)
    val strict = CdcFormats.debeziumJson(events, col("json"), physical)
    val err = intercept[Exception] { strict.count() }
    assert(err.getMessage.contains("Unknown debezium op") ||
      Option(err.getCause).exists(_.getMessage.contains("Unknown debezium op")))
  }

  test("canal merges partial old from the new row and skips CREATE ddl") {
    val events = Seq(
      """{"data":[{"id":1,"name":"a","v":1.0},{"id":2,"name":"b","v":2.0}],"type":"INSERT"}""",
      // old carries only v — before-image name must come from data.
      """{"data":[{"id":1,"name":"a","v":9.0}],"old":[{"v":1.0}],"type":"UPDATE"}""",
      """{"data":[{"id":2,"name":"b","v":2.0}],"type":"DELETE"}""",
      """{"data":null,"type":"CREATE"}"""
    ).toDF("json")
    val out = CdcFormats.canalJson(events, col("json"), physical)
    val got = out.select(col("__rowkind"), col("id"), col("name"), col("v"))
      .as[(String, Long, String, Double)].collect().toSeq.sortBy(r => (r._2, r._1))
    assert(got == Seq(
      ("+I", 1L, "a", 1.0), ("+U", 1L, "a", 9.0), ("-U", 1L, "a", 1.0),
      ("+I", 2L, "b", 2.0), ("-D", 2L, "b", 2.0)))
  }

  test("maxwell merges partial old and maps insert/update/delete") {
    val events = Seq(
      """{"data":{"id":1,"name":"a","v":1.0},"type":"insert"}""",
      """{"data":{"id":1,"name":"a","v":5.0},"old":{"v":1.0},"type":"update"}""",
      """{"data":{"id":1,"name":"a","v":5.0},"type":"delete"}"""
    ).toDF("json")
    val out = CdcFormats.maxwellJson(events, col("json"), physical)
    val got = out.select(col("__rowkind"), col("v"))
      .as[(String, Double)].collect().toSeq.sorted
    assert(got == Seq(("+I", 1.0), ("+U", 5.0), ("-D", 5.0), ("-U", 1.0)))
  }

  test("readable metadata decodes for all three formats (withMetadata)") {
    // Debezium: envelope ts_ms + source map (ts_ms/db/schema/table) —
    // DebeziumJsonDecodingFormat.ReadableMetadata.
    val dbz = Seq(
      """{"after":{"id":1,"name":"a","v":1.0},"op":"c","ts_ms":1700000001000,
         "source":{"ts_ms":"1699999999000","db":"shop","schema":"pub","table":"t1","version":"1.9"}}"""
        .replaceAll("\n\\s*", "")).toDF("json")
    val d = CdcFormats.debeziumJson(dbz, col("json"), physical,
        withMetadata = true)
      .select(col("__ingest_ts"), col("__src_ts"), col("__db"),
        col("__src_schema"), col("__table"),
        element_at(col("__src_props"), "version"))
      .as[(Long, Long, String, String, String, String)].head()
    assert(d == ((1700000001000L, 1699999999000L, "shop", "pub", "t1", "1.9")))
    // Canal: database/table/pkNames/ts — CanalJsonDecodingFormat.
    val canal = Seq(
      """{"data":[{"id":2,"name":"b","v":2.0}],"type":"INSERT",
         "database":"shop","table":"t2","pkNames":["id"],"ts":1700000002000}"""
        .replaceAll("\n\\s*", "")).toDF("json")
    val c = CdcFormats.canalJson(canal, col("json"), physical,
        withMetadata = true)
      .select(col("__db"), col("__table"), col("__pk_names"), col("__ingest_ts"))
      .as[(String, String, Seq[String], Long)].head()
    assert(c == (("shop", "t2", Seq("id"), 1700000002000L)))
    assert(CdcFormats.canalPkNames(CdcFormats.canalJson(canal, col("json"),
      physical, withMetadata = true)) == Seq("id"))
    // Maxwell: database/table/primary_key_columns/ts.
    val mx = Seq(
      """{"data":{"id":3,"name":"c","v":3.0},"type":"insert",
         "database":"shop","table":"t3","primary_key_columns":["id"],"ts":1700000003}"""
        .replaceAll("\n\\s*", "")).toDF("json")
    val x = CdcFormats.maxwellJson(mx, col("json"), physical,
        withMetadata = true)
      .select(col("__db"), col("__table"), col("__pk_names"), col("__ingest_ts"))
      .as[(String, String, Seq[String], Long)].head()
    assert(x == (("shop", "t3", Seq("id"), 1700000003L)))
  }

  test("serialize halves round-trip through their parsers") {
    val rows = Seq((1L, "a", 1.5, "+I"), (1L, "a", 1.5, "-D"),
      (2L, "b", 2.5, "+U"), (2L, "b", 2.0, "-U"))
      .toDF("id", "name", "v", "k")
    val r = struct(col("id"), col("name"), col("v"))
    // Debezium: +I/+U come back as +I (op c), -U/-D as -D (op d) — the
    // reference's serializer collapses kinds the same way.
    val dbz = CdcFormats.debeziumJson(
      rows.select(CdcFormats.toDebeziumJson(r, col("k")).as("json")),
      col("json"), physical)
    assert(dbz.select("__rowkind").as[String].collect().sorted.toSeq ==
      Seq("+I", "+I", "-D", "-D"))
    val canal = CdcFormats.canalJson(
      rows.select(CdcFormats.toCanalJson(r, col("k")).as("json")),
      col("json"), physical)
    assert(canal.select("__rowkind").as[String].collect().sorted.toSeq ==
      Seq("+I", "+I", "-D", "-D"))
    val mxw = CdcFormats.maxwellJson(
      rows.select(CdcFormats.toMaxwellJson(r, col("k")).as("json")),
      col("json"), physical)
    assert(mxw.select("__rowkind").as[String].collect().sorted.toSeq ==
      Seq("+I", "+I", "-D", "-D"))
    // Values survive the JSON round trip bit-exactly.
    assert(dbz.filter(col("__rowkind") === "+I").select("v")
      .as[Double].collect().sorted.toSeq == Seq(1.5, 2.5))
  }
}
