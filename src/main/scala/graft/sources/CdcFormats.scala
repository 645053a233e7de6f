package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** CDC changelog formats (SURVEY.md §1.1/§2.1): parse Debezium / Canal /
  * Maxwell JSON change events into `__rowkind`-tagged rows, and encode
  * rows back out — the reference's flink-json CDC format family:
  *
  *  - debezium-json: `flink-formats/flink-json/src/main/java/org/apache/
  *    flink/formats/json/debezium/DebeziumJsonDeserializationSchema.java:125`
  *    — envelope `{before, after, op}`; op c/r → +I(after),
  *    u → -U(before) then +U(after), d → -D(before); optional
  *    `{payload: ...}` wrapper (`schemaInclude`), tombstones skipped.
  *  - canal-json: `.../canal/CanalJsonDeserializationSchema.java:229` —
  *    envelope `{data: [...], old: [...], type}`; INSERT → +I per data
  *    row, UPDATE → (-U, +U) per (old, data) pair where fields absent
  *    from `old` are copied from the new row, DELETE → -D per data row,
  *    CREATE (DDL) skipped.
  *  - maxwell-json: `.../maxwell/MaxwellJsonDeserializationSchema.java:127`
  *    — single-row `{data, old, type}` with the same partial-`old`
  *    merge on update.
  *
  * All parsing is declarative (`from_json` + `explode`/`transform`/
  * `zip_with`), so the whole decode stays inside whole-stage codegen and
  * scales as a stateless map — no per-row Scala. At 100 TB the format
  * decode is a pure narrow stage fused into the scan.
  *
  * Deviation (documented): the reference distinguishes an explicit JSON
  * `null` in `old` (a genuine null before-value) from an absent field
  * (unchanged, copy from new row) by re-inspecting the raw JSON tree.
  * `from_json` yields null for both, so here an explicit null in `old`
  * is treated as "unchanged". Flink's own behavior for absent fields is
  * reproduced exactly.
  */
object CdcFormats {

  private val Kind = "__rowkind"

  /** Emitted element type: the physical row plus its changelog kind. */
  private def entry(row: Column, kind: String): Column =
    struct(row.as("row"), lit(kind).as(Kind))

  private def entryc(row: Column, kind: Column): Column =
    struct(row.as("row"), kind.as(Kind))

  /** before-image merge for canal/maxwell partial `old` rows: fields
    * null in `old` are unchanged — take them from the new row.
    */
  private def mergeOld(old: Column, data: Column, physical: StructType): Column =
    struct(physical.fields.map(f =>
      coalesce(old.getField(f.name), data.getField(f.name)).as(f.name)): _*)

  private def finish(df: DataFrame, emitted: Column): DataFrame = {
    val passthrough = df.columns.map(col)
    df.select(passthrough :+ explode(emitted).as("__cdc"): _*)
      .select(passthrough :+ col("__cdc.row.*") :+ col("__cdc." + Kind): _*)
  }

  /** Parse a Debezium-JSON column. Keeps every other column of `df` as
    * passthrough (e.g. a sequence/offset column for downstream
    * ChangelogOps.normalize ordering) and appends the physical fields
    * plus `__rowkind`. Null/empty messages (tombstones) and, when
    * `ignoreParseErrors`, unknown ops produce no rows; in strict mode an
    * unknown op raises.
    */
  /** `withMetadata` surfaces the reference's debezium READABLE
    * METADATA (DebeziumJsonDecodingFormat.ReadableMetadata,
    * flink-formats/flink-json .../debezium/DebeziumJsonDecodingFormat.java:126-233):
    * `__ingest_ts` (envelope ts_ms), `__src_props` (the `source` map,
    * parsed MAP<STRING,STRING> exactly like the reference), and the
    * derived `__src_ts` / `__db` / `__src_schema` / `__table`
    * (source.ts_ms/db/schema/table lookups — the same map-key reads
    * the reference's converters do).
    */
  def debeziumJson(df: DataFrame, jsonCol: Column, physical: StructType,
                   schemaInclude: Boolean = false,
                   ignoreParseErrors: Boolean = false,
                   withMetadata: Boolean = false): DataFrame = {
    val metaFields = Seq(
      StructField("ts_ms", org.apache.spark.sql.types.LongType),
      StructField("source", org.apache.spark.sql.types.MapType(
        StringType, StringType)))
    val envelope = StructType(Seq(
      StructField("before", physical), StructField("after", physical),
      StructField("op", StringType)) ++
      (if (withMetadata) metaFields else Nil))
    val schema =
      if (schemaInclude) StructType(Seq(StructField("payload", envelope)))
      else envelope
    val m0 = from_json(jsonCol, schema)
    val m = if (schemaInclude) m0.getField("payload") else m0
    val before = m.getField("before")
    val after = m.getField("after")
    val op = m.getField("op")
    val known = when(op.isin("c", "r"), array(entry(after, "+I")))
      .when(op === "u", array(entry(before, "-U"), entry(after, "+U")))
      .when(op === "d", array(entry(before, "-D")))
    val emitted =
      if (ignoreParseErrors) known
      else when(op.isNotNull && !op.isin("c", "r", "u", "d"),
        raise_error(concat(lit("Unknown debezium op: "), op))).otherwise(known)
    val base =
      if (!withMetadata) df
      else {
        val src = m.getField("source")
        df.withColumn("__ingest_ts", m.getField("ts_ms"))
          .withColumn("__src_props", src)
          .withColumn("__src_ts", element_at(src, "ts_ms").cast("long"))
          .withColumn("__db", element_at(src, "db"))
          .withColumn("__src_schema", element_at(src, "schema"))
          .withColumn("__table", element_at(src, "table"))
      }
    finish(base, emitted)
  }

  /** Parse a Canal-JSON column (batched `data`/`old` arrays).
    *
    * `withMetadata` additionally surfaces the envelope's READABLE
    * METADATA (reference `CanalJsonDecodingFormat.ReadableMetadata`,
    * flink-formats/flink-json .../canal/CanalJsonDecodingFormat.java:135-200):
    * `__db` (database), `__table`, `__pk_names` (array — canal's
    * per-message primary-key declaration, which drives
    * ChangelogNormalize key selection downstream, see
    * [[canalPkNames]]), and `__ingest_ts` (canal's `ts`, epoch ms).
    */
  def canalJson(df: DataFrame, jsonCol: Column, physical: StructType,
                ignoreParseErrors: Boolean = false,
                withMetadata: Boolean = false): DataFrame = {
    val metaFields = Seq(
      StructField("database", StringType), StructField("table", StringType),
      StructField("pkNames", org.apache.spark.sql.types.ArrayType(StringType)),
      StructField("ts", org.apache.spark.sql.types.LongType))
    val envelope = StructType(Seq(
      StructField("data", org.apache.spark.sql.types.ArrayType(physical)),
      StructField("old", org.apache.spark.sql.types.ArrayType(physical)),
      StructField("type", StringType)) ++
      (if (withMetadata) metaFields else Nil))
    val m = from_json(jsonCol, envelope)
    val data = m.getField("data")
    val old = m.getField("old")
    val typ = m.getField("type")
    val known = when(typ === "INSERT", transform(data, r => entry(r, "+I")))
      .when(typ === "UPDATE",
        flatten(zip_with(data, old, (a, o) =>
          array(entry(mergeOld(o, a, physical), "-U"), entry(a, "+U")))))
      .when(typ === "DELETE", transform(data, r => entry(r, "-D")))
    // CREATE/other DDL types → null → explode drops the event.
    val emitted =
      if (ignoreParseErrors) known
      else when(typ.isNotNull && !typ.isin("INSERT", "UPDATE", "DELETE", "CREATE"),
        raise_error(concat(lit("Unknown canal type: "), typ))).otherwise(known)
    val base =
      if (!withMetadata) df
      else df.withColumn("__db", m.getField("database"))
        .withColumn("__table", m.getField("table"))
        .withColumn("__pk_names", m.getField("pkNames"))
        .withColumn("__ingest_ts", m.getField("ts"))
    finish(base, emitted)
  }

  /** Canal's `pkNames`-declared primary key, extracted from a decoded
    * (withMetadata) canal frame — the key ChangelogNormalize keys on
    * when the table DDL declares none (the reference planner reads it
    * off the format's `pk-names` metadata column). One
    * metadata-discovery lookup of a single row — table-level metadata,
    * not a corpus-scale collect; fails loudly on a pk-less stream.
    */
  def canalPkNames(decoded: DataFrame): Seq[String] = {
    val r = decoded.select(col("__pk_names"))
      .where(col("__pk_names").isNotNull).limit(1).collect()
    require(r.nonEmpty, "canal stream carries no pkNames metadata")
    r(0).getSeq[String](0)
  }

  /** Parse a Maxwell-JSON column (single-row `data`/`old`).
    *
    * `withMetadata` surfaces the reference's maxwell READABLE METADATA
    * (MaxwellJsonDecodingFormat.ReadableMetadata:126-167): `__db`
    * (database), `__table`, `__pk_names` (primary_key_columns), and
    * `__ingest_ts` (maxwell's `ts`, epoch seconds).
    */
  def maxwellJson(df: DataFrame, jsonCol: Column, physical: StructType,
                  ignoreParseErrors: Boolean = false,
                  withMetadata: Boolean = false): DataFrame = {
    val metaFields = Seq(
      StructField("database", StringType), StructField("table", StringType),
      StructField("primary_key_columns",
        org.apache.spark.sql.types.ArrayType(StringType)),
      StructField("ts", org.apache.spark.sql.types.LongType))
    val envelope = StructType(Seq(
      StructField("data", physical), StructField("old", physical),
      StructField("type", StringType)) ++
      (if (withMetadata) metaFields else Nil))
    val m = from_json(jsonCol, envelope)
    val data = m.getField("data")
    val old = m.getField("old")
    val typ = m.getField("type")
    val known = when(typ === "insert", array(entry(data, "+I")))
      .when(typ === "update",
        array(entry(mergeOld(old, data, physical), "-U"), entry(data, "+U")))
      .when(typ === "delete", array(entry(data, "-D")))
    val emitted =
      if (ignoreParseErrors) known
      else when(typ.isNotNull && !typ.isin("insert", "update", "delete", "bootstrap-start", "bootstrap-complete"),
        raise_error(concat(lit("Unknown maxwell type: "), typ))).otherwise(known)
    val base =
      if (!withMetadata) df
      else df.withColumn("__db", m.getField("database"))
        .withColumn("__table", m.getField("table"))
        .withColumn("__pk_names", m.getField("primary_key_columns"))
        .withColumn("__ingest_ts", m.getField("ts"))
    finish(base, emitted)
  }

  /** Encode rows to Debezium JSON — the sink half
    * (`DebeziumJsonSerializationSchema.java:75`): +I/+U → `{after, op:"c"}`,
    * -U/-D → `{before, op:"d"}`. Null envelope halves are omitted from
    * the JSON (from_json reads them back as null), matching Debezium's
    * missing-side convention.
    */
  def toDebeziumJson(row: Column, kind: Column): Column = {
    val upsert = kind.isin("+I", "+U")
    to_json(struct(
      when(!upsert, row).as("before"),
      when(upsert, row).as("after"),
      when(upsert, lit("c")).otherwise(lit("d")).as("op")))
  }

  /** Encode rows to Canal JSON (`CanalJsonSerializationSchema.java:73`):
    * +I/+U → `{data: [row], type: "INSERT"}`, -U/-D → `{data: [row],
    * type: "DELETE"}` — Canal's sink side never emits `old`.
    */
  def toCanalJson(row: Column, kind: Column): Column = {
    val upsert = kind.isin("+I", "+U")
    to_json(struct(
      array(row).as("data"),
      when(upsert, lit("INSERT")).otherwise(lit("DELETE")).as("type")))
  }

  /** Encode rows to Maxwell JSON (`MaxwellJsonSerializationSchema.java:68`):
    * +I/+U → `{data, type: "insert"}`, -U/-D → `{data, type: "delete"}`.
    */
  def toMaxwellJson(row: Column, kind: Column): Column = {
    val upsert = kind.isin("+I", "+U")
    to_json(struct(
      row.as("data"),
      when(upsert, lit("insert")).otherwise(lit("delete")).as("type")))
  }
}
