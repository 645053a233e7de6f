package graft.operators

import graft.{OracleSafe, QueryModule, Tables}
import graft.sources.CdcFormats
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType}

/** CDC format parity (§1.1/§2.1): the reference's flink-json changelog
  * formats — debezium-json, canal-json, maxwell-json — driven end to
  * end: deterministic change events are built FROM the parquet truth,
  * serialized to the wire JSON, parsed back through CdcFormats into
  * `__rowkind` rows, and the emitted changelog (and, for cdc02, the
  * ChangelogNormalize'd final state) is aggregated. The DuckDB oracle
  * recomputes the same aggregates directly from the base table, so the
  * hash check covers envelope construction, JSON round trip, op→kind
  * mapping, partial-`old` merge, and normalize ordering.
  *
  * Event script (shared by all four): every order is inserted; every
  * 'O'-status order is updated (status→'F', price×1.1); a keyed subset
  * is deleted carrying its then-current image.
  */
object CdcParity extends QueryModule {
  import OracleSafe._

  private[graft] val physical = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType)))

  private def base(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"))

  private def row(k: Column, st: Column, p: Column): Column =
    struct(k.as("o_orderkey"), st.as("o_orderstatus"), p.as("o_totalprice"))

  /** The per-order debezium event stream: seq 1 = c, seq 2 = u (status
    * 'O' only), seq 3 = d (o_orderkey%10==0, current image as before).
    */
  private[graft] def debeziumEvents(s: SparkSession, dir: String): DataFrame = {
    val b = base(s, dir)
    val orig = row(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val updated = row(col("o_orderkey"), lit("F"), col("o_totalprice") * 1.1)
    val current = row(col("o_orderkey"),
      when(col("o_orderstatus") === "O", "F").otherwise(col("o_orderstatus")),
      when(col("o_orderstatus") === "O", col("o_totalprice") * 1.1)
        .otherwise(col("o_totalprice")))
    val inserts = b.select(col("o_orderkey").as("k"), lit(1).as("seq"),
      CdcFormats.toDebeziumJson(orig, lit("+I")).as("json"))
    val updates = b.filter(col("o_orderstatus") === "O")
      .select(col("o_orderkey").as("k"), lit(2).as("seq"),
        to_json(struct(orig.as("before"), updated.as("after"),
          lit("u").as("op"))).as("json"))
    val deletes = b.filter(col("o_orderkey") % 10 === 0)
      .select(col("o_orderkey").as("k"), lit(3).as("seq"),
        to_json(struct(current.as("before"), lit("d").as("op"))).as("json"))
    inserts.unionAll(updates).unionAll(deletes)
  }

  private def kindAgg(parsed: DataFrame): DataFrame =
    parsed.groupBy(col("__rowkind"))
      .agg(count(lit(1)).as("n"),
        dsum(col("o_totalprice")).as("sum_price"),
        sum(col("o_orderkey")).cast("long").as("sum_key"))
      .orderBy("__rowkind")

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Raw changelog emission: op c → +I, u → -U/+U pair, d → -D.
    "cdc01_debezium_changelog" -> { (s, dir) =>
      kindAgg(CdcFormats.debeziumJson(debeziumEvents(s, dir), col("json"), physical))
    },

    // Full pipeline: parse → ChangelogNormalize (keep latest image per
    // key in (seq, kind-rank) order, drop keys whose latest is -D) →
    // final-state aggregate. StreamExecChangelogNormalize semantics on
    // a CDC-format source.
    "cdc02_debezium_normalize" -> { (s, dir) =>
      val parsed = CdcFormats.debeziumJson(debeziumEvents(s, dir), col("json"), physical)
      val kindRank = when(col("__rowkind") === "+I", 0)
        .when(col("__rowkind") === "-U", 1)
        .when(col("__rowkind") === "+U", 2).otherwise(3)
      ChangelogOps.normalize(parsed, Seq(col("o_orderkey")),
          Seq(col("seq"), kindRank), col("__rowkind"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
        .orderBy("o_orderstatus")
    },

    // Canal: batched data/old arrays per custkey, partial `old` rows
    // (only o_totalprice set) exercising the merge-from-new-row rule,
    // plus a CREATE DDL event that must be skipped.
    "cdc03_canal_batch" -> { (s, dir) =>
      import s.implicits._
      val rows = base(s, dir)
        .groupBy(col("o_custkey"))
        .agg(sort_array(collect_list(row(col("o_orderkey"),
          col("o_orderstatus"), col("o_totalprice")))).as("rs"))
      val inserts = rows.select(col("o_custkey"), lit(1).as("seq"),
        to_json(struct(col("rs").as("data"), lit("INSERT").as("type"))).as("json"))
      val ors = filter(col("rs"), r => r.getField("o_orderstatus") === "O")
      val updates = rows.withColumn("ors", ors).filter(size(col("ors")) > 0)
        .select(col("o_custkey"), lit(2).as("seq"),
          to_json(struct(
            transform(col("ors"), r => row(r.getField("o_orderkey"), lit("F"),
              r.getField("o_totalprice") * 1.1)).as("data"),
            transform(col("ors"), r => row(lit(null).cast("bigint"),
              lit(null).cast("string"), r.getField("o_totalprice"))).as("old"),
            lit("UPDATE").as("type"))).as("json"))
      val deletes = rows.filter(col("o_custkey") % 7 === 0)
        .select(col("o_custkey"), lit(3).as("seq"),
          to_json(struct(
            transform(col("rs"), r => row(r.getField("o_orderkey"),
              when(r.getField("o_orderstatus") === "O", "F")
                .otherwise(r.getField("o_orderstatus")),
              when(r.getField("o_orderstatus") === "O",
                r.getField("o_totalprice") * 1.1)
                .otherwise(r.getField("o_totalprice")))).as("data"),
            lit("DELETE").as("type"))).as("json"))
      val ddl = Seq((-1L, 0, """{"data":null,"type":"CREATE"}"""))
        .toDF("o_custkey", "seq", "json")
      val events = inserts.unionAll(updates).unionAll(deletes).unionAll(ddl)
      kindAgg(CdcFormats.canalJson(events, col("json"), physical))
    },

    // Maxwell: single-row data/old with a partial `old` carrying only
    // the changed o_orderstatus; deletes carry the current image.
    "cdc04_maxwell" -> { (s, dir) =>
      val b = base(s, dir)
      val orig = row(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val updated = row(col("o_orderkey"), lit("F"), col("o_totalprice"))
      val current = row(col("o_orderkey"),
        when(col("o_orderstatus") === "P", "F").otherwise(col("o_orderstatus")),
        col("o_totalprice"))
      val partialOld = row(lit(null).cast("bigint"), col("o_orderstatus"),
        lit(null).cast("double"))
      val inserts = b.select(col("o_orderkey").as("k"), lit(1).as("seq"),
        CdcFormats.toMaxwellJson(orig, lit("+I")).as("json"))
      val updates = b.filter(col("o_orderstatus") === "P")
        .select(col("o_orderkey").as("k"), lit(2).as("seq"),
          to_json(struct(updated.as("data"), partialOld.as("old"),
            lit("update").as("type"))).as("json"))
      val deletes = b.filter(col("o_orderkey") % 7 === 0)
        .select(col("o_orderkey").as("k"), lit(3).as("seq"),
          to_json(struct(current.as("data"), lit("delete").as("type"))).as("json"))
      kindAgg(CdcFormats.maxwellJson(
        inserts.unionAll(updates).unionAll(deletes), col("json"), physical))
    },

    // Canal READABLE METADATA + pkNames-driven key selection
    // (CanalJsonDecodingFormat.ReadableMetadata): every event carries
    // database/table/pkNames/ts; the normalize key is NOT hard-coded —
    // it is extracted from the stream's pkNames declaration
    // (CdcFormats.canalPkNames), exactly how the reference's planner
    // keys ChangelogNormalize off the format metadata when the DDL
    // declares no PRIMARY KEY. Event script = cdc02's (insert all,
    // update 'O' rows to ('F', price*1.1), delete key%10==0), so the
    // final state matches the cdc02 oracle; the metadata columns ride
    // into the aggregate to prove they decode.
    "cdc05_canal_pknames" -> { (s, dir) =>
      val b = base(s, dir)
      val orig = row(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val updated = row(col("o_orderkey"), lit("F"), col("o_totalprice") * 1.1)
      val current = row(col("o_orderkey"),
        when(col("o_orderstatus") === "O", "F").otherwise(col("o_orderstatus")),
        when(col("o_orderstatus") === "O", col("o_totalprice") * 1.1)
          .otherwise(col("o_totalprice")))
      def meta(seq: Int) = Seq(
        lit("ordersdb").as("database"), lit("orders").as("table"),
        array(lit("o_orderkey")).as("pkNames"),
        (col("o_orderkey") * 10 + seq).as("ts"))
      val inserts = b.select(col("o_orderkey").as("k"), lit(1).as("seq"),
        to_json(struct(Seq(array(orig).as("data"),
          lit("INSERT").as("type")) ++ meta(1): _*)).as("json"))
      val updates = b.filter(col("o_orderstatus") === "O")
        .select(col("o_orderkey").as("k"), lit(2).as("seq"),
          to_json(struct(Seq(array(updated).as("data"),
            array(row(lit(null).cast("bigint"), col("o_orderstatus"),
              col("o_totalprice"))).as("old"),
            lit("UPDATE").as("type")) ++ meta(2): _*)).as("json"))
      val deletes = b.filter(col("o_orderkey") % 10 === 0)
        .select(col("o_orderkey").as("k"), lit(3).as("seq"),
          to_json(struct(Seq(array(current).as("data"),
            lit("DELETE").as("type")) ++ meta(3): _*)).as("json"))
      val parsed = CdcFormats.canalJson(
        inserts.unionAll(updates).unionAll(deletes), col("json"), physical,
        withMetadata = true)
      val pk = CdcFormats.canalPkNames(parsed)
      val kindRank = when(col("__rowkind") === "+I", 0)
        .when(col("__rowkind") === "-U", 1)
        .when(col("__rowkind") === "+U", 2).otherwise(3)
      ChangelogOps.normalize(parsed, pk.map(col), Seq(col("seq"), kindRank),
          col("__rowkind"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"),
          count_distinct(col("__table")).cast("long").as("n_tables"),
          max(col("__db")).as("db"),
          max(col("__ingest_ts") - col("o_orderkey") * 10).as("max_seq"))
        .orderBy("o_orderstatus")
    }
  )

  override def oracleSql: Map[String, String] = Map(
    "cdc01_debezium_changelog" -> s"""
      WITH b AS (SELECT o_orderkey AS k, o_orderstatus AS st,
                        o_totalprice AS p FROM orders)
      SELECT * FROM (
        SELECT '+I' AS __rowkind, count(1) AS n, ${dsumSql("p")} AS sum_price,
               CAST(sum(k) AS BIGINT) AS sum_key FROM b
        UNION ALL
        SELECT '+U', count(1), ${dsumSql("p * 1.1")},
               CAST(sum(k) AS BIGINT) FROM b WHERE st = 'O'
        UNION ALL
        SELECT '-D', count(1),
               ${dsumSql("CASE WHEN st = 'O' THEN p * 1.1 ELSE p END")},
               CAST(sum(k) AS BIGINT) FROM b WHERE k % 10 = 0
        UNION ALL
        SELECT '-U', count(1), ${dsumSql("p")},
               CAST(sum(k) AS BIGINT) FROM b WHERE st = 'O'
      ) ORDER BY __rowkind""",

    "cdc02_debezium_normalize" -> s"""
      WITH fin AS (
        SELECT CASE WHEN o_orderstatus = 'O' THEN 'F' ELSE o_orderstatus END AS st,
               CASE WHEN o_orderstatus = 'O' THEN o_totalprice * 1.1
                    ELSE o_totalprice END AS p
        FROM orders WHERE o_orderkey % 10 <> 0)
      SELECT st AS o_orderstatus, count(1) AS n, ${dsumSql("p")} AS sum_price
      FROM fin GROUP BY 1 ORDER BY 1""",

    "cdc03_canal_batch" -> s"""
      WITH b AS (SELECT o_orderkey AS k, o_custkey AS c, o_orderstatus AS st,
                        o_totalprice AS p FROM orders)
      SELECT * FROM (
        SELECT '+I' AS __rowkind, count(1) AS n, ${dsumSql("p")} AS sum_price,
               CAST(sum(k) AS BIGINT) AS sum_key FROM b
        UNION ALL
        SELECT '+U', count(1), ${dsumSql("p * 1.1")},
               CAST(sum(k) AS BIGINT) FROM b WHERE st = 'O'
        UNION ALL
        SELECT '-D', count(1),
               ${dsumSql("CASE WHEN st = 'O' THEN p * 1.1 ELSE p END")},
               CAST(sum(k) AS BIGINT) FROM b WHERE c % 7 = 0
        UNION ALL
        SELECT '-U', count(1), ${dsumSql("p")},
               CAST(sum(k) AS BIGINT) FROM b WHERE st = 'O'
      ) ORDER BY __rowkind""",

    "cdc04_maxwell" -> s"""
      WITH b AS (SELECT o_orderkey AS k, o_orderstatus AS st,
                        o_totalprice AS p FROM orders)
      SELECT * FROM (
        SELECT '+I' AS __rowkind, count(1) AS n, ${dsumSql("p")} AS sum_price,
               CAST(sum(k) AS BIGINT) AS sum_key FROM b
        UNION ALL
        SELECT '+U', count(1), ${dsumSql("p")},
               CAST(sum(k) AS BIGINT) FROM b WHERE st = 'P'
        UNION ALL
        SELECT '-D', count(1), ${dsumSql("p")},
               CAST(sum(k) AS BIGINT) FROM b WHERE k % 7 = 0
        UNION ALL
        SELECT '-U', count(1), ${dsumSql("p")},
               CAST(sum(k) AS BIGINT) FROM b WHERE st = 'P'
      ) ORDER BY __rowkind""",

    // Final state equals cdc02's; metadata adds the constant db/table
    // and the per-key winning sequence (2 where an update superseded
    // the insert — every 'F' group has one — else 1).
    "cdc05_canal_pknames" -> s"""
      WITH fin AS (
        SELECT CASE WHEN o_orderstatus = 'O' THEN 'F' ELSE o_orderstatus END AS st,
               CASE WHEN o_orderstatus = 'O' THEN o_totalprice * 1.1
                    ELSE o_totalprice END AS p,
               CASE WHEN o_orderstatus = 'O' THEN 2 ELSE 1 END AS seq
        FROM orders WHERE o_orderkey % 10 <> 0)
      SELECT st AS o_orderstatus, count(1) AS n, ${dsumSql("p")} AS sum_price,
             CAST(1 AS BIGINT) AS n_tables, 'ordersdb' AS db,
             CAST(max(seq) AS BIGINT) AS max_seq
      FROM fin GROUP BY 1 ORDER BY 1""")
}
