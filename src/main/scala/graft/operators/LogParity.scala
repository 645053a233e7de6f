package graft.operators

import java.nio.file.{Files, Paths}
import java.util.Comparator

import graft.{OracleSafe, QueryModule, Tables}
import graft.sources.LogSource
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Partitioned-log connector parity (§2.1 connectors): Kafka-shaped
  * semantics — per-partition monotone offsets, segment-rolled
  * append-only storage, partitioned parallel reads — proven without a
  * broker (the reference's KafkaDynamicSource,
  * flink-connectors/flink-connector-kafka/.../table/KafkaDynamicSource.java:74,
  * is env-blocked: no egress). Parquet truth is materialized into a
  * log directory (one immutable segment per log partition, records
  * sorted by key so offsets are deterministic), read back through the
  * `graft-log` DSv2 source, parsed, and aggregated — the DuckDB
  * oracle on the original parquet reproduces even the offsets via
  * row_number, so the hash check covers the whole round trip
  * including offset assignment. Streaming/restart semantics are
  * driven in LogSourceSpec (no SQL oracle for a kill/resume).
  */
object LogParity extends QueryModule {
  import OracleSafe._

  /** Deterministic scratch dir per (query, sf dir); wiped per seed. */
  private def scratch(name: String, dir: String): String = {
    val p = Paths.get(System.getProperty("java.io.tmpdir"),
      s"graft-log-${name}_" + dir.replaceAll("[^A-Za-z0-9]", "_"))
    if (Files.exists(p)) {
      Files.walk(p).sorted(Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(f => Files.delete(f))
    }
    p.toString
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Log roundtrip: orders → 4 log partitions (o_orderkey % 4, one
    // segment each, key-sorted so offset = per-partition key rank) →
    // graft-log batch read → parse "key|status|price" → aggregate.
    // sum_off folds the assigned offsets into the checked result.
    // Seeding collects each log partition's lines onto one executor
    // task — harness materialization (like JdbcParity's Derby load),
    // not the 100 TB write path.
    "kfk01_log_roundtrip" -> { (s, dir) =>
      import s.implicits._
      val base = scratch("kfk01", dir)
      val lines = Tables.load(s, dir, "orders")
        .select(pmod(col("o_orderkey"), lit(4)).cast("int").as("p"),
          col("o_orderkey"),
          concat_ws("|", col("o_orderkey"), col("o_orderstatus"),
            col("o_totalprice")).as("line"))
        .as[(Int, Long, String)]
      lines.groupByKey(_._1).mapGroups { (p, it) =>
        val recs = it.toSeq.sortBy(_._2).map(_._3)
        LogSource.append(base, p, recs)
        p -> recs.size
      }.collect()
      s.read.format("graft-log").option("path", base).load()
        .select(col("partition").as("part_id"), col("offset"),
          split(col("value"), "\\|").as("f"))
        .select(col("part_id"), col("offset"),
          col("f").getItem(1).as("o_orderstatus"),
          col("f").getItem(2).cast("double").as("o_totalprice"))
        .groupBy(col("part_id"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"),
          dsum(col("o_totalprice")).as("sum_price"),
          sum(col("offset")).cast("long").as("sum_off"))
        .orderBy("part_id", "o_orderstatus")
    },

    // The WRITE half: the same truth goes through LogSource.write —
    // the distributed sink with task-commit staging and commit-time
    // offset assignment (the KafkaDynamicSink discipline: the log, not
    // the writer, owns offsets). Routing repartitions by the partition
    // column and sorts within tasks by key, so assigned offsets are
    // again the per-partition key rank and the SAME oracle shape
    // checks the write→read round trip bit-for-bit.
    "kfk02_log_sink_roundtrip" -> { (s, dir) =>
      val base = scratch("kfk02", dir)
      val src = Tables.load(s, dir, "orders")
        .select(pmod(col("o_orderkey"), lit(4)).cast("int").as("partition"),
          col("o_orderkey").as("k"),
          concat_ws("|", col("o_orderkey"), col("o_orderstatus"),
            col("o_totalprice")).as("value"))
      LogSource.write(
        src.repartition(4, col("partition"))
          .sortWithinPartitions(col("partition"), col("k"))
          .select("partition", "value"),
        base)
      s.read.format("graft-log").option("path", base).load()
        .select(col("partition").as("part_id"), col("offset"),
          split(col("value"), "\\|").as("f"))
        .select(col("part_id"), col("offset"),
          col("f").getItem(1).as("o_orderstatus"),
          col("f").getItem(2).cast("double").as("o_totalprice"))
        .groupBy(col("part_id"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"),
          dsum(col("o_totalprice")).as("sum_price"),
          sum(col("offset")).cast("long").as("sum_off"))
        .orderBy("part_id", "o_orderstatus")
    }
  )

  override def oracleSql: Map[String, String] = Map(
    "kfk01_log_roundtrip" -> s"""
      WITH src AS (
        SELECT CAST(o_orderkey % 4 AS INT) AS part_id, o_orderstatus,
               o_totalprice,
               row_number() OVER (PARTITION BY o_orderkey % 4
                 ORDER BY o_orderkey) - 1 AS off
        FROM orders)
      SELECT part_id, o_orderstatus, count(1) AS n_orders,
             ${dsumSql("o_totalprice")} AS sum_price,
             CAST(sum(off) AS BIGINT) AS sum_off
      FROM src GROUP BY 1, 2 ORDER BY 1, 2""",

    // Identical oracle to kfk01: the sink's commit-time offsets must
    // reproduce the same per-partition key ranks.
    "kfk02_log_sink_roundtrip" -> s"""
      WITH src AS (
        SELECT CAST(o_orderkey % 4 AS INT) AS part_id, o_orderstatus,
               o_totalprice,
               row_number() OVER (PARTITION BY o_orderkey % 4
                 ORDER BY o_orderkey) - 1 AS off
        FROM orders)
      SELECT part_id, o_orderstatus, count(1) AS n_orders,
             ${dsumSql("o_totalprice")} AS sum_price,
             CAST(sum(off) AS BIGINT) AS sum_off
      FROM src GROUP BY 1, 2 ORDER BY 1, 2"""
  )
}
