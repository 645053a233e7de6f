package graft.operators

import graft.{OracleSafe, QueryModule, Tables}
import graft.sources.JdbcConnector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** JDBC connector parity (§2.1 connectors): the reference's
  * JdbcDynamicTableSource/Sink (flink-connectors/flink-connector-jdbc)
  * driven end-to-end against the embedded Derby database that ships
  * with Spark — parquet truth is materialized into Derby, then read
  * back through the connector paths (partitioned scan / per-partition
  * lookup / keyed upsert), so the DuckDB oracle on the original
  * parquet checks the whole round trip.
  */
object JdbcParity extends QueryModule {
  import OracleSafe._

  private def derby(db: String, dir: String): Map[String, String] = Map(
    "url" -> s"jdbc:derby:memory:${db}_${dir.replaceAll("[^A-Za-z0-9]", "_")};create=true",
    "driver" -> "org.apache.derby.jdbc.EmbeddedDriver")

  private def lowered(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(_.toLowerCase): _*)

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Partitioned scan roundtrip: supplier → Derby → read back through
    // the connector with scan.partition.* (the reference's
    // JdbcNumericBetweenParametersProvider BETWEEN splits), join
    // nation, aggregate. The scan comes back in 4 range partitions —
    // no single-connection bottleneck at scale.
    "jdbc01_jdbc_scan" -> { (s, dir) =>
      val opts = derby("jdbc01", dir) + ("table-name" -> "supplier")
      JdbcConnector.overwriteTable(
        Tables.load(s, dir, "supplier"), opts, primaryKey = Seq("s_suppkey"))
      val sup = lowered(JdbcConnector.read(s, opts ++ Map(
        "scan.partition.column" -> "s_suppkey",
        "scan.partition.num" -> "4",
        "scan.partition.lower-bound" -> "0",
        "scan.partition.upper-bound" -> "1000000")))
      sup.join(broadcast(Tables.load(s, dir, "nation")),
          sup("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_suppliers"), dsum(col("s_acctbal")).as("sum_bal"))
        .orderBy("n_name")
    },

    // Lookup join against the database: nation lives in Derby; each
    // events partition opens one connection + prepared statement
    // (JdbcRowDataLookupFunction) behind LookupJoin's LRU cache.
    // Probe key user_id % 30 leaves keys 25-29 unmatched to exercise
    // the miss path.
    "jdbc02_jdbc_lookup" -> { (s, dir) =>
      import s.implicits._
      val opts = derby("jdbc02", dir) + ("table-name" -> "nation")
      JdbcConnector.overwriteTable(
        Tables.load(s, dir, "nation"), opts, primaryKey = Seq("n_nationkey"))
      val e = Tables.load(s, dir, "events")
        .select(col("event_id"), col("user_id")).as[(Long, Long)]
      LookupJoin.lookup[(Long, Long), Int, String](
          e, r => (r._2 % 30).toInt,
          JdbcConnector.lookupProbe[Int, String](
            opts, "n_nationkey", Seq("n_name"), _.getString(1)),
          cacheSize = 1000)
        .map { case ((eid, uid), name) => (eid, uid, name.getOrElse("unknown")) }
        .toDF("event_id", "user_id", "n_name")
        .orderBy("event_id")
    },

    // Changelog upsert: events become a +U/-D changelog keyed by
    // user_id; upsertChangelog applies the keyed-exchange + reduced
    // buffer (TableBufferReducedStatementExecutor) into Derby; the
    // final table state read back must equal the oracle's
    // last-operation-per-key view.
    "jdbc03_jdbc_upsert" -> { (s, dir) =>
      val opts = derby("jdbc03", dir) + ("table-name" -> "user_state")
      val changelog = Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("tus"),
          when(col("event_type") === "error", "-D").otherwise("+U").as("__rowkind"))
      JdbcConnector.dropTableIfExists(opts)
      JdbcConnector.createTable(opts,
        org.apache.spark.sql.types.StructType.fromDDL(
          "user_id bigint, event_id bigint, tus bigint"),
        primaryKey = Seq("user_id"))
      JdbcConnector.upsertChangelog(changelog, opts,
        keyCols = Seq("user_id"), orderCols = Seq("tus", "event_id"),
        rowkindCol = Some("__rowkind"))
      lowered(JdbcConnector.read(s, opts))
        .select("user_id", "event_id", "tus")
        .orderBy("user_id")
    }
  )

  override def oracleSql: Map[String, String] = Map(
    "jdbc01_jdbc_scan" -> s"""
      SELECT n_name, count(1) AS n_suppliers,
             ${dsumSql("s_acctbal")} AS sum_bal
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
      GROUP BY n_name
      ORDER BY n_name""",

    "jdbc02_jdbc_lookup" -> """
      SELECT event_id, user_id, coalesce(n_name, 'unknown') AS n_name
      FROM events LEFT JOIN nation ON user_id % 30 = n_nationkey
      ORDER BY event_id""",

    "jdbc03_jdbc_upsert" -> """
      SELECT user_id, event_id, tus FROM (
        SELECT user_id, event_id, epoch_us(ts) AS tus,
          CASE WHEN event_type = 'error' THEN '-D' ELSE '+U' END AS k,
          row_number() OVER (PARTITION BY user_id
                             ORDER BY ts DESC, event_id DESC) AS rn
        FROM events)
      WHERE rn = 1 AND k <> '-D'
      ORDER BY user_id"""
  )
}
