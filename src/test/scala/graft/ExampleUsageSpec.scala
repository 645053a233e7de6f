package graft

import graft.cep.{Nfa, PatternDsl}
import graft.operators.{Dedup, TextOps}
import graft.streaming.GraftStream
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Executable end-to-end examples of the migration surface: what a user
  * of the reference engine writes after switching — SQL through the
  * table environment, a typed DataStream pipeline, CEP via the fluent
  * pattern builder, and a near-dup dedup pass. Doubles as documentation
  * (referenced from README) and as proof the pieces compose.
  */
class ExampleUsageSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(4)
  import spark.implicits._

  test("example: SQL analytics through the table environment") {
    val env = GraftTableEnvironment.create(spark)
    env.registerTestTables("/root/testdata/sf0.001")
    val top = env.sqlQuery("""
      SELECT c_mktsegment, count(1) AS n,
             count(DISTINCT split_index(c_name, '#', 1)) AS n_ids
      FROM customer
      GROUP BY c_mktsegment
      ORDER BY n DESC LIMIT 5""")
    assert(top.count() == 5) // dialect functions work inside Spark SQL
  }

  test("example: Flink DDL end-to-end — create, query, clean text, drop") {
    val env = GraftTableEnvironment.create(spark)
    // the full Flink CREATE TABLE dialect, including a computed column
    env.executeSql("""
      CREATE TABLE docs (
        doc_id BIGINT,
        text STRING,
        lang STRING,
        source STRING,
        n_chars BIGINT,
        is_long AS n_chars > 500,
        PRIMARY KEY (doc_id) NOT ENFORCED
      ) WITH (
        'connector' = 'filesystem',
        'path' = '/root/testdata/sf0.001/documents.parquet',
        'format' = 'parquet'
      )""")
    // training-data cleanup over the DDL-registered table: deny-list
    // scrub, then keep docs with few redactions
    val cleaned = TextOps.scrub(env.from("docs"), "doc_id", "text",
        "\\b(customer|value)\\b")
      .where(col("n_redactions") < 10)
    assert(cleaned.count() > 0)
    env.executeSql("DROP TABLE docs")
  }

  test("example: Avro in, Avro out") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ex-avro").toString
    graft.sources.AvroFormat.write(
      Tables.load(spark, "/root/testdata/sf0.001", "region"), dir)
    val back = spark.read.format("graft-avro").load(dir)
    assert(back.count() == 5)
  }

  test("example: DDL with ROW/MULTISET/TIMESTAMP columns typed per the reference") {
    import org.apache.spark.sql.types.TimestampNTZType
    val env = GraftTableEnvironment.create(spark)
    env.executeSql("""
      CREATE TABLE typed_ev (
        id BIGINT,
        pt ROW<lat DOUBLE, lon DOUBLE>,
        tags MULTISET<STRING>,
        ts TIMESTAMP(3),
        PRIMARY KEY (id) NOT ENFORCED
      ) WITH ('connector' = 'values')""")
    val sch = spark.table("typed_ev").schema
    assert(sch("pt").dataType.typeName == "struct")      // ROW -> struct
    assert(sch("tags").dataType.typeName == "map")       // MULTISET -> map<e,int>
    assert(sch("ts").dataType == TimestampNTZType)       // TIMESTAMP(p) is ntz
    env.executeSql("DROP TABLE typed_ev")
  }

  test("example: full IVF+PQ ANN — cell-pruned ADC, exact re-rank") {
    val top = graft.operators.VectorOps.ivfPqTopK(
      Tables.load(spark, "/root/testdata/sf0.001", "embeddings"),
      "vec_id", "embedding", _ % 25 === 0, nlist = 16, nprobe = 2,
      subDim = 8, nCent = 16, shortlist = 10, k = 3)
    // ranked neighbors per query, best first, never more than k
    val perQuery = top.groupBy("query_id").count().select("count")
      .as[Long].collect()
    assert(perQuery.nonEmpty && perQuery.forall(_ <= 3))
  }

  test("example: CEP skip strategies — overlapping matches on one stream") {
    // a run of 4 logins followed by a purchase: SKIP PAST LAST ROW sees
    // one funnel; SKIP TO NEXT ROW sees every suffix of the login run
    case class E(t: Long, typ: String)
    val evs = IndexedSeq(E(1, "login"), E(2, "login"), E(3, "login"),
      E(4, "login"), E(5, "buy"))
    def pat(b: PatternDsl.Builder[E]) = b.build
    val base = PatternDsl.begin[E]("l", _.typ == "login").oneOrMore
      .next("b", _.typ == "buy")
    val past = Nfa.run(evs, (_: E).t, pat(base.afterMatchSkipPastLast))
    val next = Nfa.run(evs, (_: E).t, pat(base.afterMatchSkipToNext))
    assert(past.size == 1 && next.size == 4)
  }

  test("example: state TTL keeps an unbounded key space bounded") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, Double)]
    // top-1 per key with an idle TTL: keys that go quiet are evicted
    // instead of living in the state store forever. TTL uses
    // processing-time timers, which keep micro-batches scheduling —
    // poll the sink with a deadline instead of processAllAvailable().
    val out = graft.streaming.StatefulOps.streamingTopN[Long, (Long, Double)](
      in.toDS(), 1, _._1, (a, b) => a._2 > b._2, stateTtlMs = Some(200L))
    val q = out.writeStream.format("memory").queryName("exttl")
      .outputMode("update").start()
    try {
      in.addData((1L, 10.0))
      val t0 = System.currentTimeMillis()
      while (spark.table("exttl").isEmpty) {
        assert(System.currentTimeMillis() - t0 < 30000, "no output")
        Thread.sleep(100)
      }
      assert(spark.table("exttl").count() == 1)
    } finally q.stop()
  }

  test("example: two-stage ANN — PQ shortlist, exact re-rank") {
    val top = graft.operators.VectorOps.pqRerankTopK(
      Tables.load(spark, "/root/testdata/sf0.001", "embeddings"),
      "vec_id", "embedding", _ % 25 === 0, subDim = 8, nCent = 16,
      shortlist = 10, k = 3)
    // every query gets exactly k ranked neighbors, best first
    val perQuery = top.groupBy("query_id").count().select("count")
      .as[Long].collect()
    assert(perQuery.nonEmpty && perQuery.forall(_ == 3))
  }

  test("example: Flink windowed SQL runs verbatim") {
    val env = GraftTableEnvironment.create(spark)
    env.registerTestTables("/root/testdata/sf0.001")
    // Legacy group-window spelling...
    val hourly = env.sqlQuery("""
      SELECT TUMBLE_START(ts, INTERVAL '1' HOUR) AS h, count(1) AS n
      FROM events GROUP BY TUMBLE(ts, INTERVAL '1' HOUR)""")
    // ...and the window-TVF spelling, both rewritten to window().
    val cumulative = env.sqlQuery("""
      SELECT window_start, window_end, count(1) AS n
      FROM TABLE(CUMULATE(TABLE events, DESCRIPTOR(ts),
                          INTERVAL '1' HOUR, INTERVAL '4' HOUR))
      GROUP BY window_start, window_end""")
    assert(hourly.count() > 0 && cumulative.count() > hourly.count())
  }

  test("example: kappa pipeline — CDC events over the log, normalized to state") {
    // The integrated story: a debezium-format changelog lands in the
    // partitioned log (the kafka stand-in), is re-read, parsed into
    // __rowkind rows, and ChangelogNormalize'd to current state —
    // upsert-kafka end to end through this engine's own pieces.
    import graft.operators.ChangelogOps
    import graft.sources.{CdcFormats, LogSource}
    import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}
    val dir = java.nio.file.Files.createTempDirectory("graft-kappa").toString
    def ev(op: String, k: Long, amt: Double) = op match {
      case "c" => s"""{"before":null,"after":{"k":$k,"amt":$amt},"op":"c"}"""
      case "u" => s"""{"before":{"k":$k,"amt":0.0},"after":{"k":$k,"amt":$amt},"op":"u"}"""
      case _   => s"""{"before":{"k":$k,"amt":$amt},"after":null,"op":"d"}"""
    }
    // kafka's contract: a key's events all land in ONE partition, so
    // (partition, offset) totally orders each key's history
    LogSource.append(dir, 0,
      Seq(ev("c", 1, 10.0), ev("u", 1, 20.0), ev("c", 3, 7.0), ev("d", 3, 7.0)))
    LogSource.append(dir, 1, Seq(ev("c", 2, 5.0)))
    val physical = StructType(Seq(
      StructField("k", LongType), StructField("amt", DoubleType)))
    val raw = spark.read.format("graft-log").option("path", dir).load()
    val parsed = CdcFormats.debeziumJson(raw, col("value"), physical)
    val kindRank = when(col("__rowkind") === "+I", 0)
      .when(col("__rowkind") === "-U", 1)
      .when(col("__rowkind") === "+U", 2).otherwise(3)
    val state = ChangelogOps.normalize(parsed, Seq(col("k")),
        Seq(col("offset"), kindRank), col("__rowkind"))
      .select(col("k"), col("amt")).as[(Long, Double)].collect().toMap
    // key 1 upserted to 20, key 2 inserted, key 3 insert+delete -> gone
    assert(state == Map(1L -> 20.0, 2L -> 5.0))
  }

  test("example: datagen source feeds batch and streaming alike") {
    val df = spark.read.format("graft-datagen")
      .option("numRows", 500).option("partitions", 4).load()
    assert(df.groupBy(window(col("ts"), "1 minute")).count().count() > 0)
  }

  test("example: typed pipeline on the DataStream veneer") {
    val clicks = GraftStream((1L to 100L).toDS())
      .map(i => (i % 7, i))          // keyBy user
      .filter(_._2 % 2 == 0)
      .keyBy(_._1)
      .sum(_._2.toDouble)
    assert(clicks.collect().toMap.values.sum ==
      (1L to 100L).filter(_ % 2 == 0).sum.toDouble)
  }

  test("example: MATCH_RECOGNIZE through the SQL surface") {
    val env = GraftTableEnvironment.create(spark)
    env.registerTestTables("/root/testdata/sf0.001")
    spark.table("events")
      .select(col("event_id"), unix_micros(col("ts")).as("tus"),
        col("user_id"), col("event_type"))
      .createOrReplaceTempView("ex_events")
    // The reference's MATCH_RECOGNIZE string syntax, verbatim.
    val funnels = env.sqlQuery("""
      SELECT user_id, first_click, n_clicks, purchase
      FROM ex_events MATCH_RECOGNIZE (
        PARTITION BY user_id
        ORDER BY tus, event_id
        MEASURES FIRST(C.event_id) AS first_click,
                 COUNT(C.event_id) AS n_clicks,
                 P.event_id AS purchase
        AFTER MATCH SKIP PAST LAST ROW
        PATTERN (C+ P) WITHIN INTERVAL '1' HOUR
        DEFINE C AS C.event_type = 'click',
               P AS P.event_type = 'purchase'
      )""")
    assert(funnels.columns.toSeq ==
      Seq("user_id", "first_click", "n_clicks", "purchase"))
    assert(funnels.count() >= 0) // runs end-to-end on the tiny sf
  }

  test("example: CEP with the fluent pattern builder") {
    import scala.concurrent.duration._
    case class Ev(t: Long, kind: String)
    val pattern = PatternDsl.begin[Ev]("fail", _.kind == "error").oneOrMore
      .followedBy("recover", _.kind == "ok")
      .within(1.minute)
      .build
    val events = IndexedSeq(
      Ev(0, "error"), Ev(1, "error"), Ev(2, "ok"), Ev(90, "error"))
    val (matches, timedOut) = Nfa.runWithTimeouts(
      events, (e: Ev) => e.t * 1000000L, pattern)
    assert(matches.size == 1 && matches.head.bindings.head._2.size == 2)
    assert(timedOut.isEmpty) // error@90 is still inside its window
  }

  test("example: temporal join through the FOR SYSTEM_TIME SQL surface") {
    val env = GraftTableEnvironment.create(spark)
    Seq((1L, "EUR", 12L), (2L, "EUR", 30L)).toDF("order_id", "currency", "ts")
      .createOrReplaceTempView("ex_orders")
    env.createTemporaryView("ex_rates",
      Seq(("EUR", 10L, 1.1), ("EUR", 20L, 1.2)).toDF("currency", "vt", "rate"),
      watermark = Some(("vt", "0 seconds")), primaryKey = Seq("currency"))
    val got = env.executeSql("""
      SELECT o.order_id, r.rate FROM ex_orders o
      JOIN ex_rates FOR SYSTEM_TIME AS OF o.ts AS r
      ON o.currency = r.currency ORDER BY o.order_id""")
      .as[(Long, Double)].collect().toSeq
    assert(got == Seq((1L, 1.1), (2L, 1.2)))
  }

  test("example: streaming curation — dedup + decontaminate a doc stream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // Static benchmark grams (what must not leak into training data).
    val bench = TextOps.shingleHashIndex(
        Seq((100L, "a b c d e")).toDF("doc_id", "text"), "doc_id", "text", 3)
      .select(col("sh")).distinct()
    val in = MemoryStream[(Long, String)]
    // Streaming side: exact dedup on content hash (streaming state),
    // then a stream-static join that counts benchmark-gram hits — the
    // same TextOps primitives as the batch pipeline (td01/td10).
    val docs = in.toDS().toDF("doc_id", "text")
      .withColumn("content_hash", md5(lower(col("text"))))
      .dropDuplicates("content_hash")
      .select(col("doc_id"), explode(TextOps.wordNgrams(
        TextOps.words(col("text")), 3)).as("gram"))
      .withColumn("sh", xxhash64(col("gram")))
      .join(bench, Seq("sh"), "left_semi") // hits only
      .groupBy(col("doc_id")).count()
    val q = docs.writeStream.format("memory").queryName("curation")
      .outputMode("complete").start()
    in.addData((1L, "a b c d e f"),  // 3 grams hit the benchmark
      (2L, "a b c d e f"),           // exact dup of 1 -> dropped
      (3L, "x y z w v u"))           // clean -> no hits row
    q.processAllAvailable(); q.stop()
    val hits = spark.table("curation").as[(Long, Long)].collect().toMap
    assert(hits == Map(1L -> 3L))
  }

  test("example: near-duplicate detection over documents") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"),
      (3L, "unrelated text entirely different from others")).toDF("doc_id", "text")
    val pairs = TextOps.minhashLshPairsIdx(
      TextOps.shingleHashIndex(docs, "doc_id", "text", 3), threshold = 0.5)
    assert(pairs.select("id_a", "id_b").as[(Long, Long)].collect().toSet ==
      Set((1L, 2L)))
    val exact = Dedup.exactByContent(docs.union(docs), col("doc_id"),
      Seq(lower(col("text"))))
    assert(exact.count() == 3) // one keeper per distinct content
  }

  test("example: curation pass — PII scrub, LM scoring, trained filter") {
    // The round-5 curation additions composed as one pass: redact PII
    // classes, score fluency against the corpus's own bigram model,
    // and train an above-average quality filter — all oracle-backed
    // operators (td21/td22/td23) driven here on an inline corpus.
    val docs = Seq(
      (1L, "good clean prose flows here and reads well to people"),
      (2L, "good clean prose flows here and reads well to editors"),
      (3L, "mail me at a.b@c.io or dial 555-867-5309 now"),
      (4L, "zxq qqv wvx zzk jjq xqz")).toDF("doc_id", "text")
    val pii = TextOps.piiRedact(docs, "doc_id", "text")
      .as[(Long, Int, Int, Int, Int, String, Int)].collect()
      .map(r => r._1 -> r).toMap
    assert(pii(3L)._2 == 1 && pii(3L)._3 == 1) // one email, one phone
    assert(pii(1L)._2 + pii(1L)._3 + pii(1L)._4 + pii(1L)._5 == 0)
    val lm = TextOps.bigramLmScore(docs, "doc_id", "text", rareMax = 1L,
        flagRatio = 0.8)
      .as[(Long, Long, Double, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(lm(4L)._5 && !lm(1L)._5) // gibberish flagged, shared prose not
    val probe = TextOps.linearProbe(docs, "doc_id", "text",
      label = col("doc_id") <= 2L)
    assert(probe.where(col("selected")).count() > 0)
  }

  test("example: neighbor graph over embeddings feeds diversity filtering") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.95f, 0.05f)),
      (3L, Array(0.0f, 1.0f)), (4L, Array(0.05f, 0.95f)))
      .toDF("vec_id", "embedding")
    val g = graft.operators.VectorOps.knnGraph(vecs, "vec_id", "embedding",
      nbits = 0, k = 1)
    // mutual top-1 pairs = near-duplicate candidates for thinning
    val mutual = g.where(col("mutual")).select(col("id"), col("nb_id"))
      .as[(Long, Long)].collect().toSet
    assert(mutual == Set((1L, 2L), (2L, 1L), (3L, 4L), (4L, 3L)))
  }
}
