package graft

import graft.cep.MatchRecognize
import graft.cep.Nfa.{AfterMatch, Quantifier}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** SQL MATCH_RECOGNIZE surface (reference StreamExecMatch.java:89;
  * MatchRecognizeITCase.scala) — parser unit tests plus end-to-end
  * execution through the table environment's SQL entry point.
  */
class MatchRecognizeSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(4)

  private val clause = """
    PARTITION BY user_id
    ORDER BY tus, event_id
    MEASURES V.event_id AS view_id, FIRST(C.event_id) AS click_id,
             LAST(C.tus) AS last_click_tus, P.event_id AS purchase_id
    ONE ROW PER MATCH
    AFTER MATCH SKIP PAST LAST ROW
    PATTERN (V C+ P) WITHIN INTERVAL '1' HOUR
    DEFINE V AS V.event_type = 'view',
           C AS C.event_type = 'click',
           P AS P.event_type = 'purchase'
  """

  test("parser extracts every section") {
    val s = MatchRecognize.parse(clause)
    assert(s.partitionBy == Seq("user_id"))
    assert(s.orderBy == Seq("tus", "event_id"))
    assert(s.measures.map(_.alias) ==
      Seq("view_id", "click_id", "last_click_tus", "purchase_id"))
    assert(s.afterMatch == AfterMatch.SkipPastLast)
    assert(s.pattern == Seq(
      "V" -> Quantifier.Once, "C" -> Quantifier.OneOrMore, "P" -> Quantifier.Once))
    assert(s.withinMicros.contains(3600000000L))
    assert(s.defines.keySet == Set("V", "C", "P"))
  }

  test("PREV/NEXT navigation, RUNNING/FINAL prefixes, FIRST/LAST offsets parse") {
    val s = MatchRecognize.parse("""
      PARTITION BY k
      ORDER BY t
      MEASURES RUNNING LAST(B.x) AS rl, FINAL LAST(B.x, 1) AS pen,
               FINAL FIRST(B.x, 2) AS third, FINAL COUNT(B.x) AS nb
      PATTERN (A B+)
      DEFINE A AS A.x < PREV(A.x) AND A.x > PREV(A.x, 2),
             B AS B.x > NEXT(B.x)
    """)
    assert(s.measures == Seq(
      MatchRecognize.LastOf("B", "x", "rl"),
      MatchRecognize.LastOf("B", "x", "pen", 1),
      MatchRecognize.FirstOf("B", "x", "third", 2),
      MatchRecognize.CountOf("B", "x", "nb")))
    // navigation lowers to encoded lag/lead column references
    val a = s.defines("A")
    assert(a == MatchRecognize.And(
      MatchRecognize.CmpCol("x", "<", "__mr_nav_p1_x"),
      MatchRecognize.CmpCol("x", ">", "__mr_nav_p2_x")))
    assert(s.defines("B") == MatchRecognize.CmpCol("x", ">", "__mr_nav_n1_x"))
    // null navigation (partition head) fails the predicate
    import org.apache.spark.sql.Row
    val idx = Map("x" -> 0, "__mr_nav_p1_x" -> 1, "__mr_nav_p2_x" -> 2)
    assert(!a.eval(Row(5L, null, null), idx))
    assert(a.eval(Row(5L, 7L, 4L), idx))
  }

  test("literal-on-the-left comparisons flip onto the column") {
    val s = MatchRecognize.parse("""
      ORDER BY t
      PATTERN (A)
      DEFINE A AS 3 < A.v
    """)
    import org.apache.spark.sql.Row
    val idx = Map("v" -> 0, "t" -> 1)
    assert(s.defines("A").eval(Row(4L, 0L), idx))
    assert(!s.defines("A").eval(Row(3L, 0L), idx))
  }

  test("predicate parser handles AND/OR/NOT, parens, numeric comparisons") {
    val s = MatchRecognize.parse("""
      ORDER BY t
      PATTERN (A)
      DEFINE A AS (A.kind = 'x' OR A.kind = 'y') AND NOT A.v <= 3 AND A.w <> 1.5
    """)
    val p = s.defines("A")
    import org.apache.spark.sql.Row
    val idx = Map("kind" -> 0, "v" -> 1, "w" -> 2, "t" -> 3)
    assert(p.eval(Row("x", 4L, 2.0, 0L), idx))
    assert(!p.eval(Row("z", 4L, 2.0, 0L), idx))   // kind fails
    assert(!p.eval(Row("y", 3L, 2.0, 0L), idx))   // NOT v<=3 fails
    assert(!p.eval(Row("y", 4L, 1.5, 0L), idx))   // w<>1.5 fails
    assert(!p.eval(Row(null, 4L, 2.0, 0L), idx))  // null never matches
  }

  test("unsupported constructs are rejected loudly") {
    intercept[IllegalArgumentException](
      MatchRecognize.parse("ORDER BY t PATTERN (A*)"))
    intercept[IllegalArgumentException](
      MatchRecognize.parse("PATTERN (A) DEFINE A AS A.x = 1")) // no ORDER BY
    intercept[IllegalArgumentException](MatchRecognize.parse(
      "ORDER BY t AFTER MATCH SKIP TO SOMEWHERE PATTERN (A B)"))
    intercept[IllegalArgumentException](MatchRecognize.parse(
      "ORDER BY t PATTERN (A B) DEFINE B AS A.x = 1")) // cross-variable
  }

  test("identifiers containing keyword substrings do not shift sections") {
    val s = MatchRecognize.parse("""
      PARTITION BY measures_x
      ORDER BY t
      MEASURES A.id AS pattern_id, B.id AS define_id
      PATTERN (A B)
      DEFINE A AS A.kind = 'a', B AS B.kind = 'b'
    """)
    assert(s.partitionBy == Seq("measures_x"))
    assert(s.measures.map(_.alias) == Seq("pattern_id", "define_id"))
    assert(s.pattern.map(_._1) == Seq("A", "B"))
  }

  test("times and skip-to strategies parse") {
    import graft.cep.Nfa.AfterMatch
    val s = MatchRecognize.parse(
      "ORDER BY t AFTER MATCH SKIP TO LAST B PATTERN (A{2} B{1,3} C)")
    assert(s.pattern == Seq(
      "A" -> Quantifier.Times(2, 2), "B" -> Quantifier.Times(1, 3),
      "C" -> Quantifier.Once))
    assert(s.afterMatch == AfterMatch.SkipToLast("B"))
    assert(MatchRecognize.parse("ORDER BY t AFTER MATCH SKIP TO FIRST A PATTERN (A+ B)")
      .afterMatch == AfterMatch.SkipToFirst("A"))
  }

  test("end-to-end through the table environment SQL entry point") {
    val env = GraftTableEnvironment.create(spark)
    import spark.implicits._
    // user u1: view click click purchase (one match, C binds 2 events);
    // user u2: view purchase with no click (no match: strict contiguity);
    // user u3: view click purchase but purchase 2h later (within fails).
    val rows = Seq(
      ("e1", 0L, "u1", "view"), ("e2", 60000000L, "u1", "click"),
      ("e3", 120000000L, "u1", "click"), ("e4", 180000000L, "u1", "purchase"),
      ("e5", 0L, "u2", "view"), ("e6", 60000000L, "u2", "purchase"),
      ("e7", 0L, "u3", "view"), ("e8", 60000000L, "u3", "click"),
      ("e9", 7210000000L, "u3", "purchase")
    ).toDF("event_id", "tus", "user_id", "event_type")
    env.createTemporaryView("mr_events", rows)

    val out = env.sqlQuery(s"""
      SELECT user_id, view_id, click_id, last_click_tus, purchase_id
      FROM mr_events MATCH_RECOGNIZE ($clause)
      ORDER BY user_id""").collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getString(0) == "u1" && r.getString(1) == "e1" &&
      r.getString(2) == "e2" && r.getLong(3) == 120000000L &&
      r.getString(4) == "e4")
  }

  test("SKIP TO NEXT ROW emits overlapping matches; optional step binds when present") {
    val env = GraftTableEnvironment.create(spark)
    import spark.implicits._
    val rows = Seq(
      ("a1", 1L, "k", "a"), ("a2", 2L, "k", "a"),
      ("b1", 3L, "k", "b"), ("c1", 4L, "k", "c")
    ).toDF("id", "t", "k", "kind")
    env.createTemporaryView("mr_abc", rows)
    // Pattern A+ B C?: from t=1 greedy A+ binds a1,a2 then b1 then c1;
    // NoSkip restarts at t=2 for the second (overlapping) match.
    val out = env.sqlQuery("""
      SELECT k, a_first, a_last, b_id, c_id
      FROM mr_abc MATCH_RECOGNIZE (
        PARTITION BY k
        ORDER BY t
        MEASURES FIRST(A.id) AS a_first, LAST(A.id) AS a_last,
                 B.id AS b_id, C.id AS c_id
        AFTER MATCH SKIP TO NEXT ROW
        PATTERN (A+ B C?)
        DEFINE A AS A.kind = 'a', B AS B.kind = 'b', C AS C.kind = 'c'
      ) ORDER BY a_first""").collect()
    assert(out.length == 2)
    assert(out(0).getString(1) == "a1" && out(0).getString(2) == "a2" &&
      out(0).getString(3) == "b1" && out(0).getString(4) == "c1")
    assert(out(1).getString(1) == "a2" && out(1).getString(2) == "a2")
  }

  test("runStream executes the clause on an unbounded stream via the SQL entry point") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[(java.sql.Timestamp, String, String, Long)]
    val wmarked = in.toDF()
      .toDF("ts", "k", "kind", "id")
      .withWatermark("ts", "0 seconds")
    val env = GraftTableEnvironment.create(spark)
    env.createTemporaryView("mr_stream", wmarked)
    val out = env.sqlQuery("""
      SELECT k, a_id, b_id
      FROM mr_stream MATCH_RECOGNIZE (
        PARTITION BY k
        ORDER BY ts
        MEASURES A.id AS a_id, B.id AS b_id
        AFTER MATCH SKIP PAST LAST ROW
        PATTERN (A B) WITHIN INTERVAL '1' MINUTE
        DEFINE A AS A.kind = 'a', B AS B.kind = 'b'
      )""")
    assert(out.isStreaming)
    val q = out.writeStream.format("memory").queryName("mr_stream_out")
      .outputMode("append").start()
    def t(s: Long) = new java.sql.Timestamp(s * 1000)
    in.addData((t(10), "u", "a", 1L))
    q.processAllAvailable()
    in.addData((t(11), "u", "b", 2L)) // completes the pattern once mature
    q.processAllAvailable()
    in.addData((t(300), "u", "x", 3L)) // watermark past 11s releases it
    q.processAllAvailable(); q.processAllAvailable(); q.stop()
    val got = spark.table("mr_stream_out").as[(String, Long, Long)].collect().toSet
    assert(got == Set(("u", 1L, 2L)))
  }

  test("undefined pattern variable matches any row") {
    val env = GraftTableEnvironment.create(spark)
    import spark.implicits._
    val rows = Seq(("x1", 1L, "k", "a"), ("x2", 2L, "k", "zzz"), ("x3", 3L, "k", "b"))
      .toDF("id", "t", "k", "kind")
    env.createTemporaryView("mr_any", rows)
    val out = env.sqlQuery("""
      SELECT k, a_id, gap_id, b_id
      FROM mr_any MATCH_RECOGNIZE (
        PARTITION BY k ORDER BY t
        MEASURES A.id AS a_id, G.id AS gap_id, B.id AS b_id
        PATTERN (A G B)
        DEFINE A AS A.kind = 'a', B AS B.kind = 'b'
      )""").collect()
    assert(out.length == 1 && out.head.getString(2) == "x2")
  }
}
