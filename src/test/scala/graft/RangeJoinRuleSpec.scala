package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape + equivalence tests for the automatic range-join rewrite
  * (graft.plans.RangeJoinRule, injected via GraftExtensions).
  */
class RangeJoinRuleSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(4)
  import spark.implicits._

  private val ConfKey = "spark.graft.rangeJoin.binWidth"

  private def points = (0L until 500L).map(i => (i, i % 97)).toDF("p_id", "pt")
  private def intervals = (0L until 40L).map(i => (i, i * 2, i * 2 + 9))
    .toDF("i_id", "lo", "hi")

  private def physical(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("key-less BETWEEN join becomes a binned equi-join when binWidth is set") {
    val cond = col("pt") >= col("lo") && col("pt") <= col("hi")
    val expected = points.join(intervals, cond)
      .select("p_id", "i_id").as[(Long, Long)].collect().toSet
    assert(expected.nonEmpty)
    spark.conf.set(ConfKey, "10")
    try {
      val joined = points.join(intervals, cond)
      val plan = physical(joined)
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
      assert(!plan.contains("CartesianProduct"), plan)
      assert(plan.contains("__graft_bin"), plan)
      val got = joined.select("p_id", "i_id").as[(Long, Long)].collect().toSet
      assert(got == expected)
      // Output schema is untouched — the bin columns never escape.
      assert(joined.columns.toSeq == Seq("p_id", "pt", "i_id", "lo", "hi"))
    } finally spark.conf.unset(ConfKey)
  }

  test("strict bounds and reversed operand spellings rewrite too") {
    val cond = col("lo") < col("pt") && col("hi") > col("pt")
    val expected = points.join(intervals, cond)
      .select("p_id", "i_id").as[(Long, Long)].collect().toSet
    spark.conf.set(ConfKey, "7")
    try {
      val joined = points.join(intervals, cond)
      val plan = physical(joined)
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
      assert(plan.contains("__graft_bin"), plan)
      assert(joined.select("p_id", "i_id").as[(Long, Long)].collect().toSet
        == expected)
    } finally spark.conf.unset(ConfKey)
  }

  test("intervals on the LEFT side still bin the point side") {
    val cond = col("pt") >= col("lo") && col("pt") <= col("hi")
    val expected = intervals.join(points, cond)
      .select("i_id", "p_id").as[(Long, Long)].collect().toSet
    spark.conf.set(ConfKey, "10")
    try {
      val joined = intervals.join(points, cond)
      val plan = physical(joined)
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
      assert(plan.contains("__graft_bin"), plan)
      assert(joined.select("i_id", "p_id").as[(Long, Long)].collect().toSet
        == expected)
    } finally spark.conf.unset(ConfKey)
  }

  test("joins with an equi key are left alone") {
    spark.conf.set(ConfKey, "10")
    try {
      val joined = points.join(intervals,
        col("pt") === col("lo") && col("pt") <= col("hi"))
      assert(!physical(joined).contains("__graft_bin"))
    } finally spark.conf.unset(ConfKey)
  }

  test("rule is inert without the conf") {
    val joined = points.join(intervals,
      col("pt") >= col("lo") && col("pt") <= col("hi"))
    assert(!physical(joined).contains("__graft_bin"))
  }

  test("null bounds and null points drop, as in the unrewritten join") {
    val pts = Seq((1L, Some(5L)), (2L, None)).toDF("p_id", "pt")
    val ivs = Seq((10L, Some(0L), Some(9L)), (11L, None, Some(9L)))
      .toDF("i_id", "lo", "hi")
    val cond = col("pt") >= col("lo") && col("pt") <= col("hi")
    val expected = pts.join(ivs, cond)
      .select("p_id", "i_id").as[(Long, Long)].collect().toSet
    spark.conf.set(ConfKey, "4")
    try {
      val joined = pts.join(ivs, cond)
      assert(physical(joined).contains("__graft_bin"))
      assert(joined.select("p_id", "i_id").as[(Long, Long)].collect().toSet
        == expected)
      assert(expected == Set((1L, 10L)))
    } finally spark.conf.unset(ConfKey)
  }
}
