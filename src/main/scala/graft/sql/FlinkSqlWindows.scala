package graft.sql

import scala.util.matching.Regex

/** Flink group-window SQL dialect → Spark SQL rewriter.
  *
  * The reference's SQL surface exposes windows two ways (SURVEY §2.4):
  * the legacy group-window functions — `GROUP BY TUMBLE(ts, INTERVAL
  * '1' HOUR)` with auxiliary `TUMBLE_START`, `TUMBLE_END`,
  * `TUMBLE_ROWTIME` (FlinkSqlOperatorTable TUMBLE, HOP, SESSION plus
  * their START, END, ROWTIME accessors)
  * — and the 1.13+ window TVFs `TABLE(TUMBLE(TABLE t, DESCRIPTOR(ts),
  * INTERVAL ...))` producing window_start/window_end columns. Spark SQL
  * has the same semantics under different spellings (`window()`,
  * `session_window()`), so a migrating query needs only a syntactic
  * rewrite, applied by GraftTableEnvironment.executeSql before
  * spark.sql:
  *
  *   - `TUMBLE(ts, size [, offset])`      → `window(ts, size [, size, offset])`
  *   - `HOP(ts, slide, size)`             → `window(ts, size, slide)`  (arg order swaps!)
  *   - `SESSION(ts, gap)`                 → `session_window(ts, gap)`
  *   - TUMBLE_START, TUMBLE_END, HOP_*    → `window.start`, `window.end`
  *   - SESSION_START, SESSION_END         → `session_window.start`, `.end`
  *   - the ROWTIME accessors              → `window.end - INTERVAL 1 MILLISECOND`
  *     (Flink's rowtime attribute is TimeWindow.maxTimestamp = end - 1ms)
  *   - `TABLE(TUMBLE(TABLE t, DESCRIPTOR(ts), size))` → derived subquery
  *     projecting `window_start`/`window_end` per row
  *   - `TABLE(HOP(...))`, `TABLE(CUMULATE(...))` → derived subquery
  *     exploding the size/slide (resp. step-expanded) windows per row
  *
  * Out of scope (fail loudly as unresolved SQL rather than silently
  * change semantics): PROCTIME attributes and window syntax inside
  * string literals.
  */
object FlinkSqlWindows {

  private val Unit_ = "(?:DAY|HOUR|MINUTE|SECOND)"
  // INTERVAL '10' MINUTE(S) — capture value + unit
  private val I = s"INTERVAL\\s+'(\\d+)'\\s+($Unit_)S?\\b"

  private def dur(n: String, u: String): String = s"$n ${u.toLowerCase}s"

  private val TvfTumble: Regex =
    ("(?i)TABLE\\s*\\(\\s*TUMBLE\\s*\\(\\s*TABLE\\s+(\\w+)\\s*,\\s*" +
      s"DESCRIPTOR\\s*\\(\\s*(\\w+)\\s*\\)\\s*,\\s*$I\\s*\\)\\s*\\)").r

  // HOP/CUMULATE TVFs take TWO intervals: (slide, size) / (step, size).
  private val TvfHop: Regex =
    ("(?i)TABLE\\s*\\(\\s*HOP\\s*\\(\\s*TABLE\\s+(\\w+)\\s*,\\s*" +
      s"DESCRIPTOR\\s*\\(\\s*(\\w+)\\s*\\)\\s*,\\s*$I\\s*,\\s*$I\\s*\\)\\s*\\)").r
  private val TvfCumulate: Regex =
    ("(?i)TABLE\\s*\\(\\s*CUMULATE\\s*\\(\\s*TABLE\\s+(\\w+)\\s*,\\s*" +
      s"DESCRIPTOR\\s*\\(\\s*(\\w+)\\s*\\)\\s*,\\s*$I\\s*,\\s*$I\\s*\\)\\s*\\)").r

  private def micros(n: String, u: String): Long = n.toLong * (u.toUpperCase match {
    case "DAY"    => 86400000000L
    case "HOUR"   => 3600000000L
    case "MINUTE" => 60000000L
    case "SECOND" => 1000000L
  })

  private val AuxStartEnd: Regex =
    "(?i)\\b(TUMBLE|HOP|SESSION)_(START|END|ROWTIME)\\s*\\(([^()]*)\\)".r

  private val Tumble: Regex = s"(?i)\\bTUMBLE\\s*\\(\\s*([^(),]+?)\\s*,\\s*$I\\s*(?:,\\s*$I\\s*)?\\)".r
  private val Hop: Regex = s"(?i)\\bHOP\\s*\\(\\s*([^(),]+?)\\s*,\\s*$I\\s*,\\s*$I\\s*\\)".r
  private val Session: Regex = s"(?i)\\bSESSION\\s*\\(\\s*([^(),]+?)\\s*,\\s*$I\\s*\\)".r

  private def q(s: String): String = Regex.quoteReplacement(s)

  /** Rewrite Flink group-window syntax to Spark SQL; no-op when absent. */
  def rewrite(sql: String): String = {
    var s = sql
    // TVF first: its body contains a TUMBLE( token the group-window
    // pass must not see.
    s = TvfTumble.replaceAllIn(s, m => {
      val (t, ts, d) = (m.group(1), m.group(2), dur(m.group(3), m.group(4)))
      q(s"(SELECT $t.*, window($ts, '$d').start AS window_start, " +
        s"window($ts, '$d').end AS window_end FROM $t) AS $t")
    })
    // HOP TVF: each row belongs to size/slide windows — explode the
    // window starts. All exploded starts satisfy ts ∈ [ws, ws+size)
    // when size is a multiple of slide (Flink requires the same).
    s = TvfHop.replaceAllIn(s, m => {
      val (t, ts) = (m.group(1), m.group(2))
      val slide = micros(m.group(3), m.group(4))
      val size = micros(m.group(5), m.group(6))
      require(size % slide == 0,
        s"HOP TVF: size must be a multiple of slide ($size % $slide)")
      val nk = size / slide
      q(s"(SELECT * EXCEPT (__ws), timestamp_micros(__ws) AS window_start, " +
        s"timestamp_micros(__ws + ${size}L) AS window_end " +
        s"FROM (SELECT __t0.*, explode(sequence(" +
        s"(unix_micros($ts) div ${slide}L - ${nk - 1}L) * ${slide}L, " +
        s"(unix_micros($ts) div ${slide}L) * ${slide}L, ${slide}L)) AS __ws " +
        s"FROM $t AS __t0)) AS $t")
    })
    // CUMULATE TVF: shared size-aligned window_start, step-expanded
    // window ends from the row's step boundary up to the full size.
    s = TvfCumulate.replaceAllIn(s, m => {
      val (t, ts) = (m.group(1), m.group(2))
      val step = micros(m.group(3), m.group(4))
      val size = micros(m.group(5), m.group(6))
      require(size % step == 0,
        s"CUMULATE TVF: size must be a multiple of step ($size % $step)")
      val ws = s"(unix_micros($ts) div ${size}L) * ${size}L"
      q(s"(SELECT * EXCEPT (__we), timestamp_micros($ws) AS window_start, " +
        s"timestamp_micros($ws + __we) AS window_end " +
        s"FROM (SELECT __t0.*, explode(sequence(" +
        s"((unix_micros($ts) - $ws) div ${step}L + 1L) * ${step}L, " +
        s"${size}L, ${step}L)) AS __we " +
        s"FROM $t AS __t0)) AS $t")
    })
    // Auxiliary accessors before the window functions themselves:
    // TUMBLE_START must not leave a bare TUMBLE( behind.
    s = AuxStartEnd.replaceAllIn(s, m => {
      val base = m.group(1).toUpperCase match {
        case "SESSION" => "session_window"
        case _         => "window"
      }
      q(m.group(2).toUpperCase match {
        case "START"   => s"$base.start"
        case "END"     => s"$base.end"
        case "ROWTIME" => s"$base.end - INTERVAL 1 MILLISECOND"
      })
    })
    s = Hop.replaceAllIn(s, m => {
      val (ts, slide, size) =
        (m.group(1), dur(m.group(2), m.group(3)), dur(m.group(4), m.group(5)))
      q(s"window($ts, '$size', '$slide')") // Flink: (slide, size); Spark: (size, slide)
    })
    s = Tumble.replaceAllIn(s, m => {
      val (ts, size) = (m.group(1), dur(m.group(2), m.group(3)))
      Option(m.group(4)) match {
        case Some(off) =>
          q(s"window($ts, '$size', '$size', '${dur(off, m.group(5))}')")
        case None => q(s"window($ts, '$size')")
      }
    })
    s = Session.replaceAllIn(s, m =>
      q(s"session_window(${m.group(1)}, '${dur(m.group(2), m.group(3))}')"))
    s
  }
}
