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
  *
  * Out of scope (fail loudly as unresolved SQL rather than silently
  * change semantics): PROCTIME attributes, HOP/CUMULATE TVFs (a
  * sliding TVF multiplies rows — use WindowOps.hop / WindowOps.cumulate
  * on the DataFrame side), and window syntax inside string literals.
  */
object FlinkSqlWindows {

  private val Unit_ = "(?:DAY|HOUR|MINUTE|SECOND)"
  // INTERVAL '10' MINUTE(S) — capture value + unit
  private val I = s"INTERVAL\\s+'(\\d+)'\\s+($Unit_)S?\\b"

  private def dur(n: String, u: String): String = s"$n ${u.toLowerCase}s"

  private val TvfTumble: Regex =
    ("(?i)TABLE\\s*\\(\\s*TUMBLE\\s*\\(\\s*TABLE\\s+(\\w+)\\s*,\\s*" +
      s"DESCRIPTOR\\s*\\(\\s*(\\w+)\\s*\\)\\s*,\\s*$I\\s*\\)\\s*\\)").r

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
