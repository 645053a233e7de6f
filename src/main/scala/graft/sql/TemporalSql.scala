package graft.sql

/** SQL surface for the reference's temporal (versioned-table) join —
  * `JOIN t FOR SYSTEM_TIME AS OF l.ts [AS] a ON <cond>` (parser
  * flink-sql-parser SqlSnapshot via Parser.tdd, planner
  * StreamExecTemporalJoin.java:67, runtime
  * TemporalRowTimeJoinOperator.java:78). Spark's parser has no slot
  * for FOR SYSTEM_TIME, so the façade rewrites it relationally before
  * handing the query to Spark SQL: the versioned table becomes
  * validity intervals [vt, lead(vt)) per primary key, and the
  * temporal join becomes a plain join with interval containment
  * folded into the ON clause. Semantics match the reference's
  * operator — each probe row sees the latest version at or before its
  * time (inclusive), no match drops the row (inner). At scale this is
  * one window over the versioned side plus a regular equi-join on the
  * primary key: it shuffles like any keyed join, with no per-probe
  * point lookups.
  *
  * The versioned side must be unique per (primary key, version time)
  * — pre-dedup with Dedup.keepLast otherwise (same contract as
  * AsOfJoin.asOf and the reference, which requires a PRIMARY KEY and
  * event-time attribute on the versioned table).
  */
object TemporalSql {
  // Alias is optional (defaults to the table name, like the reference's
  // parser); a lookahead keeps ON from being captured as the alias.
  private val JoinRe =
    ("(?is)JOIN\\s+([A-Za-z_][\\w.]*)\\s+FOR\\s+SYSTEM_TIME\\s+AS\\s+OF\\s+" +
      "([\\w.]+)(?:\\s+(?:AS\\s+)?(?!ON\\b)([A-Za-z_]\\w*))?\\s+ON\\s").r

  // Word-boundary anchored ((?!\w)) so identifiers that merely start
  // with a keyword (where_flag, joined_x) can't truncate the ON scan.
  private val ClauseKw =
    ("(?is)^(WHERE|GROUP\\s+BY|ORDER\\s+BY|HAVING|LIMIT|WINDOW|JOIN|" +
      "LEFT|RIGHT|FULL|INNER|CROSS|UNION|INTERSECT|EXCEPT)(?!\\w)").r

  private val SystemTimeRe = "(?i)FOR\\s+SYSTEM_TIME".r

  def containsClause(sql: String): Boolean = JoinRe.findFirstIn(sql).isDefined

  /** Rewrite every temporal join in `sql`. `meta(table)` supplies the
    * versioned table's (primary key columns, version time column) from
    * the table environment's declarations.
    */
  def rewrite(sql: String, meta: String => (Seq[String], String)): String = {
    JoinRe.findFirstMatchIn(sql) match {
      case None =>
        // A FOR SYSTEM_TIME the join regex did NOT consume would
        // otherwise surface as an opaque Spark parse error — fail here
        // with the supported spelling instead.
        require(SystemTimeRe.findFirstIn(sql).isEmpty,
          "unsupported temporal-join spelling: expected " +
            "`JOIN <table> FOR SYSTEM_TIME AS OF <expr> [[AS] alias] ON <cond>`")
        sql
      case Some(m) =>
        val (table, asOf) = (m.group(1), m.group(2))
        val alias = Option(m.group(3)).getOrElse(table.split('.').last)
        val (pk, vt) = meta(table)
        require(pk.nonEmpty,
          s"temporal join: no primary key declared for table $table")
        require(vt.nonEmpty,
          s"temporal join: no version-time column declared for table $table")
        // The ON expression ends at the first top-level clause keyword
        // (or end of string) outside quotes/parens.
        val tail = sql.substring(m.end)
        var depth = 0; var i = 0; var inQ = false; var onEnd = tail.length
        while (i < tail.length && onEnd == tail.length) {
          val c = tail.charAt(i)
          if (c == '\'') inQ = !inQ
          else if (!inQ && c == '(') depth += 1
          else if (!inQ && c == ')') depth -= 1
          else if (!inQ && depth == 0 && c.isLetter &&
            (i == 0 || !tail.charAt(i - 1).isLetterOrDigit) &&
            ClauseKw.findFirstIn(tail.substring(i)).isDefined) onEnd = i
          i += 1
        }
        val onCond = tail.substring(0, onEnd)
        val rest = tail.substring(onEnd)
        val pks = pk.mkString(", ")
        val versioned =
          s"(SELECT *, $vt AS __vt_from, lead($vt) OVER " +
            s"(PARTITION BY $pks ORDER BY $vt) AS __vt_to FROM $table) AS $alias"
        val newJoin = s"JOIN $versioned ON ($onCond) " +
          s"AND $asOf >= $alias.__vt_from " +
          s"AND ($alias.__vt_to IS NULL OR $asOf < $alias.__vt_to) "
        // Recurse: the query may contain several temporal joins.
        rewrite(sql.substring(0, m.start) + newJoin + rest, meta)
    }
  }

  // The legacy temporal TABLE FUNCTION spelling (reference docs
  // "Temporal Table Function"; planner resolves it through
  // LogicalCorrelateToJoinFromTemporalTableFunctionRule.scala):
  // `FROM Orders o, LATERAL TABLE (Rates(o.ts)) [AS] r WHERE
  // o.cur = r.cur`. The comma-join segment is rewritten to the same
  // validity-interval join as FOR SYSTEM_TIME — time containment in
  // the ON clause, the key equality stays wherever the user wrote it
  // (the reference's rule does exactly this split).
  // The optional alias group is guarded against clause keywords (the
  // same trap JoinRe's (?!ON\b) avoids): an alias-less spelling like
  // `LATERAL TABLE (Rates(o.ts)) WHERE ...` must not capture WHERE.
  private val LateralRe =
    ("(?is),\\s*LATERAL\\s+TABLE\\s*\\(\\s*([A-Za-z_]\\w*)\\s*\\(" +
      "([^()]*)\\)\\s*\\)\\s*(?:AS\\s+)?" +
      "(?!(?:WHERE|GROUP|ORDER|HAVING|LIMIT|WINDOW|JOIN|LEFT|RIGHT|FULL|" +
      "INNER|CROSS|UNION|INTERSECT|EXCEPT|ON|AND|OR)\\b)([A-Za-z_]\\w*)?").r

  def containsFunctionClause(sql: String): Boolean =
    LateralRe.findFirstIn(sql).isDefined

  /** Rewrite every `LATERAL TABLE (fn(expr))` temporal-function join.
    * `fnMeta(fn)` supplies (versioned table, primary key columns,
    * version time column) from the environment's
    * createTemporalTableFunction registrations; unknown functions are
    * left untouched (they may be genuine UDTFs for LATERAL VIEW).
    */
  def rewriteFunctions(sql: String,
      fnMeta: String => Option[(String, Seq[String], String)]): String =
    LateralRe.findFirstMatchIn(sql) match {
      case None => sql
      case Some(m) =>
        fnMeta(m.group(1)) match {
          case None =>
            // Not a temporal function (may be a genuine UDTF) — leave
            // THIS match as-is but keep scanning: a later registered
            // temporal function in the same statement must still be
            // rewritten.
            sql.substring(0, m.end) +
              rewriteFunctions(sql.substring(m.end), fnMeta)
          case Some((table, pk, vt)) =>
            val asOf = m.group(2).trim
            val alias = Option(m.group(3)).getOrElse(table.split('.').last)
            val pks = pk.mkString(", ")
            val versioned =
              s"(SELECT *, $vt AS __vt_from, lead($vt) OVER " +
                s"(PARTITION BY $pks ORDER BY $vt) AS __vt_to FROM $table) AS $alias"
            val newJoin = s" JOIN $versioned ON $asOf >= $alias.__vt_from " +
              s"AND ($alias.__vt_to IS NULL OR $asOf < $alias.__vt_to)"
            rewriteFunctions(
              sql.substring(0, m.start) + newJoin + sql.substring(m.end), fnMeta)
        }
    }
}
