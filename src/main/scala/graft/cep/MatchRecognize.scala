package graft.cep

import graft.cep.Nfa._
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions.{col, unix_micros}
import org.apache.spark.sql.types._

/** SQL `MATCH_RECOGNIZE` surface over the [[Nfa]] core — the string
  * syntax of the reference's StreamExecMatch (flink-table-planner
  * .../plan/nodes/exec/stream/StreamExecMatch.java:89; SQL tests
  * flink-table-planner .../stream/sql/MatchRecognizeITCase.scala).
  *
  * Supported clause surface (the reference's 1.14 SQL subset, minus
  * cross-variable DEFINE references):
  *
  * {{{
  * SELECT ... FROM tbl MATCH_RECOGNIZE (
  *   PARTITION BY k1 [, k2 ...]
  *   ORDER BY ts [, tieBreak ...]
  *   MEASURES A.col AS a, FIRST(B.col) AS b0, LAST(B.col) AS b1
  *   [ONE ROW PER MATCH]
  *   [AFTER MATCH SKIP PAST LAST ROW | SKIP TO NEXT ROW |
  *    SKIP TO FIRST v | SKIP TO LAST v]
  *   PATTERN (A B+ C? D{2} E{1,3}) [WITHIN INTERVAL 'n' unit]
  *   DEFINE A AS A.x = 'v' AND A.y > 3 [, B AS ...]
  * ) [AS alias]
  * }}}
  *
  * Semantics notes (matching SQL:2016 / the reference):
  *   - pattern concatenation is STRICT row contiguity — skipping is
  *     expressed with an undefined (always-true) variable, so every
  *     step maps to `Contiguity.Strict` in the NFA;
  *   - `B+` is greedy and consumes consecutively — exactly the NFA's
  *     implemented `OneOrMore` loop;
  *   - variables without a DEFINE entry match any row;
  *   - output is one row per match (the only mode the reference's
  *     1.14 planner supports): partition columns then measures;
  *   - batch-first: the façade runs it on the materialized table (the
  *     streaming path stays on StatefulOps.cepStream, which holds
  *     trailing-greedy matches open at the watermark).
  */
object MatchRecognize {

  // ---------------------------------------------------------------- spec

  sealed trait Measure { def alias: String; def variable: String; def column: String }
  final case class FirstOf(variable: String, column: String, alias: String) extends Measure
  final case class LastOf(variable: String, column: String, alias: String) extends Measure
  /** COUNT(X.col) — events bound to the variable (0 when optional/unbound). */
  final case class CountOf(variable: String, column: String, alias: String) extends Measure

  /** DEFINE predicate tree over one row (the candidate event). */
  sealed trait Pred { def eval(r: Row, idx: Map[String, Int]): Boolean }
  final case class And(l: Pred, r: Pred) extends Pred {
    def eval(row: Row, idx: Map[String, Int]): Boolean = l.eval(row, idx) && r.eval(row, idx)
  }
  final case class Or(l: Pred, r: Pred) extends Pred {
    def eval(row: Row, idx: Map[String, Int]): Boolean = l.eval(row, idx) || r.eval(row, idx)
  }
  final case class Not(p: Pred) extends Pred {
    def eval(row: Row, idx: Map[String, Int]): Boolean = !p.eval(row, idx)
  }
  final case class Cmp(column: String, op: String, lit: Any) extends Pred {
    def eval(row: Row, idx: Map[String, Int]): Boolean = {
      val i = idx.getOrElse(column,
        throw new IllegalArgumentException(s"MATCH_RECOGNIZE: unknown column $column"))
      val v = row.get(i)
      if (v == null) return false
      val c = compareValues(v, lit)
      op match {
        case "="          => c == 0
        case "<>" | "!="  => c != 0
        case "<"          => c < 0
        case "<="         => c <= 0
        case ">"          => c > 0
        case ">="         => c >= 0
      }
    }
  }

  private def compareValues(v: Any, lit: Any): Int = (v, lit) match {
    case (a: Number, b: Number) =>
      new java.math.BigDecimal(a.toString).compareTo(new java.math.BigDecimal(b.toString))
    case (a: java.math.BigDecimal, b: Number) =>
      a.compareTo(new java.math.BigDecimal(b.toString))
    case (a, b) => a.toString.compareTo(b.toString)
  }

  final case class Spec(
      partitionBy: Seq[String],
      orderBy: Seq[String],
      measures: Seq[Measure],
      afterMatch: AfterMatch,
      pattern: Seq[(String, Quantifier)],
      withinMicros: Option[Long],
      defines: Map[String, Pred])

  // -------------------------------------------------------------- parser

  private val SectionKeywords = Seq(
    "PARTITION BY", "ORDER BY", "MEASURES", "ONE ROW PER MATCH",
    "AFTER MATCH", "PATTERN", "DEFINE")

  /** Parse the text INSIDE `MATCH_RECOGNIZE ( ... )`. */
  def parse(clause: String): Spec = {
    val text = clause.trim
    // Slice into sections at keyword starts. Word-boundary anchored so
    // an identifier merely CONTAINING a keyword (alias `pattern_id`,
    // column `measures_x`) can't shift a section; `_` is a word char,
    // so \b rejects those. Keywords inside quoted literals are out of
    // this subset's contract.
    val starts = SectionKeywords.flatMap { kw =>
      val re = ("(?i)\\b" + kw.replace(" ", "\\s+") + "\\b").r
      re.findFirstMatchIn(text).map(m => (kw, m.start, m.end))
    }.sortBy(_._2)
    def section(kw: String): Option[String] = starts.find(_._1 == kw).map {
      case (_, s, e) =>
        val to = starts.collectFirst { case (_, j, _) if j > s => j }.getOrElse(text.length)
        text.substring(e, to).trim.stripSuffix(",").trim
    }

    val partitionBy = section("PARTITION BY")
      .map(_.split(",").map(_.trim).toSeq).getOrElse(Nil)
    val orderBy = section("ORDER BY")
      .map(_.split(",").map(_.trim.split("\\s+").head).toSeq)
      .getOrElse(throw new IllegalArgumentException("MATCH_RECOGNIZE requires ORDER BY"))

    val measures = section("MEASURES").map(parseMeasures).getOrElse(Nil)

    val skipFirstRe = "SKIP TO FIRST (\\w+)".r
    val skipLastRe = "SKIP TO LAST (\\w+)".r
    val afterMatch = section("AFTER MATCH").map(_.toUpperCase.replaceAll("\\s+", " ")) match {
      case None | Some("SKIP PAST LAST ROW") => AfterMatch.SkipPastLast
      case Some("SKIP TO NEXT ROW")          => AfterMatch.SkipToNext
      case Some(skipFirstRe(v))              => AfterMatch.SkipToFirst(v)
      case Some(skipLastRe(v))               => AfterMatch.SkipToLast(v)
      case Some(other) =>
        throw new IllegalArgumentException(s"unsupported AFTER MATCH SKIP strategy: $other")
    }

    val patternSec = section("PATTERN").getOrElse(
      throw new IllegalArgumentException("MATCH_RECOGNIZE requires PATTERN"))
    val (pattern, withinMicros) = parsePattern(patternSec)

    val defines = section("DEFINE").map(parseDefines).getOrElse(Map.empty)
    defines.keys.foreach { v =>
      require(pattern.exists(_._1.equalsIgnoreCase(v)),
        s"DEFINE references variable $v absent from PATTERN")
    }
    Spec(partitionBy, orderBy, measures, afterMatch, pattern, withinMicros, defines)
  }

  private def parseMeasures(s: String): Seq[Measure] =
    splitTopLevel(s, ',').map { m =>
      val parts = m.trim.split("(?i)\\s+AS\\s+")
      require(parts.length == 2, s"measure needs AS alias: $m")
      val (expr, alias) = (parts(0).trim, parts(1).trim)
      val firstRe = "(?i)^FIRST\\s*\\(\\s*(\\w+)\\.(\\w+)\\s*\\)$".r
      val lastRe = "(?i)^LAST\\s*\\(\\s*(\\w+)\\.(\\w+)\\s*\\)$".r
      val countRe = "(?i)^COUNT\\s*\\(\\s*(\\w+)\\.(\\w+)\\s*\\)$".r
      val bareRe = "^(\\w+)\\.(\\w+)$".r
      expr match {
        case firstRe(v, c) => FirstOf(v, c, alias)
        case lastRe(v, c)  => LastOf(v, c, alias)
        case countRe(v, c) => CountOf(v, c, alias)
        case bareRe(v, c)  => FirstOf(v, c, alias) // SQL: unqualified nav = FIRST
        case other => throw new IllegalArgumentException(s"unsupported measure: $other")
      }
    }

  /** `( A B+ C? ) [WITHIN INTERVAL 'n' unit]` */
  private def parsePattern(s: String): (Seq[(String, Quantifier)], Option[Long]) = {
    val open = s.indexOf('(')
    val close = s.lastIndexOf(')')
    require(open >= 0 && close > open, s"malformed PATTERN: $s")
    val timesRe = "(\\w+)\\{(\\d+)(?:,\\s*(\\d+))?\\}".r
    val vars = s.substring(open + 1, close).trim.split("\\s+").toSeq.filter(_.nonEmpty).map { tok =>
      if (tok.endsWith("+")) (tok.dropRight(1), Quantifier.OneOrMore: Quantifier)
      else if (tok.endsWith("?")) (tok.dropRight(1), Quantifier.Optional: Quantifier)
      else if (tok.endsWith("*"))
        throw new IllegalArgumentException(
          "ZeroOrMore (*) is unsupported — rewrite A* as an optional B? with B AS <A's define>")
      else tok match {
        case timesRe(v, n, null) => (v, Quantifier.Times(n.toInt, n.toInt): Quantifier)
        case timesRe(v, n, m2)   => (v, Quantifier.Times(n.toInt, m2.toInt): Quantifier)
        case _                   => (tok, Quantifier.Once: Quantifier)
      }
    }
    val withinRe = "(?i)WITHIN\\s+INTERVAL\\s+'(\\d+)'\\s+(\\w+)".r
    val within = withinRe.findFirstMatchIn(s.substring(close + 1)).map { m =>
      val n = m.group(1).toLong
      m.group(2).toUpperCase.stripSuffix("S") match {
        case "DAY"    => n * 86400000000L
        case "HOUR"   => n * 3600000000L
        case "MINUTE" => n * 60000000L
        case "SECOND" => n * 1000000L
        case u => throw new IllegalArgumentException(s"unsupported WITHIN unit: $u")
      }
    }
    (vars, within)
  }

  private def parseDefines(s: String): Map[String, Pred] =
    splitTopLevel(s, ',').map { d =>
      val parts = d.trim.split("(?i)\\s+AS\\s+", 2)
      require(parts.length == 2, s"DEFINE needs: VAR AS predicate — got $d")
      parts(0).trim -> parsePred(parts(1).trim, parts(0).trim)
    }.toMap

  /** Recursive-descent over: orExpr := andExpr (OR andExpr)*;
    * andExpr := term (AND term)*; term := NOT term | (orExpr) | cmp;
    * cmp := VAR.col op literal. Only self-references (the defined
    * variable's own columns) are allowed — cross-variable navigation
    * (e.g. B AS B.price > A.price) is out of the supported subset.
    */
  private def parsePred(s: String, variable: String): Pred = {
    val toks = tokenize(s)
    var pos = 0
    def peek: Option[String] = if (pos < toks.length) Some(toks(pos)) else None
    def take(): String = { val t = toks(pos); pos += 1; t }
    def orExpr(): Pred = {
      var l = andExpr()
      while (peek.exists(_.equalsIgnoreCase("OR"))) { take(); l = Or(l, andExpr()) }
      l
    }
    def andExpr(): Pred = {
      var l = term()
      while (peek.exists(_.equalsIgnoreCase("AND"))) { take(); l = And(l, term()) }
      l
    }
    def term(): Pred = peek match {
      case Some(t) if t.equalsIgnoreCase("NOT") => take(); Not(term())
      case Some("(") =>
        take(); val p = orExpr()
        require(take() == ")", s"unbalanced parens in: $s"); p
      case _ => cmp()
    }
    def cmp(): Pred = {
      val ref = take()
      val refRe = "(\\w+)\\.(\\w+)".r
      val colName = ref match {
        case refRe(v, c) =>
          require(v.equalsIgnoreCase(variable),
            s"DEFINE for $variable references $v — cross-variable predicates unsupported")
          c
        case bare => bare
      }
      val op = take()
      require(Set("=", "<>", "!=", "<", "<=", ">", ">=")(op), s"unsupported operator $op in: $s")
      val litTok = take()
      val lit: Any =
        if (litTok.startsWith("'")) litTok.stripPrefix("'").stripSuffix("'")
        else if (litTok.contains('.')) litTok.toDouble
        else litTok.toLong
      Cmp(colName, op, lit)
    }
    val p = orExpr()
    require(pos == toks.length, s"trailing tokens in predicate: $s")
    p
  }

  private def tokenize(s: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '\'') {
        val end = s.indexOf('\'', i + 1)
        require(end > i, s"unterminated string literal in: $s")
        out += s.substring(i, end + 1); i = end + 1
      } else if (c == '(' || c == ')') { out += c.toString; i += 1 }
      else if ("<>!=".contains(c)) {
        val two = s.substring(i, math.min(i + 2, s.length))
        if (Set("<>", "!=", "<=", ">=").contains(two)) { out += two; i += 2 }
        else { out += c.toString; i += 1 }
      } else {
        var j = i
        while (j < s.length && !s.charAt(j).isWhitespace && !"()<>!='".contains(s.charAt(j))) j += 1
        out += s.substring(i, j); i = j
      }
    }
    out.result()
  }

  /** Split on `sep` at paren depth 0, respecting quoted literals. */
  private def splitTopLevel(s: String, sep: Char): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0; var inQ = false; var start = 0; var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\'') inQ = !inQ
      else if (!inQ && c == '(') depth += 1
      else if (!inQ && c == ')') depth -= 1
      else if (!inQ && depth == 0 && c == sep) { out += s.substring(start, i); start = i + 1 }
      i += 1
    }
    out += s.substring(start)
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  // ------------------------------------------------------------ executor

  /** Spec compiled against a concrete input schema: the prepared frame
    * (with the lowered `__mr_time_us` event-time column), the NFA
    * pattern over [[Row]], and the output-row builders.
    */
  private final case class Compiled(
      prepared: DataFrame,
      pattern: Pattern[Row],
      partIs: Seq[Int],
      ordIs: Seq[Int],
      timeI: Int,
      measureFns: Seq[Match[Row] => Any],
      outSchema: StructType) {
    def key(r: Row): String =
      partIs.map(i => String.valueOf(r.get(i))).mkString("")
    def outputRow(m: Match[Row]): Row = {
      val anchor = m.bindings.head._2.head
      Row.fromSeq(partIs.map(anchor.get) ++ measureFns.map(_(m)))
    }
    val rowOrd: Ordering[Row] = new Ordering[Row] {
      def compare(a: Row, b: Row): Int = {
        var k = 0
        while (k < ordIs.length) {
          val c = compareAny(a.get(ordIs(k)), b.get(ordIs(k)))
          if (c != 0) return c
          k += 1
        }
        0
      }
    }
  }

  private def compile(df: DataFrame, spec: Spec): Compiled = {
    val schema = df.schema
    val fieldIdx = schema.fieldNames.zipWithIndex.toMap
    def field(name: String): StructField = schema(schema.fieldIndex(name))

    spec.measures.foreach(m => require(fieldIdx.contains(m.column),
      s"measure references unknown column ${m.column}"))
    val outSchema = StructType(
      spec.partitionBy.map(field) ++
        spec.measures.map {
          case m: CountOf => StructField(m.alias, LongType, nullable = false)
          case m          => field(m.column).copy(name = m.alias)
        })

    // Event time = first ORDER BY column, pre-lowered to micros for
    // timestamps so the within-bound arithmetic is type-free.
    val ordCols = spec.orderBy
    val timeExpr = field(ordCols.head).dataType match {
      case _: TimestampType => unix_micros(col(ordCols.head))
      case _: DateType      => unix_micros(col(ordCols.head).cast(TimestampType))
      case _                => col(ordCols.head).cast(LongType)
    }
    val prepared = df.withColumn("__mr_time_us", timeExpr)
    val pIdx = prepared.schema.fieldNames.zipWithIndex.toMap

    val steps = spec.pattern.map { case (v, q) =>
      val pred = spec.defines.collectFirst {
        case (dv, p) if dv.equalsIgnoreCase(v) => p
      }
      Step[Row](v,
        r => pred.forall(_.eval(r, pIdx)),
        quantifier = q,
        contiguity = Contiguity.Strict)
    }.toVector
    val pattern = Pattern[Row](steps, spec.withinMicros, spec.afterMatch)

    val measureFns: Seq[Match[Row] => Any] = spec.measures.map { m =>
      val ci = pIdx(m.column)
      val v = m.variable
      m match {
        case _: FirstOf => (mt: Match[Row]) =>
          mt.bindings.find(_._1.equalsIgnoreCase(v)).map(_._2.head.get(ci)).orNull
        case _: LastOf => (mt: Match[Row]) =>
          mt.bindings.find(_._1.equalsIgnoreCase(v)).map(_._2.last.get(ci)).orNull
        case _: CountOf => (mt: Match[Row]) =>
          mt.bindings.find(_._1.equalsIgnoreCase(v))
            .map(_._2.count(_.get(ci) != null).toLong).getOrElse(0L)
      }
    }

    Compiled(prepared, pattern, spec.partitionBy.map(pIdx), ordCols.map(pIdx),
      pIdx("__mr_time_us"), measureFns, outSchema)
  }

  /** Run a parsed spec over a batch DataFrame. Output schema:
    * partition columns (input types) then measures (referenced
    * column's input type), one row per match.
    */
  def run(df: DataFrame, spec: Spec): DataFrame = {
    val c = compile(df, spec)
    import c.prepared.sparkSession.implicits._
    val timeI = c.timeI
    c.prepared
      .groupByKey(c.key _)
      .flatMapGroups { (_, it) =>
        val evs = it.toIndexedSeq.sorted(c.rowOrd)
        Nfa.run[Row](evs, _.getLong(timeI), c.pattern).iterator.map(c.outputRow)
      }(Encoders.row(c.outSchema))
  }

  /** Run a parsed spec on an unbounded stream -- the reference's actual
    * MATCH_RECOGNIZE execution mode (StreamExecMatch -> CepOperator).
    * The input must be a STREAMING DataFrame with a watermark declared
    * on the first ORDER BY column; matches emit once the watermark
    * passes them, with greedy trailing matches held open exactly like
    * [[graft.streaming.StatefulOps.cepStream]] (which this delegates
    * to). Event-time resolution is milliseconds on this path (the
    * stateful runtime's watermark clock); AFTER MATCH SKIP PAST LAST
    * ROW only, per the streaming CEP contract.
    */
  def runStream(df: DataFrame, spec: Spec): DataFrame = {
    val c = compile(df, spec)
    val timeI = c.timeI
    val matches = graft.streaming.StatefulOps.cepStream[String, Row](
      c.prepared.as(Encoders.row(c.prepared.schema)),
      c.key _, r => r.getLong(timeI) / 1000L, c.pattern)(Encoders.STRING)
    matches.map(c.outputRow _)(Encoders.row(c.outSchema)).toDF()
  }

  private def compareAny(a: Any, b: Any): Int = (a, b) match {
    case (null, null) => 0
    case (null, _)    => -1
    case (_, null)    => 1
    case (x: java.lang.Long, y: java.lang.Long)       => java.lang.Long.compare(x, y)
    case (x: java.lang.Integer, y: java.lang.Integer) => Integer.compare(x, y)
    case (x: java.lang.Double, y: java.lang.Double)   => java.lang.Double.compare(x, y)
    case (x: String, y: String)                       => x.compareTo(y)
    case (x: java.sql.Timestamp, y: java.sql.Timestamp) => x.compareTo(y)
    case (x: java.time.Instant, y: java.time.Instant)   => x.compareTo(y)
    case (x: java.math.BigDecimal, y: java.math.BigDecimal) => x.compareTo(y)
    case (x: Number, y: Number) =>
      new java.math.BigDecimal(x.toString).compareTo(new java.math.BigDecimal(y.toString))
    case (x, y) => x.toString.compareTo(y.toString)
  }

  // -------------------------------------------------------- SQL rewrite

  private val FromMatchRe =
    "(?is)\\bFROM\\s+([A-Za-z_][\\w.]*)\\s+MATCH_RECOGNIZE\\s*\\(".r

  def containsClause(sql: String): Boolean =
    FromMatchRe.findFirstIn(sql).isDefined

  /** Rewrite `FROM tbl MATCH_RECOGNIZE (...)` to a temp view holding
    * the match output, then hand the remaining query to Spark SQL —
    * the same structural split as the reference planner, which turns
    * the clause into one Match node and keeps the rest relational.
    */
  def rewriteAndRun(spark: org.apache.spark.sql.SparkSession, sql: String): DataFrame = {
    val m = FromMatchRe.findFirstMatchIn(sql).getOrElse(
      throw new IllegalArgumentException("no MATCH_RECOGNIZE clause found"))
    val table = m.group(1)
    // Balance parens from the clause's opening '(' to find its end.
    val open = m.end - 1
    var depth = 0; var i = open; var close = -1; var inQ = false
    while (i < sql.length && close < 0) {
      val c = sql.charAt(i)
      if (c == '\'') inQ = !inQ
      else if (!inQ && c == '(') depth += 1
      else if (!inQ && c == ')') { depth -= 1; if (depth == 0) close = i }
      i += 1
    }
    require(close > open, "unbalanced MATCH_RECOGNIZE parens")
    val clause = sql.substring(open + 1, close)
    // Streaming views (registered with their watermark) route to the
    // stateful NFA; batch views to the sort-per-group scan.
    val input = spark.table(table)
    val out =
      if (input.isStreaming) runStream(input, parse(clause))
      else run(input, parse(clause))
    val view = s"__mr_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    out.createOrReplaceTempView(view)
    val rewritten = sql.substring(0, m.start) + s" FROM $view " + sql.substring(close + 1)
    spark.sql(rewritten)
  }
}
