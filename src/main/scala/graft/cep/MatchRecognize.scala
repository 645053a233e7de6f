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
  *   MEASURES [RUNNING|FINAL] A.col AS a,
  *            [RUNNING|FINAL] FIRST(B.col [, n]) AS b0,
  *            [RUNNING|FINAL] LAST(B.col [, n]) AS b1,
  *            COUNT(B.col) AS nb
  *   [ONE ROW PER MATCH]
  *   [AFTER MATCH SKIP PAST LAST ROW | SKIP TO NEXT ROW |
  *    SKIP TO FIRST v | SKIP TO LAST v]
  *   PATTERN (A B+ C? D{2} E{1,3}) [WITHIN INTERVAL 'n' unit]
  *   DEFINE A AS A.x = 'v' AND A.y > 3,
  *          D AS D.price < PREV(D.price [, n]) [AND ... NEXT(D.x) ...]
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

  /** `offset` is SQL:2016's logical navigation offset: FIRST(V.c, 1)
    * is the SECOND row bound to V, LAST(V.c, 1) the second-to-last.
    * A RUNNING/FINAL prefix parses and is semantically uniform here:
    * under ONE ROW PER MATCH (the reference planner's only output
    * mode) every measure is evaluated on the COMPLETE match, where
    * RUNNING and FINAL coincide (SQL:2016 §R010; the reference's
    * MatchRecognizeITCase exercises both spellings against identical
    * expected output).
    */
  sealed trait Measure { def alias: String; def variable: String; def column: String }
  final case class FirstOf(variable: String, column: String, alias: String,
                           offset: Int = 0) extends Measure
  final case class LastOf(variable: String, column: String, alias: String,
                          offset: Int = 0) extends Measure
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
      cmpOp(op, compareValues(v, lit))
    }
  }

  /** Column-vs-column comparison — the shape PREV/NEXT navigation
    * lowers to (`D.price < PREV(D.price)` reads the pre-computed
    * lag column of the SAME row). SQL three-valued logic: a null on
    * either side (e.g. PREV at the partition head) fails the
    * predicate.
    */
  final case class CmpCol(colA: String, op: String, colB: String) extends Pred {
    def eval(row: Row, idx: Map[String, Int]): Boolean = {
      val a = row.get(idx.getOrElse(colA,
        throw new IllegalArgumentException(s"MATCH_RECOGNIZE: unknown column $colA")))
      val b = row.get(idx.getOrElse(colB,
        throw new IllegalArgumentException(s"MATCH_RECOGNIZE: unknown column $colB")))
      if (a == null || b == null) return false
      cmpOp(op, compareValues(a, b))
    }
  }

  private def cmpOp(op: String, c: Int): Boolean = op match {
    case "="          => c == 0
    case "<>" | "!="  => c != 0
    case "<"          => c < 0
    case "<="         => c <= 0
    case ">"          => c > 0
    case ">="         => c >= 0
  }

  /** PREV/NEXT in DEFINE are PHYSICAL row navigation over the ordered
    * partition (SQL:2016 §R020 — unlike FIRST/LAST they ignore
    * variable bindings), so they lower to lag/lead window columns
    * computed in ONE declarative pass before the NFA runs; the NFA
    * predicate then reads the current row only. Encoded column names
    * carry (direction, offset, source column).
    */
  private[cep] def navColName(dir: String, n: Int, column: String): String =
    s"__mr_nav_${dir}${n}_$column"
  private val NavColRe = "__mr_nav_(p|n)(\\d+)_(.+)".r

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
      // RUNNING/FINAL prefixes parse and coincide under ONE ROW PER
      // MATCH (see the Measure scaladoc).
      val expr = parts(0).trim.replaceFirst("(?i)^(?:RUNNING|FINAL)\\s+", "")
      val alias = parts(1).trim
      val firstRe = "(?i)^FIRST\\s*\\(\\s*(\\w+)\\.(\\w+)\\s*(?:,\\s*(\\d+)\\s*)?\\)$".r
      val lastRe = "(?i)^LAST\\s*\\(\\s*(\\w+)\\.(\\w+)\\s*(?:,\\s*(\\d+)\\s*)?\\)$".r
      val countRe = "(?i)^COUNT\\s*\\(\\s*(\\w+)\\.(\\w+)\\s*\\)$".r
      val bareRe = "^(\\w+)\\.(\\w+)$".r
      def off(o: String): Int = Option(o).map(_.toInt).getOrElse(0)
      expr match {
        case firstRe(v, c, o) => FirstOf(v, c, alias, off(o))
        case lastRe(v, c, o)  => LastOf(v, c, alias, off(o))
        case countRe(v, c)    => CountOf(v, c, alias)
        case bareRe(v, c)     => FirstOf(v, c, alias) // SQL: unqualified nav = FIRST
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
    val refRe = "(\\w+)\\.(\\w+)".r
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
    def selfCol(ref: String): String = ref match {
      case refRe(v, c) =>
        require(v.equalsIgnoreCase(variable),
          s"DEFINE for $variable references $v — cross-variable predicates unsupported")
        c
      case bare => bare
    }
    // An operand is a column reference (plain or PREV/NEXT-navigated,
    // which lowers to the pre-computed lag/lead column) or a literal.
    def operand(): Either[String, Any] = {
      val t = take()
      if ((t.equalsIgnoreCase("PREV") || t.equalsIgnoreCase("NEXT")) &&
          peek.contains("(")) {
        take() // (
        val c = selfCol(take())
        val n = if (peek.contains(",")) { take(); take().toInt } else 1
        require(take() == ")", s"unbalanced parens in navigation: $s")
        Left(navColName(if (t.equalsIgnoreCase("PREV")) "p" else "n", n, c))
      } else if (t.startsWith("'")) Right(t.stripPrefix("'").stripSuffix("'"))
      else if (t.head.isDigit || (t.length > 1 && t.head == '-')) {
        Right(if (t.contains('.')) t.toDouble else t.toLong)
      } else Left(selfCol(t))
    }
    def cmp(): Pred = {
      val lhs = operand()
      val op = take()
      require(Set("=", "<>", "!=", "<", "<=", ">", ">=")(op), s"unsupported operator $op in: $s")
      val rhs = operand()
      (lhs, rhs) match {
        case (Left(a), Right(l))  => Cmp(a, op, l)
        case (Left(a), Left(b))   => CmpCol(a, op, b)
        case (Right(l), Left(b))  =>
          // flip `lit op col` to `col flipped-op lit`
          val flipped = op match {
            case "<" => ">"; case "<=" => ">="; case ">" => "<"
            case ">=" => "<="; case other => other
          }
          Cmp(b, flipped, l)
        case _ => throw new IllegalArgumentException(
          s"literal-vs-literal comparison in: $s")
      }
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
      } else if (c == '(' || c == ')' || c == ',') { out += c.toString; i += 1 }
      else if ("<>!=".contains(c)) {
        val two = s.substring(i, math.min(i + 2, s.length))
        if (Set("<>", "!=", "<=", ">=").contains(two)) { out += two; i += 2 }
        else { out += c.toString; i += 1 }
      } else {
        var j = i
        while (j < s.length && !s.charAt(j).isWhitespace && !"(),<>!='".contains(s.charAt(j))) j += 1
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
    // PREV/NEXT navigation columns: one lag/lead window pass over the
    // (partition, order) the clause already declares — the NFA then
    // evaluates current-row-only predicates. At scale this adds no
    // shuffle: the window shares the match's own partitioning.
    def predCols(p: Pred): Seq[String] = p match {
      case And(l, r)       => predCols(l) ++ predCols(r)
      case Or(l, r)        => predCols(l) ++ predCols(r)
      case Not(q)          => predCols(q)
      case Cmp(c, _, _)    => Seq(c)
      case CmpCol(a, _, b) => Seq(a, b)
    }
    val navCols = spec.defines.values.flatMap(predCols).toSeq.distinct.collect {
      case n @ NavColRe(dir, off, src) => (n, dir, off.toInt, src)
    }
    val navWindow = org.apache.spark.sql.expressions.Window
      .partitionBy(spec.partitionBy.map(col): _*)
      .orderBy(ordCols.map(col): _*)
    val prepared = navCols.foldLeft(df.withColumn("__mr_time_us", timeExpr)) {
      case (d, (name, dir, off, src)) =>
        val nav = if (dir == "p") org.apache.spark.sql.functions.lag(col(src), off)
                  else org.apache.spark.sql.functions.lead(col(src), off)
        d.withColumn(name, nav.over(navWindow))
    }
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
        case f: FirstOf => (mt: Match[Row]) =>
          mt.bindings.find(_._1.equalsIgnoreCase(v))
            .flatMap(_._2.lift(f.offset)).map(_.get(ci)).orNull
        case l: LastOf => (mt: Match[Row]) =>
          mt.bindings.find(_._1.equalsIgnoreCase(v))
            .flatMap(b => b._2.lift(b._2.length - 1 - l.offset))
            .map(_.get(ci)).orNull
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
    // PREV/NEXT lower to lag/lead windows, which Structured Streaming
    // cannot run (non-time windows need the whole ordered partition).
    // Fail with the reason instead of Spark's opaque analysis error;
    // the batch path supports them fully.
    def usesNav(p: Pred): Boolean = p match {
      case And(l, r)       => usesNav(l) || usesNav(r)
      case Or(l, r)        => usesNav(l) || usesNav(r)
      case Not(q)          => usesNav(q)
      case Cmp(c0, _, _)   => NavColRe.findFirstIn(c0).isDefined
      case CmpCol(a, _, b) =>
        NavColRe.findFirstIn(a).isDefined || NavColRe.findFirstIn(b).isDefined
    }
    require(!spec.defines.values.exists(usesNav),
      "PREV/NEXT navigation in DEFINE is batch-only: it lowers to a " +
        "lag/lead window over the ordered partition, which an unbounded " +
        "stream cannot materialize (run the clause on the batch table, " +
        "or rewrite the predicate against buffered event-time state)")
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
