package graft.sql

/** Flink-dialect DDL for the façade — `CREATE TABLE t (cols…,
  * computed AS expr…, PRIMARY KEY (…) NOT ENFORCED, WATERMARK FOR ts
  * AS ts - INTERVAL '5' SECOND) WITH ('connector'='…', …)` (reference
  * parser flink-sql-parser .../ddl/SqlCreateTable.java,
  * SqlWatermark.java; SURVEY §3.1). Spark SQL has no parser slot for
  * WATERMARK/computed-column/connector clauses, so the façade parses
  * the statement itself and registers the table: the connector maps to
  * a Spark reader (filesystem → spark.read.format(format).load(path),
  * datagen → the engine's DSv2 graft-datagen source, values/absent →
  * an empty frame of the declared schema), computed columns become
  * withColumn projections, and watermark + primary key land in the
  * environment's metadata maps that streaming reads and temporal joins
  * already consume.
  */
object FlinkDdl {

  /** `col TYPE METADATA [FROM 'key'] [VIRTUAL]` — a connector-provided
    * column (reference SqlTableColumn.SqlMetadataColumn,
    * flink-sql-parser .../ddl/SqlTableColumn.java:136, bound through
    * SupportsReadingMetadata,
    * flink-table-common/.../source/abilities/SupportsReadingMetadata.java:85).
    * `key` is the connector metadata key (defaults to the column name);
    * `virtual` columns are excluded from the sink schema.
    */
  final case class MetadataCol(name: String, sparkType: String,
                               key: String, virtual: Boolean)

  final case class CreateTableStmt(
      name: String,
      ifNotExists: Boolean,
      columns: Seq[(String, String)],   // (name, Spark DDL type) — physical
      computed: Seq[(String, String)],  // (name, SQL expression)
      primaryKey: Seq[String],
      watermark: Option[(String, String)], // (column, Spark delay string)
      options: Map[String, String],
      partitionedBy: Seq[String] = Nil, // PARTITIONED BY clause, in order
      metadataCols: Seq[MetadataCol] = Nil,
      // physical + metadata column names in DECLARED order — the view's
      // column order (computed columns still append at the end)
      declaredOrder: Seq[String] = Nil,
      // set once the schema EVOLVED past the files on disk (ALTER TABLE
      // ADD/REPLACE COLUMNS): self-describing formats then bind with
      // the DECLARED schema so files written before the evolution
      // null-fill the new columns (Spark's by-name parquet resolution)
      pinSchema: Boolean = false,
      // column name → canonical declared Flink type, captured at parse
      // for spellings Spark's type can't carry (timestamp PRECISION:
      // Spark has exactly one timestamp width, so TIMESTAMP_LTZ(9)
      // stores as `timestamp` and a render from the Spark type alone
      // would drift to the (3) default on SHOW CREATE TABLE / RENAME /
      // LIKE round-trips). render() replays these verbatim.
      flinkTypes: Map[String, String] = Map.empty)

  private val CreateRe =
    """(?is)^\s*CREATE\s+(?:TEMPORARY\s+)?TABLE\s+(IF\s+NOT\s+EXISTS\s+)?([A-Za-z_][\w.]*)\s*\(""".r
  private val DropRe =
    """(?is)^\s*DROP\s+TABLE\s+(IF\s+EXISTS\s+)?([A-Za-z_][\w.]*)\s*;?\s*$""".r
  private val PkRe =
    """(?is)^(?:CONSTRAINT\s+\w+\s+)?PRIMARY\s+KEY\s*\(([^)]*)\)(?:\s+NOT\s+ENFORCED)?\s*$""".r
  private val WmRe = """(?is)^WATERMARK\s+FOR\s+`?(\w+)`?\s+AS\s+(.+)$""".r
  private val WmDelayRe = """(?i)^\s*`?(\w+)`?\s*-\s*INTERVAL\s*'([\d.]+)'\s*(\w+)\s*$""".r
  private val ComputedRe = """(?is)^`?(\w+)`?\s+AS\s+(.+)$""".r
  private val MetadataRe =
    """(?is)^`?(\w+)`?\s+(.+?)\s+METADATA(?:\s+FROM\s+'([^']+)')?(\s+VIRTUAL)?\s*$""".r
  private val ColRe = """(?is)^`?(\w+)`?\s+(.+)$""".r
  private val OptRe = """'([^']*)'\s*=\s*'([^']*)'""".r

  /** True for Flink-flavored CREATE TABLE statements the façade must
    * own (watermark / primary key / connector clause present). Plain
    * Spark DDL is left to Spark.
    */
  def isFlinkCreateTable(sql: String): Boolean =
    CreateRe.findFirstIn(sql).isDefined && (
      "(?i)WATERMARK\\s+FOR".r.findFirstIn(sql).isDefined ||
      "(?i)PRIMARY\\s+KEY".r.findFirstIn(sql).isDefined ||
      "(?i)'connector'".r.findFirstIn(sql).isDefined)

  def isDropTable(sql: String): Boolean = DropRe.findFirstIn(sql).isDefined

  /** `CREATE TABLE t [(body)] [WITH (…)] LIKE base [( like-options )]`
    * (reference SqlTableLike, flink-sql-parser .../ddl/SqlTableLike.java;
    * merge semantics MergeTableLikeUtil.java): the new table derives
    * from `base`, with per-feature merge strategies — INCLUDING |
    * EXCLUDING | OVERWRITING applied to ALL | OPTIONS | CONSTRAINTS |
    * GENERATED | METADATA | PARTITIONS | WATERMARKS.
    */
  final case class LikeStmt(name: String, ifNotExists: Boolean,
                            middle: String, base: String,
                            likeOptions: Seq[(String, String)])

  private val LikeRe =
    """(?is)^\s*CREATE\s+(?:TEMPORARY\s+)?TABLE\s+(IF\s+NOT\s+EXISTS\s+)?([A-Za-z_][\w.]*)\s*(.*?)\s*LIKE\s+([A-Za-z_][\w.]*)\s*(?:\(\s*([^()]*?)\s*\))?\s*;?\s*$""".r

  def parseLike(sql: String): Option[LikeStmt] =
    // the lazy middle group must not swallow a LIKE inside a quoted
    // option value — only treat it as a table-LIKE when the keyword
    // sits outside quotes (scan from the END: the clause is trailing)
    LikeRe.findFirstMatchIn(sql).filter { m =>
      sql.substring(0, m.start(4)).count(_ == '\'') % 2 == 0
    }.map { m =>
      val optRe =
        """(?is)^(INCLUDING|EXCLUDING|OVERWRITING)\s+(ALL|OPTIONS|CONSTRAINTS|GENERATED|METADATA|PARTITIONS|WATERMARKS)\b[\s,]*""".r
      val opts = Option(m.group(5)).toSeq.flatMap { txt =>
        // the option list must consume the WHOLE parenthesized text —
        // a typo (`INCLUDNG OPTIONS`) must error, not silently fall
        // back to the INCLUDING ALL default (reference parser rejects)
        val acc = Vector.newBuilder[(String, String)]
        var rest = txt.trim
        while (rest.nonEmpty) {
          optRe.findFirstMatchIn(rest) match {
            case Some(o) =>
              acc += ((o.group(1).toUpperCase, o.group(2).toUpperCase))
              rest = rest.substring(o.end)
            case None => throw new IllegalArgumentException(
              s"cannot parse LIKE option at '${rest.take(40)}' (expected " +
                "INCLUDING|EXCLUDING|OVERWRITING ALL|OPTIONS|CONSTRAINTS|" +
                "GENERATED|METADATA|PARTITIONS|WATERMARKS)")
          }
        }
        acc.result()
      }
      LikeStmt(m.group(2), m.group(1) != null, m.group(3).trim,
        m.group(4), opts)
    }

  /** Render a parsed statement back to canonical Flink DDL text — the
    * catalog-snapshot form for derived tables (CREATE TABLE LIKE,
    * ALTER TABLE RENAME): a compiled plan replays tables sorted by
    * name, so a stored `LIKE base` text could replay before its base;
    * the rendered text is self-contained.
    */
  def render(stmt: CreateTableStmt): String = {
    val declared =
      if (stmt.declaredOrder.nonEmpty) stmt.declaredOrder
      else stmt.columns.map(_._1)
    val colMap = stmt.columns.toMap
    val metaMap = stmt.metadataCols.map(m => (m.name, m)).toMap
    // a column's DECLARED spelling (explicit timestamp precision) wins
    // over the Spark-type re-render, which can only produce the (3)
    // default — keeps SHOW CREATE TABLE / RENAME / LIKE round-trips
    // from silently rewriting TIMESTAMP_LTZ(9) to TIMESTAMP_LTZ(3)
    def typeOf(n: String, sparkT: String): String =
      stmt.flinkTypes.getOrElse(n, renderType(sparkT))
    val items =
      declared.map { n =>
        metaMap.get(n) match {
          case Some(m) =>
            s"$n ${typeOf(n, m.sparkType)} METADATA FROM '${m.key}'" +
              (if (m.virtual) " VIRTUAL" else "")
          case None => s"$n ${typeOf(n, colMap(n))}"
        }
      } ++
      stmt.computed.map { case (n, e) => s"$n AS $e" } ++
      (if (stmt.primaryKey.nonEmpty)
        Seq(s"PRIMARY KEY (${stmt.primaryKey.mkString(", ")}) NOT ENFORCED")
      else Nil) ++
      stmt.watermark.toSeq.map { case (c, delay) =>
        val parts = delay.split("\\s+", 2)
        if (parts(0) == "0") s"WATERMARK FOR $c AS $c"
        else s"WATERMARK FOR $c AS $c - INTERVAL '${parts(0)}' ${parts(1).stripSuffix("s").toUpperCase}"
      }
    val part =
      if (stmt.partitionedBy.nonEmpty)
        s" PARTITIONED BY (${stmt.partitionedBy.mkString(", ")})"
      else ""
    val opts =
      if (stmt.options.nonEmpty)
        " WITH (" + stmt.options.toSeq.sortBy(_._1)
          .map { case (k, v) => s"'$k' = '$v'" }.mkString(", ") + ")"
      else ""
    s"CREATE TABLE ${stmt.name} (${items.mkString(", ")})$part$opts"
  }

  /** Stored Spark type → the Flink spelling for rendered snapshots.
    * Spark `timestamp` is the instant type (Flink TIMESTAMP_LTZ) while
    * bare Flink TIMESTAMP is without-time-zone, which [[sparkType]]
    * maps to `timestamp_ntz` — rendering the stored Spark name
    * verbatim would silently drift a TIMESTAMP_LTZ column to ntz on
    * re-parse (SHOW CREATE TABLE replay, compiled-plan round-trip).
    * Recurses into array/map/struct so a nested `array<timestamp>`
    * element gets the same protection.
    */
  private def renderType(sparkT: String): String = {
    val t = sparkT.trim
    val low = t.toLowerCase
    if (low == "timestamp") "TIMESTAMP_LTZ(3)"
    else if (low == "timestamp_ntz") "TIMESTAMP(3)"
    else if (low.startsWith("array<") && low.endsWith(">"))
      s"array<${renderType(t.substring(6, t.length - 1))}>"
    else if (low.startsWith("map<") && low.endsWith(">")) {
      val parts = splitTopLevel(t.substring(4, t.length - 1))
      require(parts.length == 2, s"cannot parse map type: $t")
      s"map<${renderType(parts(0))},${renderType(parts(1))}>"
    } else if (low.startsWith("struct<") && low.endsWith(">")) {
      val fields = splitTopLevel(t.substring(7, t.length - 1)).map(_.trim).map { f =>
        val i = f.indexOf(':')
        require(i > 0, s"cannot parse struct field (expected name:type): $f")
        s"${f.substring(0, i).trim}:${renderType(f.substring(i + 1))}"
      }
      s"struct<${fields.mkString(",")}>"
    } else t
  }

  def parseDrop(sql: String): (String, Boolean) = {
    val m = DropRe.findFirstMatchIn(sql).get
    (m.group(2), m.group(1) != null)
  }

  def parse(sql: String): CreateTableStmt = {
    val header = CreateRe.findFirstMatchIn(sql).getOrElse(
      throw new IllegalArgumentException(s"not a CREATE TABLE statement: $sql"))
    val name = header.group(2)
    val bodyStart = header.end // index just after the opening paren
    val bodyEnd = matchParen(sql, bodyStart - 1)
    val body = sql.substring(bodyStart, bodyEnd)

    var columns = Vector.empty[(String, String)]
    var computed = Vector.empty[(String, String)]
    var metadata = Vector.empty[MetadataCol]
    var order = Vector.empty[String]
    var pk = Seq.empty[String]
    var wm: Option[(String, String)] = None
    var declared = Map.empty[String, String]
    def noteDeclared(n: String, t: String): Unit =
      canonicalTimestamp(t).foreach(c => declared += (n -> c))
    splitTopLevel(body).map(_.trim).filter(_.nonEmpty).foreach {
      case PkRe(cols) =>
        pk = cols.split(',').map(_.trim.stripPrefix("`").stripSuffix("`")).toSeq
      case WmRe(col, expr) =>
        wm = Some((col, delayOf(col, expr.trim)))
      case item =>
        // A column is `name TYPE …`, `name TYPE METADATA …`, or
        // `name AS expr` (computed). METADATA must be checked before
        // the plain form — `off BIGINT METADATA VIRTUAL` also matches
        // ColRe with the keywords glued onto the type.
        item match {
          case MetadataRe(n, t, key, virt) =>
            metadata :+= MetadataCol(n, sparkType(stripColTail(t)),
              Option(key).getOrElse(n), virt != null)
            order :+= n; noteDeclared(n, stripColTail(t))
          case ComputedRe(n, e) => computed :+= ((n, e.trim))
          case ColRe(n, t)      =>
            columns :+= ((n, sparkType(stripColTail(t)))); order :+= n
            noteDeclared(n, stripColTail(t))
          case other =>
            throw new IllegalArgumentException(s"cannot parse column definition: $other")
        }
    }

    // Trailing clauses between the column body and end-of-statement:
    // [COMMENT '…'] [PARTITIONED BY (…)] [WITH (…)]. Anything else is
    // REJECTED loudly — the earlier unanchored WITH scan silently
    // dropped unknown clauses (a PARTITIONED BY would vanish), which is
    // a silent semantic change, worse than an error.
    var rest = sql.substring(bodyEnd + 1)
    rest = "(?is)^\\s*COMMENT\\s+'[^']*'".r.replaceFirstIn(rest, "")
    var partitionedBy = Seq.empty[String]
    "(?is)^\\s*PARTITIONED\\s+BY\\s*\\(".r.findFirstMatchIn(rest).foreach { m =>
      val pEnd = matchParen(rest, m.end - 1)
      partitionedBy = rest.substring(m.end, pEnd).split(',')
        .map(_.trim.stripPrefix("`").stripSuffix("`")).toSeq
      rest = rest.substring(pEnd + 1)
    }
    val options = "(?is)^\\s*WITH\\s*\\(".r.findFirstMatchIn(rest) match {
      case Some(w) =>
        val oEnd = matchParen(rest, w.end - 1)
        val opts = OptRe.findAllMatchIn(rest.substring(w.end, oEnd))
          .map(m => (m.group(1).toLowerCase, m.group(2))).toMap
        rest = rest.substring(oEnd + 1)
        opts
      case None => Map.empty[String, String]
    }
    val leftover = rest.trim.stripSuffix(";").trim
    require(leftover.isEmpty,
      s"unsupported trailing clause in CREATE TABLE $name: " +
        leftover.linesIterator.mkString(" ").take(80))
    val physNames = columns.map(_._1).toSet
    partitionedBy.foreach(p => require(physNames.contains(p),
      s"PARTITIONED BY column $p is not a physical column of $name"))
    CreateTableStmt(name, header.group(1) != null, columns, computed, pk, wm,
      options, partitionedBy, metadata, order, flinkTypes = declared)
  }

  /** Canonical Flink spelling for a declared timestamp type with an
    * EXPLICIT precision (the only type whose declared form the Spark
    * type cannot reproduce — Spark has one timestamp width). Returns
    * None for every other type and for precision-less timestamps,
    * which keep render()'s (3) default.
    */
  private def canonicalTimestamp(t: String): Option[String] = {
    val up = t.trim.toUpperCase.replaceAll("\\s+", " ")
    val ltzRe = "^TIMESTAMP_LTZ\\((\\d+)\\)$".r
    val withLtzRe = "^TIMESTAMP\\((\\d+)\\) WITH LOCAL TIME ZONE$".r
    val ntzRe = "^TIMESTAMP\\((\\d+)\\)$".r
    up match {
      case ltzRe(p)     => Some(s"TIMESTAMP_LTZ($p)")
      case withLtzRe(p) => Some(s"TIMESTAMP_LTZ($p)")
      case ntzRe(p)     => Some(s"TIMESTAMP($p)")
      case _            => None
    }
  }

  /** Rewrite a CREATE TABLE's WITH clause to carry `newOptions`
    * (sorted for stable output) — ALTER TABLE … SET support: the
    * altered catalog snapshot (ddlLog) must re-execute to the altered
    * table (reference SqlAlterTableOptions, flink-sql-parser
    * .../ddl/SqlAlterTable.java:42).
    */
  def replaceOptions(sql: String, newOptions: Map[String, String]): String = {
    val rendered = newOptions.toSeq.sortBy(_._1)
      .map { case (k, v) => s"'$k' = '$v'" }.mkString(", ")
    "(?is)WITH\\s*\\(".r.findFirstMatchIn(sql) match {
      case Some(w) =>
        val oEnd = matchParen(sql, w.end - 1)
        sql.substring(0, w.end) + rendered + sql.substring(oEnd)
      case None =>
        sql.trim.stripSuffix(";") + s" WITH ($rendered)"
    }
  }

  /** WATERMARK expr → Spark delay string: `ts - INTERVAL '5' SECOND` →
    * "5 second"; a bare `ts` (strictly-ascending watermark) → 0.
    */
  private def delayOf(col: String, expr: String): String = expr match {
    case WmDelayRe(c, n, unit) =>
      require(c.equalsIgnoreCase(col),
        s"watermark expression must reference its own column $col, got $c")
      s"$n ${unit.toLowerCase}"
    case e if e.equalsIgnoreCase(col) => "0 seconds"
    case other => throw new IllegalArgumentException(
      s"unsupported watermark expression (expected `$col - INTERVAL '<n>' <unit>`): $other")
  }

  /** Drop NOT NULL / COMMENT tails from a column's type text. */
  private def stripColTail(t: String): String =
    t.replaceAll("(?is)\\s+NOT\\s+NULL.*$", "")
      .replaceAll("(?is)\\s+COMMENT\\s+'.*$", "").trim

  /** Flink type name → Spark DDL type (reference type root mapping,
    * flink-table-common .../types/logical/LogicalTypeRoot.java).
    */
  def sparkType(flinkType: String): String = {
    val t = flinkType.trim
    val up = t.toUpperCase
    if (up.startsWith("ARRAY<") && up.endsWith(">"))
      s"array<${sparkType(t.substring(6, t.length - 1))}>"
    else if (up.startsWith("MAP<") && up.endsWith(">")) {
      val inner = t.substring(4, t.length - 1)
      val parts = splitTopLevel(inner)
      require(parts.length == 2, s"cannot parse MAP type: $t")
      s"map<${sparkType(parts(0))},${sparkType(parts(1))}>"
    } else if (up.startsWith("ROW<") && up.endsWith(">")) {
      // ROW<f0 INT, f1 STRING> → struct<f0:int,f1:string> (reference
      // LogicalTypeRoot.ROW, RowType.java). Fields are `name TYPE`
      // pairs split at top level so nested generics stay intact.
      val fields = splitTopLevel(t.substring(4, t.length - 1)).map(_.trim).map {
        case ColRe(n, ft) => s"$n:${sparkType(stripColTail(ft))}"
        case other => throw new IllegalArgumentException(
          s"cannot parse ROW field (expected `name TYPE`): $other")
      }
      s"struct<${fields.mkString(",")}>"
    } else if (up.startsWith("STRUCT<") && up.endsWith(">")) {
      // Spark-spelled struct (appears when a RENDERED snapshot —
      // CREATE TABLE LIKE / ALTER TABLE RENAME — re-parses; fields are
      // name:type)
      val fields = splitTopLevel(t.substring(7, t.length - 1)).map(_.trim).map { f =>
        val i = f.indexOf(':')
        require(i > 0, s"cannot parse STRUCT field (expected name:type): $f")
        s"${f.substring(0, i).trim}:${sparkType(f.substring(i + 1))}"
      }
      s"struct<${fields.mkString(",")}>"
    } else if (up.startsWith("MULTISET<") && up.endsWith(">"))
      // MULTISET<e> → map<e,int> — element → multiplicity, the
      // reference's own external representation of multisets
      // (LogicalTypeRoot.MULTISET; CollectAggFunction emits Map<T,Int>).
      s"map<${sparkType(t.substring(9, t.length - 1))},int>"
    else if (up.startsWith("DECIMAL") || up.startsWith("NUMERIC"))
      t.toLowerCase.replace("numeric", "decimal")
    else if (up.startsWith("VARCHAR") || up.startsWith("CHAR") || up == "STRING") "string"
    else if (up.startsWith("TIMESTAMP_LTZ") ||
      (up.startsWith("TIMESTAMP") && up.contains("LOCAL TIME ZONE"))) "timestamp"
    else if (up.startsWith("TIMESTAMP"))
      // TIMESTAMP(p) in Flink is WITHOUT time zone (SURVEY §1.2 maps it
      // to Spark timestamp_ntz); only TIMESTAMP_LTZ is the
      // instant/local-time-zone type that Spark's `timestamp` models.
      "timestamp_ntz"
    else up match {
      case "BOOLEAN"          => "boolean"
      case "TINYINT"          => "tinyint"
      case "SMALLINT"         => "smallint"
      case "INT" | "INTEGER"  => "int"
      case "BIGINT"           => "bigint"
      case "FLOAT"            => "float"
      case "DOUBLE"           => "double"
      case "DATE"             => "date"
      case "BYTES" | "VARBINARY" | "BINARY" => "binary"
      case other => throw new IllegalArgumentException(
        s"unsupported Flink type in DDL: $other")
    }
  }

  /** Index of the ')' matching the '(' at `open` (quote-aware). */
  private def matchParen(s: String, open: Int): Int = {
    var depth = 0; var i = open; var inQ = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\'') inQ = !inQ
      else if (!inQ && c == '(') depth += 1
      else if (!inQ && c == ')') { depth -= 1; if (depth == 0) return i }
      i += 1
    }
    throw new IllegalArgumentException(s"unbalanced parentheses in DDL: $s")
  }

  /** Split on commas at paren/angle-bracket depth 0, outside quotes.
    * An angle bracket only opens depth right after a generic type name
    * (ARRAY/MAP/ROW/MULTISET) or inside one, so a bare `>` in a
    * computed expression (`flag AS price > 100`) is left alone.
    */
  private def splitTopLevel(s: String): Seq[String] = {
    val generic = """(?is)(?:ARRAY|MAP|ROW|MULTISET|STRUCT)\s*$""".r
    val out = Vector.newBuilder[String]
    var depth = 0; var angle = 0; var start = 0; var inQ = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\'') inQ = !inQ
      else if (!inQ && c == '(') depth += 1
      else if (!inQ && c == ')') depth -= 1
      else if (!inQ && c == '<' &&
        (angle > 0 || generic.findFirstIn(s.substring(start, i)).isDefined)) angle += 1
      else if (!inQ && c == '>' && angle > 0) angle -= 1
      else if (!inQ && depth == 0 && angle == 0 && c == ',') {
        out += s.substring(start, i); start = i + 1
      }
      i += 1
    }
    out += s.substring(start)
    out.result()
  }
}
