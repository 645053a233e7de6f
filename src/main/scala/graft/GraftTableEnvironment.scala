package graft

import graft.functions.FlinkFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.mutable

/** TableEnvironment-like façade over SparkSession — the user entry point
  * matching the reference's surface (TableEnvironmentImpl.sqlQuery at
  * flink-table-api-java .../internal/TableEnvironmentImpl.java:715,
  * executeSql at :735; SURVEY.md §3.1, §7.1).
  *
  * Per the survey's architecture stance, ~90% of the work delegates to
  * Spark SQL/Catalyst; the façade owns only what Spark has no DDL slot
  * for: per-table watermark declarations (applied when a table is read
  * in a streaming context), primary-key metadata (drives upsert/dedup
  * behavior), and registration of the engine's gap functions.
  */
class GraftTableEnvironment private (val spark: SparkSession,
                                     val isStreamingMode: Boolean) {
  private val watermarkDecl = mutable.Map[String, (String, String)]()
  private val primaryKeys = mutable.Map[String, Seq[String]]()
  private val temporalFns = mutable.Map[String, (String, Seq[String], String)]()
  // original CREATE TABLE text per DDL-defined table — the catalog
  // snapshot a compiled plan persists (programmatic views can't be
  // serialized; same restriction as the reference, whose plans carry
  // catalog tables, not inline DataStreams)
  private val ddlLog = mutable.Map[String, String]()
  // parsed form, kept so INSERT INTO can bind the table's SINK side
  private val ddlStmts = mutable.Map[String, graft.sql.FlinkDdl.CreateTableStmt]()

  // —— Catalog / database namespace (reference CatalogManager,
  // flink-table-api-java .../catalog/CatalogManager.java; DDL parser
  // classes SqlCreateCatalog.java, SqlCreateDatabase.java,
  // SqlUseCatalog.java, SqlUseDatabase.java). Spark temp views live in
  // one flat namespace, so the façade scopes them logically: every
  // table records the (catalog, database) current at creation, and
  // SHOW TABLES lists only the current database — the same visibility
  // contract as the reference's in-memory catalog. ——
  private var currentCat = "default_catalog"
  private var currentDb = "default_database"
  private val catalogs = mutable.LinkedHashSet("default_catalog")
  private val databases = mutable.LinkedHashSet(("default_catalog", "default_database"))
  private val tableNamespace = mutable.Map[String, (String, String)]()
  // views created via CREATE VIEW (SHOW VIEWS lists exactly these —
  // the reference distinguishes views from tables in the catalog)
  private val viewNames = mutable.SortedSet[String]()
  // view definition text (the AS body) + per-view options (reference
  // CatalogView carries an options map; SqlAlterViewProperties merges
  // into it) — together they back SHOW CREATE VIEW reflection
  private val viewDdl = mutable.Map[String, String]()
  private val viewProps = mutable.Map[String, Map[String, String]]()
  // SET/RESET session config (SqlSet.java; TableConfig) + the Spark
  // conf originals RESET restores
  private val sessionConfig = mutable.LinkedHashMap[String, String]()
  private val savedSparkConf = mutable.Map[String, Option[String]]()
  // module system (reference ModuleManager, SqlLoadModule/SqlUseModules):
  // insertion-ordered name → used flag; 'core' carries the engine's
  // gap-function library
  private val modules = mutable.LinkedHashMap("core" -> true)
  // database properties + comment (SqlCreateDatabase WITH/COMMENT,
  // SqlAlterDatabase merges; DESCRIBE DATABASE reads)
  private val dbProps = mutable.Map[(String, String), Map[String, String]]()
  private val dbComments = mutable.Map[(String, String), String]()
  // session resource jars (SqlAddJar/SqlShowJars/SqlRemoveJar;
  // reference ResourceManager tracks URLs the SQL client registered)
  private val jars = mutable.LinkedHashSet[String]()

  // All metadata maps are keyed by LOWER-CASED table name: Spark
  // resolves temp-view names case-insensitively, so `INSERT INTO
  // FS_SINK` must find the binding of a table created as `fs_sink`
  // (a case-sensitive miss would fall through to Spark and fail with
  // an unrelated "cannot insert into a view" error).
  private def norm(name: String): String =
    name.toLowerCase(java.util.Locale.ROOT)

  // Option-literal escaping (the SQL dialect doubles single quotes, as
  // the reference's Calcite lexer does): rendering escapes ' -> '' so
  // the SHOW CREATE … snapshot re-parses for ANY accepted value, and
  // the paired regex/unescape below accepts '' inside quoted literals,
  // making values containing ' or ) round-trip instead of silently
  // mis-parsing.
  private def sqlQuote(s: String): String = s.replace("'", "''")
  private def sqlUnquote(s: String): String = s.replace("''", "'")
  /** `'k' = 'v'` pairs, doubled-quote escapes allowed inside literals. */
  private val optionKvRe = "'((?:[^']|'')*)'\\s*=\\s*'((?:[^']|'')*)'".r
  private def parseOptionKvs(blob: String): Seq[(String, String)] =
    optionKvRe.findAllMatchIn(blob)
      .map(m => (sqlUnquote(m.group(1)), sqlUnquote(m.group(2)))).toSeq
  /** WITH-clause body: quote-aware, so ')' inside a quoted value does
    * not terminate the clause early. For use inside other regexes. */
  private val withBlobRe = "(?:[^()']|'(?:[^']|'')*')*"

  /** Register a temporal TABLE FUNCTION over a versioned table — the
    * reference's `Table.createTemporalTableFunction(timeAttr, key)` +
    * `createTemporarySystemFunction(name, fn)` pair (resolved by the
    * planner's LogicalCorrelateToJoinFromTemporalTableFunctionRule).
    * Queries may then join it with the legacy spelling
    * `FROM Orders o, LATERAL TABLE (name(o.ts)) AS r WHERE o.k = r.k`,
    * which executeSql rewrites to the same validity-interval join as
    * `FOR SYSTEM_TIME AS OF`.
    */
  def createTemporalTableFunction(fnName: String, table: String,
      timeAttr: String, primaryKey: Seq[String]): Unit = {
    require(primaryKey.nonEmpty, "temporal table function needs a primary key")
    temporalFns(fnName) = (table, primaryKey, timeAttr)
  }

  /** DQL/DML/DDL passthrough to Spark SQL (gap functions registered).
    * Three dialect gaps are bridged first: Flink group-window syntax
    * (TUMBLE/HOP/SESSION + auxiliaries, window TVFs) rewrites to
    * Spark's window()/session_window() spellings; `FOR SYSTEM_TIME AS
    * OF` temporal joins rewrite to validity-interval joins using the
    * probed table's declared primary key + watermark column
    * (StreamExecTemporalJoin parity); and MATCH_RECOGNIZE clauses —
    * which Spark SQL has no parser slot for — are split out and
    * executed on the engine's NFA, mirroring the reference planner's
    * StreamExecMatch node.
    */
  def executeSql(sql: String): DataFrame = {
    import graft.sql.FlinkDdl
    // CREATE TABLE … LIKE must be probed before the plain form — the
    // trailing LIKE clause is not part of SqlCreateTable's grammar and
    // would be rejected as an unsupported trailing clause.
    FlinkDdl.parseLike(sql) match {
      case Some(like) if ddlStmts.contains(norm(like.base)) =>
        return executeCreateTableLike(like)
      case Some(like) if "(?i)'connector'".r.findFirstIn(sql).isDefined ||
          like.middle.nonEmpty =>
        throw new IllegalArgumentException(
          s"CREATE TABLE LIKE base ${like.base} is not a DDL-defined table")
      case _ =>
    }
    if (FlinkDdl.isFlinkCreateTable(sql)) return executeCreateTable(sql)
    if (FlinkDdl.isDropTable(sql)) {
      val (name, ifExists) = FlinkDdl.parseDrop(sql)
      val dropped = spark.catalog.dropTempView(name)
      // Not a temp view of ours: a catalog table created via
      // pass-through Spark DDL in this same façade must stay droppable —
      // delegate the statement to Spark instead of failing.
      if (!dropped && spark.catalog.tableExists(name)) spark.sql(sql)
      else require(dropped || ifExists, s"table not found: $name")
      watermarkDecl.remove(norm(name)); primaryKeys.remove(norm(name))
      ddlLog.remove(norm(name)); ddlStmts.remove(norm(name))
      tableNamespace.remove(norm(name))
      return okResult()
    }
    // Catalog statements (SqlShowTables/SqlShowFunctions/SqlDescribeTable
    // in the reference's flink-sql-parser; TableEnvironmentImpl routes
    // them at executeInternal): answered from the same catalog state
    // the programmatic listTables/listFunctions expose.
    val trimmed = sql.trim

    // STATEMENT SET as SQL — both the TableEnvironment spelling
    // (`EXECUTE STATEMENT SET BEGIN … END`, dml/SqlExecute) and the
    // SQL-client script spelling (`BEGIN STATEMENT SET; … END;`,
    // dml/SqlBeginStatementSet.java:33). Members must be INSERTs (the
    // reference's "only insert statements" rule); they run through the
    // same createStatementSet path the programmatic API uses.
    val stmtSetRe =
      "(?is)^(?:EXECUTE\\s+STATEMENT\\s+SET\\s+BEGIN|BEGIN\\s+STATEMENT\\s+SET\\s*;)\\s*(.*?)\\s*END\\s*;?\\s*$".r
    trimmed match {
      case stmtSetRe(body) =>
        val members = splitStatements(body).map(_.trim).filter(_.nonEmpty)
        require(members.nonEmpty, "empty STATEMENT SET")
        members.foreach(m => require(
          m.toUpperCase(java.util.Locale.ROOT).startsWith("INSERT"),
          s"only INSERT statements are allowed in a STATEMENT SET, got: ${m.take(60)}"))
        val ss = createStatementSet()
        members.foreach(ss.addInsertSql)
        ss.execute()
        return okResult()
      case _ =>
    }

    // Catalog / database / module / partition / config statements
    // (CREATE CATALOG, CREATE DATABASE, USE, SHOW …, LOAD MODULE,
    // SET/RESET, ALTER TABLE RENAME/ADD PARTITION/DROP PARTITION).
    catalogStatement(trimmed).foreach(df => return df)

    // Schema evolution + ALTER VIEW/DATABASE/FUNCTION + JAR resources +
    // DESCRIBE CATALOG/DATABASE (day-2 DDL: SqlAddReplaceColumns,
    // SqlChangeColumn, SqlAlterTableReset, SqlAlterTableAddConstraint,
    // SqlAlterViewAs/Rename, SqlAlterDatabase, SqlAlterFunction,
    // SqlAddJar/SqlShowJars/SqlRemoveJar, SqlDescribeCatalog/Database).
    alterStatement(trimmed).foreach(df => return df)

    // SHOW CREATE TABLE (dql/SqlShowCreateTable.java:34): replay the
    // ORIGINAL DDL text from the catalog snapshot (post-ALTER text if
    // the table's options were altered).
    val showCreateRe = "(?is)^SHOW\\s+CREATE\\s+TABLE\\s+([A-Za-z_][\\w.]*)\\s*;?$".r
    val showCreateViewRe =
      "(?is)^SHOW\\s+CREATE\\s+VIEW\\s+([A-Za-z_][\\w.]*)\\s*;?$".r
    trimmed match {
      case showCreateRe(tbl) =>
        import spark.implicits._
        val ddl = ddlLog.getOrElse(norm(tbl), throw new IllegalArgumentException(
          s"SHOW CREATE TABLE covers DDL-defined tables; $tbl is not one"))
        return Seq(ddl).toDF("result")
      // SHOW CREATE VIEW (dql/SqlShowCreateView.java): rebuild the
      // snapshot from the stored body + options map. Options render as
      // a WITH clause (CatalogView options have no slot in the
      // reference's CREATE VIEW grammar; rendering them keeps the
      // snapshot self-contained — executeSql re-accepts the clause).
      case showCreateViewRe(v) =>
        import spark.implicits._
        require(viewNames.contains(norm(v)),
          s"SHOW CREATE VIEW covers views created via CREATE VIEW; $v is not one")
        val body = viewDdl.getOrElse(norm(v), throw new IllegalArgumentException(
          s"no stored definition for view $v (created programmatically)"))
        val props = viewProps.getOrElse(norm(v), Map.empty)
        val withClause =
          if (props.isEmpty) ""
          else " WITH (" + props.toSeq.sortBy(_._1)
            .map { case (k, x) => s"'${sqlQuote(k)}' = '${sqlQuote(x)}'" }
            .mkString(", ") + ")"
        return Seq(s"CREATE VIEW $v$withClause AS $body").toDF("result")
      case _ =>
    }

    // ALTER TABLE t SET ('k' = 'v', …) (ddl/SqlAlterTableOptions):
    // merge the new options into the parsed statement, re-bind the
    // connector (a changed path/format takes effect immediately), and
    // rewrite the catalog snapshot so SHOW CREATE TABLE and compiled
    // plans reflect the altered table.
    val alterSetRe =
      "(?is)^ALTER\\s+TABLE\\s+([A-Za-z_][\\w.]*)\\s+SET\\s*\\((.*)\\)\\s*;?$".r
    trimmed match {
      case alterSetRe(tbl, optsText) =>
        val stmt = ddlStmts.getOrElse(norm(tbl), throw new IllegalArgumentException(
          s"ALTER TABLE covers DDL-defined tables; $tbl is not one"))
        val newOpts = "'([^']*)'\\s*=\\s*'([^']*)'".r.findAllMatchIn(optsText)
          .map(m => (m.group(1).toLowerCase, m.group(2))).toMap
        require(newOpts.nonEmpty, s"no options in ALTER TABLE SET: $optsText")
        val altered = stmt.copy(options = stmt.options ++ newOpts)
        registerFromStmt(altered)
        ddlStmts(norm(tbl)) = altered
        ddlLog(norm(tbl)) =
          graft.sql.FlinkDdl.replaceOptions(ddlLog(norm(tbl)), altered.options)
        return okResult()
      case _ =>
    }

    // CREATE/DROP FUNCTION (ddl/SqlCreateFunction.java:39,
    // SqlDropFunction): the reference binds AS 'class' by loading the
    // class; with no dynamic classloading here, the target names an
    // ALREADY-REGISTERED function (engine gap functions or Spark
    // built-ins) and the statement registers an alias in the session's
    // FunctionRegistry — documented deviation (MIGRATION.md).
    val createFnRe =
      ("(?is)^CREATE\\s+(?:TEMPORARY\\s+)?(?:SYSTEM\\s+)?FUNCTION\\s+" +
        "(IF\\s+NOT\\s+EXISTS\\s+)?([A-Za-z_]\\w*)\\s+AS\\s+'([^']+)'" +
        "(?:\\s+LANGUAGE\\s+(?:JAVA|SCALA))?(?:\\s+USING\\s+JAR\\s+'([^']+)')?\\s*;?$").r
    val dropFnRe =
      "(?is)^DROP\\s+(?:TEMPORARY\\s+)?(?:SYSTEM\\s+)?FUNCTION\\s+(IF\\s+EXISTS\\s+)?([A-Za-z_]\\w*)\\s*;?$".r
    trimmed match {
      case createFnRe(ifNotExists, name, target, jar) =>
        val reg = spark.sessionState.functionRegistry
        import org.apache.spark.sql.catalyst.FunctionIdentifier
        if (reg.functionExists(FunctionIdentifier(name))) {
          require(ifNotExists != null, s"function $name already exists")
          return okResult()
        }
        if (jar != null) {
          // USING JAR: dynamic classloading path (SqlCreateFunction's
          // resource list) — the class must implement UDF0..UDF3
          registerJarFunction(name, target, jar)
          return okResult()
        }
        val builder = reg.lookupFunctionBuilder(FunctionIdentifier(target))
          .getOrElse(throw new IllegalArgumentException(
            s"CREATE FUNCTION target '$target' is not a registered function " +
              "(no dynamic classloading here — alias an engine or Spark " +
              "built-in function name)"))
        reg.registerFunction(FunctionIdentifier(name),
          new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
            "graft.sql.FunctionAlias", name),
          builder)
        return okResult()
      case dropFnRe(ifExists, name) =>
        val reg = spark.sessionState.functionRegistry
        import org.apache.spark.sql.catalyst.FunctionIdentifier
        val dropped = reg.dropFunction(FunctionIdentifier(name))
        require(dropped || ifExists != null, s"function not found: $name")
        return okResult()
      case _ =>
    }
    // INSERT INTO/OVERWRITE a DDL-defined connector table — the
    // reference's primary write path (CommonExecSink: the planner binds
    // the statement's target to the DynamicTableSink of the CREATE
    // TABLE's connector). Non-DDL targets fall through to Spark SQL
    // (catalog tables keep their native INSERT).
    val insertRe = "(?is)^INSERT\\s+(INTO|OVERWRITE)\\s+([A-Za-z_][\\w.]*)\\s+(.+)$".r
    trimmed match {
      case insertRe(mode, tbl, rest0) if ddlStmts.contains(norm(tbl)) =>
        val (rest, staticParts, colList) = parseInsertTail(rest0)
        return executeInsert(ddlStmts(norm(tbl)),
          mode.equalsIgnoreCase("OVERWRITE"), rest, staticParts, colList)
      case _ =>
    }
    // CREATE [TEMPORARY] VIEW v AS <query> (reference SqlCreateView,
    // flink-sql-parser .../ddl/SqlCreateView.java): the body goes
    // through the façade — so Flink-dialect group windows, temporal
    // joins, and MATCH_RECOGNIZE work inside a view definition, which
    // plain Spark SQL pass-through would reject.
    // An optional `WITH ('k'='v', …)` before AS carries view options
    // (reference CatalogView options — populated there via catalog
    // APIs or ALTER VIEW SET; accepted in the CREATE here so the
    // SHOW CREATE VIEW snapshot below round-trips through executeSql).
    val createViewRe =
      ("(?is)^CREATE\\s+(OR\\s+REPLACE\\s+)?(?:TEMPORARY\\s+)?VIEW\\s+" +
        "([A-Za-z_][\\w.]*)\\s*(WITH\\s*\\(" + withBlobRe +
        "\\))?\\s+AS\\s+(.+)$").r
    val dropViewRe =
      "(?is)^DROP\\s+VIEW\\s+(IF\\s+EXISTS\\s+)?([A-Za-z_][\\w.]*)\\s*;?$".r
    trimmed match {
      case createViewRe(orReplace, name, withClause, body) =>
        // Plain CREATE VIEW fails when the name exists (the reference's
        // SqlCreateView "view already exists" contract); only OR
        // REPLACE replaces.
        require(orReplace != null || !spark.catalog.tableExists(name),
          s"view $name already exists (use CREATE OR REPLACE VIEW)")
        createTemporaryView(name, executeSql(body))
        viewNames.add(norm(name))
        viewDdl(norm(name)) = body.trim.stripSuffix(";").trim
        viewProps(norm(name)) =
          Option(withClause).map(parseOptionKvs(_).toMap).getOrElse(Map.empty)
        return okResult()
      case dropViewRe(ifExists, name) =>
        // A DDL-defined connector TABLE is backed by a temp view too,
        // but DROP VIEW must not silently orphan its sink binding —
        // the reference refuses DROP VIEW on a table.
        require(!ddlStmts.contains(norm(name)),
          s"$name is a table, not a view — use DROP TABLE")
        val dropped = spark.catalog.dropTempView(name)
        require(dropped || ifExists != null, s"view not found: $name")
        viewNames.remove(norm(name)); tableNamespace.remove(norm(name))
        viewDdl.remove(norm(name)); viewProps.remove(norm(name))
        return okResult()
      case _ =>
    }
    if (trimmed.matches("(?is)SHOW\\s+TABLES\\s*;?")) {
      import spark.implicits._
      // scoped to the current database (reference SqlShowTables lists
      // the current catalog.database); tables registered outside any
      // USE belong to default_catalog.default_database
      return listTables().filter { tbl =>
        tableNamespace.getOrElse(norm(tbl),
          ("default_catalog", "default_database")) == (currentCat, currentDb)
      }.sorted.toDF("table name")
    }
    if (trimmed.matches("(?is)SHOW\\s+FUNCTIONS\\s*;?")) {
      import spark.implicits._
      return listFunctions().sorted.toDF("function name")
    }
    val explainRe = "(?is)EXPLAIN\\s+PLAN\\s+FOR\\s+(.+)".r
    trimmed match {
      case explainRe(stmt0) =>
        import spark.implicits._
        // The reference's dql/SqlRichExplain.java wraps INSERT
        // statements as well as queries: route an INSERT body through
        // the insert planner in plan-only mode (clause binding + column
        // alignment happen; the sink is NEVER written) and prefix the
        // sink binding the write would use.
        stmt0.trim match {
          case insertRe(mode, tbl, rest0) if ddlStmts.contains(norm(tbl)) =>
            val (rest, staticParts, colList) = parseInsertTail(rest0)
            val target = ddlStmts(norm(tbl))
            val frame = executeInsert(target,
              mode.equalsIgnoreCase("OVERWRITE"), rest, staticParts,
              colList, planOnly = true)
            val sink = s"== Sink ==\nSink(table=[${target.name}], " +
              s"connector=[${target.options.getOrElse("connector", "values")}], " +
              s"mode=[${mode.toUpperCase(java.util.Locale.ROOT)}])\n\n"
            return Seq(sink + frame.queryExecution.explainString(
              org.apache.spark.sql.execution.ExtendedMode)).toDF("plan")
          case ins @ insertRe(_, _, _) =>
            // non-DDL target: Spark's own EXPLAIN plans without writing
            return Seq(spark.sql(s"EXPLAIN EXTENDED $ins")
              .collect().map(_.getString(0)).mkString("\n")).toDF("plan")
          case stmt =>
            return Seq(explainSql(stmt)).toDF("plan")
        }
      case _ =>
    }
    val descRe = "(?is)DESC(?:RIBE)?\\s+([A-Za-z_][A-Za-z0-9_.]*)\\s*;?".r
    trimmed match {
      case descRe(tbl) =>
        import spark.implicits._
        val pk = primaryKey(tbl).toSet
        val wm = declaredWatermark(tbl)
        return from(tbl).schema.fields.toSeq.map { f =>
          (f.name, f.dataType.sql, f.nullable,
            if (pk.contains(f.name)) "PRI" else null,
            wm.filter(_._1 == f.name).map(_._2).orNull)
        }.toDF("name", "type", "null", "key", "watermark")
      case _ =>
    }
    runLowered(lowerSql(sql))
  }

  /** The façade's planning front-end: lower Flink-dialect constructs
    * (group windows / window TVFs, temporal joins, temporal table
    * functions) to their Spark SQL spellings. The output is what a
    * compiled plan pins (see [[compilePlanSql]]).
    */
  private def lowerSql(sql: String): String =
    graft.sql.TemporalSql.rewrite(
      graft.sql.TemporalSql.rewriteFunctions(
        graft.sql.FlinkSqlWindows.rewrite(sql), temporalFns.get),
      name => (primaryKey(name),
        declaredWatermark(name).map(_._1).getOrElse("")))

  /** Execute an already-lowered statement. MATCH_RECOGNIZE has no
    * Spark parser slot, so it survives lowering verbatim and runs on
    * the engine's NFA.
    */
  private def runLowered(rw: String): DataFrame =
    if (graft.cep.MatchRecognize.containsClause(rw))
      graft.cep.MatchRecognize.rewriteAndRun(spark, rw)
    else spark.sql(rw)

  /** Compile a query into a persistable plan artifact — the
    * reference's ExecNodeGraph JSON round-trip
    * (flink-table-planner `.../plan/nodes/exec/serde/`, test corpus
    * `src/test/resources/jsonplan/`). The artifact carries the DDL
    * catalog snapshot (every CREATE TABLE executed on this
    * environment), registered temporal table functions, and the
    * dialect-LOWERED SQL; [[executePlan]] restores all three in any
    * environment and re-executes. See [[graft.sql.GraftCompiledPlan]]
    * for the stability contract and the documented deviation (Spark
    * re-derives the physical plan; semantics are what's pinned).
    */
  def compilePlanSql(sql: String): graft.sql.GraftCompiledPlan =
    graft.sql.GraftCompiledPlan(
      version = graft.sql.GraftCompiledPlan.FormatVersion,
      streamingMode = isStreamingMode,
      tables = ddlLog.toSeq.sortBy(_._1)
        .map { case (n, d) => graft.sql.CompiledTableDef(n, d) },
      temporalFunctions = temporalFns.toSeq.sortBy(_._1)
        .map { case (n, (t, pk, ts)) => graft.sql.CompiledTemporalFn(n, t, pk, ts) },
      originalSql = sql,
      loweredSql = lowerSql(sql))

  /** Restore a compiled plan's catalog state (DDL tables + temporal
    * functions) into THIS environment and execute its lowered SQL.
    * The environment's mode must match the plan's — a streaming plan
    * binds unbounded sources, a batch plan bounded scans (the
    * reference likewise pins the runtime mode in the plan).
    */
  def executePlan(plan: graft.sql.GraftCompiledPlan): DataFrame = {
    require(plan.streamingMode == isStreamingMode,
      s"plan compiled for streamingMode=${plan.streamingMode}, " +
        s"this environment is streamingMode=$isStreamingMode")
    plan.tables.foreach(t => executeSql(t.ddl))
    plan.temporalFunctions.foreach(f =>
      createTemporalTableFunction(f.name, f.table, f.timeAttr, f.primaryKey))
    runLowered(plan.loweredSql)
  }

  /** Execute a plan loaded from a JSON file (EXECUTE PLAN parity). */
  def executePlan(path: String): DataFrame =
    executePlan(graft.sql.GraftCompiledPlan.loadFromFile(path))

  /** Flink-dialect `CREATE TABLE … WATERMARK FOR … PRIMARY KEY … WITH
    * (…)` (reference flink-sql-parser .../ddl/SqlCreateTable.java,
    * SqlWatermark.java): parse, bind the connector to a Spark reader,
    * apply computed columns, and register view + watermark/PK metadata.
    */
  private def executeCreateTable(sql: String): DataFrame = {
    val stmt = graft.sql.FlinkDdl.parse(sql)
    if (stmt.ifNotExists && spark.catalog.tableExists(stmt.name)) return okResult()
    registerFromStmt(stmt)
    ddlStmts(norm(stmt.name)) = stmt
    ddlLog(norm(stmt.name)) = sql
    tableNamespace(norm(stmt.name)) = (currentCat, currentDb)
    okResult()
  }

  /** `CREATE TABLE t [(body)] [WITH (…)] LIKE base [(like-options)]` —
    * reference SqlTableLike (flink-sql-parser .../ddl/SqlTableLike.java)
    * with MergeTableLikeUtil.java's merge semantics: each feature
    * (OPTIONS, CONSTRAINTS, GENERATED, METADATA, PARTITIONS,
    * WATERMARKS) merges per its strategy — INCLUDING (inherit; a
    * conflicting redeclaration errors), EXCLUDING (child only), or
    * OVERWRITING (child wins on conflict; not valid for constraints or
    * partitions, matching the reference). Default is INCLUDING ALL.
    * The catalog snapshot stores the RENDERED self-contained DDL, so
    * compiled plans replay the derived table without ordering against
    * its base.
    */
  private def executeCreateTableLike(like: graft.sql.FlinkDdl.LikeStmt): DataFrame = {
    import graft.sql.FlinkDdl
    val base = ddlStmts(norm(like.base))
    val strat = mutable.Map(
      "OPTIONS" -> "INCLUDING", "CONSTRAINTS" -> "INCLUDING",
      "GENERATED" -> "INCLUDING", "METADATA" -> "INCLUDING",
      "PARTITIONS" -> "INCLUDING", "WATERMARKS" -> "INCLUDING")
    like.likeOptions.foreach { case (mode, feat) =>
      if (feat == "ALL") {
        require(mode != "OVERWRITING",
          "OVERWRITING ALL is not a valid LIKE option (reference SqlTableLike)")
        strat.keys.toSeq.foreach(strat(_) = mode)
      } else {
        require(mode != "OVERWRITING" || !Set("CONSTRAINTS", "PARTITIONS")(feat),
          s"OVERWRITING $feat is not supported — constraints and partitions " +
            "can only be INCLUDING or EXCLUDING (reference MergeTableLikeUtil)")
        strat(feat) = mode
      }
    }
    val child = FlinkDdl.parse(
      s"CREATE TABLE ${like.name} " +
        (if (like.middle.startsWith("(")) like.middle else s"() ${like.middle}"))
    // a child column of ANY kind must not collide with a base column of
    // a DIFFERENT kind (same-kind collisions are handled per-feature by
    // mergeNamed's INCLUDING/OVERWRITING strategies below; physical
    // columns have no merge strategy, so any physical collision errors)
    val baseNames = Map(
      "physical" -> base.columns.map(_._1).toSet,
      "generated" -> base.computed.map(_._1).toSet,
      "metadata" -> base.metadataCols.map(_.name).toSet)
    def checkCollision(n: String, childKind: String, sameKindOk: Boolean): Unit =
      baseNames.foreach { case (kind, names) =>
        require(!names.contains(n) || (sameKindOk && kind == childKind),
          s"column $n already exists in base table ${like.base} " +
            s"(as a $kind column)") }
    child.columns.foreach { case (n, _) =>
      checkCollision(n, "physical", sameKindOk = false) }
    child.computed.foreach { case (n, _) =>
      checkCollision(n, "generated", sameKindOk = true) }
    child.metadataCols.foreach { m =>
      checkCollision(m.name, "metadata", sameKindOk = true) }
    def mergeNamed[T](b: Seq[T], c: Seq[T], nameOf: T => String, s: String,
                      what: String, kw: String): Seq[T] = s match {
      case "EXCLUDING" => c
      case "INCLUDING" =>
        c.foreach(x => require(!b.exists(y => nameOf(y) == nameOf(x)),
          s"$what ${nameOf(x)} already declared in base ${like.base} " +
            s"(use OVERWRITING $kw)"))
        b ++ c
      case "OVERWRITING" =>
        b.filterNot(y => c.exists(x => nameOf(x) == nameOf(y))) ++ c
    }
    val computed = mergeNamed[(String, String)](base.computed, child.computed,
      _._1, strat("GENERATED"), "generated column", "GENERATED")
    val metadataCols = mergeNamed[FlinkDdl.MetadataCol](base.metadataCols,
      child.metadataCols, _.name, strat("METADATA"), "metadata column", "METADATA")
    val pk = strat("CONSTRAINTS") match {
      case "EXCLUDING" => child.primaryKey
      case _ =>
        require(child.primaryKey.isEmpty || base.primaryKey.isEmpty,
          s"both ${like.name} and base ${like.base} declare a primary key")
        if (child.primaryKey.nonEmpty) child.primaryKey else base.primaryKey
    }
    val wm = strat("WATERMARKS") match {
      case "EXCLUDING"   => child.watermark
      case "INCLUDING"   =>
        require(child.watermark.isEmpty || base.watermark.isEmpty,
          s"both ${like.name} and base ${like.base} declare a watermark " +
            "(use OVERWRITING WATERMARKS)")
        child.watermark.orElse(base.watermark)
      case "OVERWRITING" => child.watermark.orElse(base.watermark)
    }
    val parts = strat("PARTITIONS") match {
      case "EXCLUDING" => child.partitionedBy
      case _ =>
        require(child.partitionedBy.isEmpty || base.partitionedBy.isEmpty,
          s"both ${like.name} and base ${like.base} declare PARTITIONED BY")
        if (child.partitionedBy.nonEmpty) child.partitionedBy
        else base.partitionedBy
    }
    val options = strat("OPTIONS") match {
      case "EXCLUDING"   => child.options
      case "INCLUDING"   =>
        val clash = base.options.keySet.intersect(child.options.keySet)
          .filter(k => base.options(k) != child.options(k))
        require(clash.isEmpty,
          s"WITH option(s) ${clash.mkString(", ")} conflict with base " +
            s"${like.base} under INCLUDING OPTIONS (use OVERWRITING OPTIONS)")
        base.options ++ child.options
      case "OVERWRITING" => base.options ++ child.options
    }
    val columns = base.columns ++ child.columns
    val physSet = columns.map(_._1).toSet
    val metaSet = metadataCols.map(_.name).toSet
    val order = (base.declaredOrder ++ child.declaredOrder)
      .filter(n => physSet.contains(n) || metaSet.contains(n)).distinct
    val stmt = FlinkDdl.CreateTableStmt(like.name, like.ifNotExists, columns,
      computed, pk, wm, options, parts, metadataCols, order,
      flinkTypes = base.flinkTypes ++ child.flinkTypes)
    if (stmt.ifNotExists && spark.catalog.tableExists(stmt.name)) return okResult()
    registerFromStmt(stmt)
    ddlStmts(norm(stmt.name)) = stmt
    ddlLog(norm(stmt.name)) = FlinkDdl.render(stmt)
    tableNamespace(norm(stmt.name)) = (currentCat, currentDb)
    okResult()
  }

  /** `INSERT INTO|OVERWRITE <ddl table> <query>` — the reference's
    * primary write path: the planner binds the target to the
    * DynamicTableSink of the table's connector (CommonExecSink,
    * `EX/common/CommonExecSink.java`; kafka sink
    * `flink-connectors/flink-connector-kafka/.../table/KafkaDynamicSink.java`,
    * filesystem `FileSystemTableSink.java`, JDBC
    * `JdbcDynamicTableSink.java`). Columns map by POSITION against the
    * table's physical schema and are cast to the declared types, like
    * the reference's type coercion at the sink boundary. An optional
    * trailing `__rowkind` column carries changelog kinds into
    * upsert-capable sinks (upsert-kafka tombstones, JDBC
    * upsert/delete) — the façade's explicit spelling of the changelog
    * the reference's planner threads implicitly.
    *
    * After the write the table's VIEW is re-bound: Spark captures file
    * listings at read time, so the pre-insert frame would not see
    * appended files.
    */
  /** Optional clauses between an INSERT's target and its query — the
    * reference's RichSqlInsert (flink-sql-parser
    * .../dml/RichSqlInsert.java:38) carries both:
    *   PARTITION (p = v, …)  — static partition values
    *   (col, …)              — explicit target column list
    * Shared by execution and EXPLAIN PLAN FOR (dql/SqlRichExplain.java
    * accepts INSERT bodies too). Returns (query, staticParts, colList).
    */
  private def parseInsertTail(rest0: String)
      : (String, Seq[(String, String)], Option[Seq[String]]) = {
    var rest = rest0.trim
    var staticParts = Seq.empty[(String, String)]
    val partRe = "(?is)^PARTITION\\s*\\(([^)]*)\\)\\s*(.*)$".r
    rest match {
      case partRe(spec, r2) =>
        staticParts = spec.split(',').map(_.trim).filter(_.nonEmpty).map { kv =>
          val i = kv.indexOf('=')
          require(i > 0, s"cannot parse static partition spec: $kv")
          (kv.substring(0, i).trim.stripPrefix("`").stripSuffix("`"),
            kv.substring(i + 1).trim)
        }.toSeq
        rest = r2.trim
      case _ =>
    }
    var colList: Option[Seq[String]] = None
    if (rest.startsWith("(")) {
      var depth = 0; var i = 0; var end = -1
      while (end < 0 && i < rest.length) {
        val c = rest.charAt(i)
        if (c == '(') depth += 1
        else if (c == ')') { depth -= 1; if (depth == 0) end = i }
        i += 1
      }
      require(end > 0, s"unbalanced parentheses in INSERT: $rest")
      val inner = rest.substring(1, end)
      // a column list is idents only — a parenthesized subquery
      // `( SELECT … )` falls through to the query untouched
      if (inner.matches("(?s)[\\w`\\s,]+")) {
        colList = Some(inner.split(',')
          .map(_.trim.stripPrefix("`").stripSuffix("`")).toSeq)
        rest = rest.substring(end + 1).trim
      }
    }
    (rest, staticParts, colList)
  }

  /** Crash recovery for CHANGE COLUMN's stage-and-swap: a crash between
    * rename(root -> old) and rename(stage -> root) leaves the table
    * path absent with the data intact in `<root>__graft_old` — restore
    * it on the next access; a crash after the swap but before cleanup
    * leaves a stale `__graft_old` / `__graft_stage` sibling — delete it
    * lazily. Called wherever a filesystem table path is (re)bound and
    * before a new stage-and-swap starts. Documented in MIGRATION.md.
    *
    * Concurrency: a stage dir can also be an IN-FLIGHT CHANGE COLUMN
    * from another session writing next to a live root. A bind must not
    * delete that mid-write, so binds (`force = false`) leave a
    * recently-modified stage alone — it is invisible to reads either
    * way; only the ALTER path about to start its own swap
    * (`force = true`) clears any stage unconditionally. The stale-`old`
    * delete stays unconditional: root-exists + old-exists can only be a
    * post-swap crash leftover (between the two renames root is absent).
    */
  private def recoverStagedSwap(pathStr: String, force: Boolean = false): Unit = {
    val root = new org.apache.hadoop.fs.Path(pathStr)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (root.getParent == null) return
    val old = new org.apache.hadoop.fs.Path(
      root.getParent, root.getName + "__graft_old")
    val stage = new org.apache.hadoop.fs.Path(
      root.getParent, root.getName + "__graft_stage")
    if (!fs.exists(root) && fs.exists(old))
      require(fs.rename(old, root),
        s"cannot recover stranded $old back to $root")
    if (fs.exists(root)) {
      if (fs.exists(old)) fs.delete(old, true)
      if (fs.exists(stage)) {
        val fresh = try {
          System.currentTimeMillis -
            fs.getFileStatus(stage).getModificationTime < 600000L
        } catch { case _: java.io.FileNotFoundException => false }
        if (force || !fresh) fs.delete(stage, true)
      }
    }
  }

  private def executeInsert(stmt: graft.sql.FlinkDdl.CreateTableStmt,
                            overwrite: Boolean, query: String,
                            staticParts: Seq[(String, String)] = Nil,
                            colList: Option[Seq[String]] = None,
                            planOnly: Boolean = false): DataFrame = {
    import org.apache.spark.sql.functions._
    val physCols = stmt.columns.map(_._1)
    val staticKeys = staticParts.map(_._1)
    staticKeys.foreach(k => require(stmt.partitionedBy.contains(k),
      s"static partition column $k is not a PARTITIONED BY column of ${stmt.name}"))
    colList.foreach { cl =>
      cl.foreach { c =>
        require(physCols.contains(c),
          s"INSERT column $c is not a physical column of ${stmt.name} " +
            "(metadata columns are connector-provided and not writable here)")
        require(!staticKeys.contains(c),
          s"column $c appears both in the static PARTITION spec and the column list")
      }
      require(cl.distinct.length == cl.length,
        s"duplicate column in INSERT column list: ${cl.mkString(", ")}")
    }
    val src1 = executeSql(query)
    val hasKind = src1.columns.contains("__rowkind")
    // The positional rename below assumes __rowkind is LAST; a query
    // emitting it elsewhere (toChangelogStream PREPENDS it) would
    // silently mis-map the kind string into a data column — move it.
    val src0 =
      if (hasKind && src1.columns.last != "__rowkind")
        src1.select((src1.columns.filterNot(_ == "__rowkind") :+ "__rowkind")
          .map(col): _*)
      else src1
    // Columns the query provides, in order: the explicit column list
    // if given, else every physical column minus the static partition
    // keys (RichSqlInsert's positional contract). Declared columns the
    // query omits are filled with NULL casts — Flink's
    // missing-column-to-null sink mapping.
    val provided = colList.getOrElse(physCols.filterNot(staticKeys.contains))
    val dataWidth = src0.columns.length - (if (hasKind) 1 else 0)
    require(dataWidth == provided.length,
      s"INSERT schema mismatch: query provides $dataWidth data columns, " +
        s"target ${stmt.name} expects ${provided.length} " +
        s"(${provided.mkString(", ")})")
    val renamed = src0.toDF(
      (provided ++ (if (hasKind) Seq("__rowkind") else Nil)): _*)
    val staticMap = staticParts.toMap
    val aligned = renamed.select(stmt.columns.map { case (n, t) =>
      if (staticMap.contains(n)) expr(staticMap(n)).cast(t).as(n)
      else if (provided.contains(n)) col(n).cast(t).as(n)
      else lit(null).cast(t).as(n) } ++
      (if (hasKind) Seq(col("__rowkind")) else Nil): _*)
    val data = aligned.drop("__rowkind")
    // EXPLAIN PLAN FOR INSERT: everything above (clause binding, column
    // alignment, NULL fill, rowkind handling) is the sink-facing plan —
    // return the frame that WOULD be written without touching the sink.
    if (planOnly) return data
    stmt.options.getOrElse("connector", "values") match {
      case "filesystem" =>
        val path = stmt.options("path")
        stmt.options.getOrElse("format", "parquet") match {
          case "avro" =>
            // append lands a new job-unique set of containers beside
            // the existing ones; overwrite clears the destination at
            // job commit (FileSystemTableSink parity — both modes)
            graft.sources.AvroFormat.write(data, path, overwrite = overwrite)
          case fmt =>
            var w = data.write.format(fmt)
              .mode(if (overwrite) "overwrite" else "append")
            if (stmt.partitionedBy.nonEmpty) {
              w = w.partitionBy(stmt.partitionedBy: _*)
              // Flink's partitioned INSERT OVERWRITE replaces only the
              // partitions that receive data (FileSystemTableSink
              // .java:94 dynamic overwrite) — Spark's dynamic
              // partitionOverwriteMode is exactly that contract.
              if (overwrite) w = w.option("partitionOverwriteMode", "dynamic")
            }
            if (fmt == "csv")
              w = w.option("header",
                stmt.options.getOrElse("csv.include-header", "false"))
            w.save(path)
        }
      case "kafka" =>
        require(!overwrite,
          "the kafka sink is append-only (a log); INSERT OVERWRITE is not supported")
        val path = stmt.options.getOrElse("path",
          throw new IllegalArgumentException("kafka connector requires 'path'"))
        val full = stmt.options.get("topic").fold(path)(t => s"$path/$t")
        val nPart = stmt.options.getOrElse("sink.partitions", "1").toInt
        val value = stmt.options.getOrElse("format", "json") match {
          case "json" => to_json(struct(physCols.map(col): _*))
          case "raw" =>
            require(physCols.length == 1,
              "raw format requires a single-column schema")
            col(physCols.head).cast("string")
          case other => throw new IllegalArgumentException(
            s"kafka sink supports json/raw value formats, got '$other'")
        }
        // Flink's default sink partitioner hashes the key when the
        // table declares one, else the whole row
        val keyCols = if (stmt.primaryKey.nonEmpty) stmt.primaryKey else physCols
        val partCol = pmod(hash(keyCols.map(col): _*), lit(nPart)).cast("int")
        graft.sources.LogSource.write(
          data.select(partCol.as("partition"), value.as("value"))
            .repartition(nPart, col("partition")), full)
      case "upsert-kafka" =>
        require(!overwrite,
          "the upsert-kafka sink is append-only (a keyed log); INSERT OVERWRITE is not supported")
        val path = stmt.options.getOrElse("path",
          throw new IllegalArgumentException("upsert-kafka connector requires 'path'"))
        val full = stmt.options.get("topic").fold(path)(t => s"$path/$t")
        val nPart = stmt.options.getOrElse("sink.partitions", "1").toInt
        val key = concat_ws(",", stmt.primaryKey.map(c => col(c).cast("string")): _*)
        // tombstone = empty payload (Flink's upsert-kafka DELETE wire)
        val payload =
          if (hasKind)
            when(aligned("__rowkind") === "-D", lit(""))
              .otherwise(to_json(struct(physCols.map(col): _*)))
          else to_json(struct(physCols.map(col): _*))
        val partCol = pmod(hash(stmt.primaryKey.map(col): _*), lit(nPart)).cast("int")
        graft.sources.LogSource.write(
          aligned.select(partCol.as("partition"),
              concat(key, lit("|"), payload).as("value"))
            .repartition(nPart, col("partition")), full)
      case "jdbc" =>
        // The reference planner rejects OVERWRITE for sinks without
        // SupportsOverwrite — JdbcDynamicTableSink doesn't implement it.
        require(!overwrite, "the jdbc sink does not support INSERT OVERWRITE")
        if (hasKind || stmt.primaryKey.nonEmpty) {
          require(stmt.primaryKey.nonEmpty,
            "a changelog INSERT into jdbc requires a PRIMARY KEY " +
              "(the reference's 'please declare primary key for sink table' error)")
          graft.sources.JdbcConnector.upsert(aligned, stmt.options,
            stmt.primaryKey, if (hasKind) Some("__rowkind") else None)
        } else graft.sources.JdbcConnector.append(data, stmt.options)
      case other => throw new IllegalArgumentException(
        s"connector '$other' has no sink binding " +
          "(supported sinks: filesystem, kafka, upsert-kafka, jdbc)")
    }
    registerFromStmt(stmt)
    okResult()
  }

  /** Catalog-object, module, partition, and config statements — the
    * rest of the reference's `executeSql` DDL surface
    * (flink-sql-parser: SqlCreateCatalog/SqlUseCatalog/SqlShowCatalogs,
    * SqlCreateDatabase/SqlDropDatabase/SqlUseDatabase/SqlShowDatabases,
    * SqlShowViews, SqlLoadModule/SqlUnloadModule/SqlUseModules/
    * SqlShowModules, SqlSet/SqlReset, SqlAlterTableRename,
    * SqlAddPartitions/SqlDropPartitions/SqlShowPartitions). Returns
    * None when `t` is none of these (the caller falls through).
    */
  private def catalogStatement(t: String): Option[DataFrame] = {
    import spark.implicits._
    val createCatRe =
      "(?is)^CREATE\\s+CATALOG\\s+([A-Za-z_]\\w*)\\s*(?:WITH\\s*\\(([^)]*)\\))?\\s*;?$".r
    val useCatRe = "(?is)^USE\\s+CATALOG\\s+([A-Za-z_]\\w*)\\s*;?$".r
    val createDbRe =
      "(?is)^CREATE\\s+DATABASE\\s+(IF\\s+NOT\\s+EXISTS\\s+)?([A-Za-z_][\\w.]*)\\s*(?:COMMENT\\s+'([^']*)')?\\s*(?:WITH\\s*\\(([^)]*)\\))?\\s*;?$".r
    val dropDbRe =
      "(?is)^DROP\\s+DATABASE\\s+(IF\\s+EXISTS\\s+)?([A-Za-z_][\\w.]*)\\s*(CASCADE|RESTRICT)?\\s*;?$".r
    val useModulesRe = "(?is)^USE\\s+MODULES\\s+(.+?)\\s*;?$".r
    val useDbRe = "(?is)^USE\\s+([A-Za-z_][\\w.]*)\\s*;?$".r
    val loadModRe =
      "(?is)^LOAD\\s+MODULE\\s+([A-Za-z_]\\w*)\\s*(?:WITH\\s*\\([^)]*\\))?\\s*;?$".r
    val unloadModRe = "(?is)^UNLOAD\\s+MODULE\\s+([A-Za-z_]\\w*)\\s*;?$".r
    val setKvRe = "(?is)^SET\\s+'([^']+)'\\s*=\\s*'([^']*)'\\s*;?$".r
    val resetKvRe = "(?is)^RESET\\s+'([^']+)'\\s*;?$".r
    val renameRe =
      "(?is)^ALTER\\s+TABLE\\s+([A-Za-z_][\\w.]*)\\s+RENAME\\s+TO\\s+([A-Za-z_][\\w.]*)\\s*;?$".r
    val addPartRe =
      "(?is)^ALTER\\s+TABLE\\s+([A-Za-z_][\\w.]*)\\s+ADD\\s+(IF\\s+NOT\\s+EXISTS\\s+)?PARTITION\\s*\\(([^)]*)\\)\\s*;?$".r
    val dropPartRe =
      "(?is)^ALTER\\s+TABLE\\s+([A-Za-z_][\\w.]*)\\s+DROP\\s+(IF\\s+EXISTS\\s+)?PARTITION\\s*\\(([^)]*)\\)\\s*;?$".r
    val showPartsRe = "(?is)^SHOW\\s+PARTITIONS\\s+([A-Za-z_][\\w.]*)\\s*;?$".r

    t match {
      case createCatRe(name, opts) =>
        // GenericInMemoryCatalogFactory is the only built-in catalog
        // kind available here (hive et al. need external metastores)
        val kind = Option(opts).map(o =>
          "'type'\\s*=\\s*'([^']*)'".r.findFirstMatchIn(o).map(_.group(1))
            .getOrElse("generic_in_memory")).getOrElse("generic_in_memory")
        require(kind == "generic_in_memory",
          s"unsupported catalog type '$kind' (supported: generic_in_memory)")
        require(catalogs.add(name), s"catalog $name already exists")
        databases.add((name, "default"))
        Some(okResult())
      case useCatRe(name) =>
        require(catalogs.contains(name), s"catalog not found: $name")
        currentCat = name
        currentDb = databases.collectFirst { case (c, d) if c == name => d }
          .getOrElse("default")
        Some(okResult())
      case _ if t.matches("(?is)^SHOW\\s+CATALOGS\\s*;?$") =>
        Some(catalogs.toSeq.sorted.toDF("catalog name"))
      case _ if t.matches("(?is)^SHOW\\s+CURRENT\\s+CATALOG\\s*;?$") =>
        Some(Seq(currentCat).toDF("current catalog name"))
      case createDbRe(ifNotExists, name, comment, props) =>
        val (c, d) = resolveDb(name)
        require(catalogs.contains(c), s"catalog not found: $c")
        val added = databases.add((c, d))
        require(added || ifNotExists != null, s"database $c.$d already exists")
        if (added) {
          Option(comment).foreach(dbComments((c, d)) = _)
          Option(props).foreach { p =>
            dbProps((c, d)) = "'([^']*)'\\s*=\\s*'([^']*)'".r
              .findAllMatchIn(p).map(m => (m.group(1), m.group(2))).toMap
          }
        }
        Some(okResult())
      case dropDbRe(ifExists, name, mode) =>
        val (c, d) = resolveDb(name)
        require(!(c == currentCat && d == currentDb),
          s"cannot drop the current database $c.$d")
        if (!databases.contains((c, d))) {
          require(ifExists != null, s"database not found: $c.$d")
          return Some(okResult())
        }
        val members = tableNamespace.collect {
          case (tbl, ns) if ns == (c, d) => tbl }.toSeq
        if (members.nonEmpty) {
          // RESTRICT (the default) refuses to drop a non-empty
          // database — the reference's DatabaseNotEmptyException
          require(mode != null && mode.equalsIgnoreCase("CASCADE"),
            s"database $c.$d is not empty (${members.size} table(s)) — use CASCADE")
          members.foreach { tbl =>
            spark.catalog.dropTempView(tbl)
            watermarkDecl.remove(tbl); primaryKeys.remove(tbl)
            ddlLog.remove(tbl); ddlStmts.remove(tbl)
            tableNamespace.remove(tbl); viewNames.remove(tbl)
            viewDdl.remove(tbl); viewProps.remove(tbl)
          }
        }
        databases.remove((c, d))
        dbProps.remove((c, d)); dbComments.remove((c, d))
        Some(okResult())
      case _ if t.matches("(?is)^SHOW\\s+DATABASES\\s*;?$") =>
        Some(databases.collect { case (c, d) if c == currentCat => d }
          .toSeq.sorted.toDF("database name"))
      case _ if t.matches("(?is)^SHOW\\s+CURRENT\\s+DATABASE\\s*;?$") =>
        Some(Seq(currentDb).toDF("current database name"))
      case _ if t.matches("(?is)^SHOW\\s+VIEWS\\s*;?$") =>
        // scoped like SHOW TABLES: only the current catalog.database's
        // views (reference SqlShowViews lists the current database)
        Some(viewNames.toSeq.filter { v =>
          tableNamespace.getOrElse(v,
            ("default_catalog", "default_database")) == (currentCat, currentDb)
        }.toDF("view name"))
      case loadModRe(name) =>
        require(name == "core",
          s"could not find a module factory for '$name' " +
            "(the engine ships the 'core' module; hive/user modules " +
            "need external classpath factories)")
        require(!modules.contains(name), s"module $name is already loaded")
        modules(name) = true
        syncModules()
        Some(okResult())
      case unloadModRe(name) =>
        require(modules.contains(name), s"module $name is not loaded")
        modules.remove(name)
        syncModules()
        Some(okResult())
      case useModulesRe(list) if t.matches("(?is)^USE\\s+MODULES\\s+.*") =>
        val names = list.split(',').map(_.trim).filter(_.nonEmpty).toSeq
        require(names.distinct.length == names.length,
          s"duplicate module name in USE MODULES: ${list.trim}")
        names.foreach(n => require(modules.contains(n),
          s"module $n is not loaded (LOAD MODULE first)"))
        // USE MODULES both enables exactly the listed modules AND
        // fixes the resolution order (reference ModuleManager.useModules)
        val disabled = modules.keys.toSeq.filterNot(names.contains)
        modules.clear()
        names.foreach(modules(_) = true)
        disabled.foreach(modules(_) = false)
        syncModules()
        Some(okResult())
      case useDbRe(name) if !name.equalsIgnoreCase("catalog") &&
          !name.equalsIgnoreCase("modules") =>
        val (c, d) = resolveDb(name)
        require(databases.contains((c, d)), s"database not found: $c.$d")
        currentCat = c; currentDb = d
        Some(okResult())
      case _ if t.matches("(?is)^SHOW\\s+MODULES\\s*;?$") =>
        Some(modules.collect { case (n, true) => n }.toSeq.toDF("module name"))
      case _ if t.matches("(?is)^SHOW\\s+FULL\\s+MODULES\\s*;?$") =>
        Some(modules.toSeq.toDF("module name", "used"))
      case setKvRe(k, v) =>
        sessionConfig(k) = v
        sparkConfKey(k).foreach { sk =>
          if (!savedSparkConf.contains(sk))
            savedSparkConf(sk) = spark.conf.getOption(sk)
          spark.conf.set(sk, v)
        }
        Some(okResult())
      case _ if t.matches("(?is)^SET\\s*;?$") =>
        Some(sessionConfig.toSeq.sortBy(_._1).toDF("key", "value"))
      case resetKvRe(k) =>
        sessionConfig.remove(k)
        sparkConfKey(k).foreach(restoreSparkConf)
        Some(okResult())
      case _ if t.matches("(?is)^RESET\\s*;?$") =>
        sessionConfig.keys.toSeq.foreach(k =>
          sparkConfKey(k).foreach(restoreSparkConf))
        sessionConfig.clear()
        Some(okResult())
      case renameRe(a, b) =>
        require(!spark.catalog.tableExists(b), s"table $b already exists")
        if (ddlStmts.contains(norm(a))) {
          val stmt = ddlStmts(norm(a)).copy(name = b)
          ddlStmts.remove(norm(a)); ddlLog.remove(norm(a))
          watermarkDecl.remove(norm(a)); primaryKeys.remove(norm(a))
          val ns = tableNamespace.remove(norm(a))
          spark.catalog.dropTempView(a)
          registerFromStmt(stmt)
          ddlStmts(norm(b)) = stmt
          ddlLog(norm(b)) = graft.sql.FlinkDdl.render(stmt)
          ns.foreach(tableNamespace(norm(b)) = _)
        } else {
          val df = from(a)
          val wm = watermarkDecl.remove(norm(a))
          val pk = primaryKeys.remove(norm(a))
          val ns = tableNamespace.remove(norm(a))
          require(spark.catalog.dropTempView(a), s"table not found: $a")
          createTemporaryView(b, df, wm, pk.getOrElse(Nil))
          ns.foreach(tableNamespace(norm(b)) = _)
          if (viewNames.remove(norm(a))) {
            viewNames.add(norm(b))
            viewDdl.remove(norm(a)).foreach(viewDdl(norm(b)) = _)
            viewProps.remove(norm(a)).foreach(viewProps(norm(b)) = _)
          }
        }
        Some(okResult())
      case addPartRe(tbl, ifNotExists, spec) =>
        val (stmt, path) = partitionTarget(tbl, spec)
        val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (fs.exists(path)) require(ifNotExists != null,
          s"partition already exists: $path")
        else fs.mkdirs(path)
        Some(okResult())
      case dropPartRe(tbl, ifExists, spec) =>
        val (stmt, path) = partitionTarget(tbl, spec)
        val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (!fs.exists(path)) require(ifExists != null,
          s"partition not found: $path")
        else fs.delete(path, true)
        registerFromStmt(stmt) // data changed — re-bind the view's file listing
        Some(okResult())
      case showPartsRe(tbl) =>
        val stmt = ddlStmts.getOrElse(norm(tbl), throw new IllegalArgumentException(
          s"SHOW PARTITIONS covers DDL-defined tables; $tbl is not one"))
        require(stmt.partitionedBy.nonEmpty, s"table $tbl is not partitioned")
        Some(listPartitions(stmt).toDF("partition name"))
      case _ => None
    }
  }

  /** Day-2 DDL — schema evolution and object alteration (reference
    * flink-sql-parser: ddl/SqlAddReplaceColumns.java:44,
    * ddl/SqlChangeColumn.java:42, ddl/SqlAlterTableReset.java:33,
    * ddl/SqlAlterTableAddConstraint.java:31,
    * ddl/SqlAlterTableDropConstraint.java, ddl/SqlAlterViewAs.java:33,
    * ddl/SqlAlterViewRename.java:31, ddl/SqlAlterDatabase.java:37,
    * ddl/SqlAlterFunction.java:38, ddl/SqlAddJar.java:31,
    * dql/SqlShowJars.java:29, ddl/SqlRemoveJar.java,
    * dql/SqlDescribeCatalog.java:35, dql/SqlDescribeDatabase.java).
    * Returns None when `t` is none of these (the caller falls through).
    */
  private def alterStatement(t: String): Option[DataFrame] = {
    import spark.implicits._
    import graft.sql.FlinkDdl
    val addColsRe =
      "(?is)^ALTER\\s+TABLE\\s+([A-Za-z_][\\w.]*)\\s+ADD\\s+COLUMNS\\s*\\((.*)\\)\\s*;?$".r
    val replaceColsRe =
      "(?is)^ALTER\\s+TABLE\\s+([A-Za-z_][\\w.]*)\\s+REPLACE\\s+COLUMNS\\s*\\((.*)\\)\\s*;?$".r
    val changeColRe =
      "(?is)^ALTER\\s+TABLE\\s+([A-Za-z_][\\w.]*)\\s+CHANGE\\s+(?:COLUMN\\s+)?`?(\\w+)`?\\s+`?(\\w+)`?\\s+(.+?)\\s*;?$".r
    val resetRe =
      "(?is)^ALTER\\s+TABLE\\s+([A-Za-z_][\\w.]*)\\s+RESET\\s*\\(([^)]*)\\)\\s*;?$".r
    val addConstraintRe =
      ("(?is)^ALTER\\s+TABLE\\s+([A-Za-z_][\\w.]*)\\s+ADD\\s+CONSTRAINT\\s+(\\w+)\\s+" +
        "PRIMARY\\s+KEY\\s*\\(([^)]*)\\)\\s*(NOT\\s+ENFORCED)?\\s*;?$").r
    val dropConstraintRe =
      "(?is)^ALTER\\s+TABLE\\s+([A-Za-z_][\\w.]*)\\s+DROP\\s+(?:CONSTRAINT\\s+\\w+|PRIMARY\\s+KEY)\\s*;?$".r
    val alterViewRenameRe =
      "(?is)^ALTER\\s+VIEW\\s+([A-Za-z_][\\w.]*)\\s+RENAME\\s+TO\\s+([A-Za-z_][\\w.]*)\\s*;?$".r
    val alterViewAsRe =
      "(?is)^ALTER\\s+VIEW\\s+([A-Za-z_][\\w.]*)\\s+AS\\s+(.+)$".r
    val alterViewSetRe =
      ("(?is)^ALTER\\s+VIEW\\s+([A-Za-z_][\\w.]*)\\s+SET\\s*\\((" +
        withBlobRe + ")\\)\\s*;?$").r
    val alterDbRe =
      "(?is)^ALTER\\s+DATABASE\\s+([A-Za-z_][\\w.]*)\\s+SET\\s*\\(([^)]*)\\)\\s*;?$".r
    val alterFnRe =
      ("(?is)^ALTER\\s+(?:TEMPORARY\\s+)?(?:SYSTEM\\s+)?FUNCTION\\s+(IF\\s+EXISTS\\s+)?" +
        "([A-Za-z_]\\w*)\\s+AS\\s+'([^']+)'\\s*;?$").r
    val addJarRe = "(?is)^ADD\\s+JAR\\s+'([^']+)'\\s*;?$".r
    val removeJarRe = "(?is)^REMOVE\\s+JAR\\s+'([^']+)'\\s*;?$".r
    val descCatRe = "(?is)^DESC(?:RIBE)?\\s+CATALOG\\s+([A-Za-z_]\\w*)\\s*;?$".r
    val descDbRe =
      "(?is)^DESC(?:RIBE)?\\s+DATABASE\\s+(EXTENDED\\s+)?([A-Za-z_][\\w.]*)\\s*;?$".r
    val optKvRe = "'([^']*)'\\s*=\\s*'([^']*)'".r

    def ddlOf(tbl: String, what: String): FlinkDdl.CreateTableStmt =
      ddlStmts.getOrElse(norm(tbl), throw new IllegalArgumentException(
        s"$what covers DDL-defined tables; $tbl is not one"))
    def commitAlter(tbl: String, altered: FlinkDdl.CreateTableStmt): Unit = {
      registerFromStmt(altered)
      ddlStmts(norm(tbl)) = altered
      ddlLog(norm(tbl)) = FlinkDdl.render(altered)
    }
    def allNames(s: FlinkDdl.CreateTableStmt): Set[String] =
      (s.columns.map(_._1) ++ s.computed.map(_._1) ++
        s.metadataCols.map(_.name)).toSet

    t match {
      // —— ALTER TABLE t ADD COLUMNS (col defs): append physical,
      // computed, or metadata columns; optionally a PRIMARY KEY if the
      // table has none. Files written before the evolution null-fill
      // the new columns on read (pinSchema → declared-schema bind;
      // Spark's by-name parquet resolution does the heavy lifting). ——
      case addColsRe(tbl, defs) =>
        require(defs.trim.nonEmpty, "ADD COLUMNS requires at least one column")
        val stmt = ddlOf(tbl, "ALTER TABLE ADD COLUMNS")
        require(stmt.options.getOrElse("format", "parquet") != "avro" ||
          !stmt.options.get("connector").contains("filesystem"),
          "ADD COLUMNS is not supported on avro tables (the graft-avro " +
            "reader scans container schemas, no user-schema slot)")
        val add = FlinkDdl.parse(s"CREATE TABLE __alter__ ($defs)")
        require(add.watermark.isEmpty,
          "ADD COLUMNS cannot add a watermark (no ALTER slot in the reference either)")
        val existing = allNames(stmt)
        (add.columns.map(_._1) ++ add.computed.map(_._1) ++
          add.metadataCols.map(_.name)).foreach(n =>
          require(!existing.contains(n), s"column $n already exists in $tbl"))
        require(add.primaryKey.isEmpty || stmt.primaryKey.isEmpty,
          s"table $tbl already has a primary key")
        val altered = stmt.copy(
          columns = stmt.columns ++ add.columns,
          computed = stmt.computed ++ add.computed,
          metadataCols = stmt.metadataCols ++ add.metadataCols,
          primaryKey =
            if (add.primaryKey.nonEmpty) add.primaryKey else stmt.primaryKey,
          declaredOrder = stmt.declaredOrder ++ add.declaredOrder,
          pinSchema = stmt.pinSchema || add.columns.nonEmpty,
          flinkTypes = stmt.flinkTypes ++ add.flinkTypes)
        commitAlter(tbl, altered)
        Some(okResult())

      // —— ALTER TABLE t REPLACE COLUMNS (col defs): the physical
      // column list is replaced wholesale (hive-dialect
      // SqlAddReplaceColumns semantics). Retained columns must keep
      // their type — data on disk was written with the old one, and a
      // silently-coerced read is worse than an error. ——
      case replaceColsRe(tbl, defs) =>
        require(defs.trim.nonEmpty, "REPLACE COLUMNS requires at least one column")
        val stmt = ddlOf(tbl, "ALTER TABLE REPLACE COLUMNS")
        require(stmt.options.getOrElse("format", "parquet") != "avro" ||
          !stmt.options.get("connector").contains("filesystem"),
          "REPLACE COLUMNS is not supported on avro tables")
        val rep = FlinkDdl.parse(s"CREATE TABLE __alter__ ($defs)")
        require(rep.computed.isEmpty && rep.metadataCols.isEmpty &&
          rep.primaryKey.isEmpty && rep.watermark.isEmpty,
          "REPLACE COLUMNS takes physical columns only")
        val oldTypes = stmt.columns.toMap
        rep.columns.foreach { case (n, ty) =>
          oldTypes.get(n).foreach(old => require(old == ty,
            s"REPLACE COLUMNS cannot change the type of $n ($old -> $ty): " +
              s"data on disk was written as $old")) }
        stmt.partitionedBy.foreach(p => require(rep.columns.exists(_._1 == p),
          s"REPLACE COLUMNS must keep partition column $p"))
        stmt.primaryKey.foreach(c => require(rep.columns.exists(_._1 == c),
          s"REPLACE COLUMNS must keep primary key column $c (DROP PRIMARY KEY first)"))
        stmt.watermark.foreach { case (c, _) =>
          require(rep.columns.exists(_._1 == c),
            s"REPLACE COLUMNS must keep watermark column $c") }
        (stmt.computed.map(_._1) ++ stmt.metadataCols.map(_.name)).foreach(n =>
          require(!rep.columns.exists(_._1 == n),
            s"column $n already exists in $tbl (as a computed/metadata column)"))
        // CSV binds POSITIONALLY under an explicit schema (enforceSchema
        // ignores header names), so dropping or reordering a middle
        // column would make pre-evolution files silently misbind — old
        // values shift into the wrong column. Only append-only changes
        // (old list as an exact prefix; new trailing columns null-fill)
        // are safe without the full rewrite CHANGE COLUMN pays.
        if (stmt.options.getOrElse("format", "parquet") == "csv" &&
            stmt.options.get("connector").contains("filesystem"))
          require(rep.columns.take(stmt.columns.length) == stmt.columns,
            s"REPLACE COLUMNS on csv table $tbl must keep the existing " +
              "columns as an exact prefix (csv files bind positionally; " +
              "dropping/reordering would silently misbind old files) — " +
              "only appending trailing columns is supported")
        val metaNames = stmt.metadataCols.map(_.name).toSet
        val altered = stmt.copy(columns = rep.columns,
          declaredOrder = rep.declaredOrder ++ stmt.metadataCols.map(_.name),
          pinSchema = true,
          flinkTypes = stmt.flinkTypes.filter(kv => metaNames(kv._1)) ++
            rep.flinkTypes)
        commitAlter(tbl, altered)
        Some(okResult())

      // —— ALTER TABLE t CHANGE [COLUMN] old new TYPE: rename a
      // physical column. The type must stay (changed types rejected
      // loudly — same rationale as REPLACE). Parquet has no field-ids
      // here, so a metadata-only rename would orphan the stored
      // column; filesystem data is REWRITTEN under the new name (the
      // cost hive pays for the same statement — at warehouse scale
      // this is a full table rewrite, do it knowingly). ——
      case changeColRe(tbl, oldN, newN, typeText)
          if !typeText.trim.startsWith("(") =>
        val stmt = ddlOf(tbl, "ALTER TABLE CHANGE COLUMN")
        require(!"(?is)\\b(FIRST|AFTER)\\b".r.findFirstIn(typeText).isDefined,
          "CHANGE COLUMN FIRST/AFTER repositioning is not supported")
        val parsed = FlinkDdl.parse(s"CREATE TABLE __alter__ (c $typeText)")
        val ty = parsed.columns.head._2
        val idx = stmt.columns.indexWhere(_._1 == oldN)
        require(idx >= 0, s"column $oldN not found in $tbl")
        require(stmt.columns(idx)._2 == ty,
          s"CHANGE COLUMN cannot change the type of $oldN " +
            s"(${stmt.columns(idx)._2} -> $ty): data on disk was written as " +
            s"${stmt.columns(idx)._2}")
        if (newN != oldN) {
          require(!allNames(stmt).contains(newN),
            s"column $newN already exists in $tbl")
          stmt.computed.foreach { case (n, e) =>
            require(s"(?i)\\b$oldN\\b".r.findFirstIn(e).isEmpty,
              s"cannot rename $oldN: computed column $n references it") }
          if (stmt.options.get("connector").contains("filesystem")) {
            // a prior crashed swap may have stranded the table path —
            // restore it before deciding whether there is data to move
            // (force: this ALTER owns the swap, any stage dir is stale)
            recoverStagedSwap(stmt.options("path"), force = true)
            val root = new org.apache.hadoop.fs.Path(stmt.options("path"))
            val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
            if (fs.exists(root)) {
              val fmt = stmt.options.getOrElse("format", "parquet")
              require(fmt != "avro",
                "CHANGE COLUMN is not supported on avro tables")
              // STAGE-AND-SWAP rewrite: write the renamed data to a
              // temp SIBLING directory, then swap via filesystem rename
              // and delete the old data only after the write succeeded.
              // (The previous shape — eager localCheckpoint + overwrite
              // onto the table's own path — pinned the whole table in
              // cluster memory and left it truncated if the write died
              // mid-flight; staging needs no cache and is crash-safe:
              // a failure before the swap leaves the original intact.)
              val stage = new org.apache.hadoop.fs.Path(
                root.getParent, root.getName + "__graft_stage")
              if (fs.exists(stage)) fs.delete(stage, true)
              val phys = from(tbl)
                .select(stmt.columns.map(c => org.apache.spark.sql.functions.col(c._1)): _*)
                .withColumnRenamed(oldN, newN)
              val newParts = stmt.partitionedBy.map(p => if (p == oldN) newN else p)
              var w = phys.write.format(fmt).mode("overwrite")
              if (newParts.nonEmpty) w = w.partitionBy(newParts: _*)
              if (fmt == "csv") w = w.option("header",
                stmt.options.getOrElse("csv.include-header", "false"))
              try {
                w.save(stage.toString)
                val old = new org.apache.hadoop.fs.Path(
                  root.getParent, root.getName + "__graft_old")
                if (fs.exists(old)) fs.delete(old, true)
                require(fs.rename(root, old), s"cannot stage-out $root")
                if (!fs.rename(stage, root)) {
                  fs.rename(old, root) // roll the original back in place
                  throw new IllegalStateException(
                    s"cannot swap $stage into $root (original restored)")
                }
                fs.delete(old, true)
              } finally if (fs.exists(stage)) fs.delete(stage, true)
            }
          }
        }
        val altered = stmt.copy(
          columns = stmt.columns.updated(idx, (newN, ty)),
          primaryKey = stmt.primaryKey.map(c => if (c == oldN) newN else c),
          partitionedBy = stmt.partitionedBy.map(p => if (p == oldN) newN else p),
          watermark = stmt.watermark.map { case (c, d) =>
            (if (c == oldN) newN else c, d) },
          declaredOrder = stmt.declaredOrder.map(n => if (n == oldN) newN else n),
          // the redeclared spelling wins (a precision change is legal —
          // same Spark type); otherwise carry the old one under the key
          flinkTypes = (stmt.flinkTypes - oldN) ++
            parsed.flinkTypes.get("c").orElse(stmt.flinkTypes.get(oldN))
              .map(newN -> _))
        if (stmt.primaryKey.contains(oldN)) primaryKeys.remove(norm(tbl))
        if (stmt.watermark.exists(_._1 == oldN)) watermarkDecl.remove(norm(tbl))
        commitAlter(tbl, altered)
        Some(okResult())

      // —— ALTER TABLE t RESET ('k' [, …]): remove table options,
      // falling back to connector defaults (SqlAlterTableReset — the
      // reference likewise forbids resetting 'connector'). ——
      case resetRe(tbl, keys) =>
        val stmt = ddlOf(tbl, "ALTER TABLE RESET")
        val ks = keys.split(',').map(_.trim.stripPrefix("'").stripSuffix("'"))
          .filter(_.nonEmpty).toSeq
        require(ks.nonEmpty, "ALTER TABLE RESET requires at least one key")
        ks.foreach(k => require(!k.equalsIgnoreCase("connector"),
          "ALTER TABLE RESET cannot reset 'connector' " +
            "(reference SqlAlterTableReset validation)"))
        val altered = stmt.copy(options = stmt.options -- ks.map(_.toLowerCase))
        commitAlter(tbl, altered)
        Some(okResult())

      // —— ALTER TABLE t ADD CONSTRAINT nm PRIMARY KEY (…) NOT ENFORCED ——
      case addConstraintRe(tbl, _, cols, notEnforced) =>
        require(notEnforced != null,
          "primary key constraints must be NOT ENFORCED " +
            "(the reference rejects ENFORCED mode)")
        val stmt = ddlOf(tbl, "ALTER TABLE ADD CONSTRAINT")
        require(stmt.primaryKey.isEmpty, s"table $tbl already has a primary key")
        val pk = cols.split(',').map(_.trim.stripPrefix("`").stripSuffix("`"))
          .filter(_.nonEmpty).toSeq
        pk.foreach(c => require(stmt.columns.exists(_._1 == c),
          s"primary key column $c is not a physical column of $tbl"))
        commitAlter(tbl, stmt.copy(primaryKey = pk))
        Some(okResult())

      // —— ALTER TABLE t DROP CONSTRAINT nm | DROP PRIMARY KEY ——
      case dropConstraintRe(tbl) =>
        val stmt = ddlOf(tbl, "ALTER TABLE DROP CONSTRAINT")
        require(stmt.primaryKey.nonEmpty, s"table $tbl has no primary key")
        primaryKeys.remove(norm(tbl))
        commitAlter(tbl, stmt.copy(primaryKey = Nil))
        Some(okResult())

      // —— ALTER VIEW v RENAME TO v2 (SqlAlterViewRename) ——
      case alterViewRenameRe(a, b) =>
        require(viewNames.contains(norm(a)),
          s"ALTER VIEW covers views created via CREATE VIEW; $a is not one")
        require(!spark.catalog.tableExists(b), s"table $b already exists")
        val df = from(a)
        spark.catalog.dropTempView(a)
        val ns = tableNamespace.remove(norm(a))
        createTemporaryView(b, df)
        ns.foreach(tableNamespace(norm(b)) = _)
        viewNames.remove(norm(a)); viewNames.add(norm(b))
        viewDdl.remove(norm(a)).foreach(viewDdl(norm(b)) = _)
        viewProps.remove(norm(a)).foreach(viewProps(norm(b)) = _)
        Some(okResult())

      // —— ALTER VIEW v SET ('k'='v', …) (SqlAlterViewProperties,
      // flink-sql-parser .../ddl/SqlAlterViewProperties.java:33): merge
      // into the view's options map (reference CatalogView.getOptions);
      // SHOW CREATE VIEW reflects the merged set. ——
      case alterViewSetRe(name, opts) =>
        require(viewNames.contains(norm(name)),
          s"ALTER VIEW covers views created via CREATE VIEW; $name is not one")
        val kvs = parseOptionKvs(opts).toMap
        require(kvs.nonEmpty, s"no properties in ALTER VIEW SET: $opts")
        viewProps(norm(name)) =
          viewProps.getOrElse(norm(name), Map.empty) ++ kvs
        Some(okResult())

      // —— ALTER VIEW v AS query (SqlAlterViewAs): re-bind in place;
      // the body goes through the façade like CREATE VIEW's does ——
      case alterViewAsRe(name, body) =>
        require(viewNames.contains(norm(name)),
          s"ALTER VIEW covers views created via CREATE VIEW; $name is not one")
        createTemporaryView(name, executeSql(body))
        viewDdl(norm(name)) = body.trim.stripSuffix(";").trim
        Some(okResult())

      // —— ALTER DATABASE db SET ('k'='v', …) (SqlAlterDatabase) ——
      case alterDbRe(name, opts) =>
        val (c, d) = resolveDb(name)
        require(databases.contains((c, d)), s"database not found: $c.$d")
        val kvs = optKvRe.findAllMatchIn(opts)
          .map(m => (m.group(1), m.group(2))).toMap
        require(kvs.nonEmpty, s"no properties in ALTER DATABASE SET: $opts")
        dbProps((c, d)) = dbProps.getOrElse((c, d), Map.empty) ++ kvs
        Some(okResult())

      // —— ALTER FUNCTION f AS 'target' (SqlAlterFunction): re-bind the
      // alias to a different registered implementation ——
      case alterFnRe(ifExists, name, target) =>
        val reg = spark.sessionState.functionRegistry
        import org.apache.spark.sql.catalyst.FunctionIdentifier
        if (!reg.functionExists(FunctionIdentifier(name))) {
          require(ifExists != null, s"function not found: $name")
          return Some(okResult())
        }
        val builder = reg.lookupFunctionBuilder(FunctionIdentifier(target))
          .getOrElse(throw new IllegalArgumentException(
            s"ALTER FUNCTION target '$target' is not a registered function"))
        reg.dropFunction(FunctionIdentifier(name))
        reg.registerFunction(FunctionIdentifier(name),
          new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
            "graft.sql.FunctionAlias", name),
          builder)
        Some(okResult())

      // —— ADD JAR / SHOW JARS / REMOVE JAR (SqlAddJar, SqlShowJars,
      // SqlRemoveJar — how SQL-client users load UDF jars). ADD routes
      // to Spark's native ADD JAR (session classloader + executor
      // shipping); REMOVE untracks it — the JVM cannot unload classes
      // already loaded, same session-lifetime caveat as the reference's
      // client-side REMOVE JAR. ——
      case addJarRe(p) =>
        addJar(p)
        Some(okResult())
      case removeJarRe(p) =>
        require(jars.remove(p), s"jar is not registered: $p")
        Some(okResult())
      case _ if t.matches("(?is)^SHOW\\s+JARS\\s*;?$") =>
        Some(jars.toSeq.toDF("jars"))

      // —— DESCRIBE CATALOG / DESCRIBE DATABASE (SqlDescribeCatalog,
      // SqlDescribeDatabase) ——
      case descCatRe(name) =>
        require(catalogs.contains(name), s"catalog not found: $name")
        Some(Seq(("name", name), ("type", "generic_in_memory"),
          ("comment", "")).toDF("info name", "info value"))
      case descDbRe(extended, name) =>
        val (c, d) = resolveDb(name)
        require(databases.contains((c, d)), s"database not found: $c.$d")
        // properties sit behind EXTENDED (reference SqlDescribeDatabase
        // isExtended — the plain form shows name/catalog/comment only)
        val props =
          if (extended == null) Nil
          else dbProps.getOrElse((c, d), Map.empty).toSeq.sortBy(_._1)
            .map { case (k, v) => (s"property.$k", v) }
        Some((Seq(("name", d), ("catalog", c),
          ("comment", dbComments.getOrElse((c, d), ""))) ++ props)
          .toDF("info name", "info value"))

      case _ => None
    }
  }

  /** Register a resource jar: tracked for SHOW/REMOVE JAR and added to
    * the Spark session (driver session classloader + shipped to
    * executors at task launch).
    */
  private def addJar(p: String): Unit = {
    require(new java.io.File(p).exists, s"jar not found: $p")
    if (jars.add(p)) spark.sql(s"ADD JAR '$p'")
  }

  /** `CREATE FUNCTION f AS 'cls' USING JAR 'p'` — the dynamic
    * classloading path (reference SqlCreateFunction carries a resource
    * list; FunctionCatalog loads the class from it). The class must
    * implement `org.apache.spark.sql.api.java.UDF0..UDF3`; the return
    * DataType is reflected off the interface's generic signature, the
    * same move the reference's UDF type-extraction stack makes
    * (no declared return type in the statement there either).
    */
  private def registerJarFunction(name: String, className: String,
                                  jarPath: String): Unit = {
    addJar(jarPath)
    val loader = new java.net.URLClassLoader(
      Array(new java.io.File(jarPath).toURI.toURL),
      Thread.currentThread.getContextClassLoader)
    val clazz = loader.loadClass(className)
    val inst = clazz.getDeclaredConstructor().newInstance()
    // Walk the WHOLE hierarchy (superclass chain + each level's
    // interfaces): a UDF that inherits UDF1..UDF3 through an abstract
    // base class declares the parameterized interface on the base, not
    // on itself, so inspecting only clazz.getGenericInterfaces would
    // reject it even though the runtime match below accepts it.
    def udfIface(c: Class[_]): Option[java.lang.reflect.ParameterizedType] =
      if (c == null) None
      else c.getGenericInterfaces.toSeq.collectFirst {
        case p: java.lang.reflect.ParameterizedType
            if p.getRawType.isInstanceOf[Class[_]] &&
              p.getRawType.asInstanceOf[Class[_]].getName
                .startsWith("org.apache.spark.sql.api.java.UDF") => p
      }.orElse(udfIface(c.getSuperclass))
    val iface = udfIface(clazz).getOrElse(throw new IllegalArgumentException(
      s"$className does not implement org.apache.spark.sql.api.java.UDF0..UDF3"))
    val retCls = iface.getActualTypeArguments.last match {
      case c: Class[_] => c
      case other => throw new IllegalArgumentException(
        s"cannot infer the return type of $className from $other")
    }
    import org.apache.spark.sql.types._
    val ret: DataType = retCls.getName match {
      case "java.lang.Long"    => LongType
      case "java.lang.Integer" => IntegerType
      case "java.lang.Double"  => DoubleType
      case "java.lang.Boolean" => BooleanType
      case "java.lang.String"  => StringType
      case other => throw new IllegalArgumentException(
        s"unsupported UDF return type $other " +
          "(supported: Long, Integer, Double, Boolean, String)")
    }
    import org.apache.spark.sql.api.java._
    inst match {
      case f: UDF0[_] =>
        spark.udf.register(name, f.asInstanceOf[UDF0[Any]], ret)
      case f: UDF1[_, _] =>
        spark.udf.register(name, f.asInstanceOf[UDF1[Any, Any]], ret)
      case f: UDF2[_, _, _] =>
        spark.udf.register(name, f.asInstanceOf[UDF2[Any, Any, Any]], ret)
      case f: UDF3[_, _, _, _] =>
        spark.udf.register(name, f.asInstanceOf[UDF3[Any, Any, Any, Any]], ret)
      case _ => throw new IllegalArgumentException(
        s"$className must implement UDF0..UDF3")
    }
  }

  private def resolveDb(name: String): (String, String) = {
    val parts = name.split('.')
    if (parts.length == 2) (parts(0), parts(1)) else (currentCat, name)
  }

  /** Map a SET key onto the Spark conf it drives; None = stored only. */
  private def sparkConfKey(k: String): Option[String] = k match {
    case "table.local-time-zone" => Some("spark.sql.session.timeZone")
    case "table.exec.resource.default-parallelism" =>
      Some("spark.sql.shuffle.partitions")
    case s if s.startsWith("spark.") => Some(s)
    case _ => None
  }

  private def restoreSparkConf(sk: String): Unit =
    savedSparkConf.remove(sk).foreach {
      case Some(v) => spark.conf.set(sk, v)
      case None    => spark.conf.unset(sk)
    }

  /** Re-sync the function registry with the used-module set: the
    * 'core' module carries the engine's gap-function library, so
    * unloading (or USE MODULES without it) drops those resolutions,
    * exactly the reference's module-gated function lookup
    * (ModuleManager.getFunctionDefinition walks used modules only).
    */
  private def syncModules(): Unit =
    if (modules.getOrElse("core", false)) FlinkFunctions.registerAll(spark)
    else FlinkFunctions.dropAll(spark)

  /** Resolve ALTER TABLE … PARTITION's target directory: the table
    * must be a DDL filesystem table and the spec must cover every
    * PARTITIONED BY column in order (k1=v1/k2=v2 — hive-style layout,
    * the same dirs Spark's partitioned reader prunes on).
    */
  private def partitionTarget(tbl: String, specText: String)
      : (graft.sql.FlinkDdl.CreateTableStmt, org.apache.hadoop.fs.Path) = {
    val stmt = ddlStmts.getOrElse(norm(tbl), throw new IllegalArgumentException(
      s"ALTER TABLE PARTITION covers DDL-defined tables; $tbl is not one"))
    require(stmt.partitionedBy.nonEmpty, s"table $tbl is not partitioned")
    val spec = specText.split(',').map(_.trim).filter(_.nonEmpty).map { kv =>
      val i = kv.indexOf('=')
      require(i > 0, s"cannot parse partition spec: $kv")
      (kv.substring(0, i).trim.stripPrefix("`").stripSuffix("`"),
        kv.substring(i + 1).trim.stripPrefix("'").stripSuffix("'"))
    }.toMap
    require(spec.keySet == stmt.partitionedBy.toSet,
      s"partition spec (${spec.keys.mkString(", ")}) must name exactly the " +
        s"PARTITIONED BY columns (${stmt.partitionedBy.mkString(", ")})")
    val rel = stmt.partitionedBy.map(k => s"$k=${spec(k)}").mkString("/")
    (stmt, new org.apache.hadoop.fs.Path(stmt.options("path"), rel))
  }

  /** Partition specs present on disk, `k1=v1/k2=v2`-rendered and
    * sorted — partition discovery straight off the directory layout
    * (SqlShowPartitions; filesystem connector PartitionPathUtils).
    */
  private def listPartitions(stmt: graft.sql.FlinkDdl.CreateTableStmt): Seq[String] = {
    val root = new org.apache.hadoop.fs.Path(stmt.options("path"))
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Nil
    def walk(p: org.apache.hadoop.fs.Path, depth: Int): Seq[String] =
      if (depth == stmt.partitionedBy.length) Seq("")
      else fs.listStatus(p).toSeq
        .filter(s => s.isDirectory &&
          s.getPath.getName.startsWith(stmt.partitionedBy(depth) + "="))
        .flatMap { s =>
          walk(s.getPath, depth + 1).map { tail =>
            if (tail.isEmpty) s.getPath.getName
            else s"${s.getPath.getName}/$tail"
          }
        }
    walk(root, 0).sorted
  }

  /** Bind a parsed DDL statement's connector to a Spark reader and
    * (re-)register the view + metadata. Re-run after an INSERT: file
    * listings are captured at read time (InMemoryFileIndex), so a view
    * built before the write would not see appended files/records.
    */
  private def registerFromStmt(stmt: graft.sql.FlinkDdl.CreateTableStmt): Unit = {
    import org.apache.spark.sql.functions.{col, expr, lit}
    import org.apache.spark.sql.types.StructType
    val schema = StructType.fromDDL(
      stmt.columns.map { case (n, t) => s"$n $t" }.mkString(", "))
    val connector = stmt.options.getOrElse("connector", "values")
    if (stmt.partitionedBy.nonEmpty)
      require(connector == "filesystem",
        s"PARTITIONED BY is supported on filesystem tables, not '$connector'")
    if (stmt.metadataCols.nonEmpty)
      require(connector == "filesystem" || connector == "kafka",
        s"metadata columns are supported on filesystem and kafka tables, not '$connector'")
    // true when the filesystem location was empty at bind time — the
    // metadata binding then has no scan to read `_metadata` from
    var fsEmptyBound = false
    val base = connector match {
      case "filesystem" =>
        val path = stmt.options.getOrElse("path",
          throw new IllegalArgumentException("filesystem connector requires 'path'"))
        recoverStagedSwap(path) // heal a crashed CHANGE COLUMN swap
        // 'avro' maps to the engine's own DSv2 reader (the env has the
        // Avro core jars but not the spark-avro wrapper).
        val fmt = stmt.options.getOrElse("format", "parquet") match {
          case "avro" => "graft-avro"
          case f      => f
        }
        require(stmt.partitionedBy.isEmpty || fmt != "graft-avro",
          "PARTITIONED BY avro tables are not supported (the graft-avro " +
            "reader scans a flat container directory)")
        val reader = spark.read.format(fmt)
        // Self-describing formats carry their own schema; text formats
        // take the declared one (csv additionally its header option).
        // PARTITIONED tables always get the declared schema: partition
        // columns live in directory names, not the files, and the
        // user schema pins their types (Spark fills the values from
        // the dirs — that's what makes PartitionFilters pruning work).
        // A table created BEFORE its first INSERT has no data yet —
        // the reference's filesystem table is happy with an empty
        // location, so bind an empty frame of the declared schema
        // until a write lands (executeInsert re-binds afterwards).
        try {
          if (fmt == "csv" || fmt == "json")
            reader.schema(schema)
              .option("header", stmt.options.getOrElse("csv.include-header", "false"))
              .load(path)
          else if (stmt.partitionedBy.nonEmpty || stmt.pinSchema)
            reader.schema(schema).load(path)
          else reader.load(path)
        } catch {
          case e: org.apache.spark.sql.AnalysisException
              if e.getMessage.contains("Path does not exist") ||
                 e.getMessage.contains("Unable to infer schema") =>
            fsEmptyBound = true
            spark.createDataFrame(
              java.util.Collections.emptyList[org.apache.spark.sql.Row](), schema)
          case e: IllegalArgumentException // graft-avro's empty-location probe
              if e.getMessage.contains("no .avro files") =>
            fsEmptyBound = true
            spark.createDataFrame(
              java.util.Collections.emptyList[org.apache.spark.sql.Row](), schema)
        }
      case "datagen" =>
        spark.read.format("graft-datagen").schema(schema)
          .option("numRows", stmt.options.getOrElse("number-of-rows", "1000"))
          .load()
      case "jdbc" =>
        // Reference JdbcDynamicTableFactory: url/table-name/username/
        // password/driver plus scan.partition.* → partitioned read
        // (graft.sources.JdbcConnector maps the option keys onto
        // Spark's JDBC source).
        graft.sources.JdbcConnector.read(spark, stmt.options)
      case "kafka" =>
        // Kafka-dialect table over the engine's partitioned-log
        // emulation (KafkaDynamicSource.java:74 is env-blocked — no
        // broker; graft-log reproduces partition/offset semantics).
        // 'path' locates the log ('topic' optionally a subdirectory);
        // the value format decodes each record: json → declared
        // schema, raw → one string column, debezium-json/canal-json/
        // maxwell-json → CdcFormats changelog rows (+ __rowkind),
        // exactly Flink's kafka-with-CDC-format table.
        val log = logRead(stmt.options)
        val fmt = stmt.options.getOrElse("format", "json")
        require(stmt.metadataCols.isEmpty || fmt == "json" || fmt == "raw",
          "metadata columns are supported with json/raw kafka values, " +
            s"not '$fmt' (the CDC decoders own the offset themselves)")
        // json/raw decodes RETAIN the log's partition/offset under
        // reserved names so declared METADATA columns (the reference's
        // KafkaDynamicSource SOURCE metadata, SupportsReadingMetadata)
        // can bind to them; the final ordered projection below keeps
        // only declared columns either way.
        fmt match {
          case "json" =>
            val dec = log.select(log("partition").as("__log_part"),
                log("offset").as("__log_off"),
                org.apache.spark.sql.functions
                  .from_json(log("value"), schema).as("r"))
              .select(col("__log_part") +: col("__log_off") +:
                schema.fieldNames.toSeq.map(f => col("r." + f)): _*)
            if (stmt.metadataCols.nonEmpty) dec
            else dec.drop("__log_part", "__log_off")
          case "raw" =>
            if (schema.fields.length != 1)
              throw new IllegalArgumentException(
                "raw format requires a single-column schema")
            val dec = log.select(log("partition").as("__log_part"),
              log("offset").as("__log_off"),
              log("value").cast(schema.fields(0).dataType)
                .as(schema.fields(0).name))
            if (stmt.metadataCols.nonEmpty) dec
            else dec.drop("__log_part", "__log_off")
          // In streaming mode the CDC views RETAIN the log offset (the
          // reference's `offset` metadata column, KafkaDynamicSource
          // SOURCE metadata): the downstream stateful
          // ChangelogNormalize (CdcStream.normalize) needs a
          // per-partition ordering to version a key's events.
          case "debezium-json" =>
            val d = graft.sources.CdcFormats.debeziumJson(
              log.select("offset", "value"), log("value"), schema)
              .drop("value")
            if (isStreamingMode) d else d.drop("offset")
          case "canal-json" =>
            val d = graft.sources.CdcFormats.canalJson(
              log.select("offset", "value"), log("value"), schema)
              .drop("value")
            if (isStreamingMode) d else d.drop("offset")
          case "maxwell-json" =>
            val d = graft.sources.CdcFormats.maxwellJson(
              log.select("offset", "value"), log("value"), schema)
              .drop("value")
            if (isStreamingMode) d else d.drop("offset")
          case other => throw new IllegalArgumentException(
            s"unsupported kafka value format '$other'")
        }
      case "upsert-kafka" =>
        // UpsertKafkaDynamicTableFactory semantics: keyed log, each
        // record the key's new image, empty payload = tombstone; Flink
        // plans ChangelogNormalize on top. In batch mode the binding
        // folds the normalize in and the table IS the materialization;
        // in streaming mode it runs the STATEFUL normalize
        // (CdcStream.normalize — StreamExecChangelogNormalize) and the
        // view is the resulting upsert changelog (+U/-D with
        // `__rowkind`), which an upsert sink (CdcStream.upsertSink)
        // materializes. Emulated wire encoding: "<pk csv>|<value
        // json>", tombstone "<pk csv>|".
        if (stmt.primaryKey.isEmpty)
          throw new IllegalArgumentException(
            "upsert-kafka requires a PRIMARY KEY")
        import org.apache.spark.sql.functions._
        val log = logRead(stmt.options)
          .select(col("offset"), split(col("value"), "\\|", 2).as("f"))
          .select(col("offset"), col("f").getItem(0).as("__key"),
            col("f").getItem(1).as("__payload"))
          .withColumn("__rowkind",
            when(col("__payload") === "", "-D").otherwise("+U"))
        if (isStreamingMode) {
          val norm = graft.streaming.CdcStream
            .normalize(log, Seq("__key"), "offset")
            .withColumn("__r", from_json(col("__payload"), schema))
          // PRIMARY KEY fields decode from the KEY bytes (Flink's
          // upsert-kafka contract — the key format owns them), so a
          // tombstone (empty payload) still carries its key; value
          // fields come from the payload and are null on tombstones.
          val keyParts = split(col("__key"), ",")
          val fields = schema.fields.map { f =>
            val ki = stmt.primaryKey.indexOf(f.name)
            if (ki >= 0)
              element_at(keyParts, ki + 1).cast(f.dataType).as(f.name)
            else col("__r." + f.name).as(f.name)
          }
          norm.select(col("offset") +: fields.toSeq :+ col("__rowkind"): _*)
        } else {
          val latest = graft.operators.ChangelogOps.normalize(
            log, Seq(col("__key")), Seq(col("offset")), col("__rowkind"))
          latest.select(from_json(col("__payload"), schema).as("r")).select("r.*")
        }
      case "values" | "" =>
        spark.createDataFrame(java.util.Collections.emptyList[org.apache.spark.sql.Row](), schema)
      case other => throw new IllegalArgumentException(
        s"unsupported connector '$other' (supported: filesystem, datagen, jdbc, kafka, upsert-kafka, values)")
    }
    val withComputed = stmt.computed.foldLeft(base) {
      case (df, (n, e)) => df.withColumn(n, expr(e))
    }
    // Declared METADATA columns bind to their connector source here —
    // filesystem keys map onto Spark's hidden `_metadata` struct
    // (native: no extra scan, prunable), kafka keys onto the log
    // read's partition/offset — and the view's column order follows
    // the declaration (physical and metadata interleaved as written,
    // computed columns appended).
    val finalDf =
      if (stmt.metadataCols.isEmpty) withComputed
      else {
        val topicName = stmt.options.get("topic").orElse(
          stmt.options.get("path").map(_.split('/').last)).getOrElse("")
        def resolve(m: graft.sql.FlinkDdl.MetadataCol): org.apache.spark.sql.Column =
          connector match {
            case "filesystem" =>
              val src = m.key match {
                case "file.path" => "file_path"
                case "file.name" => "file_name"
                case "file.size" => "file_size"
                case "file.modification-time" => "file_modification_time"
                case other => throw new IllegalArgumentException(
                  s"unsupported filesystem metadata key '$other' (supported: " +
                    "file.path, file.name, file.size, file.modification-time)")
              }
              if (fsEmptyBound) lit(null).cast(m.sparkType)
              else col(s"_metadata.$src").cast(m.sparkType)
            case "kafka" => m.key match {
              case "offset"    => col("__log_off").cast(m.sparkType)
              case "partition" => col("__log_part").cast(m.sparkType)
              case "topic"     => lit(topicName).cast(m.sparkType)
              case other => throw new IllegalArgumentException(
                s"unsupported kafka metadata key '$other' (supported: " +
                  "offset, partition, topic)")
            }
          }
        val ordered = stmt.declaredOrder.map { n =>
          stmt.metadataCols.find(_.name == n)
            .map(m => resolve(m).as(n)).getOrElse(col(n))
        } ++ stmt.computed.map { case (n, _) => col(n) }
        withComputed.select(ordered: _*)
      }
    createTemporaryView(stmt.name, finalDf,
      watermark = stmt.watermark, primaryKey = stmt.primaryKey)
  }

  /** Bind a kafka-dialect table's log directory: 'path' is the log
    * root, 'topic' optionally a subdirectory under it. In a streaming
    * environment (EnvironmentSettings.inStreamingMode — the
    * reference's default for the kafka connector) the binding is the
    * MicroBatchStream read path with checkpointed (partition, offset)
    * resume; 'scan.max-records-per-trigger' maps to Kafka's
    * maxOffsetsPerTrigger admission control. In batch mode it is a
    * bounded 0→end scan (the reference's 1.14 batch-runtime read).
    */
  private def logRead(options: Map[String, String]): DataFrame = {
    val path = options.getOrElse("path",
      throw new IllegalArgumentException("kafka connector requires 'path'"))
    val full = options.get("topic").fold(path)(t => s"$path/$t")
    if (isStreamingMode) {
      var r = spark.readStream.format("graft-log").option("path", full)
      options.get("scan.max-records-per-trigger")
        .foreach(v => r = r.option("maxRecordsPerTrigger", v))
      // KafkaConnectorOptions.SCAN_STARTUP_MODE: earliest/latest/
      // specific-offsets map onto the log source's startup position;
      // group-offsets is meaningless here (the checkpoint IS the group
      // position) and timestamp needs record timestamps the log lacks.
      options.get("scan.startup.mode").foreach {
        case "earliest-offset" => r = r.option("startupMode", "earliest")
        case "latest-offset"   => r = r.option("startupMode", "latest")
        case "specific-offsets" =>
          r = r.option("startupMode", "specific")
            .option("specificOffsets", options.getOrElse(
              "scan.startup.specific-offsets",
              throw new IllegalArgumentException(
                "specific-offsets startup requires 'scan.startup.specific-offsets'")))
        case other => throw new IllegalArgumentException(
          s"unsupported scan.startup.mode '$other' (supported: " +
            "earliest-offset, latest-offset, specific-offsets; " +
            "group-offsets is the checkpoint itself here, timestamp " +
            "needs record timestamps the graft-log format lacks)")
      }
      r.load()
    } else spark.read.format("graft-log").option("path", full).load()
  }

  private def okResult(): DataFrame = {
    import spark.implicits._
    Seq("OK").toDF("result")
  }

  /** Split a script body on ';' outside single-quoted literals. */
  private def splitStatements(body: String): Seq[String] = {
    val out = Vector.newBuilder[String]
    var start = 0; var inQ = false; var i = 0
    while (i < body.length) {
      val c = body.charAt(i)
      if (c == '\'') inQ = !inQ
      else if (c == ';' && !inQ) { out += body.substring(start, i); start = i + 1 }
      i += 1
    }
    out += body.substring(start)
    out.result()
  }

  /** Query returning a Table (reference Table == DataFrame here). */
  def sqlQuery(sql: String): DataFrame = executeSql(sql)

  /** TableEnvironment.explainSql parity (TableEnvironmentImpl.java:679):
    * logical + optimized + physical plan of the query AFTER the façade's
    * dialect rewrites (so a Flink-SQL window or temporal join explains
    * as the Spark plan that will actually run).
    */
  def explainSql(sql: String): String =
    sqlQuery(sql).queryExecution.explainString(
      org.apache.spark.sql.execution.ExtendedMode)

  /** TableEnvironment.listTables parity. */
  def listTables(): Seq[String] =
    spark.catalog.listTables().collect().map(_.name).toSeq.sorted

  /** TableEnvironment.listUserDefinedFunctions parity — the engine's
    * registered gap functions among them.
    */
  def listFunctions(): Seq[String] =
    spark.catalog.listFunctions().collect().map(_.name).toSeq.sorted

  /** Register a table, optionally with a watermark declaration
    * (CREATE TABLE ... WATERMARK FOR ts AS ts - INTERVAL d) and
    * primary key metadata.
    */
  def createTemporaryView(name: String, df: DataFrame,
                          watermark: Option[(String, String)] = None,
                          primaryKey: Seq[String] = Nil): Unit = {
    df.createOrReplaceTempView(name)
    watermark.foreach(w => watermarkDecl(norm(name)) = w)
    if (primaryKey.nonEmpty) primaryKeys(norm(name)) = primaryKey
    // record the creating namespace once (re-binds must not move a
    // table into whatever database happens to be current later)
    tableNamespace.getOrElseUpdate(norm(name), (currentCat, currentDb))
  }

  /** Batch read of a registered table. */
  def from(name: String): DataFrame = spark.table(name)

  /** Read a registered table applying its declared watermark — use on
    * streaming DataFrames (readStream/MemoryStream) registered as views;
    * on batch frames the watermark node is a no-op, matching the
    * reference where watermarks only matter in streaming mode.
    */
  def fromWithWatermark(name: String): DataFrame = {
    val df = spark.table(name)
    watermarkDecl.get(name) match {
      case Some((tsCol, delay)) =>
        // Structured Streaming watermarks require an instant-typed
        // event-time column (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE on
        // ntz). A Flink TIMESTAMP(p) rowtime maps to timestamp_ntz, so
        // cast it for the streaming read — the session time zone (UTC
        // in GraftSession) interprets the wall clock, matching the
        // reference's tz-agnostic rowtime.
        val d0 =
          if (df.isStreaming && df.schema(tsCol).dataType ==
              org.apache.spark.sql.types.TimestampNTZType)
            df.withColumn(tsCol,
              org.apache.spark.sql.functions.col(tsCol).cast("timestamp"))
          else df
        d0.withWatermark(tsCol, delay)
      case None => df
    }
  }

  def declaredWatermark(name: String): Option[(String, String)] =
    watermarkDecl.get(norm(name))

  def primaryKey(name: String): Seq[String] =
    primaryKeys.getOrElse(norm(name), Nil)

  /** Register the driver testdata tables as views. */
  def registerTestTables(dir: String): Unit = {
    Tables.registerAll(spark, dir)
    // events is the stream table (FIXTURES.md): declare its watermark.
    watermarkDecl.getOrElseUpdate("events", ("ts", "10 minutes"))
  }

  /** TableEnvironment.createStatementSet parity (TableEnvironmentImpl
    * .java:685): batch several INSERTs and execute them together.
    */
  def createStatementSet(): GraftStatementSet = new GraftStatementSet(this)

  /** StreamTableEnvironment.fromChangelogStream parity (Flink 1.14
    * flink-table-api-java-bridge .../StreamTableEnvironment.java):
    * interpret a DataFrame carrying a `__rowkind` column (+I/-U/+U/-D)
    * as a changelog and register its NORMALIZED current state — latest
    * version per primary key, deleted keys dropped — as a view.
    */
  def fromChangelogStream(name: String, df: DataFrame, primaryKey: Seq[String],
                          versionOrder: Seq[String]): Unit = {
    import org.apache.spark.sql.functions.col
    // -U rows are dropped first (DropUpdateBefore): a retraction is
    // always superseded by its +U twin at the same version, so it can
    // never be final state — and removing it keeps keep-last
    // deterministic when both share the version key.
    val retractFree = graft.operators.ChangelogOps
      .dropUpdateBefore(df, col("__rowkind"))
    val norm = graft.operators.ChangelogOps
      .normalize(retractFree, primaryKey.map(col), versionOrder.map(col), col("__rowkind"))
      .drop("__rowkind")
    createTemporaryView(name, norm, primaryKey = primaryKey)
  }

  /** StreamTableEnvironment.toChangelogStream parity: emit a table's
    * rows with their row kind. An append table is an insert-only
    * changelog (+I on every row); updating results carry their kinds
    * from the streaming side (StatefulOps.keepLastDedup emits -U/+U).
    */
  def toChangelogStream(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    if (df.columns.contains("__rowkind")) df
    else df.select(lit("+I").as("__rowkind") +: df.columns.map(col): _*)
  }
}

/** Multi-sink pipeline: collect INSERT statements / (df, target) pairs,
  * run them all on execute(). The reference compiles a statement set
  * into ONE job DAG with shared subtrees; Spark executes one job per
  * sink — pass shared inputs through `shareScan` (persist + unpersist
  * around execute) to avoid recomputing a common scan per sink, which
  * is the same physical effect at the cost of a materialization.
  */
class GraftStatementSet private[graft] (env: GraftTableEnvironment) {
  private val inserts = mutable.Buffer[() => Unit]()
  private val shared = mutable.Buffer[DataFrame]()

  /** INSERT INTO/OVERWRITE ... SELECT ... — deferred until execute().
    * Routed through the environment so DDL-defined connector tables
    * (filesystem/kafka/upsert-kafka/jdbc) bind their sinks, not just
    * Spark catalog tables.
    */
  def addInsertSql(sql: String): this.type = {
    inserts += (() => { env.executeSql(sql); () })
    this
  }

  /** Insert a DataFrame into a saved table (append). */
  def addInsert(targetTable: String, df: DataFrame): this.type = {
    inserts += (() => df.write.mode("append").saveAsTable(targetTable))
    this
  }

  /** Mark a DataFrame as shared across sinks: persisted before the
    * inserts run, unpersisted after.
    */
  def shareScan(df: DataFrame): DataFrame = { shared += df; df }

  /** Run all collected inserts (shared inputs materialized once). */
  def execute(): Unit = {
    shared.foreach(_.persist())
    try inserts.foreach(_.apply())
    finally { shared.foreach(_.unpersist()); inserts.clear(); shared.clear() }
  }
}

object GraftTableEnvironment {
  def create(spark: SparkSession): GraftTableEnvironment =
    create(spark, inStreamingMode = false)

  /** EnvironmentSettings.inStreamingMode()/inBatchMode() parity
    * (flink-table-api-java .../EnvironmentSettings.java): a streaming
    * environment binds unbounded connectors (kafka/upsert-kafka) to
    * the MicroBatchStream read path, a batch environment to bounded
    * scans. Same DDL, same decode, same downstream operators — the
    * reference's unified-runtime contract.
    */
  def create(spark: SparkSession, inStreamingMode: Boolean): GraftTableEnvironment = {
    FlinkFunctions.registerAll(spark)
    new GraftTableEnvironment(spark, inStreamingMode)
  }
}
