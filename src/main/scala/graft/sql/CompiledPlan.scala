package graft.sql

/** Compiled-plan persistence — the reference's ExecNodeGraph JSON
  * round-trip (flink-table-planner `.../plan/nodes/exec/serde/`
  * JsonSerdeUtil + the `src/test/resources/jsonplan/` corpus, surfaced
  * in later Flink lines as COMPILE PLAN / EXECUTE PLAN): serialize
  * everything that determines a query's semantics, restore it in a
  * fresh environment, re-execute, get the same results.
  *
  * Deviation (documented in MIGRATION.md): Spark has no stable
  * physical-plan serde — Catalyst plans are not versioned artifacts.
  * What Flink pins with the ExecNode graph (operator semantics +
  * catalog bindings, so a saved pipeline re-runs identically across
  * sessions) is pinned here at the DECLARATIVE layer: the catalog DDL
  * snapshot plus the dialect-LOWERED SQL (group windows, temporal
  * joins and temporal table functions already rewritten to their Spark
  * spellings — the output of the façade's planning front-end, i.e. the
  * closest stable analogue of an ExecNode graph). Catalyst re-derives
  * the physical plan on every execute, which is the Spark-first
  * contract: physical strategy is the optimizer's job, semantics are
  * the plan artifact's.
  *
  * The JSON is STABLE: compiling the same query against the same
  * catalog twice yields byte-identical text (fields in fixed order,
  * tables sorted by name), so plans can be diffed and version-pinned.
  */
case class CompiledTableDef(name: String, ddl: String)

case class CompiledTemporalFn(name: String, table: String,
                              primaryKey: Seq[String], timeAttr: String)

case class GraftCompiledPlan(
    version: Int,
    streamingMode: Boolean,
    tables: Seq[CompiledTableDef],
    temporalFunctions: Seq[CompiledTemporalFn],
    originalSql: String,
    loweredSql: String) {

  def toJson: String = {
    import org.json4s.jackson.Serialization
    implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats
    Serialization.writePretty(this)
  }

  def writeToFile(path: String): Unit = {
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      toJson.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ()
  }
}

object GraftCompiledPlan {
  /** Current plan format version; bump on breaking layout changes.
    * Restore fails loudly on a mismatch (the reference refuses
    * ExecNode graphs whose node versions it doesn't know).
    */
  val FormatVersion = 1

  def fromJson(json: String): GraftCompiledPlan = {
    import org.json4s.jackson.JsonMethods
    implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats
    val plan = JsonMethods.parse(json).extract[GraftCompiledPlan]
    require(plan.version == FormatVersion,
      s"compiled plan version ${plan.version} not supported " +
        s"(this engine reads version $FormatVersion)")
    plan
  }

  def loadFromFile(path: String): GraftCompiledPlan =
    fromJson(new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8))
}
