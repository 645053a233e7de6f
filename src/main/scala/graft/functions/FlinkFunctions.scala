package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block.BlockHelper
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Scalar functions the reference declares but Spark lacks (SURVEY.md §2.9
  * gap list; reference surface BuiltInFunctionDefinitions.java, runtime
  * bodies flink-table-runtime .../functions/SqlFunctionUtils.java).
  * Implemented as native Catalyst expressions (codegen where it matters)
  * rather than Scala UDFs so they stay inside whole-stage codegen.
  */
object FlinkFunctions {

  /** HASH_CODE(string): Java String.hashCode, 32-bit. */
  case class HashCode(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = IntegerType
    override def nullSafeEval(v: Any): Any =
      v.asInstanceOf[UTF8String].toString.hashCode
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"($c).toString().hashCode()")
    override protected def withNewChildInternal(c: Expression): HashCode = copy(c)
    override def prettyName: String = "hash_code"
  }

  /** SPLIT_INDEX(str, sep, index): index-th (0-based) piece after
    * splitting by the literal separator; null when out of range.
    */
  case class SplitIndex(first: Expression, second: Expression, third: Expression)
      extends TernaryExpression {
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def nullSafeEval(str: Any, sep: Any, idx: Any): Any = {
      val parts = str.asInstanceOf[UTF8String].toString
        .split(java.util.regex.Pattern.quote(sep.asInstanceOf[UTF8String].toString), -1)
      val i = idx.asInstanceOf[Int]
      if (i >= 0 && i < parts.length) UTF8String.fromString(parts(i)) else null
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      nullSafeCodeGen(ctx, ev, (str, sep, idx) => {
        val parts = ctx.freshName("parts")
        s"""
           |String[] $parts = ($str).toString().split(
           |  java.util.regex.Pattern.quote(($sep).toString()), -1);
           |if ($idx >= 0 && $idx < $parts.length) {
           |  ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString($parts[$idx]);
           |} else {
           |  ${ev.isNull} = true;
           |}
         """.stripMargin
      })
    }
    override protected def withNewChildrenInternal(
        f: Expression, s: Expression, t: Expression): SplitIndex = copy(f, s, t)
    override def prettyName: String = "split_index"
  }

  sealed abstract class CharClassCheck extends UnaryExpression
      with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
    override def dataType: DataType = BooleanType
    protected def check(s: String): Boolean
    override def nullSafeEval(v: Any): Any = check(v.asInstanceOf[UTF8String].toString)
  }

  /** IS_ALPHA(str): every char a letter; false for empty. */
  case class IsAlpha(child: Expression) extends CharClassCheck {
    override protected def check(s: String): Boolean =
      s.nonEmpty && s.forall(Character.isLetter)
    override protected def withNewChildInternal(c: Expression): IsAlpha = copy(c)
    override def prettyName: String = "is_alpha"
  }

  /** IS_DIGIT(str): every char a decimal digit; false for empty. */
  case class IsDigit(child: Expression) extends CharClassCheck {
    override protected def check(s: String): Boolean =
      s.nonEmpty && s.forall(Character.isDigit)
    override protected def withNewChildInternal(c: Expression): IsDigit = copy(c)
    override def prettyName: String = "is_digit"
  }

  /** IS_DECIMAL(str): parseable as a decimal number. */
  case class IsDecimal(child: Expression) extends CharClassCheck {
    override protected def check(s: String): Boolean =
      try { new java.math.BigDecimal(s); true } catch { case _: NumberFormatException => false }
    override protected def withNewChildInternal(c: Expression): IsDecimal = copy(c)
    override def prettyName: String = "is_decimal"
  }

  // Column wrappers.
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
  def hash_code(c: Column): Column = column(HashCode(expression(c)))
  def split_index(str: Column, sep: Column, idx: Column): Column =
    column(SplitIndex(expression(str), expression(sep), expression(idx)))
  def is_alpha(c: Column): Column = column(IsAlpha(expression(c)))
  def is_digit(c: Column): Column = column(IsDigit(expression(c)))
  def is_decimal(c: Column): Column = column(IsDecimal(expression(c)))

  import org.apache.spark.sql.catalyst.expressions.{Coalesce, GetJsonObject, IsNotNull}

  /** JSON_EXISTS(json, path) — SQL:2016 subset (reference
    * BuiltInFunctionDefinitions.java:1510): true iff the path resolves.
    * Deviation: a JSON null value is indistinguishable from a missing
    * path (get_json_object collapses both to SQL NULL).
    */
  def json_exists(json: Column, path: Column): Column =
    column(IsNotNull(GetJsonObject(expression(json), expression(path))))

  /** JSON_VALUE(json, path [, default]) — extract a scalar as string;
    * `default` replaces the NULL ON EMPTY / null result
    * (BuiltInFunctionDefinitions.java:1531 DEFAULT ... ON EMPTY).
    */
  def json_value(json: Column, path: Column): Column =
    column(GetJsonObject(expression(json), expression(path)))
  def json_value(json: Column, path: Column, default: Column): Column =
    column(Coalesce(Seq(
      GetJsonObject(expression(json), expression(path)), expression(default))))

  /** TEMPORAL_OVERLAPS(leftStart, leftEnd, rightStart, rightEnd) — true
    * iff the two time periods share at least one instant, endpoints
    * inclusive (reference BuiltInFunctionDefinitions `temporalOverlaps`,
    * codegen TemporalOverlapsCallGen; Flink normalizes each period so
    * start <= end, then tests leftEnd >= rightStart AND rightEnd >=
    * leftStart). Composes from comparisons, so it stays codegen'd.
    */
  def temporal_overlaps(leftStart: Column, leftEnd: Column,
                        rightStart: Column, rightEnd: Column): Column = {
    import org.apache.spark.sql.functions.{greatest, least}
    val (ls, le) = (least(leftStart, leftEnd), greatest(leftStart, leftEnd))
    val (rs, re) = (least(rightStart, rightEnd), greatest(rightStart, rightEnd))
    le >= rs && re >= ls
  }

  /** TO_TIMESTAMP_LTZ(numeric, precision) — epoch seconds (precision 0)
    * or millis (precision 3) to a local-time-zone timestamp (reference
    * BuiltInFunctionDefinitions `toTimestampLtz`). Fractional input is
    * FLOORED at the declared precision in both branches (explicit and
    * sign-consistent, unlike a truncating cast).
    */
  def to_timestamp_ltz(epoch: Column, precision: Int): Column = {
    import org.apache.spark.sql.functions.{floor, timestamp_millis, timestamp_seconds}
    precision match {
      case 0 => timestamp_seconds(floor(epoch).cast("long"))
      case 3 => timestamp_millis(floor(epoch).cast("long"))
      case p => throw new IllegalArgumentException(
        s"TO_TIMESTAMP_LTZ precision must be 0 or 3, got $p")
    }
  }

  /** TYPEOF(col) — the column's SQL type string (reference
    * BuiltInFunctionDefinitions `TYPEOF`, runtime scalar TypeOfFunction).
    * Type is a plan-time property, so this resolves against the frame's
    * schema and returns a literal — same observable behavior as the
    * reference's constant-folded call.
    */
  def type_of(df: org.apache.spark.sql.DataFrame, colName: String): Column =
    org.apache.spark.sql.functions.lit(
      df.schema(colName).dataType.sql)

  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.Generator
  import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
  import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
  import org.apache.spark.unsafe.types.UTF8String

  /** SPLIT_TO_ROWS(str, delim) — a table function (UDTF) as a native
    * Catalyst `Generator`, emitting one (pos, word) row per delimited
    * token: the §2.11 TableFunction<T> surface (reference
    * flink-table-common .../functions/TableFunction.java — user eval()
    * calling collect(row) per emitted row), exercised through SQL
    * LATERAL VIEW exactly like Flink's `LATERAL TABLE(split(...))`.
    * Multi-column output is the part plain explode() can't express.
    */
  case class SplitToRows(str: Expression, delim: Expression)
      extends Expression with Generator with CodegenFallback {
    override def children: Seq[Expression] = Seq(str, delim)

    override def elementSchema: StructType = StructType(Seq(
      StructField("pos", IntegerType, nullable = false),
      StructField("word", StringType, nullable = true)))

    override def eval(input: InternalRow): IterableOnce[InternalRow] = {
      val s = str.eval(input)
      val d = delim.eval(input)
      if (s == null || d == null) Nil
      else {
        // limit -1 keeps trailing empty tokens (DuckDB string_split /
        // Spark split() semantics; Java's default drops them)
        val parts = s.asInstanceOf[UTF8String].toString
          .split(java.util.regex.Pattern.quote(d.asInstanceOf[UTF8String].toString), -1)
        parts.iterator.zipWithIndex.map { case (w, i) =>
          InternalRow(i, UTF8String.fromString(w))
        }
      }
    }

    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): SplitToRows =
      copy(str = newChildren(0), delim = newChildren(1))
    override def prettyName: String = "split_to_rows"
  }

  /** TRUNCATE(x, d) — round toward zero at `d` decimals (reference
    * SqlFunctionUtils truncate / FlinkSqlOperatorTable TRUNCATE).
    * Composed from floor/ceil (preference (a): existing ops express the
    * semantics exactly), so it stays inside whole-stage codegen.
    */
  def truncate_num(c: Column, scale: Int): Column = {
    val p = math.pow(10, scale)
    org.apache.spark.sql.functions.when(c >= 0,
      org.apache.spark.sql.functions.floor(c * p) / p)
      .otherwise(org.apache.spark.sql.functions.ceil(c * p) / p)
  }

  /** Name → expression builder for every gap function. */
  private val sqlBuilders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "hash_code" -> (es => HashCode(es.head)),
    "split_index" -> (es => SplitIndex(es(0), es(1), es(2))),
    "is_alpha" -> (es => IsAlpha(es.head)),
    "is_digit" -> (es => IsDigit(es.head)),
    "is_decimal" -> (es => IsDecimal(es.head)),
    "json_exists" -> (es => IsNotNull(GetJsonObject(es(0), es(1)))),
    "json_value" -> (es =>
      if (es.length >= 3) Coalesce(Seq(GetJsonObject(es(0), es(1)), es(2)))
      else GetJsonObject(es(0), es(1))),
    "split_to_rows" -> (es => SplitToRows(es(0), es(1))),
  )

  /** Register all gap functions on an already-built session. */
  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    sqlBuilders.foreach { case (name, b) =>
      reg.createOrReplaceTempFunction(name, b, "built-in")
    }
  }

  /** Unregister every gap function — module gating: `UNLOAD MODULE
    * core` (or USE MODULES without core) removes the library from
    * function resolution, mirroring the reference's ModuleManager
    * walking only used modules.
    */
  def dropAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    sqlBuilders.foreach { case (name, _) =>
      reg.dropFunction(org.apache.spark.sql.catalyst.FunctionIdentifier(name)) }
  }

  /** SparkSessionExtensions hook — the idiomatic injection point; wired
    * into every GraftSession so the SQL surface always has the dialect.
    */
  def injectAll(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    sqlBuilders.foreach { case (name, b) =>
      ext.injectFunction((
        org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          getClass.getCanonicalName, name),
        b))
    }

  /** Translate a Flink/SimpleDateFormat-style DATE_FORMAT pattern to the
    * Spark 3+ (java.time DateTimeFormatter) dialect. The common tokens
    * (y M d H m s S E a) coincide; the differing ones are mapped here.
    * Tokenizes the pattern — runs of one letter, 'quoted literals', and
    * other chars — so a literal quoted 'u'/'Z' is never rewritten.
    */
  def translateDatePattern(sdf: String): String = {
    val out = new StringBuilder
    var i = 0
    while (i < sdf.length) {
      val c = sdf.charAt(i)
      if (c == '\'') { // quoted literal: copy through the closing quote
        val end = sdf.indexOf('\'', i + 1)
        val stop = if (end < 0) sdf.length - 1 else end
        out.append(sdf.substring(i, stop + 1))
        i = stop + 1
      } else if (c.isLetter) { // token: run of the same letter
        var j = i
        while (j < sdf.length && sdf.charAt(j) == c) j += 1
        val run = j - i
        (c, run) match {
          case ('u', _) => out.append("e" * run) // SDF day-number-of-week → DTF localized day-of-week
          case ('Z', 2) => out.append("xx") // SDF RFC822 zone ZZ → DTF +HHMM
          case _ => out.append(c.toString * run)
        }
        i = j
      } else { out.append(c); i += 1 }
    }
    out.toString
  }
}
