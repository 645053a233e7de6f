package graft.operators

import graft.{OracleSafe, QueryModule, Tables}
import graft.functions.FlinkFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar function parity (SURVEY.md §2.9): the reference declares 147
  * built-in functions (BuiltInFunctionDefinitions.java) + 189 SQL operators
  * (FlinkSqlOperatorTable.java). Nearly all map to Spark built-ins; the gap
  * functions (SPLIT_INDEX, HASH_CODE, IS_ALPHA/IS_DIGIT/IS_DECIMAL) are
  * native Catalyst expressions in graft.functions.FlinkFunctions. Each
  * query exercises one category against the DuckDB oracle.
  */
object FunctionsSuite extends QueryModule {
  import OracleSafe._

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // String function matrix.
    "f01_string_funcs" -> { (s, dir) =>
      Tables.load(s, dir, "customer").select(
        col("c_custkey"),
        concat_ws("|", col("c_name"), col("c_mktsegment")).as("cat"),
        upper(col("c_name")).as("up"),
        initcap(lower(col("c_name"))).as("ini"),
        lpad(col("c_mktsegment"), 12, "*").as("lp"),
        rpad(col("c_mktsegment"), 12, "*").as("rp"),
        substring(col("c_name"), 1, 8).as("sub8"),
        reverse(col("c_name")).as("rev"),
        length(col("c_name")).as("len"),
        instr(col("c_name"), "#").as("pos_hash"),
        ascii(col("c_mktsegment")).as("first_code"),
        repeat(col("c_mktsegment"), 2).as("rep2"),
        regexp_replace(col("c_name"), "[0-9]+", "#").as("rex"),
        regexp_extract(col("c_name"), "([0-9]+)", 1).as("digits"),
        translate(col("c_mktsegment"), "AEIOU", "aeiou").as("tl"),
        split_index(col("c_name"), lit("#"), lit(1)).as("id_part"))
        .orderBy("c_custkey")
    },

    // Math function matrix (trig rounded to 8dp — see OracleSafe notes).
    "f02_math_funcs" -> { (s, dir) =>
      Tables.load(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        abs(-col("l_quantity")).as("abs_q"),
        ceil(col("l_quantity") * 1.37).as("ceil_q"),
        floor(col("l_quantity") * 1.37).as("floor_q"),
        round(col("l_quantity") * 0.25, 1).as("round1"),
        signum(col("l_discount") - 0.05).as("sgn"),
        pmod(col("l_orderkey"), lit(7)).as("mod7"),
        pow(col("l_quantity"), 2).as("pow2"),
        sqrt(col("l_quantity")).as("sqrt_q"),
        round(exp(col("l_discount")), 8).as("exp_d"),
        round(log(col("l_quantity") + 1.0), 8).as("ln_q"),
        round(log10(col("l_extendedprice")), 8).as("log10_p"),
        round(sin(col("l_discount")), 8).as("sin_d"),
        round(cos(col("l_discount")), 8).as("cos_d"),
        round(atan2(col("l_discount"), col("l_tax") + 0.01), 8).as("at2"),
        round(degrees(col("l_discount")), 8).as("deg"),
        round(radians(col("l_quantity")), 8).as("rad"),
        hex(col("l_orderkey")).as("hx"),
        bin(col("l_orderkey")).as("bn"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    // Date/time function matrix (incl. Flink DATE_FORMAT dialect).
    "f03_datetime_funcs" -> { (s, dir) =>
      Tables.load(s, dir, "orders").select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        quarter(col("o_orderdate")).as("q"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("d"),
        dayofweek(col("o_orderdate")).as("dow"),
        dayofyear(col("o_orderdate")).as("doy"),
        weekofyear(col("o_orderdate")).as("woy"),
        date_format(col("o_orderdate"),
          translateDatePattern("yyyy-MM-dd HH:mm:ss")).as("fmt"),
        date_format(col("o_orderdate"), "EEEE").as("dname"),
        date_format(col("o_orderdate"), "MMMM").as("mname"),
        date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("mstart"),
        date_format(date_add(to_date(col("o_orderdate")), 30), "yyyy-MM-dd").as("plus30"),
        datediff(to_date(col("o_orderdate")), lit("1995-01-01").cast("date")).as("days_since"),
        date_format(last_day(to_date(col("o_orderdate"))), "yyyy-MM-dd").as("eom"),
        date_format(col("o_orderdate") + expr("INTERVAL 5 HOURS"),
          "yyyy-MM-dd HH:mm:ss").as("plus5h"))
        .orderBy("o_orderkey")
    },

    // JSON functions over events.props.
    "f04_json_funcs" -> { (s, dir) =>
      val e = Tables.load(s, dir, "events")
        .select(col("event_id"), col("event_type"), col("props"),
          get_json_object(col("props"), "$.k").as("k_str"),
          get_json_object(col("props"), "$.missing").as("missing"),
          from_json(col("props"),
            org.apache.spark.sql.types.StructType.fromDDL("k INT"))
            .getField("k").as("k_int"))
      e.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("k_int").cast("long")).as("sum_k"),
          count(col("missing")).as("n_missing"),
          min(col("k_str")).as("min_k_str"),
          sum(when(graft.functions.FlinkFunctions.json_exists(
            col("props"), lit("$.k")), 1L).otherwise(0L)).as("n_k_exists"),
          min(graft.functions.FlinkFunctions.json_value(
            col("props"), lit("$.missing"), lit("dflt"))).as("jv_default"))
        .orderBy("event_type")
    },

    // TEMPORAL_OVERLAPS + TO_TIMESTAMP_LTZ (§2.9 date/time gaps):
    // period overlap with normalization (reversed endpoints) and a
    // degenerate point period; epoch second/milli conversions projected
    // back to micros so both engines compare integers.
    "f15_overlaps_tsltz" -> { (s, dir) =>
      import graft.functions.FlinkFunctions.{temporal_overlaps, to_timestamp_ltz}
      val e1 = expr("ts + make_dt_interval(0, 0, floor(value), 0)")
      Tables.load(s, dir, "events").select(
        col("event_id"),
        temporal_overlaps(col("ts"), e1,
          col("ts") + expr("INTERVAL 30 MINUTES"),
          col("ts") + expr("INTERVAL 60 MINUTES")).as("ov1"),
        // reversed left endpoints + a point right period
        temporal_overlaps(e1, col("ts"),
          col("ts") + expr("INTERVAL 45 MINUTES"),
          col("ts") + expr("INTERVAL 45 MINUTES")).as("ov2"),
        unix_micros(to_timestamp_ltz(unix_seconds(col("ts")), 0)).as("tsl_s"),
        unix_micros(to_timestamp_ltz(unix_millis(col("ts")), 3)).as("tsl_ms"))
        .orderBy("event_id")
    },

    // String/conditional extras named in SURVEY §2.9 but not covered by
    // f01: OVERLAY, POSITION, CHR, LEFT/RIGHT, TRIM(BOTH/LEADING/
    // TRAILING ch), ENCODE/DECODE roundtrip, NULLIF/IFNULL,
    // GREATEST/LEAST, IS DISTINCT FROM.
    "f13_string_extras" -> { (s, dir) =>
      Tables.load(s, dir, "customer")
        .withColumn("padded", concat(lit("**"), col("c_mktsegment"), lit("*")))
        .select(col("c_custkey"),
          overlay(col("c_name"), lit("ZZ"), lit(4)).as("ov"),
          expr("position('5' in c_name)").as("pos5"),
          expr("chr(65 + c_custkey % 26)").as("chr_c"),
          expr("left(c_name, 4)").as("l4"),
          expr("right(c_name, 3)").as("r3"),
          expr("trim(BOTH '*' FROM padded)").as("tb"),
          expr("trim(LEADING '*' FROM padded)").as("tl"),
          expr("trim(TRAILING '*' FROM padded)").as("tt"),
          decode(encode(col("c_name"), "utf-8"), "utf-8").as("rt"),
          expr("nullif(c_mktsegment, 'BUILDING')").as("nn"),
          expr("ifnull(nullif(c_mktsegment, 'BUILDING'), 'none')").as("fb"),
          greatest(col("c_custkey") % 7, col("c_custkey") % 5, lit(3L)).as("g3"),
          least(col("c_custkey") % 7, col("c_custkey") % 5, lit(3L)).as("l3"),
          expr("c_mktsegment is distinct from 'BUILDING'").as("idf"))
        .orderBy("c_custkey")
    },

    // Datetime/math extras from §2.9: TIMESTAMPADD/TIMESTAMPDIFF,
    // UNIX_TIMESTAMP epoch, TRUNCATE (Flink round-toward-zero),
    // LOG2, COT, PI.
    "f14_datetime_math_extras" -> { (s, dir) =>
      Tables.load(s, dir, "orders").select(
        col("o_orderkey"),
        date_format(expr("timestampadd(MONTH, 2, o_orderdate)"),
          "yyyy-MM-dd").as("madd"),
        date_format(expr("timestampadd(HOUR, 36, o_orderdate)"),
          "yyyy-MM-dd HH:mm:ss").as("hadd"),
        expr("timestampdiff(DAY, timestamp'1995-01-01 00:00:00', o_orderdate)")
          .as("ddiff"),
        unix_timestamp(col("o_orderdate")).as("ep"),
        truncate_num(col("o_totalprice"), 1).as("tr1"),
        round(log2(col("o_totalprice")), 8).as("lg2"),
        round(expr("cot(o_orderkey % 7 + 1)"), 8).as("ct"),
        round(expr("pi()"), 8).as("pi8"))
        .orderBy("o_orderkey")
    },

    // Gap functions on crafted inputs (oracle: regex / try_cast /
    // precomputed Java hashCode constants).
    "f05_gap_funcs" -> { (s, dir) =>
      val inputs = Seq("123", "12.5", "-4e2", "abc", "12a", "", "12.5.6",
        "+5", "Hello", "a#b#c", "#x#")
      s.createDataFrame(inputs.map(Tuple1(_))).toDF("sv")
        .select(col("sv"),
          is_alpha(col("sv")).as("alpha"),
          is_digit(col("sv")).as("digit"),
          is_decimal(col("sv")).as("dec"),
          split_index(col("sv"), lit("#"), lit(0)).as("si0"),
          split_index(col("sv"), lit("#"), lit(1)).as("si1"),
          split_index(col("sv"), lit("#"), lit(5)).as("si5"))
        .orderBy("sv")
    },

    // Java String.hashCode as a native expression, vs precomputed oracle.
    "f06_hash_code" -> { (s, dir) =>
      val inputs = Seq("abc", "hello", "A", "", "zz", "ab")
      s.createDataFrame(inputs.map(Tuple1(_))).toDF("sv")
        .select(col("sv"), hash_code(col("sv")).as("hc"))
        .orderBy("sv")
    },

    // Hash / crypto / encode functions.
    "f07_hash_crypto" -> { (s, dir) =>
      Tables.load(s, dir, "customer").select(
        col("c_custkey"),
        md5(col("c_name")).as("h_md5"),
        sha2(col("c_name"), 256).as("h_sha256"),
        base64(col("c_name").cast("binary")).as("b64"),
        unbase64(base64(col("c_name").cast("binary"))).cast("string").as("roundtrip"))
        .orderBy("c_custkey")
    },

    // Cast matrix (deterministic conversions only).
    "f08_casts" -> { (s, dir) =>
      Tables.load(s, dir, "lineitem").select(
        col("l_orderkey"),
        col("l_linenumber"),
        col("l_orderkey").cast("string").as("key_str"),
        col("l_linenumber").cast("double").as("ln_dbl"),
        concat(col("l_linenumber").cast("string"), lit("9")).cast("int").as("rt_int"),
        (col("l_discount") > 0.05).cast("string").as("b_str"),
        col("l_shipdate").cast("date").cast("string").as("ship_day"),
        floor(col("l_quantity") * 1.5).cast("int").as("q_int"))
        .orderBy("l_orderkey", "l_linenumber")
    }
  )

  override def oracleSql: Map[String, String] = Map(
    "f01_string_funcs" -> """
      SELECT c_custkey,
        c_name || '|' || c_mktsegment AS cat,
        upper(c_name) AS up,
        upper(substr(lower(c_name), 1, 1)) || substr(lower(c_name), 2) AS ini,
        CASE WHEN length(c_mktsegment) >= 12 THEN substr(c_mktsegment, 1, 12)
             ELSE repeat('*', 12 - length(c_mktsegment)) || c_mktsegment END AS lp,
        CASE WHEN length(c_mktsegment) >= 12 THEN substr(c_mktsegment, 1, 12)
             ELSE c_mktsegment || repeat('*', 12 - length(c_mktsegment)) END AS rp,
        substr(c_name, 1, 8) AS sub8,
        reverse(c_name) AS rev,
        length(c_name) AS len,
        strpos(c_name, '#') AS pos_hash,
        ascii(c_mktsegment) AS first_code,
        repeat(c_mktsegment, 2) AS rep2,
        regexp_replace(c_name, '[0-9]+', '#', 'g') AS rex,
        coalesce(regexp_extract(c_name, '([0-9]+)', 1), '') AS digits,
        translate(c_mktsegment, 'AEIOU', 'aeiou') AS tl,
        CASE WHEN length(string_split(c_name, '#')) > 1
             THEN string_split(c_name, '#')[2] END AS id_part
      FROM customer
      ORDER BY c_custkey""",

    "f02_math_funcs" -> """
      SELECT l_orderkey, l_linenumber,
        abs(-l_quantity) AS abs_q,
        CAST(ceil(l_quantity * 1.37) AS BIGINT) AS ceil_q,
        CAST(floor(l_quantity * 1.37) AS BIGINT) AS floor_q,
        round(l_quantity * 0.25, 1) AS round1,
        CAST(CASE WHEN l_discount - 0.05 > 0 THEN 1.0
             WHEN l_discount - 0.05 < 0 THEN -1.0 ELSE 0.0 END AS DOUBLE) AS sgn,
        l_orderkey % 7 AS mod7,
        power(l_quantity, 2) AS pow2,
        sqrt(l_quantity) AS sqrt_q,
        round(exp(l_discount), 8) AS exp_d,
        round(ln(l_quantity + 1.0), 8) AS ln_q,
        round(log10(l_extendedprice), 8) AS log10_p,
        round(sin(l_discount), 8) AS sin_d,
        round(cos(l_discount), 8) AS cos_d,
        round(atan2(l_discount, l_tax + 0.01), 8) AS at2,
        round(degrees(l_discount), 8) AS deg,
        round(radians(l_quantity), 8) AS rad,
        upper(to_hex(l_orderkey)) AS hx,
        bin(l_orderkey) AS bn
      FROM lineitem
      ORDER BY l_orderkey, l_linenumber""",

    "f03_datetime_funcs" -> """
      SELECT o_orderkey,
        CAST(year(o_orderdate) AS INT) AS y,
        CAST(quarter(o_orderdate) AS INT) AS q,
        CAST(month(o_orderdate) AS INT) AS m,
        CAST(day(o_orderdate) AS INT) AS d,
        CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
        CAST(dayofyear(o_orderdate) AS INT) AS doy,
        CAST(weekofyear(o_orderdate) AS INT) AS woy,
        strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS fmt,
        dayname(o_orderdate) AS dname,
        monthname(o_orderdate) AS mname,
        strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS mstart,
        strftime(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d') AS plus30,
        date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since,
        strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS eom,
        strftime(o_orderdate + INTERVAL 5 HOUR, '%Y-%m-%d %H:%M:%S') AS plus5h
      FROM orders
      ORDER BY o_orderkey""",

    // Oracle deliberately avoids DuckDB's json_* functions (their output
    // types/quoting have shifted across DuckDB releases; r1 hash-mismatched
    // even though values agreed under local compare) and recomputes the
    // same answers from the known '{"k": N}' shape with portable regex SQL.
    // The Spark side still exercises the real JSON functions.
    "f04_json_funcs" -> """
      SELECT event_type, count(1) AS n,
        CAST(sum(CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT)) AS BIGINT) AS sum_k,
        count(CASE WHEN props LIKE '%"missing"%' THEN 1 END) AS n_missing,
        min(NULLIF(regexp_extract(props, '"k": ([0-9]+)', 1), '')) AS min_k_str,
        CAST(sum(CASE WHEN regexp_extract(props, '"k": ([0-9]+)', 1) <> ''
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_k_exists,
        min('dflt') AS jv_default
      FROM events
      GROUP BY event_type
      ORDER BY event_type""",

    "f15_overlaps_tsltz" -> """
      SELECT event_id,
        (greatest(ts, ts + to_minutes(CAST(floor(value) AS BIGINT)))
           >= ts + INTERVAL 30 MINUTE
         AND ts + INTERVAL 60 MINUTE
           >= least(ts, ts + to_minutes(CAST(floor(value) AS BIGINT)))) AS ov1,
        (greatest(ts, ts + to_minutes(CAST(floor(value) AS BIGINT)))
           >= ts + INTERVAL 45 MINUTE
         AND ts + INTERVAL 45 MINUTE
           >= least(ts, ts + to_minutes(CAST(floor(value) AS BIGINT)))) AS ov2,
        CAST(floor(epoch(ts)) AS BIGINT) * 1000000 AS tsl_s,
        epoch_ms(ts) * 1000 AS tsl_ms
      FROM events
      ORDER BY event_id""",

    "f13_string_extras" -> """
      SELECT c_custkey,
        substr(c_name, 1, 3) || 'ZZ' || substr(c_name, 6) AS ov,
        CAST(position('5' IN c_name) AS INT) AS pos5,
        chr(CAST(65 + c_custkey % 26 AS INT)) AS chr_c,
        left(c_name, 4) AS l4,
        right(c_name, 3) AS r3,
        trim(padded, '*') AS tb,
        ltrim(padded, '*') AS tl,
        rtrim(padded, '*') AS tt,
        c_name AS rt,
        nullif(c_mktsegment, 'BUILDING') AS nn,
        coalesce(nullif(c_mktsegment, 'BUILDING'), 'none') AS fb,
        greatest(c_custkey % 7, c_custkey % 5, 3) AS g3,
        least(c_custkey % 7, c_custkey % 5, 3) AS l3,
        (c_mktsegment IS DISTINCT FROM 'BUILDING') AS idf
      FROM (SELECT *, '**' || c_mktsegment || '*' AS padded FROM customer)
      ORDER BY c_custkey""",

    "f14_datetime_math_extras" -> """
      SELECT o_orderkey,
        strftime(o_orderdate + INTERVAL 2 MONTH, '%Y-%m-%d') AS madd,
        strftime(o_orderdate + INTERVAL 36 HOUR, '%Y-%m-%d %H:%M:%S') AS hadd,
        CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT) AS ddiff,
        CAST(epoch(o_orderdate) AS BIGINT) AS ep,
        CASE WHEN o_totalprice >= 0 THEN floor(o_totalprice * 10.0) / 10.0
             ELSE ceil(o_totalprice * 10.0) / 10.0 END AS tr1,
        round(log2(o_totalprice), 8) AS lg2,
        round(cot(o_orderkey % 7 + 1), 8) AS ct,
        round(pi(), 8) AS pi8
      FROM orders
      ORDER BY o_orderkey""",

    "f05_gap_funcs" -> """
      WITH inputs(sv) AS (VALUES ('123'), ('12.5'), ('-4e2'), ('abc'), ('12a'),
                                 (''), ('12.5.6'), ('+5'), ('Hello'), ('a#b#c'), ('#x#'))
      SELECT sv,
        regexp_matches(sv, '^[A-Za-z]+$') AS alpha,
        regexp_matches(sv, '^[0-9]+$') AS digit,
        (TRY_CAST(sv AS DOUBLE) IS NOT NULL AND NOT regexp_matches(sv, '^\\s|\\s$')
          AND sv <> '' AND lower(sv) NOT IN ('nan', 'inf', '-inf', 'infinity', '-infinity')) AS dec,
        string_split(sv, '#')[1] AS si0,
        CASE WHEN length(string_split(sv, '#')) > 1 THEN string_split(sv, '#')[2] END AS si1,
        CASE WHEN length(string_split(sv, '#')) > 5 THEN string_split(sv, '#')[6] END AS si5
      FROM inputs
      ORDER BY sv""",

    "f06_hash_code" -> """
      WITH t(sv, hc) AS (VALUES ('abc', 96354), ('hello', 99162322), ('A', 65),
                                ('', 0), ('zz', 3904), ('ab', 3105))
      SELECT sv, CAST(hc AS INT) AS hc FROM t ORDER BY sv""",

    "f07_hash_crypto" -> """
      SELECT c_custkey,
        md5(c_name) AS h_md5,
        sha256(c_name) AS h_sha256,
        to_base64(encode(c_name)) AS b64,
        c_name AS roundtrip
      FROM customer
      ORDER BY c_custkey""",

    "f08_casts" -> """
      SELECT l_orderkey, l_linenumber,
        CAST(l_orderkey AS VARCHAR) AS key_str,
        CAST(l_linenumber AS DOUBLE) AS ln_dbl,
        CAST(CAST(l_linenumber AS VARCHAR) || '9' AS INT) AS rt_int,
        CAST(l_discount > 0.05 AS VARCHAR) AS b_str,
        strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d') AS ship_day,
        CAST(floor(l_quantity * 1.5) AS INT) AS q_int
      FROM lineitem
      ORDER BY l_orderkey, l_linenumber"""
  )
}
