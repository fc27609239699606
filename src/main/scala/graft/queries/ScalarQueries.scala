package graft.queries

import org.apache.spark.sql.functions._

import graft.api.{SortKey, Table}
import graft.functions.ibisfn
import Tables._

/** Scalar-function corpus (SURVEY.md §2.4): strings/regex, math/bitwise,
  * logical/comparison/case, temporal/interval. Pure per-row expressions —
  * these stay inside one WholeStageCodegen span over the scan. */
object ScalarQueries {

  val defs: Seq[QueryDef] = Seq(

    // String battery 1: case/trim/pad/slice with ibis 0-indexing.
    QueryDef("q40_strings", (s, dir) => {
      Table(part(s, dir))
        .filter(col("p_partkey") < 40)
        .mutate(
          "up" -> upper(col("p_name")),
          "lo" -> lower(col("p_brand")),
          "cap" -> ibisfn.capitalize(col("p_name")),
          "rev" -> reverse(col("p_name")),
          "sub0" -> ibisfn.substring0(col("p_name"), 2, 4),
          "rightN" -> ibisfn.strRight(col("p_name"), 5),
          "lpadded" -> lpad(col("p_brand"), 12, "*"),
          "rpadded" -> rpad(col("p_brand"), 12, "-"),
          "rep" -> repeat(col("p_type"), 2),
          "len" -> length(col("p_name")),
          "trimmed" -> trim(lpad(col("p_type"), 10, " ")),
          "tr" -> translate(col("p_name"), "aeiou", "AEIOU"))
        .selectNames("p_partkey", "up", "lo", "cap", "rev", "sub0", "rightN",
          "lpadded", "rpadded", "rep", "len", "trimmed", "tr")
        .sort(SortKey.asc(col("p_partkey")))
        .df
    }, Some("""
      SELECT p_partkey, UPPER(p_name) AS up, LOWER(p_brand) AS lo,
        UPPER(p_name[1:1]) || LOWER(p_name[2:]) AS cap,
        REVERSE(p_name) AS rev,
        p_name[3:6] AS sub0,
        p_name[-5:] AS rightN,
        LPAD(p_brand, 12, '*') AS lpadded, RPAD(p_brand, 12, '-') AS rpadded,
        REPEAT(p_type, 2) AS rep, CAST(LENGTH(p_name) AS INT) AS len,
        TRIM(LPAD(p_type, 10, ' ')) AS trimmed,
        TRANSLATE(p_name, 'aeiou', 'AEIOU') AS tr
      FROM part WHERE p_partkey < 40 ORDER BY p_partkey""")),

    // String battery 2: find/contains/startswith + split/join + levenshtein.
    QueryDef("q41_strings_search", (s, dir) => {
      Table(part(s, dir))
        .filter(col("p_partkey") < 40)
        .mutate(
          "find0" -> ibisfn.strFind0(col("p_name"), "widget"),
          "haswid" -> col("p_name").contains("widget"),
          "startsw" -> col("p_name").startsWith("small"),
          "endsw" -> col("p_name").endsWith("bolt"),
          "word1" -> element_at(split(col("p_name"), " "), 1),
          "word_cnt" -> size(split(col("p_name"), " ")),
          "joined" -> concat_ws("-", col("p_brand"), col("p_type")),
          "lev" -> levenshtein(col("p_name"), lit("small widget")),
          "asc0" -> ascii(col("p_name")),
          "liked" -> col("p_name").like("%wid%"),
          "ilike" -> col("p_name").ilike("%WID%"))
        .selectNames("p_partkey", "find0", "haswid", "startsw", "endsw", "word1",
          "word_cnt", "joined", "lev", "asc0", "liked", "ilike")
        .sort(SortKey.asc(col("p_partkey")))
        .df
    }, Some("""
      SELECT p_partkey,
        CAST(STRPOS(p_name, 'widget') - 1 AS INT) AS find0,
        CONTAINS(p_name, 'widget') AS haswid,
        STARTS_WITH(p_name, 'small') AS startsw,
        p_name LIKE '%bolt' AS endsw,
        STRING_SPLIT(p_name, ' ')[1] AS word1,
        CAST(LEN(STRING_SPLIT(p_name, ' ')) AS INT) AS word_cnt,
        CONCAT_WS('-', p_brand, p_type) AS joined,
        CAST(LEVENSHTEIN(p_name, 'small widget') AS INT) AS lev,
        CAST(ASCII(p_name) AS INT) AS asc0,
        p_name LIKE '%wid%' AS liked,
        p_name ILIKE '%WID%' AS ilike
      FROM part WHERE p_partkey < 40 ORDER BY p_partkey""")),

    // Regex ops (Java dialect on Spark; patterns kept RE2/Java-compatible).
    QueryDef("q42_regex", (s, dir) => {
      Table(customer(s, dir))
        .filter(col("c_custkey") < 40)
        .mutate(
          "cust_num" -> regexp_extract(col("c_name"), "Customer#(\\d+)", 1).cast("long"),
          "digits_gone" -> regexp_replace(col("c_name"), "\\d", ""),
          "has_zeros" -> col("c_name").rlike("0{3,}"),
          "n_parts" -> size(split(col("c_name"), "#")),
          "seg_initial" -> regexp_extract(col("c_mktsegment"), "^(.)", 1))
        .selectNames("c_custkey", "cust_num", "digits_gone", "has_zeros", "n_parts", "seg_initial")
        .sort(SortKey.asc(col("c_custkey")))
        .df
    }, Some("""
      SELECT c_custkey,
        CAST(REGEXP_EXTRACT(c_name, 'Customer#(\d+)', 1) AS BIGINT) AS cust_num,
        REGEXP_REPLACE(c_name, '\d', '', 'g') AS digits_gone,
        REGEXP_MATCHES(c_name, '0{3,}') AS has_zeros,
        CAST(LEN(STRING_SPLIT(c_name, '#')) AS INT) AS n_parts,
        REGEXP_EXTRACT(c_mktsegment, '^(.)', 1) AS seg_initial
      FROM customer WHERE c_custkey < 40 ORDER BY c_custkey""")),

    // Math battery: rounding/rootslogs/trig/sign/clip, ibis int64 floor-ceil.
    QueryDef("q43_math", (s, dir) => {
      Table(lineitem(s, dir))
        .filter(col("l_orderkey") < 30)
        .mutate(
          "px" -> col("l_extendedprice"),
          "absneg" -> abs(-col("l_quantity")),
          "ceil_l" -> ibisfn.ceilLong(col("l_extendedprice") / 1000),
          "floor_l" -> ibisfn.floorLong(col("l_extendedprice") / 1000),
          "rnd2" -> round(col("l_extendedprice"), -2),
          "sq" -> round(sqrt(col("l_extendedprice")), 6),
          "ex" -> round(exp(col("l_discount")), 6),
          "lg" -> round(log(col("l_extendedprice")), 6),
          "lg10" -> round(log10(col("l_extendedprice")), 6),
          "lg2" -> round(log2(col("l_extendedprice")), 6),
          "lgb" -> round(log(5.0, col("l_extendedprice")), 6),
          "pw" -> round(pow(col("l_quantity"), lit(2)), 4),
          "md" -> pmod(col("l_orderkey"), lit(7)),
          "sgn" -> signum(col("l_quantity") - 25),
          "sn" -> round(sin(col("l_discount")), 6),
          "at2" -> round(atan2(col("l_quantity"), col("l_tax") + 1), 6),
          "clipped" -> ibisfn.clip(col("l_quantity"), Some(10.0), Some(40.0)),
          "deg" -> round(degrees(col("l_discount")), 6),
          "rad" -> round(radians(col("l_quantity")), 6))
        .selectNames("l_orderkey", "l_linenumber", "px", "absneg", "ceil_l", "floor_l",
          "rnd2", "sq", "ex", "lg", "lg10", "lg2", "lgb", "pw", "md", "sgn", "sn",
          "at2", "clipped", "deg", "rad")
        .sort(SortKey.asc(col("l_orderkey")), SortKey.asc(col("l_linenumber")))
        .df
    }, Some("""
      SELECT l_orderkey, l_linenumber, l_extendedprice AS px,
        ABS(-l_quantity) AS absneg,
        CAST(CEIL(l_extendedprice / 1000) AS BIGINT) AS ceil_l,
        CAST(FLOOR(l_extendedprice / 1000) AS BIGINT) AS floor_l,
        ROUND(l_extendedprice, -2) AS rnd2,
        ROUND(SQRT(l_extendedprice), 6) AS sq,
        ROUND(EXP(l_discount), 6) AS ex,
        ROUND(LN(l_extendedprice), 6) AS lg,
        ROUND(LOG10(l_extendedprice), 6) AS lg10,
        ROUND(LOG2(l_extendedprice), 6) AS lg2,
        ROUND(LN(l_extendedprice) / LN(5.0), 6) AS lgb,
        ROUND(POW(l_quantity, 2), 4) AS pw,
        CAST(l_orderkey % 7 AS BIGINT) AS md,
        CASE WHEN l_quantity - 25 > 0 THEN 1.0 WHEN l_quantity - 25 < 0 THEN -1.0 ELSE 0.0 END AS sgn,
        ROUND(SIN(l_discount), 6) AS sn,
        ROUND(ATAN2(l_quantity, l_tax + 1), 6) AS at2,
        CASE WHEN l_quantity IS NULL THEN NULL ELSE LEAST(GREATEST(l_quantity, 10.0), 40.0) END AS clipped,
        ROUND(DEGREES(l_discount), 6) AS deg,
        ROUND(RADIANS(l_quantity), 6) AS rad
      FROM lineitem WHERE l_orderkey < 30 ORDER BY l_orderkey, l_linenumber""")),

    // Bitwise ops (numeric.py:342-392).
    QueryDef("q44_bitwise", (s, dir) => {
      Table(customer(s, dir))
        .filter(col("c_custkey") < 40)
        .mutate(
          "band" -> (col("c_custkey").bitwiseAND(col("c_nationkey").cast("long"))),
          "bor" -> (col("c_custkey").bitwiseOR(col("c_nationkey").cast("long"))),
          "bxor" -> (col("c_custkey").bitwiseXOR(col("c_nationkey").cast("long"))),
          "bnot" -> bitwise_not(col("c_custkey")),
          "shl" -> shiftleft(col("c_custkey"), 3),
          "shr" -> shiftright(col("c_custkey"), 1))
        .selectNames("c_custkey", "band", "bor", "bxor", "bnot", "shl", "shr")
        .sort(SortKey.asc(col("c_custkey")))
        .df
    }, Some("""
      SELECT c_custkey,
        c_custkey & c_nationkey AS band,
        c_custkey | c_nationkey AS bor,
        XOR(c_custkey, c_nationkey) AS bxor,
        ~c_custkey AS bnot,
        c_custkey << 3 AS shl,
        c_custkey >> 1 AS shr
      FROM customer WHERE c_custkey < 40 ORDER BY c_custkey""")),

    // Logical / comparison / case / null ops (logical.py, generic.py).
    QueryDef("q45_logical_case", (s, dir) => {
      Table(orders(s, dir))
        .filter(col("o_orderkey") < 50)
        .mutate(
          "cmp" -> (col("o_totalprice") > 100000.0),
          "conj" -> ((col("o_totalprice") > 50000.0) && (col("o_orderstatus") === "F")),
          "disj" -> ((col("o_orderpriority") === "1-URGENT") || (col("o_orderpriority") === "2-HIGH")),
          "neg" -> !(col("o_orderstatus") === "O"),
          "xr" -> ((col("o_totalprice") > 100000.0) =!= (col("o_orderstatus") === "F")),
          "nullsafe_eq" -> col("o_orderstatus").eqNullSafe(lit("F")),
          "btw" -> col("o_totalprice").between(50000.0, 150000.0),
          "inset" -> col("o_orderpriority").isin("1-URGENT", "5-LOW"),
          "ifelse" -> when(col("o_totalprice") > 100000.0, lit("big")).otherwise(lit("small")),
          "simple_case" -> when(col("o_orderstatus") === "F", "done")
            .when(col("o_orderstatus") === "O", "open").otherwise("partial"),
          "searched" -> when(col("o_totalprice") < 50000.0, 0)
            .when(col("o_totalprice") < 150000.0, 1).otherwise(2),
          "nullif_o" -> nullif(col("o_orderstatus"), lit("O")),
          "coal" -> coalesce(nullif(col("o_orderstatus"), lit("O")), lit("was_open")),
          "grt" -> ibisfn.greatestStrict(col("o_totalprice"), lit(100000.0)),
          "lst" -> ibisfn.leastStrict(col("o_totalprice"), lit(100000.0)))
        .selectNames("o_orderkey", "cmp", "conj", "disj", "neg", "xr", "nullsafe_eq",
          "btw", "inset", "ifelse", "simple_case", "searched", "nullif_o", "coal", "grt", "lst")
        .sort(SortKey.asc(col("o_orderkey")))
        .df
    }, Some("""
      SELECT o_orderkey,
        o_totalprice > 100000 AS cmp,
        o_totalprice > 50000 AND o_orderstatus = 'F' AS conj,
        o_orderpriority = '1-URGENT' OR o_orderpriority = '2-HIGH' AS disj,
        NOT (o_orderstatus = 'O') AS neg,
        (o_totalprice > 100000) != (o_orderstatus = 'F') AS xr,
        o_orderstatus IS NOT DISTINCT FROM 'F' AS nullsafe_eq,
        o_totalprice BETWEEN 50000 AND 150000 AS btw,
        o_orderpriority IN ('1-URGENT', '5-LOW') AS inset,
        CASE WHEN o_totalprice > 100000 THEN 'big' ELSE 'small' END AS ifelse,
        CASE o_orderstatus WHEN 'F' THEN 'done' WHEN 'O' THEN 'open' ELSE 'partial' END AS simple_case,
        CASE WHEN o_totalprice < 50000 THEN 0 WHEN o_totalprice < 150000 THEN 1 ELSE 2 END AS searched,
        NULLIF(o_orderstatus, 'O') AS nullif_o,
        COALESCE(NULLIF(o_orderstatus, 'O'), 'was_open') AS coal,
        GREATEST(o_totalprice, 100000.0) AS grt,
        LEAST(o_totalprice, 100000.0) AS lst
      FROM orders WHERE o_orderkey < 50 ORDER BY o_orderkey""")),

    // Temporal extraction battery incl. ibis Monday-0 weekday.
    QueryDef("q46_temporal_extract", (s, dir) => {
      Table(orders(s, dir))
        .filter(col("o_orderkey") < 50)
        .mutate(
          "yr" -> year(col("o_orderdate")),
          "mo" -> month(col("o_orderdate")),
          "dy" -> dayofmonth(col("o_orderdate")),
          "qtr" -> quarter(col("o_orderdate")),
          "doy" -> dayofyear(col("o_orderdate")),
          "wk" -> weekofyear(col("o_orderdate")),
          "dow0" -> ibisfn.dayOfWeekIndex(col("o_orderdate")),
          "dow_name" -> ibisfn.dayOfWeekName(col("o_orderdate")),
          "hr" -> hour(col("o_orderdate")),
          "mi" -> minute(col("o_orderdate")),
          "sec" -> second(col("o_orderdate")),
          "epoch_s" -> unix_timestamp(col("o_orderdate")),
          "iso_str" -> date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss"))
        .selectNames("o_orderkey", "yr", "mo", "dy", "qtr", "doy", "wk", "dow0",
          "dow_name", "hr", "mi", "sec", "epoch_s", "iso_str")
        .sort(SortKey.asc(col("o_orderkey")))
        .df
    }, Some("""
      SELECT o_orderkey,
        CAST(YEAR(o_orderdate) AS INT) AS yr,
        CAST(MONTH(o_orderdate) AS INT) AS mo,
        CAST(DAY(o_orderdate) AS INT) AS dy,
        CAST(QUARTER(o_orderdate) AS INT) AS qtr,
        CAST(DAYOFYEAR(o_orderdate) AS INT) AS doy,
        CAST(WEEKOFYEAR(o_orderdate) AS INT) AS wk,
        CAST((DAYOFWEEK(o_orderdate) + 6) % 7 AS INT) AS dow0,
        DAYNAME(o_orderdate) AS dow_name,
        CAST(HOUR(o_orderdate) AS INT) AS hr,
        CAST(MINUTE(o_orderdate) AS INT) AS mi,
        CAST(SECOND(o_orderdate) AS INT) AS sec,
        CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
        STRFTIME(o_orderdate, '%Y-%m-%d %H:%M:%S') AS iso_str
      FROM orders WHERE o_orderkey < 50 ORDER BY o_orderkey""")),

    // Truncation, bucketing, date arithmetic, intervals, deltas.
    QueryDef("q47_temporal_arith", (s, dir) => {
      Table(orders(s, dir))
        .filter(col("o_orderkey") < 50)
        .mutate(
          "mon_start" -> date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd"),
          "wk_start" -> date_format(date_trunc("week", col("o_orderdate")), "yyyy-MM-dd"),
          "bucket_12h" -> date_format(ibisfn.timestampBucket(col("o_orderdate"), 12 * 3600), "yyyy-MM-dd HH:mm:ss"),
          "plus_30d" -> date_format(col("o_orderdate") + expr("INTERVAL 30 DAYS"), "yyyy-MM-dd"),
          "minus_2mo" -> date_format(col("o_orderdate") - expr("INTERVAL 2 MONTHS"), "yyyy-MM-dd"),
          "days_since_epoch" -> datediff(col("o_orderdate").cast("date"), lit("1970-01-01").cast("date")),
          "days_to_1998" -> datediff(lit("1998-01-01").cast("date"), col("o_orderdate").cast("date")),
          "months_between_98" -> round(months_between(lit("1998-01-01").cast("date"), col("o_orderdate")), 4),
          "mk_date" -> date_format(make_date(year(col("o_orderdate")), month(col("o_orderdate")), lit(1)), "yyyy-MM-dd"),
          "next_mon" -> date_format(next_day(col("o_orderdate"), "Mon"), "yyyy-MM-dd"),
          "last_dom" -> date_format(last_day(col("o_orderdate")), "yyyy-MM-dd"))
        .selectNames("o_orderkey", "mon_start", "wk_start", "bucket_12h", "plus_30d",
          "minus_2mo", "days_since_epoch", "days_to_1998", "months_between_98",
          "mk_date", "next_mon", "last_dom")
        .sort(SortKey.asc(col("o_orderkey")))
        .df
    }, Some("""
      SELECT o_orderkey,
        STRFTIME(DATE_TRUNC('month', o_orderdate), '%Y-%m-%d') AS mon_start,
        STRFTIME(DATE_TRUNC('week', o_orderdate), '%Y-%m-%d') AS wk_start,
        STRFTIME(MAKE_TIMESTAMP(CAST(FLOOR(epoch(o_orderdate) / 43200) * 43200 * 1000000 AS BIGINT)), '%Y-%m-%d %H:%M:%S') AS bucket_12h,
        STRFTIME(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS plus_30d,
        STRFTIME(o_orderdate - INTERVAL 2 MONTH, '%Y-%m-%d') AS minus_2mo,
        CAST(DATEDIFF('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS INT) AS days_since_epoch,
        CAST(DATEDIFF('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS INT) AS days_to_1998,
        ROUND(12 * (1998 - YEAR(o_orderdate)) - MONTH(o_orderdate) + 1
          - CASE WHEN DAY(o_orderdate) = 1 THEN 0.0
                 ELSE (DAY(o_orderdate) - 1) / 31.0 END, 4) AS months_between_98,
        STRFTIME(MAKE_DATE(YEAR(o_orderdate), MONTH(o_orderdate), 1), '%Y-%m-%d') AS mk_date,
        STRFTIME(CAST(o_orderdate AS DATE) + CASE WHEN (DAYOFWEEK(CAST(o_orderdate AS DATE)) + 6) % 7 = 0 THEN 7
          ELSE (7 - (DAYOFWEEK(CAST(o_orderdate AS DATE)) + 6) % 7) % 7 END::INT, '%Y-%m-%d') AS next_mon,
        STRFTIME(LAST_DAY(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS last_dom
      FROM orders WHERE o_orderkey < 50 ORDER BY o_orderkey""")),

    // String → timestamp/date parsing (Strftime family, format-dialect
    // conversion strftime↔Java noted in SURVEY §2.4).
    QueryDef("q48_temporal_parse", (s, dir) => {
      val s2 = s
      Table(orders(s2, dir))
        .filter(col("o_orderkey") < 30)
        .mutate("datestr" -> date_format(col("o_orderdate"), "yyyy-MM-dd"))
        .mutate(
          "parsed_ts" -> date_format(to_timestamp(col("datestr"), "yyyy-MM-dd"), "yyyy-MM-dd HH:mm:ss"),
          "parsed_date" -> date_format(to_date(col("datestr"), "yyyy-MM-dd"), "yyyy-MM-dd"),
          "roundtrip_us" -> unix_micros(to_timestamp(col("datestr"))))
        .selectNames("o_orderkey", "datestr", "parsed_ts", "parsed_date", "roundtrip_us")
        .sort(SortKey.asc(col("o_orderkey")))
        .df
    }, Some("""
      SELECT o_orderkey, STRFTIME(o_orderdate, '%Y-%m-%d') AS datestr,
        STRFTIME(STRPTIME(STRFTIME(o_orderdate, '%Y-%m-%d'), '%Y-%m-%d'), '%Y-%m-%d %H:%M:%S') AS parsed_ts,
        STRFTIME(CAST(STRPTIME(STRFTIME(o_orderdate, '%Y-%m-%d'), '%Y-%m-%d') AS DATE), '%Y-%m-%d') AS parsed_date,
        epoch_us(STRPTIME(STRFTIME(o_orderdate, '%Y-%m-%d'), '%Y-%m-%d')) AS roundtrip_us
      FROM orders WHERE o_orderkey < 30 ORDER BY o_orderkey""")),

    // Hashing & type ops: md5/sha/hex, casts, try_cast, typeof.
    QueryDef("q49_hash_cast", (s, dir) => {
      Table(customer(s, dir))
        .filter(col("c_custkey") < 30)
        .mutate(
          "md5h" -> md5(col("c_name").cast("binary")),
          "sha256h" -> sha2(col("c_name").cast("binary"), 256),
          "hexed" -> hex(col("c_name").cast("binary")),
          "unhexed" -> expr("cast(unhex(hex(cast(c_name as binary))) as string)"),
          "as_str" -> col("c_custkey").cast("string"),
          "as_dbl" -> col("c_custkey").cast("double"),
          "str2int" -> lit("42").cast("long"),
          "try_bad" -> try_to_number(lit("xx"), lit("999")),
          "bal_int" -> col("c_acctbal").cast("long"))
        .selectNames("c_custkey", "md5h", "sha256h", "hexed", "unhexed",
          "as_str", "as_dbl", "str2int", "try_bad", "bal_int")
        .sort(SortKey.asc(col("c_custkey")))
        .df
    }, Some("""
      SELECT c_custkey,
        MD5(c_name) AS md5h,
        SHA256(c_name) AS sha256h,
        UPPER(HEX(c_name)) AS hexed,
        c_name AS unhexed,
        CAST(c_custkey AS VARCHAR) AS as_str,
        CAST(c_custkey AS DOUBLE) AS as_dbl,
        CAST('42' AS BIGINT) AS str2int,
        TRY_CAST('xx' AS DECIMAL(3,0)) AS try_bad,
        CAST(TRUNC(c_acctbal) AS BIGINT) AS bal_int
      FROM customer WHERE c_custkey < 30 ORDER BY c_custkey"""))
  )
}
