package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Ibis-semantic scalar/analytic function layer.
  *
  * Every helper reproduces a semantic quirk of the reference engine
  * (ibis-project/ibis) on top of codegen'd Spark SQL functions — no UDFs.
  * Citations are file:line into /root/reference.
  *
  * The big ones (SURVEY.md §2.3/§2.4):
  *   - 0-indexing: substring/find/array index+position/rank family
  *     (ibis/backends/sql/rewrites.py:490-507)
  *   - Monday=0 day-of-week (ibis/backends/sql/compilers/pyspark.py:182)
  *   - Capitalize = upper(first) + lower(rest), not initcap
  *     (ibis/backends/sql/rewrites.py:606-615)
  *   - Clip/Greatest/Least null-propagation (compilers/base.py:873-880)
  */
object ibisfn {

  /** Evaluate `value` exactly once and use it repeatedly in `body`.
    *
    * Higher-order array functions re-evaluate any non-trivial expression
    * referenced inside their lambda once PER ELEMENT (and CollapseProject
    * happily inlines upstream projections into lambda bodies) — so e.g.
    * `transform(idx, i => element_at(expensive, i))` recomputes `expensive`
    * |idx| times. Wrapping it as the input of a 1-element transform binds it
    * to a lambda variable: all reads in `body` are O(1) variable accesses.
    * This is the expression-level `let`. */
  def let1(value: Column)(body: Column => Column): Column =
    element_at(transform(array(value), x => body(x)), 1)

  // ---------------------------------------------------------------- strings

  /** ibis Substring: 0-indexed, negative start counts from the end
    * (ibis/expr/operations/strings.py:61). */
  def substring0(col: Column, start: Int, len: Int): Column =
    if (start >= 0) substring(col, start + 1, len)
    else substring(col, start, len) // Spark negative start is already from-end

  def substring0(col: Column, start: Int): Column =
    if (start >= 0) col.substr(lit(start + 1), length(col))
    else col.substr(lit(start), length(col))

  /** ibis StringFind: 0-indexed position, -1 when absent
    * (strings.py:107; oracle compilers/pyspark.py:456-467). */
  def strFind0(col: Column, sub: String, start: Int = 0): Column =
    locate(sub, col, start + 1) - 1

  /** ibis Capitalize (rewrites.py:606-615): upper(head) + lower(tail) —
    * differs from Spark initcap which capitalizes every word. */
  def capitalize(col: Column): Column =
    concat(upper(substring(col, 1, 1)), lower(substring(col, 2, Int.MaxValue)))

  /** ibis StrRight (strings.py:85). */
  def strRight(col: Column, n: Int): Column = substring(col, -n, n)

  /** ibis FindInSet: 0-indexed, -1 absent (strings.py:156). */
  def findInSet0(needle: Column, setCol: Column): Column =
    call_function("find_in_set", needle, setCol) - 1

  // ----------------------------------------------------------------- ranks

  /** ibis ranking fns are 0-indexed (rewrites.py:490-498). */
  def rank0(w: WindowSpec): Column = rank().over(w) - 1
  def denseRank0(w: WindowSpec): Column = dense_rank().over(w) - 1
  def rowNumber0(w: WindowSpec): Column = row_number().over(w) - 1
  def ntile0(n: Int, w: WindowSpec): Column = ntile(n).over(w) - 1

  /** ibis NthValue is 0-indexed (rewrites.py:501-507). */
  def nthValue0(col: Column, nth: Int, w: WindowSpec): Column =
    nth_value(col, nth + 1).over(w)

  // -------------------------------------------------------------- temporal

  /** ibis DayOfWeekIndex: Monday=0 (temporal.py:196; pyspark oracle
    * compilers/pyspark.py:182). Spark dayofweek: Sunday=1. */
  def dayOfWeekIndex(col: Column): Column = (dayofweek(col) + 5) % 7

  /** ibis DayOfWeekName (temporal.py:205). */
  def dayOfWeekName(col: Column): Column = date_format(col, "EEEE")

  /** ibis ExtractEpochSeconds (temporal.py:162). */
  def epochSeconds(col: Column): Column = unix_timestamp(col)

  /** ibis ExtractMillisecond: millis within the second (temporal.py:180). */
  def extractMillisecond(col: Column): Column =
    (date_part(lit("MICROSECONDS"), col) / 1000).cast("int")

  /** ibis ExtractMicrosecond (temporal.py:186). */
  def extractMicrosecond(col: Column): Column =
    date_part(lit("MICROSECONDS"), col).cast("int")

  /** ibis TimestampBucket (temporal.py:53) — floor ts into fixed-width
    * buckets; pyspark backend marks it unsupported, we do it natively. */
  def timestampBucket(col: Column, seconds: Long): Column =
    timestamp_seconds(floor(unix_timestamp(col) / seconds) * seconds)

  // ----------------------------------------------------------------- math

  /** ibis Strftime (temporal.py:65): C-strftime format string, converted to
    * the Java DateTimeFormatter dialect Spark's date_format speaks
    * (SURVEY.md §2.4 "format-string dialect conversion"). Unsupported
    * specifiers throw rather than silently mis-format. */
  def strftime(ts: Column, fmt: String): Column =
    date_format(ts, strftimeToJava(fmt))

  private[graft] def strftimeToJava(fmt: String): String = {
    val map = Map(
      'Y' -> "yyyy", 'y' -> "yy", 'm' -> "MM", 'd' -> "dd", 'e' -> "d",
      'H' -> "HH", 'I' -> "hh", 'M' -> "mm", 'S' -> "ss", 'f' -> "SSSSSS",
      'j' -> "DDD", 'a' -> "EEE", 'A' -> "EEEE", 'b' -> "MMM", 'B' -> "MMMM",
      // %G/%V/%u deliberately absent: week-based Java patterns (YYYY/ww/e)
      // are rejected at execution since Spark 3.0, so they must throw here
      // at conversion time per the documented contract.
      'p' -> "a", 'z' -> "xx", 'Z' -> "zz", '%' -> "%")
    val out = new StringBuilder
    var i = 0
    var literal = new StringBuilder
    def flush(): Unit = {
      if (literal.nonEmpty) {
        val s = literal.toString
        // Single quotes are Java-pattern metacharacters in ANY run, so they
        // are always doubled; runs containing letters additionally need
        // quoting so the letters aren't pattern chars.
        val esc = s.replace("'", "''")
        out ++= (if (s.exists(_.isLetter)) "'" + esc + "'" else esc)
        literal = new StringBuilder
      }
    }
    while (i < fmt.length) {
      if (fmt(i) == '%' && i + 1 < fmt.length) {
        val c = fmt(i + 1)
        if (c == '%') literal += '%'
        else {
          flush()
          out ++= map.getOrElse(c,
            throw new IllegalArgumentException(s"unsupported strftime specifier %$c"))
        }
        i += 2
      } else { literal += fmt(i); i += 1 }
    }
    flush()
    out.toString
  }

  /** ibis BetweenTime (temporal.py:440): is the time-of-day of `ts` within
    * [lo, hi] inclusive ("HH:mm:ss" bounds). Compared as microseconds since
    * midnight so sub-second timestamps sit on the correct side of the
    * bounds (a string compare of "HH:mm:ss" would truncate). */
  def betweenTime(ts: Column, lo: String, hi: String): Column = {
    def us(t: String): Long = {
      val p = t.split(":").map(_.toDouble)
      ((p(0) * 3600 + p(1) * 60 + p(2)) * 1e6).toLong
    }
    val tod = unix_micros(ts) - unix_micros(date_trunc("DAY", ts))
    tod.between(lit(us(lo)), lit(us(hi)))
  }

  /** ibis StringToTime (temporal.py:98) — unsupported by the reference's
    * pyspark backend; we emulate TIME as µs-of-day int64 (the same
    * convention as [[betweenTime]]): parse "HH:mm:ss[.fraction]" as a
    * timestamp on the epoch date and take its microsecond offset. Invalid
    * strings → null (to_timestamp parse semantics). */
  def stringToTime(s: Column): Column =
    unix_micros(try_to_timestamp(concat(lit("1970-01-01 "), s)))

  /** ibis TimeDelta/DateDelta/TimestampDelta(part) (temporal.py:457-477):
    * whole `part`-boundaries crossed between start and end. */
  def timestampDelta(part: String, start: Column, end: Column): Column = {
    // `timestampdiff` is parser syntax, not a registered function — build
    // the Catalyst expression directly.
    import org.apache.spark.sql.GraftSqlBridge._
    column(org.apache.spark.sql.catalyst.expressions.TimestampDiff(
      part.toUpperCase, expression(start), expression(end)))
  }

  /** ibis FloorDivide returns int64 (numeric.py:69). */
  def floorDiv(a: Column, b: Column): Column = floor(a / b).cast("long")

  /** ibis Ceil/Floor return int64 for non-decimal input (numeric.py:119-143). */
  def ceilLong(col: Column): Column = ceil(col).cast("long")
  def floorLong(col: Column): Column = floor(col).cast("long")

  /** ibis Clip with null propagation (numeric.py:179; compilers/base.py:873-880):
    * Spark's greatest/least skip nulls, ibis propagates them. */
  def clip(col: Column, lower: Option[Double], upper: Option[Double]): Column = {
    val bounded = (lower, upper) match {
      case (Some(lo), Some(hi)) => least(greatest(col, lit(lo)), lit(hi))
      case (Some(lo), None)     => greatest(col, lit(lo))
      case (None, Some(hi))     => least(col, lit(hi))
      case (None, None)         => col
    }
    when(col.isNull, lit(null)).otherwise(bounded)
  }

  /** ibis Greatest/Least propagate nulls (generic.py:114-130); Spark skips. */
  def greatestStrict(cols: Column*): Column =
    when(cols.map(_.isNull).reduce(_ || _), lit(null)).otherwise(greatest(cols: _*))
  def leastStrict(cols: Column*): Column =
    when(cols.map(_.isNull).reduce(_ || _), lit(null)).otherwise(least(cols: _*))

  /** ibis IsInf (numeric.py:101; oracle compilers/pyspark.py:166-169). */
  def isInf(col: Column): Column =
    col === lit(Double.PositiveInfinity) || col === lit(Double.NegativeInfinity)

  // ---------------------------------------------------------------- arrays

  /** ibis ArrayRemove (arrays.py:159): remove every occurrence of `value`
    * but KEEP null elements — Spark's array_remove drops them. */
  def arrayRemove(col: Column, value: Column): Column =
    filter(col, x => x.isNull || x =!= value)

  /** ibis ArrayZip (arrays.py:212): zip to structs with positional field
    * names f1, f2, … (Spark's arrays_zip uses the source column names);
    * zips to the LONGEST input, null-padding the shorter ones. `get` is
    * 0-based and null-on-out-of-bounds (ANSI-safe). */
  def arrayZip(cols: Column*): Column =
    transform(sequence(lit(0), greatest(cols.map(size): _*) - 1), i =>
      struct(cols.zipWithIndex.map { case (c, j) => get(c, i).as(s"f${j + 1}") }: _*))

  /** ibis ArrayIndex: 0-indexed, negative from end, null out-of-bounds
    * (arrays.py:55; oracle compilers/pyspark.py:406). */
  def arrayIndex0(col: Column, i: Int): Column =
    if (i >= 0) get(col, lit(i)) else element_at(col, i)

  /** ibis ArrayPosition: 0-indexed, -1 when absent (arrays.py:148). */
  def arrayPosition0(col: Column, value: Column): Column =
    array_position(col, value) - 1

  /** ibis ArraySlice with 0-indexed start (arrays.py:43). */
  def arraySlice0(col: Column, start: Int, len: Int): Column =
    slice(col, start + 1, len)

  /** ibis ArrayRepeat = whole-array repetition (arrays.py:82; oracle
    * compilers/pyspark.py:412) — flatten(array_repeat(arr, n)). */
  def arrayRepeat(col: Column, n: Int): Column = flatten(array_repeat(col, n))

  /** ibis ArrayAny/ArrayAll over boolean arrays (arrays.py:318-335). */
  def arrayAny(col: Column): Column = array_max(col)
  def arrayAll(col: Column): Column = array_min(col)

  /** ibis ArraySum/ArrayMean via higher-order aggregate (arrays.py:301-316) —
    * stays inside codegen, no explode/shuffle. */
  def arraySum(col: Column): Column =
    when(col.isNull, lit(null)).otherwise(
      aggregate(filter(col, x => x.isNotNull), lit(0.0), (acc, x) => acc + x))
  def arrayMean(col: Column): Column = {
    val nn = filter(col, x => x.isNotNull)
    when(col.isNull || size(nn) === 0, lit(null))
      .otherwise(aggregate(nn, lit(0.0), (acc, x) => acc + x) / size(nn))
  }

  /** ibis IntegerRange: exclusive stop, empty on step 0
    * (arrays.py:258; oracle compilers/pyspark.py:332-339). Spark sequence is
    * inclusive ⇒ trim the endpoint. */
  def integerRange(start: Column, stop: Column, step: Column): Column =
    when(step === 0, array().cast("array<bigint>")).otherwise(
      filter(
        sequence(start.cast("long"), stop.cast("long"), step.cast("long")),
        x => when(step > 0, x < stop).otherwise(x > stop)))

  // ------------------------------------------------------------------ maps

  /** ibis MapGet with default (maps.py:39; oracle compilers/pyspark.py:379-383). */
  /** ibis MapMerge (maps.py:87) — FIRST-wins on duplicate keys (ibis docs
    * maps.py:88-91). The pyspark backend needs the session-level
    * `spark.sql.mapKeyDedupPolicy=LAST_WIN` + argument swap
    * (backends/pyspark/__init__.py:212); filtering `b` down to keys absent
    * from `a` instead makes the expression policy-independent — it works
    * under Spark's default EXCEPTION dedup policy too. */
  def mapMerge(a: Column, b: Column): Column =
    map_concat(a, map_filter(b, (k, _) => !map_contains_key(a, k)))

  def mapGet(col: Column, key: Column, default: Column): Column =
    coalesce(try_element_at(col, key), default)

  // ------------------------------------------------------------------ json

  /** ibis JSONGetItem (json.py:14; oracle compilers/pyspark.py:472-478). */
  def jsonGetItem(col: Column, key: String): Column =
    get_json_object(col, s"$$.$key")

  /** ibis UnwrapJSONInt64 (json.py:64): null unless the JSON value is an
    * integer — bools and floats-with-fraction are rejected (json.py:86-89). */
  def unwrapJsonInt(col: Column, key: String): Column = {
    val raw = get_json_object(col, s"$$.$key")
    when(raw.rlike("^-?[0-9]+$"), raw.cast("long")).otherwise(lit(null))
  }

  /** ibis UnwrapJSONFloat64: numbers only, not bools (json.py:73). */
  def unwrapJsonFloat(col: Column, key: String): Column = {
    val raw = get_json_object(col, s"$$.$key")
    when(raw.rlike("^-?[0-9]+(\\.[0-9]+)?([eE][+-]?[0-9]+)?$"), raw.cast("double"))
      .otherwise(lit(null))
  }

  /** ibis UnwrapJSONBoolean (json.py:82). */
  def unwrapJsonBool(col: Column, key: String): Column = {
    val raw = get_json_object(col, s"$$.$key")
    when(raw === "true", lit(true)).when(raw === "false", lit(false)).otherwise(lit(null))
  }

  // ------------------------------------------------------------ histograms

  /** ibis Bucket (histograms.py:18) lowered to a searched-case chain
    * (rewrites.py:552-603). closed="left" default; include_under/over add
    * open-ended edge buckets. Bucket index is int32 like the reference. */
  def bucket(
      col: Column,
      buckets: Seq[Double],
      closedLeft: Boolean = true,
      includeUnder: Boolean = false,
      includeOver: Boolean = false): Column = {
    require(buckets.size >= 2, "bucket needs at least 2 edges")
    var idx = 0
    var c: Column = null
    def addCase(cond: Column): Unit = {
      c = if (c == null) when(cond, lit(idx)) else c.when(cond, lit(idx))
      idx += 1
    }
    if (includeUnder) addCase(if (closedLeft) col < buckets.head else col <= buckets.head)
    buckets.sliding(2).zipWithIndex.foreach { case (Seq(lo, hi), i) =>
      val isLast = i == buckets.size - 2
      val cond =
        if (closedLeft)
          if (isLast && !includeOver) col >= lo && col <= hi else col >= lo && col < hi
        else if (i == 0 && !includeUnder) col >= lo && col <= hi
        else col > lo && col <= hi
      addCase(cond)
    }
    if (includeOver) addCase(if (closedLeft) col >= buckets.last else col > buckets.last)
    c.otherwise(lit(null)).cast("int")
  }

  // ------------------------------------------------------------ reductions

  /** Filterable reductions (reductions.py:28-29): agg(x) FILTER (WHERE p). */
  def aggFiltered(aggFn: Column => Column, x: Column, where: Column): Column =
    aggFn(when(where, x))

  /** ibis GroupConcat (reductions.py:82). NOTE: element order is the
    * engine's arrival order — nondeterministic across partitioned runs;
    * prefer [[groupConcatOrdered]] when a stable result matters. */
  def groupConcat(x: Column, sep: String): Column =
    array_join(collect_list(x), sep)

  /** ibis GroupConcat(order_by=value) (reductions.py:82): deterministic,
    * elements sorted ascending before joining. */
  def groupConcatOrdered(x: Column, sep: String): Column =
    array_join(sort_array(collect_list(x)), sep)

  /** Window spec helper matching ibis's default frame injection for ranking
    * functions (rewrites.py:480-533): (unbounded preceding, current row). */
  def cumulativeFrame(w: WindowSpec): WindowSpec =
    w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

  /** ibis Kurtosis(how="sample") (reductions.py:339) — the pyspark backend
    * can't do it (compilers/pyspark.py:73); we compose it from Spark's
    * population moments in ONE pass: G2 = ((n+1)·g2 + 6)·(n-1)/((n-2)(n-3))
    * where g2 is Spark's (population, excess) `kurtosis`. */
  def kurtosisSample(x: Column): Column = {
    val n = count(x).cast("double")
    ((n + 1) * kurtosis(x) + 6) * (n - 1) / ((n - 2) * (n - 3))
  }

  /** ibis sample skewness: G1 = g1 · sqrt(n(n-1))/(n-2), g1 = Spark's
    * population `skewness`. Single pass, no custom Aggregator needed. */
  def skewnessSample(x: Column): Column = {
    val n = count(x).cast("double")
    skewness(x) * sqrt(n * (n - 1)) / (n - 2)
  }
}
