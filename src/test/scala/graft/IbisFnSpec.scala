package graft

import org.apache.spark.sql.functions._

import graft.functions.ibisfn

class IbisFnSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column): T =
    Seq(1).toDF("x").select(c.as("r")).collect().head.getAs[T]("r")

  test("substring0 is 0-indexed; negative start counts from end") {
    assert(one[String](ibisfn.substring0(lit("abcdef"), 1, 3)) == "bcd")
    assert(one[String](ibisfn.substring0(lit("abcdef"), 0, 2)) == "ab")
    assert(one[String](ibisfn.substring0(lit("abcdef"), -2)) == "ef")
  }

  test("strFind0 returns 0-based position, -1 when absent") {
    assert(one[Int](ibisfn.strFind0(lit("hello"), "ll")) == 2)
    assert(one[Int](ibisfn.strFind0(lit("hello"), "zz")) == -1)
  }

  test("capitalize: first char upper, REST lower (not initcap)") {
    assert(one[String](ibisfn.capitalize(lit("hello World"))) == "Hello world")
  }

  test("clip propagates nulls (Spark least/greatest would skip them)") {
    val df = Seq(Some(5.0), Some(50.0), None).toDF("v")
    val out = df.select(ibisfn.clip(col("v"), Some(10.0), Some(40.0)).as("c"))
      .collect().map(r => Option(r.get(0))).toSeq
    assert(out == Seq(Some(10.0), Some(40.0), None))
  }

  test("greatestStrict null-propagates") {
    val df = Seq((Some(1.0), Some(2.0)), (Some(1.0), None)).toDF("a", "b")
    val out = df.select(ibisfn.greatestStrict(col("a"), col("b")).as("g"))
      .collect().map(r => Option(r.get(0))).toSeq
    assert(out == Seq(Some(2.0), None))
  }

  test("bucket: closed-left edges, include_over adds the open bucket") {
    val df = Seq(-5.0, 0.0, 49.9, 50.0, 99.9, 100.0).toDF("v")
    val out = df.select(ibisfn.bucket(col("v"), Seq(0, 50, 100), includeOver = true).as("b"))
      .collect().map(r => Option(r.get(0))).toSeq
    assert(out == Seq(None, Some(0), Some(0), Some(1), Some(1), Some(2)))
  }

  test("integerRange: exclusive stop, empty on zero step") {
    val df = Seq(1).toDF("x")
    def range(start: Int, stop: Int, step: Int) =
      df.select(ibisfn.integerRange(lit(start), lit(stop), lit(step)).as("r"))
        .collect().head.getSeq[Long](0)
    assert(range(0, 7, 2) == Seq(0L, 2L, 4L, 6L))
    assert(range(0, 6, 2) == Seq(0L, 2L, 4L))
    assert(range(5, 0, -2) == Seq(5L, 3L, 1L))
    assert(range(0, 5, 0).isEmpty)
    assert(range(3, 3, 1).isEmpty)
  }

  test("dayOfWeekIndex: Monday=0 ... Sunday=6") {
    val df = Seq("2024-01-01", "2024-01-07").toDF("d") // Mon, Sun
    val out = df.select(ibisfn.dayOfWeekIndex(col("d").cast("date")).as("i"))
      .collect().map(_.getInt(0)).toSeq
    assert(out == Seq(0, 6))
  }

  test("arrayIndex0 / arrayPosition0: 0-based, negative-from-end, -1 missing") {
    val df = Seq(Seq("a", "b", "c")).toDF("arr")
    assert(df.select(ibisfn.arrayIndex0(col("arr"), 1)).collect().head.getString(0) == "b")
    assert(df.select(ibisfn.arrayIndex0(col("arr"), -1)).collect().head.getString(0) == "c")
    assert(df.select(ibisfn.arrayPosition0(col("arr"), lit("c"))).collect().head.getLong(0) == 2L)
    assert(df.select(ibisfn.arrayPosition0(col("arr"), lit("z"))).collect().head.getLong(0) == -1L)
  }

  test("unwrapJsonInt rejects bools and fractional floats (ibis json.py:86-89)") {
    val df = Seq("""{"k": 3}""", """{"k": 3.5}""", """{"k": true}""", """{"k": "s"}""").toDF("j")
    val out = df.select(ibisfn.unwrapJsonInt(col("j"), "k").as("v"))
      .collect().map(r => Option(r.get(0))).toSeq
    assert(out == Seq(Some(3L), None, None, None))
  }

  test("sample kurtosis/skewness match the textbook small-sample values") {
    val df = Seq(1.0, 2.0, 3.0, 4.0, 10.0).toDF("x")
    val k = df.agg(ibisfn.kurtosisSample(col("x"))).collect().head.getDouble(0)
    val sk = df.agg(ibisfn.skewnessSample(col("x"))).collect().head.getDouble(0)
    // bias-corrected moments of [1,2,3,4,10]: G2=3.152, G1=1.6970562748
    assert(math.abs(k - 3.152) < 1e-6)
    assert(math.abs(sk - 1.6970562748) < 1e-6)
  }

  test("strftime converts C format specifiers to Java patterns") {
    assert(ibisfn.strftimeToJava("%Y-%m-%d") == "yyyy-MM-dd")
    assert(ibisfn.strftimeToJava("%H:%M:%S.%f") == "HH:mm:ss.SSSSSS")
    assert(ibisfn.strftimeToJava("at %I%p on %A") == "'at 'hha' on 'EEEE")
    assert(ibisfn.strftimeToJava("100%%") == "100%")
    intercept[IllegalArgumentException](ibisfn.strftimeToJava("%Q"))
    val df = Seq(java.sql.Timestamp.valueOf("2024-03-05 09:07:01")).toDF("t")
    val s = df.select(ibisfn.strftime(col("t"), "%Y/%m/%d %H:%M")).head().getString(0)
    assert(s == "2024/03/05 09:07")
  }

  test("arrayRemove keeps nulls; arrayZip names fields f1/f2 and pads to longest") {
    val df = Seq(1).toDF("x").select(
      array(lit(1), lit(null).cast("int"), lit(2), lit(1)).as("a"),
      array(lit("p"), lit("q"), lit("r")).as("s"),
      array(lit(10), lit(20)).as("b"))
    val removed = df.select(ibisfn.arrayRemove(col("a"), lit(1)).as("r"))
      .head().getSeq[Any](0)
    assert(removed == Seq(null, 2))
    val zipped = df.select(ibisfn.arrayZip(col("s"), col("b")).as("z")).head().getSeq[org.apache.spark.sql.Row](0)
    assert(zipped.length == 3)
    assert(zipped(0).schema.fieldNames.toSeq == Seq("f1", "f2"))
    assert(zipped(2).getString(0) == "r" && zipped(2).isNullAt(1))
  }

  test("timestampDelta counts whole part-boundaries crossed") {
    val df = Seq(("2024-01-01 23:00:00", "2024-01-02 01:30:00")).toDF("a", "b")
      .select(col("a").cast("timestamp").as("a"), col("b").cast("timestamp").as("b"))
    val r = df.select(
      ibisfn.timestampDelta("HOUR", col("a"), col("b")).as("h"),
      ibisfn.timestampDelta("DAY", col("a"), col("b")).as("d")).head()
    assert(r.getLong(0) == 2L && r.getLong(1) == 0L)
  }

  test("mapMerge keeps the FIRST map's value on duplicate keys") {
    val df = Seq(1).toDF("x").select(
      map(lit("a"), lit(1), lit("b"), lit(2)).as("m1"),
      map(lit("b"), lit(99), lit("c"), lit(3)).as("m2"))
    val merged = df.select(ibisfn.mapMerge(col("m1"), col("m2")).as("m"))
      .select(explode(col("m"))).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(merged == Map("a" -> 1, "b" -> 2, "c" -> 3))
  }

  test("kurtosis Aggregator (udaf) merges partial buffers to the same G2") {
    graft.functions.Udfs.register(spark)
    // repartition(4) forces cross-partition Moments merging
    val df = Seq(1.0, 2.0, 3.0, 4.0, 10.0).toDF("x").repartition(4)
    val k = df.selectExpr("kurtosis_sample(x) as k").collect().head.getDouble(0)
    assert(math.abs(k - 3.152) < 1e-6)
    assert(df.limit(3).selectExpr("kurtosis_sample(x)").collect().head.isNullAt(0), "n<4 -> null")
  }

  test("corr_sample Aggregator merges partial co-moment buffers to CORR") {
    graft.functions.Udfs.register(spark)
    val df = Seq((1.0, 2.0), (2.0, 4.1), (3.0, 5.9), (4.0, 8.2), (5.0, 9.8))
      .toDF("x", "y").repartition(4) // force cross-partition CoMoments merging
    val r = df.selectExpr("corr_sample(x, y) AS r").collect().head.getDouble(0)
    val builtin = df.selectExpr("corr(x, y)").collect().head.getDouble(0)
    assert(math.abs(r - builtin) < 1e-12)
    // n < 2 and zero-variance sides are undefined → null
    assert(df.limit(1).selectExpr("corr_sample(x, y)").collect().head.isNullAt(0))
    val const = Seq((1.0, 1.0), (2.0, 1.0)).toDF("x", "y")
    assert(const.selectExpr("corr_sample(x, y)").collect().head.isNullAt(0))
  }

  test("stringToTime: µs-of-day int64, null on unparseable input") {
    val df = Seq("13:45:30", "00:00:00.250", "oops").toDF("t")
      .select(graft.functions.ibisfn.stringToTime(col("t")).as("us"))
    val rows = df.collect()
    assert(rows(0).getLong(0) == (13L * 3600 + 45 * 60 + 30) * 1000000L)
    assert(rows(1).getLong(0) == 250000L)
    assert(rows(2).isNullAt(0))
  }

  test("timeFormat renders µs-of-day like a native TIME (TypeMapper, DIVERGENCES §4)") {
    import graft.types.TypeMapper
    val cases = Seq(
      0L -> "00:00:00",
      1L -> "00:00:00.000001",
      3723500000L -> "01:02:03.5",
      45296123456L -> "12:34:56.123456",
      86399999999L -> "23:59:59.999999",
      86400000000L -> "00:00:00", // wraps modulo one day
      -1L -> "23:59:59.999999")   // negative wraps too
    val out = cases.map(_._1).toDF("us")
      .select(TypeMapper.timeFormat(col("us")).as("r")).collect().map(_.getString(0))
    assert(out.toSeq == cases.map(_._2))
    // parse → render round trip, and the SQL registration agrees
    val rt = Seq("13:45:30", "00:00:00.25").toDF("t")
      .select(TypeMapper.timeFormat(graft.functions.ibisfn.stringToTime(col("t"))).as("r"))
      .collect().map(_.getString(0)).toSeq
    assert(rt == Seq("13:45:30", "00:00:00.25"))
    assert(spark.sql("SELECT time_format(3723500000)").head().getString(0) == "01:02:03.5")
  }

  test("scalar closure udf: slugify") {
    graft.functions.Udfs.register(spark)
    val out = Seq("Hello, World!", "  a  B c ").toDF("s")
      .selectExpr("slugify(s) as r").collect().map(_.getString(0)).toSeq
    assert(out == Seq("hello-world", "a-b-c"))
  }
}
