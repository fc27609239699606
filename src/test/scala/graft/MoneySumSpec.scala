package graft

import org.apache.spark.sql.functions._

class MoneySumSpec extends SparkSpec {
  import spark.implicits._

  test("moneySum4 equals the decimal(38,4) sum policy, incl. negatives/nulls/merges") {
    val vals: Seq[java.lang.Double] = Seq[java.lang.Double](
      12.34, -0.05, 9999.99, 0.0001, -123456.789, null, 0.625, 3.145) ++
      (1 to 2000).map(i => java.lang.Double.valueOf((i * 97 % 10007) / 100.0 * (if (i % 3 == 0) -1 else 1)))
    val df = vals.toDF("x").repartition(7) // force partial-buffer merges
    val got = df.agg(graft.exts.exprs.moneySum4(col("x"))).collect().head.getDouble(0)
    val ref = df.agg(sum(col("x").cast("decimal(38,4)")).cast("double")).collect().head.getDouble(0)
    assert(got == ref, s"$got != $ref")
  }

  test("moneySum4: all-null group is null, grouped results match") {
    val df = Seq(("a", Some(1.25)), ("a", Some(2.50)), ("b", None), ("c", Some(-7.77)))
      .toDF("k", "x")
    val got = df.groupBy("k").agg(graft.exts.exprs.moneySum4(col("x")).as("s"))
      .orderBy("k").collect()
    assert(got(0).getDouble(1) == 3.75)
    assert(got(1).isNullAt(1))
    assert(got(2).getDouble(1) == -7.77)
  }

  test("moneySum4 carries across the 10^18-unit base (hi/lo split)") {
    // 2e14 per value × 20 values = 4e15 money = 4e19 units > 10^18·hi base
    val df = (1 to 20).map(_ => 2.0e14).toDF("x").repartition(3)
    val got = df.agg(graft.exts.exprs.moneySum4(col("x"))).collect().head.getDouble(0)
    assert(got == 4.0e15)
  }

  test("money_sum4 is callable from SQL (same builder the extension injects)") {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "money_sum4",
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.exts.MoneySum4(org.apache.spark.sql.catalyst.expressions.Cast(
          children.head, org.apache.spark.sql.types.DoubleType)).toAggregateExpression(),
      "built-in")
    Seq(1.11, 2.22).toDF("x").createOrReplaceTempView("m4t")
    val r = spark.sql("SELECT money_sum4(x) FROM m4t").collect().head.getDouble(0)
    assert(r == 3.33)
    // non-double columns coerce at analysis time via the builder's Cast —
    // a decimal column through the SQL path used to fail at execution
    Seq(BigDecimal("1.50"), BigDecimal("2.25")).toDF("x").createOrReplaceTempView("m4dec")
    val d = spark.sql("SELECT money_sum4(x) FROM m4dec").collect().head.getDouble(0)
    assert(d == 3.75)
  }

  test("moneySum4 skips non-finite values like the decimal-cast policy skips them") {
    val df = Seq(1.25, Double.NaN, 2.50, Double.PositiveInfinity,
      Double.NegativeInfinity, -0.75).toDF("x")
    val got = df.agg(graft.exts.exprs.moneySum4(col("x"))).collect().head.getDouble(0)
    assert(got == 3.0, s"$got != 3.0 (NaN/Inf must not corrupt the sum)")
    // all-non-finite group behaves like all-null: result is null
    val df2 = Seq(Double.NaN, Double.PositiveInfinity).toDF("x")
    assert(df2.agg(graft.exts.exprs.moneySum4(col("x"))).collect().head.isNullAt(0))
  }
}
