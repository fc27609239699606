package graft

import org.apache.spark.sql.functions._

import graft.exts.AnchoredRegexSimplification

/** AnchoredRegexSimplification: literal anchored RLIKE patterns become
  * plain string predicates; real regexes are untouched; results agree. */
class RegexRuleSpec extends SparkSpec {
  import spark.implicits._

  // parquet-backed: a LocalRelation would be constant-folded away by
  // ConvertToLocalRelation before the plan can be inspected
  private lazy val df = {
    val p = java.nio.file.Files.createTempDirectory("graft_rlike").toString + "/t"
    Seq("abc", "abcd", "xabc", "xabcx", "", "ABC").toDF("s").write.parquet(p)
    spark.read.parquet(p)
  }

  override def withFixture(test: NoArgTest) = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ AnchoredRegexSimplification
    try super.withFixture(test)
    finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == AnchoredRegexSimplification)
  }

  private def optimized(pattern: String): String =
    df.filter(col("s").rlike(pattern)).queryExecution.optimizedPlan.toString

  test("rewrites: full anchor -> equals, prefix -> startswith, suffix -> endswith, bare -> contains") {
    assert(optimized("^abc$").contains("= abc") && !optimized("^abc$").contains("RLIKE"))
    assert(optimized("^abc").toLowerCase.contains("startswith"))
    assert(optimized("abc$").toLowerCase.contains("endswith"))
    assert(optimized("abc").toLowerCase.contains("contains"))
  }

  test("real regexes are left alone") {
    assert(optimized("^a.c$").contains("RLIKE"))
    assert(optimized("ab+c").contains("RLIKE"))
    assert(optimized("a\\dc").contains("RLIKE"))
  }

  test("rewritten results match the regex engine") {
    for (p <- Seq("^abc$", "^abc", "abc$", "abc", "^$")) {
      val withRule = df.filter(col("s").rlike(p)).as[String].collect().toSet
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == AnchoredRegexSimplification)
      val without = df.filter(col("s").rlike(p)).as[String].collect().toSet
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ AnchoredRegexSimplification
      assert(withRule == without, s"pattern $p: $withRule vs $without")
    }
  }
}
