package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Value identity of the fused text-stats expression (exts/TextStats +
  * the TextAnalysis.*Of accessors) with the declarative HOF features it
  * replaces (round 15) — covering tokenization edges (punct runs,
  * unicode case/width, digits-in-words), char-class counting on the
  * ORIGINAL text, empty/blank docs, nulls, and the fingerprint's
  * distinct+binary-sort+join contract. */
class TextStatsFusionSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    "The quick brown fox jumps over the lazy dog",
    "the quick BROWN fox--jumps,,, over!!! the lazy dog",
    "short doc",
    "x",
    "",
    "   ,,,;;;   ",
    "a b a b a b a b a b",
    "Äpfel über STRAßE çödé 日本語 テスト 123 456",
    "numbers 123 mixed42words and 99% punct!!! [brackets] {braces}",
    "the of to in is THE OF TO IN IS tHe oF", // stopword case folding
    "zz aa mm bb zz aa", // fingerprint sort order
    "one two three four five six seven eight nine ten eleven twelve"
  ).zipWithIndex.map { case (t, i) => (i.toLong, t) }

  test("fused stats equal the declarative features on every edge doc") {
    val df = docs.toDF("doc", "text")
    val fused = df
      .withColumn("st", TextAnalysis.textStats(col("text"), withFingerprint = true))
      .select(col("doc"),
        TextAnalysis.tokenCountOf(col("st")).as("n_tokens"),
        TextAnalysis.avgWordLengthOf(col("st")).as("avg_wlen"),
        TextAnalysis.stopwordRatioOf(col("st")).as("stop_ratio"),
        TextAnalysis.punctRatioOf(col("st")).as("punct_ratio"),
        TextAnalysis.digitRatioOf(col("st")).as("digit_ratio"),
        TextAnalysis.qualityScoreOf(col("st")).as("quality"),
        TextAnalysis.fingerprintKeyOf(col("st")).as("fp_key"))
    val hof = df.select(col("doc"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"),
        TextAnalysis.avgWordLength(col("text")).as("avg_wlen"),
        TextAnalysis.stopwordRatio(col("text")).as("stop_ratio"),
        TextAnalysis.punctRatio(col("text")).as("punct_ratio"),
        TextAnalysis.digitRatio(col("text")).as("digit_ratio"),
        TextAnalysis.qualityScore(col("text")).as("quality"),
        TextAnalysis.fingerprintKey(col("text")).as("fp_key"))
    val f = fused.orderBy("doc").collect()
    val h = hof.orderBy("doc").collect()
    assert(f.length == h.length)
    f.zip(h).foreach { case (a, b) =>
      (1 until a.length).foreach { i =>
        assert(a.get(i) == b.get(i),
          s"field ${fused.columns(i)} mismatch for doc ${a.getLong(0)}: " +
            s"fused=${a.get(i)} hof=${b.get(i)}")
      }
    }
  }

  test("null text yields a null struct and null-propagated features") {
    val df = Seq((0L, Option.empty[String]), (1L, Some("a real doc here ok"))).toDF("doc", "text")
    val got = df
      .withColumn("st", TextAnalysis.textStats(col("text"), withFingerprint = true))
      .select(col("doc"), col("st"),
        TextAnalysis.qualityScoreOf(col("st")).as("q"))
      .orderBy("doc").collect()
    assert(got(0).isNullAt(1), "null text must give a null stats struct")
    // when/otherwise folds a null condition to the otherwise branch —
    // exactly the declarative qualityScore(null) = 0.0 contract
    assert(got(0).getDouble(2) == 0.0)
    assert(!got(1).isNullAt(1))
  }

  test("withFingerprint=false leaves fp_key null and the counts intact") {
    val df = Seq((0L, "some tokens in here")).toDF("doc", "text")
    val r = df.select(TextAnalysis.textStats(col("text")).as("st"))
      .select(col("st.n_tokens"), col("st.fp_key")).collect().head
    assert(r.getInt(0) == 4)
    assert(r.isNullAt(1))
  }
}
