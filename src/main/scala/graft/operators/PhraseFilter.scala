package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-scale multi-phrase matching: find documents containing any of a
  * (possibly huge) list of blocked phrases as a CONTIGUOUS TOKEN SEQUENCE.
  *
  * A thousand phrases fit a regex alternation; a blocklist of millions
  * (copyrighted passages, eval-set n-grams, abuse phrases) does not — the
  * distributed answer is a JOIN: explode each document's token windows at
  * exactly the lengths the phrase list uses, hash both sides the same way,
  * and equi-join on (length, hash). Shuffle carries (id, len, 32-char md5)
  * per distinct window — never document text — and Catalyst broadcasts the
  * phrase side automatically when it is small.
  *
  * The document pass is ONE scan: windows for all lengths are built in a
  * single generated-column explode (|distinct lengths| bounded — real
  * blocklists are 1-8 token phrases; the require guards a degenerate list).
  */
object PhraseFilter {

  /** (id, phrase) for every blocklist phrase occurring in a document as a
    * contiguous token sequence (token comparison = [[Dedup.tokens]]
    * normalization: lowercase, alnum runs). Distinct pairs. */
  def matches(
      df: DataFrame,
      id: String,
      text: String,
      phrases: DataFrame,
      phraseCol: String = "phrase"): DataFrame = {
    val ptoks = Dedup.tokens(col(phraseCol))
    val pkeyed = phrases.select(
        col(phraseCol),
        size(ptoks).as("__len"),
        md5(concat_ws(" ", ptoks).cast("binary")).as("__key"))
      .filter(col("__len") > 0)
    val lens = pkeyed.select("__len").distinct().collect().map(_.getInt(0)).sorted
    require(lens.nonEmpty, "phrase list has no tokenized phrases")
    require(lens.length <= 16,
      s"phrase list uses ${lens.length} distinct token lengths — window explode " +
        "cost scales with it; split the list or pre-bucket by length")
    val winArrays = lens.map { l =>
      graft.functions.ibisfn.let1(col("__ts")) { t =>
        when(size(t) < l, array().cast("array<struct<len:int,key:string>>"))
          .otherwise(transform(sequence(lit(0), size(t) - l),
            i => struct(lit(l).as("len"),
              md5(concat_ws(" ", slice(t, i + 1, lit(l))).cast("binary")).as("key"))))
      }
    }
    val wins = df
      .withColumn("__ts", Dedup.tokens(col(text)))
      .select(col(id), explode(array_distinct(concat(winArrays: _*))).as("__w"))
      .select(col(id), col("__w.len").as("__len"), col("__w.key").as("__key"))
    wins.join(pkeyed, Seq("__len", "__key"))
      .select(col(id), col(phraseCol)).distinct()
  }

  /** Drop every document containing any blocklist phrase (anti join on the
    * matched id set). */
  def filterOut(
      df: DataFrame,
      id: String,
      text: String,
      phrases: DataFrame,
      phraseCol: String = "phrase"): DataFrame =
    df.join(matches(df, id, text, phrases, phraseCol).select(col(id)).distinct(),
      Seq(id), "left_anti")

  /** Small-list fast path: one codegen'd regex alternation over the
    * space-joined token stream (token-boundary exact, same normalization
    * as [[matches]]). Use when the list fits a plan literal (≤ a few
    * thousand phrases); the join path above is the scale path. */
  def containsAnyPhrase(text: Column, phrases: Seq[String]): Column = {
    require(phrases.nonEmpty, "phrase list must be non-empty")
    val normalized = phrases.map(p =>
      p.toLowerCase.split("[^\\p{L}\\p{N}]+").filter(_.nonEmpty).mkString(" "))
      .filter(_.nonEmpty)
    val padded = concat(lit(" "), concat_ws(" ", Dedup.tokens(text)), lit(" "))
    normalized.map(p => padded.contains(" " + p + " ")).reduce(_ || _)
  }
}
