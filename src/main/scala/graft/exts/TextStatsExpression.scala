package graft.exts

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused text-feature pass: ONE tokenization + ONE character scan per
  * document, surfacing the raw counts every TextAnalysis feature derives
  * from (round 15 — the ShingleMinhash treatment applied to the quality
  * family).
  *
  * The declarative features (`tokenCount`, `avgWordLength`,
  * `stopwordRatio`, `qualityScore`, `fingerprintKey`) each re-tokenize
  * the document through higher-order functions whose lambdas Spark
  * evaluates INTERPRETED — a q60b-shaped projection tokenizes every text
  * ~6× (qualityScore alone re-runs tokenCount AND stopwordRatio) and
  * regex-scans it twice more. This expression computes the identical
  * primitives in one flat loop:
  *
  *   - tokens: split(lower(text), "[^\p{L}\p{N}]+") dropping empties —
  *     byte-for-byte the Dedup.tokens contract (same UTF8String
  *     toLowerCase, same Java regex, same limit -1);
  *   - n_tokens, sum_wlen (Σ code-point lengths — Spark `length`
  *     semantics), n_stop (membership in the fixed English stopword
  *     list);
  *   - n_chars / n_punct / n_digit over the ORIGINAL text: code-point
  *     count and counts of Java `[\p{Punct}]` (ASCII punctuation — the
  *     exact class regexp_replace matched) and `[0-9]`;
  *   - fp_key (optional): first-occurrence distinct tokens sorted in
  *     UTF8String binary order (array_sort's StringType ordering) joined
  *     with " " — the fingerprintKey contract.
  *
  * Value identity with the declarative path is pinned by
  * TextStatsFusionSpec over the documents corpus + adversarial edges;
  * the q60b/q71 DuckDB oracles hold end-to-end. */
case class TextStats(child: Expression, withFp: Boolean)
    extends UnaryExpression {

  override def prettyName: String = "text_stats"
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("sum_wlen", LongType, nullable = false),
    StructField("n_stop", LongType, nullable = false),
    StructField("n_chars", IntegerType, nullable = false),
    StructField("n_punct", LongType, nullable = false),
    StructField("n_digit", LongType, nullable = false),
    StructField("fp_key", StringType, nullable = true)))
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string column")

  @transient private lazy val splitPattern =
    java.util.regex.Pattern.compile("[^\\p{L}\\p{N}]+")

  // Built from TextAnalysis.EnglishStopwords (the single source of truth,
  // frozen by the q60* oracles) — a hardcoded copy here could drift from
  // the declarative path without the fusion spec's 12-doc corpus noticing
  @transient private lazy val stopSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](64)
    graft.operators.TextAnalysis.EnglishStopwords.foreach(s.add)
    s
  }

  /** All stats for one document; called from interpreted eval and the
    * generated code (reference-object call — the per-row work is the
    * scan, not the dispatch). */
  def stats(text: UTF8String): InternalRow = {
    if (text == null) return null
    val s = text.toString
    // ---- character-class counts over the ORIGINAL text --------------
    // n_chars must equal Spark length() = code points; \p{Punct} and
    // [0-9] only match single ASCII chars, so per-code-point checks
    // reproduce the regexp_replace length deltas exactly
    var nChars = 0
    var nPunct = 0L
    var nDigit = 0L
    var ci = 0
    val sLen = s.length
    while (ci < sLen) {
      val cp = s.codePointAt(ci)
      nChars += 1
      if (cp < 127) {
        val c = cp.toChar
        if (c >= '0' && c <= '9') nDigit += 1
        if ((c >= '!' && c <= '/') || (c >= ':' && c <= '@') ||
            (c >= '[' && c <= '`') || (c >= '{' && c <= '~')) nPunct += 1
      }
      ci += Character.charCount(cp)
    }
    // ---- tokenization (the Dedup.tokens contract) -------------------
    val raw = splitPattern.split(text.toLowerCase.toString, -1)
    var n = 0
    var sumWlen = 0L
    var nStop = 0L
    var i = 0
    while (i < raw.length) {
      val t = raw(i)
      if (t.nonEmpty) {
        n += 1
        sumWlen += t.codePointCount(0, t.length)
        if (stopSet.contains(t)) nStop += 1
      }
      i += 1
    }
    // ---- fingerprint key (distinct, binary-sorted, space-joined) ----
    val fp: UTF8String = if (!withFp) null else {
      val seen = new java.util.LinkedHashSet[String](n * 2)
      i = 0
      while (i < raw.length) {
        if (raw(i).nonEmpty) seen.add(raw(i))
        i += 1
      }
      val distinct = new Array[UTF8String](seen.size)
      val it = seen.iterator()
      var j = 0
      while (it.hasNext) { distinct(j) = UTF8String.fromString(it.next()); j += 1 }
      // array_sort on strings = UTF8String binary order
      java.util.Arrays.sort(distinct, (a: UTF8String, b: UTF8String) => a.compareTo(b))
      UTF8String.concatWs(UTF8String.fromString(" "), distinct: _*)
    }
    new GenericInternalRow(Array[Any](n, sumWlen, nStop, nChars, nPunct, nDigit, fp))
  }

  override def nullSafeEval(v: Any): Any = stats(v.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("textStats", this, classOf[TextStats].getName)
    nullSafeCodeGen(ctx, ev, t => {
      val r = ctx.freshName("r")
      s"""
        InternalRow $r = $self.stats($t);
        if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
