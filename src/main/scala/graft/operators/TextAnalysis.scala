package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-corpus analysis operators for training-data pipelines: token
  * counting, quality scoring, language ID, fingerprinting. All pure
  * codegen'd column expressions — run map-side at any scale. */
object TextAnalysis {

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(Dedup.tokens(text))

  /** BPE-ish subword token estimate: word-piece regex split (letters runs,
    * digit runs, single punctuation), the common pre-tokenizer shape. */
  def subwordCount(text: Column): Column =
    size(filter(split(text, "(?<=\\p{L})(?=\\p{N})|(?<=\\p{N})(?=\\p{L})|\\s+|(?=[\\p{Punct}])|(?<=[\\p{Punct}])"),
      t => length(t) > 0))

  def charCount(text: Column): Column = length(text)

  def avgWordLength(text: Column): Column = {
    val toks = Dedup.tokens(text)
    when(size(toks) === 0, lit(null)).otherwise(
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / size(toks))
  }

  /** Fraction of characters that are punctuation / digits / uppercase. */
  def punctRatio(text: Column): Column = charClassRatio(text, "[\\p{Punct}]")
  def digitRatio(text: Column): Column = charClassRatio(text, "[0-9]")
  def upperRatio(text: Column): Column = charClassRatio(text, "[A-Z]")
  def whitespaceRatio(text: Column): Column = charClassRatio(text, "\\s")

  private def charClassRatio(text: Column, cls: String): Column =
    when(length(text) === 0, lit(0.0)).otherwise(
      (length(text) - length(regexp_replace(text, cls, ""))).cast("double") / length(text))

  /** Single source of truth for the stopword list: the fused
    * exts.TextStats expression builds its lookup set from this same
    * constant, so editing it cannot silently break the fused/declarative
    * value identity (ADVICE r15). */
  private[graft] val EnglishStopwords = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "are", "was", "it",
    "for", "on", "with", "as", "at", "by", "that", "this", "be", "from")

  /** Fraction of tokens that are (English) stopwords — a standard quality
    * signal (Gopher/C4-style filters). */
  def stopwordRatio(text: Column, stopwords: Seq[String] = EnglishStopwords): Column = {
    val toks = Dedup.tokens(text)
    val stops = array(stopwords.map(lit): _*)
    when(size(toks) === 0, lit(0.0)).otherwise(
      size(filter(toks, t => array_contains(stops, t))).cast("double") / size(toks))
  }

  /** Composite quality score in [0,1]: length band + stopword presence +
    * low punctuation/digit noise (C4/Gopher-inspired heuristic mix). */
  def qualityScore(text: Column): Column = {
    val lenOk = when(tokenCount(text).between(10, 100000), 1.0).otherwise(0.0)
    val stopOk = when(stopwordRatio(text) > 0.01, 1.0).otherwise(0.0)
    val punctOk = when(punctRatio(text) < 0.2, 1.0).otherwise(0.0)
    val digitOk = when(digitRatio(text) < 0.3, 1.0).otherwise(0.0)
    (lenOk + stopOk + punctOk + digitOk) / 4.0
  }

  // ---- fused feature path (round 15) -----------------------------------
  // The declarative features above each re-tokenize the document through
  // interpreted higher-order-function lambdas — a projection that wants
  // token count + quality + fingerprint tokenizes every text ~6×.
  // textStats runs ONE fused pass (exts.TextStats) and the *Of accessors
  // derive the identical values from its counts; value identity is pinned
  // by TextStatsFusionSpec and the q60b/q71 oracles.

  /** One-pass stats struct (n_tokens, sum_wlen, n_stop, n_chars, n_punct,
    * n_digit, fp_key). Ask for the fingerprint only when used — it is the
    * expensive part (distinct + sort + join per document). */
  def textStats(text: Column, withFingerprint: Boolean = false): Column =
    graft.exts.exprs.textStats(text, withFingerprint)

  def tokenCountOf(st: Column): Column = st.getField("n_tokens")

  def avgWordLengthOf(st: Column): Column =
    when(st.getField("n_tokens") === 0, lit(null)).otherwise(
      st.getField("sum_wlen").cast("double") / st.getField("n_tokens"))

  def stopwordRatioOf(st: Column): Column =
    when(st.getField("n_tokens") === 0, lit(0.0)).otherwise(
      st.getField("n_stop").cast("double") / st.getField("n_tokens"))

  def punctRatioOf(st: Column): Column =
    when(st.getField("n_chars") === 0, lit(0.0)).otherwise(
      st.getField("n_punct").cast("double") / st.getField("n_chars"))

  def digitRatioOf(st: Column): Column =
    when(st.getField("n_chars") === 0, lit(0.0)).otherwise(
      st.getField("n_digit").cast("double") / st.getField("n_chars"))

  def qualityScoreOf(st: Column): Column = {
    val lenOk = when(st.getField("n_tokens").between(10, 100000), 1.0).otherwise(0.0)
    val stopOk = when(stopwordRatioOf(st) > 0.01, 1.0).otherwise(0.0)
    val punctOk = when(punctRatioOf(st) < 0.2, 1.0).otherwise(0.0)
    val digitOk = when(digitRatioOf(st) < 0.3, 1.0).otherwise(0.0)
    (lenOk + stopOk + punctOk + digitOk) / 4.0
  }

  def fingerprintKeyOf(st: Column): Column = st.getField("fp_key")

  /** Character n-gram profiles per language for heuristic language ID.
    * Tiny deterministic profiles — real deployments would plug larger
    * tables in; the operator shape (score-every-language, argmax) is what
    * matters at scale. */
  private val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" th", "the", "he ", " an", "and", "nd ", " of", "of ", "ing", " to"),
    "de" -> Seq("en ", "er ", " de", "der", "ie ", "die", "sch", "ein", "ich", "nde"),
    "fr" -> Seq(" de", "de ", " le", "es ", "le ", "ent", "ne ", "la ", " la", "tio"),
    "es" -> Seq(" de", "de ", " la", "la ", "os ", " co", "es ", "ión", "el ", " el"),
    "zh" -> Seq("的", "是", "了", "在", "人", "有", "我", "他", "这", "中"))

  /** Per-language profile hit count (for langId and its oracle). */
  def langScore(text: Column, langCode: String): Column = {
    val grams = LangProfiles.find(_._1 == langCode).get._2
    val lowered = lower(text)
    grams.map(g => when(lowered.contains(g), lit(1)).otherwise(lit(0)): Column).reduce(_ + _)
  }

  /** Heuristic language ID: profile-hit argmax, ties broken by profile
    * order (deterministic first-wins when-chain, no sort-stability reliance). */
  def langId(text: Column): Column = {
    val scores = LangProfiles.map { case (code, _) => code -> langScore(text, code) }
    val m = greatest(scores.map(_._2): _*)
    scores.tail.foldLeft(when(scores.head._2 === m, lit(scores.head._1))) {
      case (chain, (code, sc)) => chain.when(sc === m, lit(code))
    }.otherwise(lit("und"))
  }

  // ------------------------------------------------------------- PII scrub

  /** Regexes shared with the DuckDB oracles — Java/RE2 common subset only
    * (no lookaround, no backrefs), so any engine matches identically. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}(\\.\\d{1,3}){3}\\b"
  val PhoneRe = "\\+\\d[\\d\\-]{7,}\\d"

  def emailCount(text: Column): Column = regexp_count(text, lit(EmailRe))
  def ipv4Count(text: Column): Column = regexp_count(text, lit(Ipv4Re))
  def phoneCount(text: Column): Column = regexp_count(text, lit(PhoneRe))

  /** PII redaction: emails, IPv4 addresses, then phone-shaped digit runs
    * replaced with typed placeholder tags. Order matters (an IP inside a
    * URL must not be half-eaten by the phone pattern) and is mirrored in
    * the oracle. Pure codegen regexp_replace chain — map-side at any
    * scale. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  // --------------------------------------------- repetition (Gopher-style)

  /** Fraction of tokens that repeat an earlier token: 1 − distinct/total.
    * High values flag boilerplate/spam (Gopher's duplicate-fraction
    * family). */
  def dupTokenFraction(text: Column): Column = {
    val toks = Dedup.tokens(text)
    when(size(toks) === 0, lit(0.0)).otherwise(
      lit(1.0) - size(array_distinct(toks)).cast("double") / size(toks))
  }

  /** Share of all token n-grams taken by the single most frequent one —
    * Gopher's top-n-gram fraction signal. Per-row cost is O(len·distinct)
    * in the worst case (bounded by document length — fine for a quality
    * signal that runs once per document). Documents shorter than n tokens
    * score 0. */
  def topNgramFraction(text: Column, n: Int): Column = {
    require(n >= 1, "n must be positive")
    val toks = Dedup.tokens(text)
    // guard BEFORE building sequence(): Spark's sequence(0, k) runs
    // DESCENDING for k < 0, which would fabricate grams on short docs
    when(size(toks) < n, lit(0.0)).otherwise(
      graft.functions.ibisfn.let1(
        transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*))) { grams =>
        array_max(transform(array_distinct(grams),
          g => size(filter(grams, x => x === g)))).cast("double") / size(grams)
      })
  }

  /** Sentences: split on terminal punctuation runs (. ! ?) followed by
    * whitespace or end, trimmed, blanks dropped. Regex-only — the
    * engine-portable approximation (no abbreviation dictionary). */
  def sentences(text: Column): Column =
    filter(transform(split(text, "[.!?]+(\\s+|$)"), s => trim(s)), s => length(s) > 0)

  def sentenceCount(text: Column): Column = size(sentences(text))

  /** Mean sentence length in word tokens — short-sentence soup and
    * unbroken walls of text both flag extraction problems. */
  def meanSentenceLength(text: Column): Column =
    graft.functions.ibisfn.let1(sentences(text)) { ss =>
      when(size(ss) === 0, lit(0.0)).otherwise(
        aggregate(ss, lit(0L),
          (acc, s) => acc + size(filter(split(s, "\\s+"), w => length(w) > 0)))
          .cast("double") / size(ss))
    }

  // ----------------------------------------- line-level (Gopher) signals

  /** Non-empty trimmed lines of a document — the unit of Gopher's
    * line-level format/repetition rules (Rae et al. 2021, §A1.1). */
  private def lineList(text: Column, sepRegex: String): Column =
    filter(transform(split(text, sepRegex), l => trim(l)), l => length(l) > 0)

  /** Fraction of lines starting with a bullet character (- * •). */
  def bulletLineFraction(text: Column, sepRegex: String = "\\n"): Column =
    graft.functions.ibisfn.let1(lineList(text, sepRegex)) { ls =>
      when(size(ls) === 0, lit(0.0)).otherwise(
        size(filter(ls, l => l.rlike("^[-*•]"))).cast("double") / size(ls))
    }

  /** Fraction of lines ending in an ellipsis ("..." or …). */
  def ellipsisLineFraction(text: Column, sepRegex: String = "\\n"): Column =
    graft.functions.ibisfn.let1(lineList(text, sepRegex)) { ls =>
      when(size(ls) === 0, lit(0.0)).otherwise(
        size(filter(ls, l => l.rlike("(\\.\\.\\.|…)$"))).cast("double") / size(ls))
    }

  /** Fraction of lines that repeat an earlier line: 1 − distinct/total. */
  def dupLineFraction(text: Column, sepRegex: String = "\\n"): Column =
    graft.functions.ibisfn.let1(lineList(text, sepRegex)) { ls =>
      when(size(ls) === 0, lit(0.0)).otherwise(
        lit(1.0) - size(array_distinct(ls)).cast("double") / size(ls))
    }

  /** Fraction of characters inside repeated line occurrences (every
    * occurrence beyond a line value's first): Σ_v (count_v − 1)·len(v)
    * over Σ len — Gopher's "duplicate line character fraction".
    * Per-row cost O(lines·distinct) — bounded by document size. */
  def dupLineCharFraction(text: Column, sepRegex: String = "\\n"): Column =
    graft.functions.ibisfn.let1(lineList(text, sepRegex)) { ls =>
      when(size(ls) === 0, lit(0.0)).otherwise(
        graft.functions.ibisfn.let1(
          aggregate(ls, lit(0L), (a, l) => a + length(l))) { total =>
          when(total === 0L, lit(0.0)).otherwise(
            aggregate(array_distinct(ls), lit(0L),
              (a, v) => a + (size(filter(ls, x => x === v)) - 1) * length(v))
              .cast("double") / total)
        })
    }

  /** Fraction of whitespace words containing at least one letter —
    * Gopher requires ≥0.8 (filters symbol/number soup). */
  def alphaWordFraction(text: Column): Column =
    graft.functions.ibisfn.let1(
      filter(split(text, "\\s+"), w => length(w) > 0)) { ws =>
      when(size(ws) === 0, lit(0.0)).otherwise(
        size(filter(ws, w => w.rlike("\\p{L}"))).cast("double") / size(ws))
    }

  /** Symbol-to-word ratio: occurrences of '#' or '...' per word —
    * Gopher rejects > 0.1. */
  def symbolWordRatio(text: Column): Column =
    graft.functions.ibisfn.let1(
      size(filter(split(text, "\\s+"), w => length(w) > 0))) { nw =>
      when(nw === 0, lit(0.0)).otherwise(
        regexp_count(text, lit("#|\\.\\.\\.")).cast("double") / nw)
    }

  /** The composed Gopher quality gate (Rae et al. 2021 §A1.1 thresholds):
    * 50 ≤ words ≤ 100k, mean word length in [3, 10], symbol/word ≤ 0.1,
    * bullet lines ≤ 90%, ellipsis lines ≤ 30%, ≥80% of words alphabetic,
    * and at least 2 distinct stopwords present. Pure map-side boolean. */
  def gopherQualityPass(text: Column, sepRegex: String = "\\n"): Column = {
    val nWords = tokenCount(text)
    val awl = avgWordLength(text)
    val distinctStops = graft.functions.ibisfn.let1(Dedup.tokens(text)) { ts =>
      size(array_intersect(array_distinct(ts), array(EnglishStopwords.map(lit): _*)))
    }
    nWords.between(50, 100000) &&
      awl.between(3.0, 10.0) &&
      symbolWordRatio(text) <= 0.1 &&
      bulletLineFraction(text, sepRegex) <= 0.9 &&
      ellipsisLineFraction(text, sepRegex) <= 0.3 &&
      alphaWordFraction(text) >= 0.8 &&
      distinctStops >= 2
  }

  /** Shannon entropy (bits/char) of the character distribution — low
    * entropy flags repeated-character junk, high entropy flags
    * base64/binary soup (both standard web-corpus cut signals).
    * Computed as Σ_c k_c·(−log2 k_c/n) / n folded over the DISTINCT
    * characters in first-occurrence order (`array_distinct` preserves
    * it; an oracle engine replays the same order via MIN(pos)) — the
    * deterministic-order form of Σ −p·log2 p. Per-row cost
    * O(len·distinct-chars), distinct-chars bounded by the alphabet;
    * map-side. */
  def charEntropy(text: Column): Column =
    graft.functions.ibisfn.let1(
      when(length(text) === 0, array().cast("array<string>")).otherwise(
        transform(sequence(lit(1), length(text)), i => text.substr(i, lit(1))))) { cs =>
      when(size(cs) === 0, lit(0.0)).otherwise(
        graft.functions.ibisfn.let1(array_distinct(cs)) { ds =>
          aggregate(ds, lit(0.0), (acc, c) =>
            acc + graft.functions.ibisfn.let1(
              size(filter(cs, x => x === c)).cast("double")) { k =>
                k * -log(2.0, k / size(cs))
              }) / size(cs)
        })
    }

  /** fastText-style linear quality-classifier scoring: sigmoid of a
    * bag-of-hashed-ngrams dot product — the "quality classifier" step of
    * the GPT-3/LLaMA-family pipelines, with weights trained offline and
    * applied here at corpus scale. Features are [[Splits.ngramFeatures]]
    * (unigrams+bigrams) hashed into `weights.size` buckets (md5, engine-
    * portable), tf-weighted: score = σ(Σ_g w[b(g)]/n + bias). A pure
    * map-side fold over each document's grams — the weight vector rides
    * as plan literals, nothing shuffles. */
  def classifierScore(
      text: Column,
      weights: Seq[Double],
      bias: Double = 0.0,
      seed: Long = 13L): Column = {
    require(weights.nonEmpty, "weights must be non-empty")
    val dim = weights.size
    val wArr = array(weights.map(lit): _*)
    val bucket: Column => Column = g =>
      conv(substring(md5(concat(lit(seed.toString), lit(":"), g).cast("binary")), 1, 7), 16, 10)
        .cast("long") % dim
    graft.functions.ibisfn.let1(Splits.ngramFeatures(Dedup.tokens(text))) { gs =>
      graft.functions.ibisfn.let1(
        when(size(gs) === 0, lit(0.0)).otherwise(
          aggregate(gs, lit(0.0),
            (acc, g) => acc + element_at(wArr, (bucket(g) + 1).cast("int"))) / size(gs))
      ) { dot =>
        lit(1.0) / (lit(1.0) + exp(-(dot + bias)))
      }
    }
  }

  /** One-call corpus health report: a tidy (metric, value) frame with
    * document/token counts, token-length distribution (exact interpolated
    * percentiles), empty-document and exact-duplicate fractions, and one
    * `group_frac_<v>` row per value of `group` (source/lang mix).
    *
    * Cost: ONE wide aggregation over the corpus plus one |groups|-sized
    * aggregation — no window, no self-join; the duplicate fraction uses
    * count-distinct over the token-stream md5 (a single hash shuffle).
    * The curation dashboard every pipeline run should log. */
  def corpusReport(
      df: org.apache.spark.sql.DataFrame,
      text: String,
      group: Column): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    val ts = Dedup.tokens(col(text))
    val ck = md5(concat_ws(" ", ts).cast("binary"))
    val row = df.agg(
      count(lit(1)).as("n"),
      sum(size(ts)).cast("double").as("tot"),
      round(avg(size(ts)), 6).as("mean"),
      percentile(size(ts), array(lit(0.5), lit(0.9))).as("pcts"),
      sum(when(size(ts) === 0, 1L).otherwise(0L)).cast("double").as("empties"),
      countDistinct(ck).cast("double").as("distincts")).head()
    val n = row.getLong(0)
    val scalarRows = Seq(
      "n_docs" -> n.toDouble,
      "total_tokens" -> row.getDouble(1),
      "mean_tokens" -> row.getDouble(2),
      "p50_tokens" -> row.getSeq[Double](3).head,
      "p90_tokens" -> row.getSeq[Double](3)(1),
      "empty_frac" -> (if (n == 0) 0.0 else row.getDouble(4) / n),
      "exact_dup_frac" -> (if (n == 0) 0.0 else 1.0 - row.getDouble(5) / n))
    import spark.implicits._
    val scalars = scalarRows.toDF("metric", "value")
      .select(col("metric"), round(col("value"), 6).as("value"))
    val groups = df.groupBy(group.cast("string").as("__g")).count()
      .select(concat(lit("group_frac_"), col("__g")).as("metric"),
        round(col("count") / lit(n.toDouble), 6).as("value"))
    scalars.union(groups)
  }

  /** WordPiece subword tokenization of a whole document: the exact
    * HuggingFace/BERT greedy longest-match algorithm per word (custom
    * Expression [[graft.exts.WordPiece]] — the vocab set builds once per
    * executor and rides the plan), flattened across the word stream.
    * This is the REAL tokenizer the regex [[subwordCount]] estimates. */
  def wordpieceTokens(text: Column, vocab: Seq[String], unk: String = "[UNK]"): Column =
    flatten(transform(Dedup.tokens(text),
      w => graft.exts.TokenizerExpressions.wordpiece(w, vocab, unk)))

  /** Exact subword token count under a WordPiece vocab. */
  def wordpieceCount(text: Column, vocab: Seq[String], unk: String = "[UNK]"): Column =
    size(wordpieceTokens(text, vocab, unk))

  /** BPE subword tokenization of a whole document under a ranked merge
    * list — the GPT-2/Sennrich family ([[graft.exts.BpeTokenize]]). */
  def bpeTokens(text: Column, merges: Seq[(String, String)]): Column =
    flatten(transform(Dedup.tokens(text),
      w => graft.exts.TokenizerExpressions.bpe(w, merges)))

  /** Exact subword token count under a BPE merge list. */
  def bpeCount(text: Column, merges: Seq[(String, String)]): Column =
    size(bpeTokens(text, merges))

  /** Within-document repeated-segment removal: drop every repeat of an
    * earlier segment (paragraph) INSIDE the same document — the map-side
    * sibling of [[Dedup.segmentDedup]] (which dedups corpus-wide): no
    * shuffle at all, each row cleans itself. First occurrences keep
    * their order; comparison is on the trimmed lowercase segment. */
  def dedupSegmentsWithinDoc(
      text: Column,
      sepRegex: String = "\\n{2,}",
      joiner: String = "\n\n"): Column =
    graft.functions.ibisfn.let1(
      filter(split(text, sepRegex), s => length(trim(s)) > 0)) { segs =>
      array_join(
        // keep seg i iff no earlier j has the same normalized form;
        // O(n²) in segments per doc — bounded by document size
        filter(segs, (s, i) =>
          !exists(slice(segs, lit(1), i),
            p => lower(trim(p)) === lower(trim(s)))), joiner)
    }

  // --------------------------------------------- C4 line cleaning / scripts

  /** C4-style line-level cleaning (Raffel et al. 2020 §2.2): keep only
    * lines that (1) end in terminal punctuation, (2) have ≥ `minWords`
    * words, (3) contain no curly brace, and (4) none of the boilerplate
    * phrases (javascript / lorem ipsum / cookie policy / terms of use).
    * Returns the re-joined kept lines — pure codegen, map-side. */
  def c4CleanLines(text: Column, sepRegex: String = "\\n", minWords: Int = 3): Column = {
    val keep: Column => Column = l =>
      l.rlike("[.!?\"']$") &&
        size(filter(split(l, "\\s+"), w => length(w) > 0)) >= minWords &&
        !l.contains("{") && !l.contains("}") &&
        !lower(l).rlike("javascript|lorem ipsum|cookie policy|terms of use|privacy policy")
    array_join(filter(
      filter(transform(split(text, sepRegex), l => trim(l)), l => length(l) > 0),
      keep), "\n")
  }

  /** Fraction of a line set surviving [[c4CleanLines]] — the audit signal
    * (how much of this corpus is C4-clean). */
  def c4KeepFraction(text: Column, sepRegex: String = "\\n", minWords: Int = 3): Column =
    graft.functions.ibisfn.let1(
      filter(transform(split(text, sepRegex), l => trim(l)), l => length(l) > 0)) { ls =>
      when(size(ls) === 0, lit(0.0)).otherwise(
        size(filter(split(c4CleanLines(text, sepRegex, minWords), "\n"),
          l => length(l) > 0)).cast("double") / size(ls))
    }

  /** Per-script character fractions (Latin letters, CJK ideographs,
    * Cyrillic, Arabic) — the CCNet-style script-mix signal for routing
    * and mixed-script spam cuts. Codepoint-range character classes, not
    * named script classes — `\p{script=...}` syntax differs between Java
    * and RE2, while explicit ranges mean the same thing in both (Java
    * `\uXXXX`, RE2 `\x{XXXX}`). */
  def scriptRatios(text: Column): Column = {
    def frac(cls: String): Column =
      when(length(text) === 0, lit(0.0)).otherwise(
        (length(text) - length(regexp_replace(text, cls, ""))).cast("double") / length(text))
    struct(
      frac("[A-Za-z]").as("latin"),
      frac("[\\u4e00-\\u9fff\\u3040-\\u30ff]").as("cjk"),
      frac("[\\u0400-\\u04ff]").as("cyrillic"),
      frac("[\\u0600-\\u06ff]").as("arabic"))
  }

  /** OpenRefine-style key fingerprint: sorted distinct lowercase tokens
    * joined — canonical form for clustering near-identical records. */
  def fingerprintKey(text: Column): Column =
    array_join(array_sort(array_distinct(Dedup.tokens(text))), " ")

  /** 64-bit rolling content fingerprint, order-sensitive: the fold
    * acc' = xxhash64(acc, token). A polynomial roll (acc*P + h) would
    * overflow int64 after two tokens and ANSI mode (Spark 4 default) throws
    * on long overflow rather than wrapping — hash-chaining keeps the same
    * order-sensitivity with no unchecked arithmetic. */
  def rollingFingerprint(text: Column): Column =
    aggregate(Dedup.tokens(text), lit(0L), (acc, t) => xxhash64(acc, t))

  /** Context-window packing: assign documents to fixed token-budget packs
    * by the concatenate-then-chunk rule every LLM pretraining loader uses —
    * walk documents in `orderBy` order, keep a running token total, and
    * `pack_id = floor(tokens_before / budget)` (a document whose tokens
    * straddle a boundary belongs to the pack its first token lands in).
    * Adds `pack_id` and `pack_offset` (token offset within the stream).
    *
    * SCALE: packing is a prefix-sum — inherently sequential — so with a
    * `shard` it runs per shard (a window PARTITION BY): each shard packs
    * independently and in parallel, which is exactly how a multi-worker
    * loader shards anyway. WITHOUT a shard the global stream is computed
    * as a distributed prefix sum (range-partition on `orderBy` → local
    * running totals per partition → one |partitions|-row shift pass), so
    * the corpus never funnels through a single task either way. */
  def packByBudget(
      df: org.apache.spark.sql.DataFrame,
      tokensCol: Column,
      budget: Long,
      orderBy: Seq[Column],
      shard: Seq[Column] = Seq.empty,
      numShards: Int = 0): org.apache.spark.sql.DataFrame = {
    require(budget > 0, "budget must be positive")
    if (shard.nonEmpty) {
      val w = org.apache.spark.sql.expressions.Window.partitionBy(shard: _*)
        .orderBy(orderBy: _*)
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      val before = coalesce(sum(tokensCol.cast("long")).over(w), lit(0L))
      df.withColumn("pack_offset", before)
        .withColumn("pack_id", (col("pack_offset") / budget).cast("long"))
    } else globalPack(df, tokensCol, budget, orderBy, numShards)
  }

  /** Distributed global prefix sum for the shard-less [[packByBudget]]
    * stream: range-partition + sort on `orderBy` (equal keys land in one
    * partition, partition i holds strictly lower keys than i+1), one
    * sequential local pass per partition (the one place `mapPartitions`
    * is the right tool — a running total is inherently imperative), then
    * an exclusive prefix over the |partitions|-row totals (a bounded
    * plan-literal collect, repo convention) broadcast-joined back as a
    * per-partition shift. Result is bit-identical to a global
    * `SUM OVER (ORDER BY …)` window without any single-task stage. */
  private def globalPack(
      df: org.apache.spark.sql.DataFrame,
      tokensCol: Column,
      budget: Long,
      orderBy: Seq[Column],
      numShards: Int): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val n = if (numShards > 0) numShards
            else spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    // materialize the ranged layout once; both passes below reuse it
    val ranged = df.withColumn("__tok", tokensCol.cast("long"))
      .repartitionByRange(n, orderBy: _*)
      .sortWithinPartitions(orderBy: _*)
      .localCheckpoint()
    val tokIdx = ranged.schema.fieldIndex("__tok")
    val outSchema = ranged.schema
      .add("__pid", org.apache.spark.sql.types.IntegerType)
      .add("__local", org.apache.spark.sql.types.LongType)
    val withLocal = ranged.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      var acc = 0L
      it.map { r =>
        val local = acc
        if (!r.isNullAt(tokIdx)) acc += r.getLong(tokIdx)
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ pid :+ local)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
    // one row per physical partition — bounded by numShards
    val totals = withLocal.groupBy(col("__pid"))
      .agg(coalesce(sum(col("__tok")), lit(0L)).as("__t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    var run = 0L
    val shifts = totals.keys.toSeq.sorted.map { p =>
      val s = run; run += totals(p); (p, s)
    }
    val shiftDf = shifts.toDF("__pid", "__shift")
    val outCols = df.columns.map(col).toSeq :+ col("pack_offset") :+ col("pack_id")
    withLocal.join(broadcast(shiftDf), "__pid")
      .withColumn("pack_offset", col("__local") + col("__shift"))
      .withColumn("pack_id", (col("pack_offset") / budget).cast("long"))
      .select(outCols: _*)
  }

  /** Loader manifest for [[packByBudget]]: one row per (shard, pack) with
    * the ordered documents it contains — (doc id, token offset within the
    * stream, token count) structs plus pack totals. This is the artifact
    * a data-loader worker reads to assemble fixed-budget training
    * sequences. One groupBy over the packed frame; the per-pack doc list
    * is bounded by budget/min-doc-tokens. */
  def packManifest(
      df: org.apache.spark.sql.DataFrame,
      id: Column,
      tokensCol: Column,
      budget: Long,
      orderBy: Seq[Column],
      shard: Seq[Column] = Seq.empty): org.apache.spark.sql.DataFrame = {
    val packed = packByBudget(df, tokensCol, budget, orderBy, shard)
    val keys = shard :+ col("pack_id")
    packed.groupBy(keys: _*)
      .agg(
        sort_array(collect_list(struct(
          col("pack_offset").as("offset"),
          id.as("doc_id"),
          tokensCol.cast("long").as("n_tokens")))).as("docs"),
        sum(tokensCol.cast("long")).as("pack_tokens"),
        count(lit(1)).as("n_docs"))
  }

  /** Sliding-window text chunking (the RAG/pretraining "split long
    * documents into overlapping windows" step): whitespace words, windows
    * of `chunkTokens` advancing by `chunkTokens - overlapTokens`. A window
    * is emitted when it starts the document or adds at least one token not
    * covered by its predecessor (`start + overlap < n` — the standard
    * splitter rule, so a short tail that is fully contained in the
    * previous window is not duplicated). Documents with no tokens emit no
    * chunks. Adds (chunk_index, chunk_text, chunk_ntokens) one row per
    * chunk; original columns are preserved.
    *
    * SCALE: a pure map-side posexplode — per-document work, no shuffle;
    * the natural pre-step to [[packByBudget]]. */
  def chunkByTokens(
      df: org.apache.spark.sql.DataFrame,
      text: String,
      chunkTokens: Int,
      overlapTokens: Int = 0): org.apache.spark.sql.DataFrame = {
    require(chunkTokens > 0, "chunkTokens must be positive")
    require(overlapTokens >= 0 && overlapTokens < chunkTokens,
      "overlap must be in [0, chunkTokens)")
    val step = chunkTokens - overlapTokens
    val words = filter(split(col(text), "\\s+"), w => length(w) > 0)
    val starts = graft.functions.ibisfn.let1(words) { ws =>
      when(size(ws) === 0, array().cast("array<int>")).otherwise(
        filter(sequence(lit(0), size(ws) - 1, lit(step)),
          s => s === 0 || s + overlapTokens < size(ws)))
    }
    df.withColumn("__ws", words)
      .select(col("*"), posexplode(starts).as(Seq("chunk_index", "__start")))
      .withColumn("chunk_text",
        concat_ws(" ", slice(col("__ws"), col("__start") + 1, lit(chunkTokens))))
      .withColumn("chunk_ntokens",
        least(lit(chunkTokens), size(col("__ws")) - col("__start")))
      .drop("__ws", "__start")
  }

  /** BM25 relevance of every document against a fixed term set — the
    * classic retrieval/quality scorer (Robertson-Sparck Jones weights,
    * Lucene's idf variant: ln(1 + (N - df + 0.5)/(df + 0.5))).
    *
    * Distributed shape: one corpus aggregate for (N, avgdl), one slim
    * aggregate for per-term document frequencies (only `terms` rows — a
    * broadcast literal map after collection), then a single map-side score
    * pass. The df aggregation is the only shuffle and carries ≤|terms|
    * groups; at 100 TB the corpus is scanned twice (stats + score), never
    * joined wide. Adds `scoreCol` (0.0 for documents containing no query
    * term). */
  def bm25Score(
      df: org.apache.spark.sql.DataFrame,
      text: String,
      terms: Seq[String],
      k1: Double = 1.2,
      b: Double = 0.75,
      scoreCol: String = "bm25"): org.apache.spark.sql.DataFrame = {
    require(terms.nonEmpty, "terms must be non-empty")
    val qTerms = terms.map(_.toLowerCase).distinct
    val toks = Dedup.tokens(col(text))
    // corpus stats: ONE aggregation job → N, avgdl, and |terms| document
    // frequencies (a handful of scalars — the "broadcast" is plan literals)
    val withToks = df.select(toks.as("__t"))
    val aggs = Seq(count(lit(1)).as("__n"), avg(size(col("__t"))).as("__avgdl")) ++
      qTerms.map(t => sum(when(array_contains(col("__t"), t), 1L).otherwise(0L)))
    val statsRow = withToks.agg(aggs.head, aggs.tail: _*).head()
    val n = statsRow.getLong(0)
    if (n == 0L) return df.withColumn(scoreCol, lit(0.0))
    val avgdl = math.max(statsRow.getDouble(1), 1e-9)
    val dfs = qTerms.zipWithIndex.map { case (t, i) => t -> statsRow.getLong(i + 2) }.toMap
    val score = graft.functions.ibisfn.let1(toks) { ts =>
      graft.functions.ibisfn.let1(size(ts).cast("double")) { dl =>
        qTerms.map { t =>
          val idf = math.log(1.0 + (n - dfs(t) + 0.5) / (dfs(t) + 0.5))
          val tf = size(filter(ts, x => x === t)).cast("double")
          tf * (k1 + 1.0) / (tf + lit(k1) * (lit(1.0 - b) + lit(b) * dl / avgdl)) * idf
        }.reduce(_ + _)
      }
    }
    df.withColumn(scoreCol, coalesce(score, lit(0.0)))
  }

  /** Corpus-level most-frequent tokens via the mergeable Misra-Gries
    * sketch (Udfs.misraGries): ONE pass, no shuffle of the token
    * universe — each partition sends ≤`capacity` counters to a single
    * merge, so a 100 TB corpus with a billion-key vocabulary costs
    * |partitions|·capacity map entries on the wire instead of a
    * billion-group exchange. Counts are exact when capacity ≥ distinct
    * tokens (the oracle regime) and undercount by ≤ n/(capacity+1)
    * otherwise. Returns (token, count) for the top `k` reported keys,
    * ties broken by token — deterministic given the sketch contents. */
  def topTokens(
      df: org.apache.spark.sql.DataFrame,
      text: String,
      k: Int,
      capacity: Int = 4096): org.apache.spark.sql.DataFrame = {
    val agg = org.apache.spark.sql.functions.udaf(graft.functions.Udfs.misraGries(capacity))
    df.select(explode(Dedup.tokens(col(text))).as("__tok"))
      .agg(agg(col("__tok")).as("__hh"))
      .select(explode(col("__hh")).as(Seq("token", "count")))
      .orderBy(col("count").desc, col("token").asc)
      .limit(k)
  }

  /** CCNet-style unigram language-model quality score: mean per-token
    * negative log-likelihood under a unigram model trained on the corpus
    * itself (low = in-distribution text, high = noise/outliers — the
    * cheap stand-in for the KenLM perplexity filter).
    *
    * The model is the corpus's `vocabSize` most frequent tokens — found
    * by the Misra-Gries pass of [[topTokens]] (no token-universe
    * shuffle), collected as PLAN LITERALS (a vocabSize-entry map — the
    * same broadcast-a-tiny-model shape as bm25Score), plus one scalar
    * total-token count. Scoring is then pure map-side: a single ordered
    * fold over each document's tokens, p(oov) = oovCount/N additive
    * floor. Two corpus scans (train + score), zero wide joins. */
  def unigramLogProb(
      df: org.apache.spark.sql.DataFrame,
      text: String,
      vocabSize: Int = 1024,
      capacity: Int = 65536,
      oovCount: Double = 0.5,
      scoreCol: String = "lm_score"): org.apache.spark.sql.DataFrame = {
    val model = topTokens(df, text, vocabSize, capacity)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val n = df.select(sum(size(Dedup.tokens(col(text)))).cast("long")).head.getLong(0)
    require(n > 0, "corpus has no tokens to train on")
    val modelMap =
      if (model.isEmpty) typedLit(Map.empty[String, Long])
      else map(model.flatMap { case (t, c) => Seq(lit(t), lit(c)) }: _*)
    val score = graft.functions.ibisfn.let1(Dedup.tokens(col(text))) { ts =>
      when(size(ts) > 0,
        aggregate(ts, lit(0.0),
          (acc, t) => acc - log(coalesce(element_at(modelMap, t), lit(oovCount)) / n.toDouble))
          / size(ts))
        .otherwise(lit(0.0))
    }
    df.withColumn(scoreCol, score)
  }
}
