package graft

import org.apache.spark.sql.functions._

import graft.operators.{Splits, TextAnalysis}

class SplitsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val ids = spark.range(0, 2000).toDF("id")

  test("assignSplit partitions every row, fractions near weights, deterministic") {
    val out = Splits.assignSplit(ids, col("id"),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), seed = 1L)
    val counts = out.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.values.sum == 2000)
    assert(counts("train") > 1500 && counts("train") < 1700)
    assert(counts("val") > 130 && counts("val") < 270)
    // same seed → identical assignment; different seed → different one
    val again = Splits.assignSplit(ids, col("id"),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), seed = 1L)
    assert(out.except(again).count() == 0)
    val other = Splits.assignSplit(ids, col("id"),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), seed = 2L)
    assert(out.except(other).count() > 0)
  }

  test("assignSplit rejects bad weights") {
    intercept[IllegalArgumentException] {
      Splits.assignSplit(ids, col("id"), Seq("a" -> 0.5, "b" -> 0.4), 1L)
    }
    intercept[IllegalArgumentException] {
      Splits.assignSplit(ids, col("id"), Seq("a" -> 1.5, "b" -> -0.5), 1L)
    }
  }

  test("stratifiedSample respects per-stratum fractions and the default") {
    val d = ids.withColumn("g", when(col("id") % 2 === 0, "even").otherwise("odd"))
    val kept = Splits.stratifiedSample(d, col("id"), col("g"),
      Map("even" -> 0.5), seed = 9L, default = 0.0)
    assert(kept.filter(col("g") === "odd").count() == 0)
    val n = kept.count()
    assert(n > 400 && n < 600) // ~0.5 of the 1000 even ids
    // subset property: membership is a pure function of (id, seed)
    val kept2 = Splits.stratifiedSample(d, col("id"), col("g"),
      Map("even" -> 0.25), seed = 9L, default = 0.0)
    assert(kept2.join(kept, "id", "left_anti").count() == 0)
  }

  test("shuffled is a deterministic permutation; shardAssign stays in range") {
    val a = Splits.shuffled(ids, col("id"), 5L).select("id").as[Long].collect()
    val b = Splits.shuffled(ids, col("id"), 5L).select("id").as[Long].collect()
    assert(a.toSeq == b.toSeq)
    assert(a.sorted.toSeq == (0L until 2000L))
    assert(a.toSeq != (0L until 2000L)) // actually permuted
    val c = Splits.shuffled(ids, col("id"), 6L).select("id").as[Long].collect()
    assert(a.toSeq != c.toSeq) // new seed → new epoch order
    val shards = Splits.shardAssign(ids, col("id"), nShards = 8, seed = 5L)
      .select("shard").distinct().as[Int].collect().toSet
    assert(shards.subsetOf((0 until 8).toSet) && shards.size == 8)
  }

  test("redactPii replaces emails, IPs, and phones; counts match") {
    val d = Seq("mail a@b.co and 10.1.2.3 then +1-555-0100-99 done").toDF("t")
    val r = d.select(
      TextAnalysis.redactPii(col("t")).as("r"),
      TextAnalysis.emailCount(col("t")).as("ne"),
      TextAnalysis.ipv4Count(col("t")).as("ni"),
      TextAnalysis.phoneCount(col("t")).as("np")).head()
    assert(r.getString(0) == "mail <EMAIL> and <IP> then <PHONE> done")
    assert((r.getInt(1), r.getInt(2), r.getInt(3)) == ((1, 1, 1)))
  }

  test("repetition signals: guards and known values") {
    val d = Seq(
      "a b a b a b",   // dup 4/6; top bigram "a b" = 3 of 5
      "x",             // single token: no bigrams → 0
      "").toDF("t")
    val out = d.select(
      round(TextAnalysis.dupTokenFraction(col("t")), 6).as("df"),
      round(TextAnalysis.topNgramFraction(col("t"), 2), 6).as("t2")).collect()
    assert(out(0).getDouble(0) == 0.666667 && out(0).getDouble(1) == 0.6)
    assert(out(1).getDouble(0) == 0.0 && out(1).getDouble(1) == 0.0)
    assert(out(2).getDouble(0) == 0.0 && out(2).getDouble(1) == 0.0)
  }

  test("chunkByTokens: windows, overlap, tail rule, empty docs") {
    val d = Seq(
      (1L, (1 to 10).map(i => s"w$i").mkString(" ")), // 10 tokens
      (2L, "a b c"),                                  // shorter than a chunk
      (3L, "   "),                                    // whitespace-only → no chunks
      (4L, "")                                        // empty → no chunks
    ).toDF("id", "text")
    val out = TextAnalysis.chunkByTokens(d, "text", chunkTokens = 8, overlapTokens = 4)
      .select("id", "chunk_index", "chunk_text", "chunk_ntokens")
      .as[(Long, Int, String, Int)].collect().sortBy(r => (r._1, r._2))
    // doc 1: starts 0 and 4 (start 8 is dropped: 8+4 >= 10, fully covered)
    assert(out.toSeq == Seq(
      (1L, 0, (1 to 8).map(i => s"w$i").mkString(" "), 8),
      (1L, 1, (5 to 10).map(i => s"w$i").mkString(" "), 6),
      (2L, 0, "a b c", 3)))
    intercept[IllegalArgumentException] {
      TextAnalysis.chunkByTokens(d, "text", chunkTokens = 4, overlapTokens = 4)
    }
  }

  test("bm25Score: term frequency and rarity ordering, absent terms score 0") {
    val d = Seq(
      (1L, "spark spark spark data engine"),
      (2L, "spark data engine"),
      (3L, "data engine pipeline"),
      (4L, "completely unrelated words here")
    ).toDF("id", "text")
    val out = TextAnalysis.bm25Score(d, "text", Seq("spark"))
      .select("id", "bm25").as[(Long, Double)].collect().toMap
    assert(out(1L) > out(2L))          // higher tf → higher score
    assert(out(2L) > 0 && out(3L) == 0.0 && out(4L) == 0.0)
    // a rarer term outranks a common one at equal tf
    val two = TextAnalysis.bm25Score(d, "text", Seq("pipeline", "data"))
      .filter(col("id") === 3L).select("bm25").as[Double].head()
    val dataOnly = TextAnalysis.bm25Score(d, "text", Seq("data"))
      .filter(col("id") === 3L).select("bm25").as[Double].head()
    assert(two > 2 * dataOnly) // pipeline (df=1) contributes more than data (df=3)
  }

  test("mixtureSample realizes the target mixture with the binding source kept whole") {
    val d = spark.range(0, 3000).toDF("id")
      .withColumn("src", when(col("id") < 2000, "web")
        .when(col("id") < 2800, "code").otherwise("books"))
    // books has 200 rows and wants 1/3 of the corpus → binding source:
    // kept whole, total ≈ 600, web/code downsampled to ≈200 each
    val (out, rates) = Splits.mixtureSample(d, col("id"), col("src"),
      Map("web" -> 1.0, "code" -> 1.0, "books" -> 1.0), seed = 5L)
    assert(rates("books") == 1.0 && rates("web") == 0.1 && rates("code") == 0.25)
    val counts = out.groupBy("src").count().as[(String, Long)].collect().toMap
    assert(counts("books") == 200L)
    assert(math.abs(counts("web") - 200L) < 60 && math.abs(counts("code") - 200L) < 60)
    // dropping a source not in weights; unknown source in weights rejected
    assert(Splits.mixtureSample(d, col("id"), col("src"),
      Map("books" -> 1.0), 5L)._1.select("src").distinct().as[String].collect().toSeq == Seq("books"))
    intercept[IllegalArgumentException] {
      Splits.mixtureSample(d, col("id"), col("src"), Map("nope" -> 1.0), 5L)
    }
  }

  test("cappedPerGroup keeps exactly k smallest-hash rows per group, nested across k") {
    val d = spark.range(0, 300).toDF("id")
      .withColumn("g", (col("id") % 3).cast("string"))
    val k10 = Splits.cappedPerGroup(d, "id", col("g"), k = 10, seed = 7L)
    val counts = k10.groupBy("g").count().as[(String, Long)].collect().toMap
    assert(counts.values.toSet == Set(10L))
    // matches the window formulation exactly
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("g").orderBy(Splits.hashUnit(col("id"), 7L).asc, col("id").asc)
    val viaWindow = d.withColumn("rn", row_number().over(w)).filter(col("rn") <= 10)
      .select("id").as[Long].collect().toSet
    assert(k10.select("id").as[Long].collect().toSet == viaWindow)
    // nested: the k=5 selection is a subset of k=10; groups smaller than k kept whole
    val k5 = Splits.cappedPerGroup(d, "id", col("g"), k = 5, seed = 7L)
      .select("id").as[Long].collect().toSet
    assert(k5.subsetOf(viaWindow) && k5.size == 15)
    val small = Splits.cappedPerGroup(d.filter(col("id") < 4), "id", col("g"), k = 10)
    assert(small.count() == 4)
  }

  test("unigramLogProb: frequent-token docs score lower; oov floors; empty doc 0") {
    val d = Seq(
      (1L, "common common common common common"),
      (2L, "common rare"),
      (3L, ""),
      (4L, "weird unseen junk")).toDF("id", "text")
    val out = TextAnalysis.unigramLogProb(d, "text", vocabSize = 2, capacity = 64)
      .select("id", "lm_score").as[(Long, Double)].collect().toMap
    // N = 10 tokens; counts: common 6, junk/rare/unseen/weird 1 each
    val n = 10.0
    val pc = 6.0 / n
    assert(math.abs(out(1L) - (-math.log(pc))) < 1e-9)
    assert(out(2L) > out(1L)) // rare token raises the score
    assert(out(3L) == 0.0)
    // doc 4: mostly oov — the vocab-2 model keeps common(6) and junk(1,
    // token-asc tie-break), so weird/unseen floor at 0.5/N → highest score
    assert(out(4L) > out(2L))
  }

  test("charEntropy: constant string 0, uniform chars log2(k), empty 0") {
    val d = Seq((1L, "aaaa"), (2L, "abcd"), (3L, ""), (4L, "aabb")).toDF("id", "text")
    val out = d.select(col("id"), TextAnalysis.charEntropy(col("text")))
      .as[(Long, Double)].collect().toMap
    assert(out(1L) == 0.0)
    assert(math.abs(out(2L) - 2.0) < 1e-12) // 4 distinct uniform → log2 4
    assert(out(3L) == 0.0)
    assert(math.abs(out(4L) - 1.0) < 1e-12) // two chars, 50/50
  }

  test("classifierScore: sigmoid bounds, bias shift, weight sensitivity") {
    val d = Seq((1L, "alpha beta gamma"), (2L, "")).toDF("id", "text")
    val zero = d.select(col("id"),
      TextAnalysis.classifierScore(col("text"), Seq.fill(16)(0.0), bias = 0.0))
      .as[(Long, Double)].collect().toMap
    assert(zero(1L) == 0.5 && zero(2L) == 0.5) // zero weights → σ(0)
    val pos = d.select(TextAnalysis.classifierScore(col("text"), Seq.fill(16)(2.0), bias = 0.0))
      .as[Double].head()
    assert(math.abs(pos - 1.0 / (1.0 + math.exp(-2.0))) < 1e-12) // all grams hit w=2, tf sums to 1... scaled by 1/n each of n grams
    val biased = d.filter(col("id") === 2L)
      .select(TextAnalysis.classifierScore(col("text"), Seq.fill(16)(0.0), bias = 3.0))
      .as[Double].head()
    assert(math.abs(biased - 1.0 / (1.0 + math.exp(-3.0))) < 1e-12)
  }

  test("gopher line rules: fractions and the composed gate") {
    val text = "the data is good and it works well for all of us every day here now\n" +
      "- item one\n" +
      "the data is good and it works well for all of us every day here now\n" +
      "loading ..."
    val d = Seq((1L, text)).toDF("id", "text")
    val row = d.select(
      TextAnalysis.bulletLineFraction(col("text")).as("b"),
      TextAnalysis.ellipsisLineFraction(col("text")).as("e"),
      TextAnalysis.dupLineFraction(col("text")).as("dl"),
      TextAnalysis.dupLineCharFraction(col("text")).as("dc"),
      TextAnalysis.alphaWordFraction(col("text")).as("a"),
      TextAnalysis.gopherQualityPass(col("text")).as("p")).head()
    assert(row.getDouble(0) == 0.25)  // 1 of 4 lines bulleted
    assert(row.getDouble(1) == 0.25)  // 1 of 4 ends in ...
    assert(row.getDouble(2) == 0.25)  // line 3 repeats line 1
    val lineLen = "the data is good and it works well for all of us every day here now".length
    val total = 2 * lineLen + "- item one".length + "loading ...".length
    assert(math.abs(row.getDouble(3) - lineLen.toDouble / total) < 1e-12)
    // words: 16+16+3+2 = 37; "-" and "..." carry no letter → 35/37
    assert(math.abs(row.getDouble(4) - 35.0 / 37.0) < 1e-12)
    assert(!row.getBoolean(5)) // 35 alnum words < 50 → fails the gate
    // a long plain English doc passes
    val ok = Seq((1L, ("the quick brown fox jumps over the lazy dog and runs far " * 6))).toDF("id", "text")
    assert(ok.select(TextAnalysis.gopherQualityPass(col("text"))).head().getBoolean(0))
    // empty text: every fraction 0, gate false
    val empty = Seq((1L, "")).toDF("id", "text")
    val er = empty.select(
      TextAnalysis.bulletLineFraction(col("text")),
      TextAnalysis.dupLineCharFraction(col("text")),
      TextAnalysis.alphaWordFraction(col("text")),
      TextAnalysis.gopherQualityPass(col("text"))).head()
    assert(er.getDouble(0) == 0.0 && er.getDouble(1) == 0.0 && er.getDouble(2) == 0.0)
    assert(!er.getBoolean(3))
  }

  test("wordpieceTokens: HF greedy longest-match semantics incl. UNK collapse") {
    val vocab = Seq("un", "##aff", "##able", "aff", "able", "runn", "##ing", "run", "the")
    val d = Seq((1L, "unaffable running the unknownword")).toDF("id", "text")
    val out = d.select(TextAnalysis.wordpieceTokens(col("text"), vocab))
      .head().getSeq[String](0)
    // "running" takes the LONGEST first piece (runn, not run); any
    // unmatched position collapses the WHOLE word to [UNK]
    assert(out == Seq("un", "##aff", "##able", "runn", "##ing", "the", "[UNK]"))
    assert(d.select(TextAnalysis.wordpieceCount(col("text"), vocab)).head().getInt(0) == 7)
    // empty text → zero pieces
    val e = Seq((1L, "")).toDF("id", "text")
    assert(e.select(TextAnalysis.wordpieceCount(col("text"), vocab)).head().getInt(0) == 0)
  }

  test("sentence stats: terminal-punctuation split, counts and mean words") {
    val d = Seq((1L, "One two three. Four five! Six? seven eight nine ten")).toDF("id", "text")
    val r = d.select(
      TextAnalysis.sentenceCount(col("text")),
      TextAnalysis.meanSentenceLength(col("text"))).head()
    assert(r.getInt(0) == 4)
    assert(math.abs(r.getDouble(1) - 10.0 / 4.0) < 1e-12)
    val empty = Seq((1L, "")).toDF("id", "text")
    val e = empty.select(
      TextAnalysis.sentenceCount(col("text")),
      TextAnalysis.meanSentenceLength(col("text"))).head()
    assert(e.getInt(0) == 0 && e.getDouble(1) == 0.0)
  }

  test("packManifest groups packed docs in stream order with totals") {
    val d = Seq((1L, 300L), (2L, 300L), (3L, 300L), (4L, 100L))
      .toDF("id", "n_tok")
    val m = TextAnalysis.packManifest(d, col("id"), col("n_tok"),
        budget = 512L, orderBy = Seq(col("id")))
      .orderBy("pack_id").collect()
    // offsets 0/300/600/900 → packs 0,0,1,1
    assert(m.length == 2)
    val p0 = m(0)
    assert(p0.getAs[Long]("pack_id") == 0L && p0.getAs[Long]("n_docs") == 2L &&
      p0.getAs[Long]("pack_tokens") == 600L)
    assert(p0.getSeq[org.apache.spark.sql.Row](p0.fieldIndex("docs"))
      .map(_.getLong(1)) == Seq(1L, 2L))
    val p1 = m(1)
    assert(p1.getSeq[org.apache.spark.sql.Row](p1.fieldIndex("docs"))
      .map(_.getLong(1)) == Seq(3L, 4L))
    assert(p1.getAs[Long]("pack_tokens") == 400L)
  }

  test("corpusReport: counts, dup/empty fractions, group mix by hand") {
    val d = Seq(
      (1L, "a b c d", "web"), (2L, "a b c d", "web"),  // exact dup pair
      (3L, "e f", "book"), (4L, "", "web"))
      .toDF("id", "text", "src")
    val out = TextAnalysis.corpusReport(d, "text", col("src"))
      .as[(String, Double)].collect().toMap
    assert(out("n_docs") == 4.0)
    assert(out("total_tokens") == 10.0)
    assert(out("empty_frac") == 0.25)
    assert(out("exact_dup_frac") == 0.25)   // 3 distinct keys over 4 docs
    assert(out("group_frac_web") == 0.75 && out("group_frac_book") == 0.25)
    assert(out("mean_tokens") == 2.5)
  }

  test("bucketByQuantiles: balanced bands, monotone, null passthrough") {
    val d = (1 to 100).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    val out = Splits.bucketByQuantiles(d, col("v"), 4)
      .select("id", "bucket").as[(Long, Int)].collect().toMap
    // 1..100 into quartiles: 1-25 → 0, 26-50 → 1, 51-75 → 2, 76-100 → 3
    assert(out(1L) == 0 && out(25L) == 0)
    assert(out(26L) == 1 && out(50L) == 1)
    assert(out(51L) == 2 && out(75L) == 2)
    assert(out(76L) == 3 && out(100L) == 3)
    // nulls stay null
    val withNull = Seq((1L, Some(1.0)), (2L, None), (3L, Some(9.0)))
      .toDF("id", "v")
    val nb = Splits.bucketByQuantiles(withNull, col("v"), 2)
      .filter(col("id") === 2L).select("bucket").head()
    assert(nb.isNullAt(0))
    // approx mode assigns every row a bucket in range
    val ap = Splits.bucketByQuantiles(d, col("v"), 5, approx = true)
      .select("bucket").as[Int].collect()
    assert(ap.forall(b => b >= 0 && b < 5))
  }

  test("bucketByQuantiles: float/short columns and all-null input") {
    // regression: approx_percentile returns the INPUT column type — a
    // float column used to MatchError in the threshold decode
    val f = (1 to 40).map(i => (i.toLong, i.toFloat)).toDF("id", "v")
    val fb = Splits.bucketByQuantiles(f, col("v"), 2, approx = true)
      .select("id", "bucket").as[(Long, Int)].collect().toMap
    assert(fb(1L) == 0 && fb(40L) == 1)
    val s = (1 to 40).map(i => (i.toLong, i.toShort)).toDF("id", "v")
    val sb = Splits.bucketByQuantiles(s, col("v"), 2)
      .select("id", "bucket").as[(Long, Int)].collect().toMap
    assert(sb(1L) == 0 && sb(40L) == 1)
    // all-null input: clear error, not an NPE
    val nulls = Seq((1L, Option.empty[Double]), (2L, None)).toDF("id", "v")
    val ex = intercept[IllegalArgumentException] {
      Splits.bucketByQuantiles(nulls, col("v"), 2)
    }
    assert(ex.getMessage.contains("no non-null values"))
  }

  test("tokenizers are SQL-callable with literal vocab/merge arrays") {
    val wp = spark.sql(
      "SELECT wordpiece('unaffable', array('un', '##aff', '##able'))")
      .head().getSeq[String](0)
    assert(wp == Seq("un", "##aff", "##able"))
    val bp = spark.sql(
      "SELECT bpe('the', array(array('t','h'), array('th','e')))")
      .head().getSeq[String](0)
    assert(bp == Seq("the"))
  }

  test("bpeTokens: ranked merges, multi-iteration cascade, overlap skip") {
    val merges = Seq(("a", "b"), ("ab", "c"), ("a", "a"))
    val d = Seq((1L, "abc aaa abab xyz")).toDF("id", "text")
    val out = d.select(TextAnalysis.bpeTokens(col("text"), merges)).head().getSeq[String](0)
    // abc: (a,b) then (ab,c) cascade → [abc]; aaa: overlap skip → [aa, a];
    // abab: both occurrences in one pass → [ab, ab]; xyz: untouched chars
    assert(out == Seq("abc", "aa", "a", "ab", "ab", "x", "y", "z"))
    assert(d.select(TextAnalysis.bpeCount(col("text"), merges)).head().getInt(0) == 8)
  }

  test("c4CleanLines keeps only punctuated, long-enough, brace- and boilerplate-free lines") {
    val text = "The data pipeline works well.\n" +
      "enable javascript to continue.\n" +
      "We updated our cookie policy today.\n" +
      "short line.\n" +
      "if (x) { return }\n" +
      "no terminal punctuation here\n" +
      "Another good line stays in!"
    val d = Seq((1L, text)).toDF("id", "text")
    val cleaned = d.select(TextAnalysis.c4CleanLines(col("text"))).head().getString(0)
    assert(cleaned == "The data pipeline works well.\nAnother good line stays in!")
    val frac = d.select(TextAnalysis.c4KeepFraction(col("text"))).head().getDouble(0)
    assert(math.abs(frac - 2.0 / 7.0) < 1e-12)
    // empty doc: empty clean, 0 fraction
    val e = Seq((1L, "")).toDF("id", "text")
    assert(e.select(TextAnalysis.c4CleanLines(col("text"))).head().getString(0) == "")
    assert(e.select(TextAnalysis.c4KeepFraction(col("text"))).head().getDouble(0) == 0.0)
  }

  test("scriptRatios: latin/cjk/cyrillic fractions by codepoint range") {
    val d = Seq((1L, "ab你好да")).toDF("id", "text")
    val r = d.select(TextAnalysis.scriptRatios(col("text")).as("s")).select("s.*").head()
    assert(math.abs(r.getDouble(0) - 2.0 / 6.0) < 1e-12) // latin
    assert(math.abs(r.getDouble(1) - 2.0 / 6.0) < 1e-12) // cjk
    assert(math.abs(r.getDouble(2) - 2.0 / 6.0) < 1e-12) // cyrillic
    assert(r.getDouble(3) == 0.0)                        // arabic
  }

  private lazy val dsirDocs = Seq(
    (1L, "physics quantum energy field theory particle wave", true),
    (2L, "quantum field particle physics energy state wave", true),
    (3L, "physics theory energy quantum particle spin", true),
    (4L, "cheap pills buy now click here discount offer", false),
    (5L, "click buy discount cheap offer now deal", false),
    (6L, "quantum energy particle physics wave theory state", false), // target-like, raw-labeled
    (7L, "buy cheap click discount now offer pills deal", false)
  ).toDF("id", "text", "is_t")

  test("dsirLogWeights: target-like documents outscore off-target ones") {
    val out = Splits.dsirLogWeights(dsirDocs, "text", col("is_t"), buckets = 128, seed = 5L)
      .select("id", "dsir_logw").as[(Long, Double)].collect().toMap
    // the raw-labeled doc that shares the target vocabulary must outscore
    // every spam doc, and the target docs must outscore all spam docs
    assert(out(6L) > out(4L) && out(6L) > out(5L) && out(6L) > out(7L))
    for (t <- Seq(1L, 2L, 3L); s <- Seq(4L, 5L, 7L)) assert(out(t) > out(s))
    // deterministic
    val again = Splits.dsirLogWeights(dsirDocs, "text", col("is_t"), buckets = 128, seed = 5L)
      .select("id", "dsir_logw").as[(Long, Double)].collect().toMap
    assert(out == again)
    // empty doc scores exactly 0
    val withEmpty = Splits.dsirLogWeights(
      dsirDocs.union(Seq((8L, "", false)).toDF("id", "text", "is_t")),
      "text", col("is_t"), buckets = 128, seed = 5L)
      .filter(col("id") === 8L).select("dsir_logw").as[Double].head()
    assert(withEmpty == 0.0)
  }

  test("dsirSample: seeded Gumbel top-n is deterministic and target-enriched") {
    val sel = Splits.dsirSample(dsirDocs, col("id"), "text", col("is_t"),
      n = 3, buckets = 128, seed = 5L, temperature = 0.05)
    val got = sel.select("id").as[Long].collect().toSet
    assert(got.size == 3)
    // at near-zero temperature selection ≈ top-3 by weight — all target-like
    assert(got.subsetOf(Set(1L, 2L, 3L, 6L)))
    val again = Splits.dsirSample(dsirDocs, col("id"), "text", col("is_t"),
      n = 3, buckets = 128, seed = 5L, temperature = 0.05)
      .select("id").as[Long].collect().toSet
    assert(got == again)
  }
}
