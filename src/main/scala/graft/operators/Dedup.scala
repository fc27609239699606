package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Large-scale deduplication operators for training-data pipelines.
  *
  * All variants are pure DataFrame plans: tokenize/shingle/sketch steps are
  * single-pass array expressions (no UDFs, no driver collect; higher-order
  * lambdas are interpreted by Spark, so each op is shaped to touch its
  * input once — see shingleHashSet/minhashSignature), candidate generation
  * is a bucket equi-join (shuffle on bucket key, never an all-pairs cross
  * product). At 100 TB the only wide stages are (a) the bucket-key shuffle
  * and (b) the final pair-verify join — both hash-partitioned and
  * AQE-skew-splittable.
  */
object Dedup {

  /** Spread an under-partitioned input across the cluster before a
    * CPU-heavy per-row stage (tokenize/shingle/hash). Parquet can only
    * split at row-group boundaries, so a source with few/large row groups
    * yields fewer tasks than cores and the sketch stage serializes. A
    * round-robin shuffle of the raw rows is cheap relative to the compute
    * it parallelizes; when the scan already has ≥ defaultParallelism
    * splits (the 100 TB case) this is a no-op. */
  private[graft] def scatter(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    // plan-level split estimate (catalyst size / maxPartitionBytes), NOT
    // df.rdd.getNumPartitions — touching .rdd materializes the analyzed
    // plan's RDD lineage on the driver at every operator construction, a
    // real planner cost on wide plans. Catalyst stats are free. Unknown
    // sizes estimate huge → no-op, the safe direction at scale.
    val maxSplit = math.max(1L, spark.sessionState.conf.filesMaxPartitionBytes)
    val bytesSplits = df.queryExecution.optimizedPlan.stats.sizeInBytes / maxSplit + 1
    // the bytes estimate overshoots for UNSPLITTABLE compressed sources
    // (few large .gz files = few tasks no matter the byte count) — there
    // the real ceiling is the file count. inputFiles is cached listing
    // metadata, no RDD involved.
    val files = try df.inputFiles catch { case _: Throwable => Array.empty[String] }
    val unsplittableExt = Seq(".gz", ".zst", ".lz4", ".deflate", ".br", ".sz")
    val allUnsplittable = files.nonEmpty &&
      files.forall(f => unsplittableExt.exists(f.endsWith))
    val estSplits =
      if (allUnsplittable) BigInt(files.length) else bytesSplits
    if (estSplits < target) df.repartition(target) else df
  }

  /** Exact dedup, "keep first by `orderCol`" semantics (`orderCol` should
    * be non-null and unique within a key, e.g. an id): ONE hash aggregation
    * with map-side partial `min_by` — constant state per key, no sort. The
    * window-rank formulation (`row_number() == 1`) sorts every key group;
    * at 100 TB that is a full shuffle + sort where this plan combines on
    * the map side and ships one candidate row per (mapper, key). */
  def exact(df: DataFrame, keyCols: Seq[String], orderCol: String): DataFrame = {
    val allCols = df.columns.toSeq
    val payload = allCols.filterNot(c => keyCols.contains(c) || c == orderCol)
    if (payload.isEmpty && keyCols.contains(orderCol)) {
      // ordering column IS a group key: every row of a group is identical
      // on all output columns, so keep-first = distinct (aliasing min(ord)
      // as ord would otherwise collide with the grouping column)
      df.select(allCols.map(col): _*).distinct()
    } else if (payload.isEmpty) {
      // Every output column is a group key or the ordering column itself:
      // min_by degenerates to plain min (nulls ignored = nulls-last; a
      // group that is entirely null keeps a null-ord row either way).
      // This buffer is a primitive, so the plan is a whole-stage-codegen
      // HashAggregate instead of the SortAggregate the struct buffer
      // forces — prune BEFORE deduping to hit this path (DuckDB's
      // optimizer does the same pruning automatically).
      df.groupBy(keyCols.map(col): _*).agg(min(col(orderCol)).as(orderCol))
        .select(allCols.map(col): _*)
    } else {
      // ordering key is a struct with a nulls-last flag: min_by alone
      // returns a null struct (→ an all-null output row) for a group whose
      // orderCol is entirely null; with the flag such groups keep a real
      // row, matching the row_number()==1 formulation this plan replaced
      val ord = struct(col(orderCol).isNull, col(orderCol))
      df.groupBy(keyCols.map(col): _*)
        .agg(min_by(struct(allCols.map(col): _*), ord).as("__row"))
        .select(allCols.map(c => col("__row").getField(c).as(c)): _*)
    }
  }

  /** Exact-duplicate groups (hash-groupBy): content hash → ids + count. */
  def exactGroups(df: DataFrame, id: String, key: Column): DataFrame =
    df.groupBy(md5(key.cast("string")).as("content_hash"))
      .agg(count(lit(1)).as("dup_count"), min(col(id)).as("keeper_id"),
        sort_array(collect_list(col(id))).as("member_ids"))
      .filter(col("dup_count") > 1)

  /** Lower-cased word tokens. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "[^\\p{L}\\p{N}]+"), t => length(t) > 0)

  /** Distinct k-word shingles of a token array. */
  def shingles(toks: Column, k: Int): Column =
    when(size(toks) < k, array(concat_ws(" ", toks)))
      .otherwise(array_distinct(transform(
        sequence(lit(0), size(toks) - k),
        i => concat_ws(" ", slice(toks, i + 1, lit(k))))))

  /** 32-bit murmur hash per shingle (Spark's codegen'd `hash`). */
  def shingleHashes(sh: Column): Column = transform(sh, s => hash(s).cast("long"))

  /** Default token hash: Spark's codegen'd 32-bit murmur — the fast path. */
  val murmurHash: Column => Column = t => hash(t).cast("long")

  /** 28-bit md5-derived token hash: first 7 hex chars of md5, parsed as a
    * number. Slower than murmur but reproducible in ANY engine with md5 —
    * the oracle-checkable hash for cross-engine verification of sketch
    * math. 28 bits keeps every downstream polynomial combine far from
    * int64 overflow (ANSI mode throws rather than wraps). */
  val md5Hash28: Column => Column =
    t => conv(substring(md5(t.cast("binary")), 1, 7), 16, 10).cast("long")

  /** 64-bit md5-derived hash (two 32-bit hex halves packed with shiftleft/
    * or — bitwise ops, no overflow check applies). */
  val md5Hash64: Column => Column = { t =>
    val h = md5(t.cast("binary"))
    shiftleft(conv(substring(h, 1, 8), 16, 10).cast("long"), 32)
      .bitwiseOR(conv(substring(h, 9, 8), 16, 10).cast("long"))
  }

  /** Distinct k-shingle hash set computed arithmetically: murmur-hash each
    * token ONCE, then combine k consecutive token-hashes with a polynomial
    * multiply-add. Set-equivalent to `shingleHashes(shingles(toks, k))`
    * (same distinct-shingle identity) but avoids materializing shingle
    * strings — the interpreted concat_ws/array_distinct-on-strings path is
    * the dominant cost of the sketch stage. Documents shorter than k tokens
    * collapse to one whole-document hash, matching `shingles`' fallback. */
  def shingleHashSet(toks: Column, k: Int, tokenHash: Column => Column = murmurHash): Column =
    graft.functions.ibisfn.let1(transform(toks, tokenHash)) { th =>
      val rolled =
        if (k == 1) th
        else transform(sequence(lit(0), size(th) - k), i =>
          (0 until k).map(j => element_at(th, i + j + 1) * lit(math.pow(31, k - 1 - j).toLong))
            .reduce(_ + _))
      val whole = array(aggregate(th, lit(7L), (a, x) => a * 31 + x))
      array_distinct(when(size(th) < k, whole).otherwise(rolled))
    }

  private[graft] val MinhashPrime = 2038074743L // large 31-bit prime, fits long math

  /** Deterministic (a,b) parameter pairs for the minhash family
    * h_i(x) = (a_i*x + b_i) mod p — the standard universal-hash minhash
    * construction (Broder '97; same scheme as Spark MLlib MinHashLSH). */
  private[graft] def minhashParams(numHashes: Int, seed: Long): Seq[(Long, Long)] = {
    var s = seed
    def next(): Long = { s = (s * 6364136223846793005L + 1442695040888963407L); math.abs(s) }
    (0 until numHashes).map(_ => (next() % (MinhashPrime - 1) + 1, next() % MinhashPrime))
  }

  /** Minhash signature (array<bigint>, length numHashes) of a shingle-hash
    * array.
    *
    * Shape matters: a single `aggregate` pass over `hashes` that updates all
    * numHashes running minima per element (via `zip_with` against the
    * parameter array). The naive transpose — transform over params with an
    * inner `array_min(transform(hashes, …))` — evaluates the `hashes`
    * argument expression once PER PARAMETER when Catalyst inlines the
    * upstream tokenize/shingle expression into the lambda (no projection
    * boundary survives CollapseProject), i.e. a numHashes× blowup of the
    * whole text-processing chain. The aggregate form reads `hashes` exactly
    * once regardless of how callers compose it. */
  def minhashSignature(hashes: Column, numHashes: Int, seed: Long = 42L): Column = {
    val params = minhashParams(numHashes, seed)
    val paramArr = array(params.map { case (a, b) =>
      struct(lit(a).as("a"), lit(b).as("b"))
    }: _*)
    aggregate(
      hashes,
      array_repeat(lit(MinhashPrime), numHashes),
      (acc, x) => zip_with(acc, paramArr, (m, p) =>
        least(m, pmod(p.getField("a") * pmod(x, lit(MinhashPrime)) + p.getField("b"),
          lit(MinhashPrime)))))
  }

  /** MinHash + LSH near-duplicate pairs.
    *
    * shingle → minhash(numHashes) → band into `bands` groups of
    * numHashes/bands rows → explode (band_idx, band_hash) → equi-join on the
    * bucket → verify true Jaccard on the shingle-hash sets → pairs with
    * jaccard >= threshold. Candidate generation cost is |buckets| join, not
    * |docs|² — the LSH banding bound.
    */
  /** Pick (bands, rows) for [[minhashLsh]] from a target Jaccard
    * threshold: among factor pairs bands·rows = numHashes, choose the one
    * whose S-curve inflection point (1/bands)^(1/rows) lies closest to
    * the threshold — the standard LSH tuning rule (more bands ⇒ catches
    * lower similarities at more candidate-pair cost). */
  def lshParams(threshold: Double, numHashes: Int): (Int, Int) = {
    require(threshold > 0 && threshold < 1, "threshold must be in (0, 1)")
    require(numHashes > 0, "numHashes must be positive")
    val best = (1 to numHashes).filter(numHashes % _ == 0)
      .map { b => (b, numHashes / b, math.pow(1.0 / b, 1.0 / (numHashes / b))) }
      .minBy { case (_, _, t) => math.abs(t - threshold) }
    (best._1, best._2)
  }

  def minhashLsh(
      df: DataFrame,
      id: String,
      text: String,
      shingleK: Int = 3,
      numHashes: Int = 32,
      bands: Int = 8,
      threshold: Double = 0.7,
      tokenHash: Column => Column = murmurHash,
      reliableCheckpoint: Boolean = false): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands

    // The sketch stage feeds three consumers (banding + both sides of the
    // verify join) — materialize it EAGERLY so shingling/minhashing runs
    // once (the explicit-CTE materialization): the three consumers are
    // independent shuffle stages that Spark schedules concurrently, and
    // without materialization each would race to (re)compute the sketch.
    // localCheckpoint (not persist+count): a persist is pinned in the
    // CacheManager until an explicit unpersist nobody can call on a lazily
    // returned result — repeated minhashLsh calls in a long-lived session
    // would accumulate sketch caches until eviction thrash (observed: a
    // 4× slowdown of UNRELATED bench queries at SF1). Checkpoint blocks
    // are freed by the ContextCleaner as soon as the plan is unreachable.
    //
    // FAULT TOLERANCE (round-2 verdict #1): localCheckpoint blocks live on
    // executor local disk only — on a real cluster an executor loss makes
    // the plan unrecoverable mid-query. Long multi-hour 100 TB dedup jobs
    // should pass reliableCheckpoint=true (requires
    // sparkContext.setCheckpointDir on durable storage): blocks go to the
    // checkpoint filesystem and survive executor loss; lineage is still
    // truncated and the ContextCleaner still removes the files once the
    // plan is unreachable (spark.cleaner.referenceTracking.cleanCheckpoints
    // governs eager file cleanup). Local/bench runs keep the default.
    // Fused sketch for the known hash kinds: ONE typed loop per document
    // (exts/ShingleMinhash) instead of the interpreted-HOF chain — value-
    // identical (SketchFusionSpec asserts it per kind; q65's generated
    // oracle checks it end-to-end). Custom tokenHash lambdas keep the
    // declarative path.
    val sketched = minhashSketch(df, id, text, shingleK, numHashes, tokenHash,
      reliableCheckpoint)

    // Bucket join carries ONLY (band, bucket, id) — the wide shingle arrays
    // never enter the ×bands-duplicated shuffle. Shingle sets are re-joined
    // after pair dedup, so verify-stage data volume is O(candidate pairs).
    // The bucket key is the signature band itself (`rows` longs), not a
    // re-hash of it: exact keys add a few bytes per row to the shuffle but
    // eliminate band-hash collisions AND keep the whole pipeline
    // reproducible in any engine for oracle checks.
    val banded = bandSignature(sketched, bands, rows)

    val l = banded.select(col("band"), col("bucket"), col("doc").as("doc_a"))
    val r = banded.select(col("band"), col("bucket"), col("doc").as("doc_b"))
    val candidates = l
      .join(r, Seq("band", "bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
      .dropDuplicates("doc_a", "doc_b")

    val sets = sketched.select(col("doc"), col("sh"))
    candidates
      .join(sets.withColumnRenamed("doc", "doc_a").withColumnRenamed("sh", "sh_a"), Seq("doc_a"))
      .join(sets.withColumnRenamed("doc", "doc_b").withColumnRenamed("sh", "sh_b"), Seq("doc_b"))
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** Shingle-set + minhash-signature sketch of (id, text) → (doc, sh, sig),
    * eagerly materialized (checkpoint) because every consumer (banding and
    * both verify-join sides) would otherwise race to recompute it — the
    * rationale and the fused-vs-declarative path choice are documented at
    * the [[minhashLsh]] call site they were extracted from. */
  private def minhashSketch(
      df: DataFrame, id: String, text: String,
      shingleK: Int, numHashes: Int,
      tokenHash: Column => Column,
      reliableCheckpoint: Boolean): DataFrame = {
    val fusedKind =
      if (tokenHash eq murmurHash) Some("murmur")
      else if (tokenHash eq md5Hash28) Some("md5_28")
      else None // md5_64 overflows the 31-polynomial roll (ANSI rejects it
                // in the declarative path too) — not a valid shingle hash
    val base = fusedKind match {
      case Some(kind) =>
        val e = graft.exts.ShingleMinhash(
          org.apache.spark.sql.GraftSqlBridge.expression(col(text)),
          shingleK, kind, minhashParams(numHashes, 42L), MinhashPrime)
        scatter(df)
          .select(col(id).as("doc"),
            org.apache.spark.sql.GraftSqlBridge.column(e).as("s"))
          .select(col("doc"), col("s.sh").as("sh"), col("s.sig").as("sig"))
          .filter(size(col("sh")) > 0)
      case None =>
        scatter(df)
          .select(col(id).as("doc"),
            shingleHashSet(tokens(col(text)), shingleK, tokenHash).as("sh"))
          .filter(size(col("sh")) > 0)
          .withColumn("sig", minhashSignature(col("sh"), numHashes))
    }
    if (reliableCheckpoint) {
      require(df.sparkSession.sparkContext.getCheckpointDir.isDefined,
        "reliableCheckpoint=true requires sparkContext.setCheckpointDir(...)")
      base.checkpoint()
    } else base.localCheckpoint()
  }

  /** Explode a sketch's signature into (doc, band, bucket) rows — the slim
    * LSH shuffle payload ([[minhashLsh]] explains why the bucket key is the
    * band itself, not a re-hash). */
  private def bandSignature(sketched: DataFrame, bands: Int, rows: Int): DataFrame =
    sketched.select(
      col("doc"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => slice(col("sig"), b * rows + 1, lit(rows)))).as(Seq("band", "bucket")))

  /** Benchmark/test-set decontamination: drop every corpus document that
    * exactly or near-duplicates ANY blocklist document — the step an LLM
    * training pipeline runs between eval-set construction and training.
    *
    * Two bucketed stages (never corpus × blocklist):
    *
    *  1. EXACT: md5 of the normalized token stream, removed with a
    *     broadcast-friendly left-anti join (the blocklist — an eval set —
    *     is tiny next to a training corpus; Catalyst broadcasts its
    *     distinct key set and the corpus never shuffles).
    *  2. NEAR: the [[minhashLsh]] sketch on BOTH sides, band buckets
    *     cross-joined corpus×blocklist (only (band, bucket, id) rows in
    *     the join), candidates verified on true shingle-set Jaccard, and
    *     survivors of stage 1 with jaccard >= threshold anti-joined out.
    *
    * At 100 TB the corpus-side cost is one sketch pass + one slim bucket
    * shuffle — identical to self-dedup — while the blocklist side stays
    * broadcast-sized end to end. Returns the cleaned corpus with its
    * original columns. */
  def decontaminate(
      corpus: DataFrame,
      id: String,
      text: String,
      blocklist: DataFrame,
      blockText: String,
      shingleK: Int = 3,
      numHashes: Int = 32,
      bands: Int = 8,
      threshold: Double = 0.7,
      tokenHash: Column => Column = murmurHash,
      reliableCheckpoint: Boolean = false): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands

    def contentKey(t: Column) = md5(concat_ws(" ", tokens(t)))
    val blockKeys = blocklist
      .select(contentKey(col(blockText)).as("__bkey")).distinct()
    val exactClean = corpus.join(blockKeys,
      contentKey(col(text)) === col("__bkey"), "left_anti")

    val cSketch = minhashSketch(exactClean, id, text, shingleK, numHashes,
      tokenHash, reliableCheckpoint)
    val bSketch = minhashSketch(blocklist.select(
        monotonically_increasing_id().as("__bid"), col(blockText).as("__btext")),
      "__bid", "__btext", shingleK, numHashes, tokenHash, reliableCheckpoint)

    val cBand = bandSignature(cSketch, bands, rows)
    val bBand = bandSignature(bSketch, bands, rows)
      .withColumnRenamed("doc", "bdoc")
    val candidates = cBand
      .join(bBand, Seq("band", "bucket"))
      .select(col("doc"), col("bdoc"))
      .dropDuplicates("doc", "bdoc")

    val contaminated = candidates
      .join(cSketch.select(col("doc"), col("sh").as("sh_c")), Seq("doc"))
      .join(bSketch.select(col("doc").as("bdoc"), col("sh").as("sh_b")), Seq("bdoc"))
      .filter(
        size(array_intersect(col("sh_c"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_c"), col("sh_b"))) >= threshold)
      .select(col("doc")).distinct()

    exactClean.join(contaminated, exactClean(id) === contaminated("doc"), "left_anti")
  }

  /** N-gram overlap decontamination — the GPT-3/PaLM-style "13-gram
    * collision" benchmark test: a corpus document is removed when it
    * shares ANY n-token shingle with the blocklist (far stricter than
    * whole-document or jaccard matching — one leaked benchmark sentence
    * inside a long web page is enough). Documents shorter than n tokens
    * fall back to whole-token-stream matching on both sides
    * ([[shingles]]' rule), so short items still decontaminate.
    *
    * SCALE: grams ship as md5 digests — the corpus side of the gram join
    * is a slim (id, digest) stream, never text; the blocklist side is
    * |bench|·len distinct digests (broadcast-sized for real benchmark
    * suites); the hit-id set is small → the final anti-join is
    * AQE-broadcastable. Exact (digest equality ⟺ gram equality modulo
    * md5 collision), fully oracle-replayable. */
  def decontaminateNgrams(
      corpus: DataFrame,
      id: String,
      text: String,
      blocklist: DataFrame,
      blockText: String,
      n: Int = 13): DataFrame = {
    require(n >= 1, "n must be >= 1")
    def grams(t: Column) = transform(shingles(tokens(t), n), g => md5(g.cast("binary")))
    val bg = blocklist.select(explode(grams(col(blockText))).as("__g")).distinct()
    val cg = corpus.select(col(id).as("__cid"), explode(grams(col(text))).as("__g"))
    val hit = cg.join(bg, "__g").select(col("__cid")).distinct()
    corpus.join(hit, corpus(id) === hit("__cid"), "left_anti")
  }

  /** Exact decontamination against a blocklist too large to broadcast —
    * the 10⁹-key benchmark-contamination case. A Bloom filter built over
    * the blocklist's content keys (driver-side bits, `fpp` sized) rides
    * to every task; only the bloom-POSITIVE slice — true matches plus an
    * `fpp` fraction of false positives — ever shuffles (as slim
    * (id, key) pairs, never document text), and a semi-join against the
    * real key set verifies every candidate, so the RESULT is exact: the
    * bloom can only let a non-contaminated row into the verify stage,
    * never drop a contaminated one. The final anti-join on the verified
    * id set is AQE-broadcastable (contaminated sets are small).
    *
    * Versus [[decontaminate]]'s exact stage (anti-join on the key): this
    * trades one extra corpus scan (map-side, column-pruned) for removing
    * the corpus-wide key shuffle — the right trade once row count ×
    * key width dwarfs `fpp` × corpus. Same content-key definition, same
    * exact semantics, same oracle. */
  def decontaminateExactBloom(
      corpus: DataFrame,
      id: String,
      text: String,
      blocklist: DataFrame,
      blockText: String,
      expectedItems: Long = 0L,
      fpp: Double = 0.01): DataFrame = {
    require(fpp > 0 && fpp < 1, "fpp must be in (0, 1)")
    def contentKey(t: Column) = md5(concat_ws(" ", tokens(t)))
    val keys = blocklist.select(contentKey(col(blockText)).as("__bkey")).distinct()
    // |blocklist|-bounded driver work: one count (skippable via
    // expectedItems) and the bloom bits themselves
    val n = if (expectedItems > 0) expectedItems else math.max(1L, keys.count())
    // floor the sizing: tiny n × loose fpp can compute to 0 bits, which
    // the aggregate rejects
    val numBits = math.max(64L,
      org.apache.spark.util.sketch.BloomFilter.optimalNumOfBits(n, fpp))
    val bloom = keys.stat.bloomFilter("__bkey", n, numBits)
    val bc = corpus.sparkSession.sparkContext.broadcast(bloom)
    val might = udf((k: String) => k != null && bc.value.mightContainString(k))
    val cands = corpus
      .select(col(id).as("__cid"), contentKey(col(text)).as("__ck"))
      .filter(might(col("__ck")))
    val contaminatedIds = cands
      .join(keys, cands("__ck") === keys("__bkey"), "left_semi")
      .select(col("__cid")).distinct()
    corpus.join(contaminatedIds, corpus(id) === contaminatedIds("__cid"), "left_anti")
  }

  /** Exact pairwise n-gram Jaccard within a blocking key (e.g. language or
    * length bucket) — the verify-everything baseline for small blocks. */
  def ngramJaccardPairs(
      df: DataFrame,
      id: String,
      text: String,
      blockBy: Column,
      n: Int = 3,
      threshold: Double = 0.5): DataFrame = {
    val docs = scatter(df).select(col(id).as("doc"), blockBy.as("block"),
      shingleHashSet(tokens(col(text)), n).as("sh"))
    val l = docs.select(col("block"), col("doc").as("doc_a"), col("sh").as("sh_a"))
    val r = docs.select(col("block"), col("doc").as("doc_b"), col("sh").as("sh_b"))
    l.join(r, Seq("block"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** 64-bit SimHash of the token multiset: per-token xxhash64, each of the
    * 64 bit-lanes accumulates ±1, sign vector re-packed into a bigint.
    * Near-dups = signatures within small Hamming distance; candidate pairs
    * via b-bit band buckets like minhash. */
  def simhash(toks: Column, tokenHash: Column => Column = t => xxhash64(t)): Column = {
    val lanes = aggregate(
      transform(toks, tokenHash),
      array_repeat(lit(0L), 64),
      (acc, h) => zip_with(acc, sequence(lit(0), lit(63)),
        (a, b) => a + when(call_function("shiftright", h, b).bitwiseAND(1L) === 1L, 1L).otherwise(-1L)))
    aggregate(
      zip_with(lanes, sequence(lit(0), lit(63)),
        (v, b) => when(v > 0, call_function("shiftleft", lit(1L), b)).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  /** SimHash near-dup pairs: bucket on 16-bit quadrants of the signature
    * (any pair within Hamming distance 3 of 64 shares ≥1 exact quadrant). */
  def simhashPairs(df: DataFrame, id: String, text: String, maxHamming: Int = 3,
      tokenHash: Column => Column = t => xxhash64(t)): DataFrame = {
    val sigs = scatter(df).select(col(id).as("doc"), simhash(tokens(col(text)), tokenHash).as("sig"))
    val banded = sigs.select(col("doc"), col("sig"),
      posexplode(transform(sequence(lit(0), lit(3)),
        q => call_function("shiftright", col("sig"), q * 16).bitwiseAND(0xFFFFL))).as(Seq("q", "bucket")))
    val l = banded.select(col("q"), col("bucket"), col("doc").as("doc_a"), col("sig").as("sig_a"))
    val r = banded.select(col("q"), col("bucket"), col("doc").as("doc_b"), col("sig").as("sig_b"))
    l.join(r, Seq("q", "bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
  }

  /** Connected components over an undirected edge list — turns pairwise
    * near-duplicate evidence ([[minhashLsh]]/[[simhashPairs]]/
    * [[ngramJaccardPairs]] output) into duplicate CLUSTERS, which is what a
    * keep-one-per-group dedup actually needs (pair-at-a-time removal drops
    * too much: in a chain a–b, b–c, removing both "b of a–b" and "c of b–c"
    * loses c even though only one of the three should go).
    *
    * Algorithm: alternating large-star / small-star (Kiveris et al.,
    * "Connected Components in MapReduce and Beyond", SoCC'14) — converges
    * in O(log² n) rounds on any graph, each round two hash-partitioned
    * aggregations plus an equi-join on the node id. Unlike label
    * propagation (O(diameter) rounds) or GraphX/pregel (RDD-based, no
    * AQE/codegen), this stays a pure DataFrame plan; unlike
    * groupBy+collect_set formulations, the per-node neighborhood is never
    * materialized — a hub node with 10M neighbors costs a min() aggregate,
    * not a 10M-element array in one task. Per-round results are
    * checkpointed (lineage truncation is what makes iteration viable;
    * `reliableCheckpoint=true` for multi-hour cluster jobs, same contract
    * as [[minhashLsh]]).
    *
    * Returns (id, component) for every node appearing in `edges`, where
    * component = the minimum node id of the component (deterministic,
    * engine-independent — reproducible in any engine for oracle checks).
    * Node ids may be any orderable type (long, string, …); self-loops and
    * duplicate/reversed edges are tolerated. */
  def connectedComponents(
      edges: DataFrame,
      src: String,
      dst: String,
      maxIter: Int = 30,
      reliableCheckpoint: Boolean = false): DataFrame = {
    def ckpt(df: DataFrame): DataFrame =
      if (reliableCheckpoint) df.checkpoint() else df.localCheckpoint()
    // checksum action per round: (edge count, xor of row hashes) — xor
    // cannot overflow (sum would, and under ANSI mode would throw) and the
    // edge set is distinct, so set equality ⇔ checksum equality up to
    // 64-bit collision odds; count equality guards the trivial collisions
    def chk(df: DataFrame): (Long, Long) = {
      val r = df.agg(
        count(lit(1)),
        coalesce(call_function("bit_xor", xxhash64(col("u"), col("v"))), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }
    // normalize: big→small direction, no self-loops, distinct
    var e = ckpt(edges
      .filter(col(src).isNotNull && col(dst).isNotNull && col(src) =!= col(dst))
      .select(greatest(col(src), col(dst)).as("u"), least(col(src), col(dst)).as("v"))
      .distinct())
    var prev = chk(e)
    var iter = 0
    var converged = prev._1 == 0L
    while (!converged && iter < maxIter) {
      // large-star: every node u links its LARGER neighbors v to
      // m(u) = min(Γ(u) ∪ {u}); m ≤ u < v keeps edges big→small
      val nbrs = e.union(e.select(col("v").as("u"), col("u").as("v")))
      val mins = nbrs.groupBy("u").agg(min("v").as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      val large = nbrs.join(mins, "u").filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v")).distinct()
      // small-star: on the big→small edge set, every node u re-links its
      // smaller neighborhood (and itself) to its minimum
      val mins2 = large.groupBy("u").agg(min("v").as("m"))
      val small = large.join(mins2, "u")
        .select(col("v").as("u"), col("m").as("v"))
        .union(mins2.select(col("u"), col("m").as("v")))
        .filter(col("u") =!= col("v")).distinct()
      e = ckpt(small)
      val cur = chk(e)
      converged = cur == prev
      prev = cur
      iter += 1
    }
    require(converged,
      s"connectedComponents did not converge in $maxIter rounds — raise maxIter")
    // at the fixpoint the edge set is a union of stars centered at each
    // component's min: non-roots appear exactly once as u, roots only as v
    e.select(col("u").as("id"), col("v").as("component"))
      .union(e.select(col("v").as("id"), col("v").as("component")))
      .distinct()
  }

  /** Near-duplicate clusters for every document: [[minhashLsh]] pairs →
    * [[connectedComponents]] → (id, cluster) where cluster = min doc id of
    * the duplicate group and singletons map to themselves. */
  def nearDupClusters(
      df: DataFrame,
      id: String,
      text: String,
      shingleK: Int = 3,
      numHashes: Int = 32,
      bands: Int = 8,
      threshold: Double = 0.7,
      tokenHash: Column => Column = murmurHash,
      reliableCheckpoint: Boolean = false): DataFrame = {
    val pairs = minhashLsh(df, id, text, shingleK, numHashes, bands, threshold,
      tokenHash, reliableCheckpoint)
    val cc = connectedComponents(pairs, "doc_a", "doc_b",
        reliableCheckpoint = reliableCheckpoint)
      .select(col("id").as("__cc_id"), col("component").as("__cc_comp"))
    df.join(cc, df(id) === cc("__cc_id"), "left")
      .select(df.columns.map(col) :+
        coalesce(col("__cc_comp"), df(id)).as("cluster"): _*)
  }

  /** Cluster-aware near-dedup: keep exactly ONE document per near-duplicate
    * cluster (the minimum id — deterministic and retry-stable), all
    * original columns preserved. This is the transitive-closure-correct
    * version of pairwise removal: a chain a–b–c keeps a alone, never
    * drops the whole chain. */
  def nearDedup(
      df: DataFrame,
      id: String,
      text: String,
      shingleK: Int = 3,
      numHashes: Int = 32,
      bands: Int = 8,
      threshold: Double = 0.7,
      tokenHash: Column => Column = murmurHash,
      reliableCheckpoint: Boolean = false): DataFrame = {
    val clustered = nearDupClusters(df, id, text, shingleK, numHashes, bands,
      threshold, tokenHash, reliableCheckpoint)
    clustered.filter(col("cluster") === col(id)).drop("cluster")
  }

  /** Embedding near-duplicate pairs: cosine >= threshold, LSH-bucketed by
    * random-hyperplane sign bits so the join is bucket-local. */
  def embeddingNearDups(
      df: DataFrame,
      id: String,
      vec: String,
      planes: Int = 8,
      threshold: Double = 0.95,
      seed: Long = 7L): DataFrame = {
    val withBucket = df.select(col(id).as("doc"), col(vec).as("v"))
      .withColumn("bucket", Similarity.hyperplaneBucket(col("v"), planes, seed))
    val l = withBucket.select(col("bucket"), col("doc").as("doc_a"), col("v").as("v_a"))
    val r = withBucket.select(col("bucket"), col("doc").as("doc_b"), col("v").as("v_b"))
    l.join(r, Seq("bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("cosine", Similarity.cosine(col("v_a"), col("v_b")))
      .filter(col("cosine") >= threshold)
      .select("doc_a", "doc_b", "cosine")
  }

  /** SemDeDup-style semantic duplicate pairs (reference near-dup family,
    * ibis has no counterpart — Abbas et al. 2023 is the public recipe):
    * assign every embedding to its nearest k-means centroid cell
    * (map-side; the centroids are plan literals, trained in-engine by
    * Similarity.kmeans), then compare cosine only WITHIN a cell. The
    * cells bound the quadratic pair step exactly like LSH bands do for
    * minhash — the shuffle carries (cell, id, vec) once and each task
    * joins one cell locally; no all-pairs product ever forms. Recall is
    * governed by k (more cells = faster, more boundary misses) — the
    * standard SemDeDup trade, documented here rather than hidden. */
  def semanticDupPairs(
      df: DataFrame,
      id: String,
      vec: String,
      centroids: Seq[Seq[Double]],
      threshold: Double = 0.95): DataFrame = {
    val withCell = df.select(col(id).as("doc"), col(vec).as("v"))
      .withColumn("cell", Similarity.cellOf(col("v"), centroids))
    val l = withCell.select(col("cell"), col("doc").as("doc_a"), col("v").as("v_a"))
    val r = withCell.select(col("cell"), col("doc").as("doc_b"), col("v").as("v_b"))
    l.join(r, Seq("cell"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("cosine", Similarity.cosine(col("v_a"), col("v_b")))
      .filter(col("cosine") >= threshold)
      .select("doc_a", "doc_b", "cosine")
  }

  /** Semantic dedup: [[semanticDupPairs]] closed into connected components
    * (pairs are within-cell, but a chain a–b–c where only a–b and b–c
    * clear the threshold is still ONE duplicate group — the closure keeps
    * a alone instead of dropping the whole chain), keep each group's
    * minimum id. Returns the kept rows with all original columns. */
  def semanticDedup(
      df: DataFrame,
      id: String,
      vec: String,
      centroids: Seq[Seq[Double]],
      threshold: Double = 0.95): DataFrame = {
    val pairs = semanticDupPairs(df, id, vec, centroids, threshold)
    val cc = connectedComponents(pairs, "doc_a", "doc_b")
      .select(col("id").as("__cc_id"), col("component").as("__cc_comp"))
    df.join(cc, df(id) === cc("__cc_id"), "left")
      .filter(col("__cc_comp").isNull || col("__cc_comp") === df(id))
      .drop("__cc_id", "__cc_comp")
  }

  /** Paragraph/segment-level exact dedup (the RefinedWeb/FineWeb "remove
    * repeated boilerplate paragraphs corpus-wide" step): split every
    * document on `sepRegex`, keep only the FIRST occurrence of each
    * normalized segment across the whole corpus (first = smallest
    * (id, position) — deterministic and retry-stable), and reassemble
    * each document from its surviving segments in order.
    *
    * Scale shape: posexplode is map-side; the keep-first decision is ONE
    * hash aggregation on the segment key (min_by partial aggregates — no
    * global window, same plan as [[exact]]); re-assembly is one shuffle
    * back on the document id. Segment text itself crosses the wire only
    * for winning segments (the keeper join carries (key, id, pos)).
    *
    * Returns one row per input document: (id, text = deduped rejoin with
    * `joiner`, n_segments, n_kept). Documents whose every segment was
    * seen earlier come back with text = '' and n_kept = 0 — filtering
    * them out is the caller's policy decision. */
  def segmentDedup(
      df: DataFrame,
      id: String,
      text: String,
      sepRegex: String = "\\n{2,}",
      joiner: String = "\n\n"): DataFrame = {
    val segs = df
      .select(col(id).as("__id"), posexplode(split(col(text), sepRegex)).as(Seq("__pos", "__seg")))
      .withColumn("__key", md5(lower(trim(col("__seg")))))
    // one aggregation finds each key's first (id, pos); a segment survives
    // iff it IS its key's winner
    val winners = segs.groupBy(col("__key"))
      .agg(min(struct(col("__id"), col("__pos"))).as("__w"))
      .select(col("__key"), col("__w.__id").as("__wid"), col("__w.__pos").as("__wpos"))
    val kept = segs.join(winners, Seq("__key"))
      .filter(col("__id") === col("__wid") && col("__pos") === col("__wpos"))
    val rebuilt = kept.groupBy(col("__id"))
      .agg(
        count(lit(1)).as("n_kept"),
        array_join(transform(sort_array(collect_list(struct(col("__pos"), col("__seg")))),
          s => s.getField("__seg")), joiner).as("__text"))
    df.select(col(id).as("__id"),
        size(split(col(text), sepRegex)).as("n_segments"))
      .join(rebuilt, Seq("__id"), "left")
      .select(col("__id").as(id),
        coalesce(col("__text"), lit("")).as(text),
        col("n_segments"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
  }

  // ------------------------------------ cross-document repeated-span removal

  /** Token spans covered by w-token windows that recur across documents —
    * the exact-substring dedup signal of Lee et al. 2022 ("Deduplicating
    * Training Data Makes Language Models Better"), at token-window
    * granularity: any `w`-token window whose hash occurs in ≥ `minDocs`
    * DISTINCT documents marks its tokens as duplicated; overlapping and
    * adjacent duplicated windows merge into maximal spans.
    *
    * Returns one row per document that has at least one duplicated window:
    * (id, spans) where spans is a sorted array of struct(s, e) half-open
    * 0-based token intervals.
    *
    * SCALE: windows are a map-side posexplode (one row per token, like the
    * shingle stage); the duplicate-key cut is ONE hash aggregation on the
    * window hash (count-distinct over doc ids — bounded by minDocs
    * semantics, no doc list materialized); the join back ships only
    * (key, id, start) for windows that survive the cut; span-merge is a
    * per-document fold after a groupBy on id. No window function over the
    * corpus, no cross product — three hash exchanges total, all on keys
    * AQE can split. */
  def repeatedSpans(
      df: DataFrame,
      id: String,
      text: String,
      w: Int,
      minDocs: Int = 2,
      windowHash: Column => Column = t => xxhash64(t)): DataFrame = {
    require(w >= 1, "window must be >= 1 token")
    require(minDocs >= 2, "minDocs must be >= 2")
    val keys = graft.functions.ibisfn.let1(tokens(col(text))) { ts =>
      // guard BEFORE sequence(): sequence(0, k) runs DESCENDING for k < 0
      when(size(ts) < w, array().cast("array<long>")).otherwise(
        transform(sequence(lit(0), size(ts) - w),
          i => windowHash(concat_ws(" ", slice(ts, i + 1, lit(w))))))
    }
    val wins = df.select(col(id).as("__id"), posexplode(keys).as(Seq("__start", "__key")))
    val dupKeys = wins.groupBy("__key")
      .agg(countDistinct(col("__id")).as("__docs"))
      .filter(col("__docs") >= minDocs)
      .select("__key")
    val emptySpans = array().cast("array<struct<s:int,e:int>>")
    wins.join(dupKeys, Seq("__key"))
      .groupBy(col("__id"))
      .agg(sort_array(collect_set(col("__start"))).as("__starts"))
      .select(col("__id").as(id),
        aggregate(col("__starts"), emptySpans, (acc, st) =>
          when(size(acc) === 0, array(struct(st.as("s"), (st + lit(w)).as("e"))))
            .otherwise(graft.functions.ibisfn.let1(element_at(acc, size(acc))) { last =>
              when(last.getField("e") >= st,
                concat(slice(acc, lit(1), size(acc) - 1),
                  array(struct(last.getField("s").as("s"),
                    greatest(last.getField("e"), st + lit(w)).as("e")))))
                .otherwise(concat(acc, array(struct(st.as("s"), (st + lit(w)).as("e")))))
            })
            // aggregate() requires merge-type == zero-type exactly
            .cast("array<struct<s:int,e:int>>")).as("spans"))
  }

  /** Remove cross-document repeated spans from each document (see
    * [[repeatedSpans]]): every token covered by a duplicated window is
    * dropped, the remainder re-joined with single spaces. Adds
    * `clean_text` and `n_removed_tokens`; all input columns are kept and
    * every input row comes back (documents with no duplicated window keep
    * their token stream verbatim in `clean_text`).
    *
    * Note clean_text is rebuilt from the LOWERCASED token stream (the same
    * normalization the window keys use — [[tokens]]); callers who need
    * original casing preserved should map spans back themselves. */
  def stripRepeatedSpans(
      df: DataFrame,
      id: String,
      text: String,
      w: Int,
      minDocs: Int = 2,
      windowHash: Column => Column = t => xxhash64(t)): DataFrame = {
    val spans = repeatedSpans(df, id, text, w, minDocs, windowHash)
      .withColumnRenamed(id, "__sid")
    val emptySpans = array().cast("array<struct<s:int,e:int>>")
    df.join(spans, df(id) === spans("__sid"), "left")
      .drop("__sid")
      .withColumn("__ts", tokens(col(text)))
      .withColumn("__kept", graft.functions.ibisfn.let1(coalesce(col("spans"), emptySpans)) { sp =>
        filter(col("__ts"), (t, j) =>
          !exists(sp, x => x.getField("s") <= j && j < x.getField("e")))
      })
      .withColumn("clean_text", concat_ws(" ", col("__kept")))
      .withColumn("n_removed_tokens", (size(col("__ts")) - size(col("__kept"))).cast("long"))
      .drop("spans", "__ts", "__kept")
  }
}
