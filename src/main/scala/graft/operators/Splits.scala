package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset splitting, sampling, and ordering for training-data pipelines:
  * hash-based train/val/test assignment, deterministic stratified sampling,
  * and seeded corpus shuffling.
  *
  * Everything here is DETERMINISTIC given (id, seed): the randomness source
  * is an md5-derived unit-interval hash of the row id, not `rand()`. That is
  * the property a 100 TB pipeline actually needs — re-running a stage (or
  * recomputing a lost partition on a real cluster) must assign every row to
  * the same split/sample/position, and `rand()` guarantees neither across
  * retries nor across engines. md5 also makes every operator here
  * oracle-checkable in any engine (cf. ibis Table.sample / the reference's
  * `random()`-filter semantics at expr/types/relations.py — same shape, but
  * seeded-stable by construction).
  *
  * All operators are map-side only (no shuffle) except [[shuffled]], which
  * is one range-partitioned sort — exactly the cost a global reshuffle must
  * pay. */
object Splits {

  /** Unit-interval hash in [0, 1): first 7 md5 hex chars of `"<seed>:<id>"`
    * over 16^7. 28 bits of resolution ≈ 4e-9 granularity — plenty for split
    * fractions; exactly representable as a double (no rounding divergence
    * across engines). */
  def hashUnit(id: Column, seed: Long): Column =
    conv(substring(md5(concat(lit(seed.toString), lit(":"),
      id.cast("string")).cast("binary")), 1, 7), 16, 10)
      .cast("double") / lit(268435456.0)

  /** Named-split assignment (train/val/test or any weighted partition):
    * adds `splitCol` with the name whose cumulative weight interval contains
    * `hashUnit(id, seed)`. Weights must be positive and sum to ~1.
    * Map-side, no shuffle; rows keep their partitions. */
  def assignSplit(
      df: DataFrame,
      id: Column,
      splits: Seq[(String, Double)],
      seed: Long,
      splitCol: String = "split"): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0), "weights must be positive")
    val total = splits.map(_._2).sum
    require(math.abs(total - 1.0) < 1e-9, s"weights must sum to 1, got $total")
    val u = hashUnit(id, seed)
    val cum = splits.scanLeft(0.0)(_ + _._2).tail
    // last bucket is the unconditional otherwise — no row can fall through
    // on cumulative float error
    val chain = splits.init.zip(cum.init).foldLeft(Option.empty[Column]) {
      case (acc, ((name, _), upper)) =>
        val cond = u < lit(upper)
        Some(acc.fold(when(cond, lit(name)))(_.when(cond, lit(name))))
    }
    val expr = chain.fold(lit(splits.last._1))(_.otherwise(lit(splits.last._1)))
    df.withColumn(splitCol, expr)
  }

  /** Deterministic stratified sample: keep a row iff
    * `hashUnit(id, seed) < fraction(stratum)`. Unlike Spark's `sampleBy`
    * (Bernoulli on `rand()`), membership is a pure function of (id, seed) —
    * stable under retries, recomputation, and engine changes — and the
    * realized fraction concentrates at the target by the same law of large
    * numbers. Strata absent from `fractions` fall back to `default`
    * (0 = drop). Map-side, no shuffle. */
  def stratifiedSample(
      df: DataFrame,
      id: Column,
      stratum: Column,
      fractions: Map[String, Double],
      seed: Long,
      default: Double = 0.0): DataFrame = {
    require((fractions.values ++ Seq(default)).forall(f => f >= 0 && f <= 1),
      "fractions must be in [0,1]")
    val u = hashUnit(id, seed)
    val frac = fractions.foldLeft(Option.empty[Column]) {
      case (acc, (k, f)) =>
        val cond = stratum === lit(k)
        Some(acc.fold(when(cond, lit(f)))(_.when(cond, lit(f))))
    }.fold(lit(default))(_.otherwise(lit(default)))
    df.filter(u < frac)
  }

  /** Seeded global shuffle: total-order sort by `(hashUnit(id, seed), id)`
    * — the id tiebreak makes the order total even if 28-bit keys collide.
    * This is the pretraining-loader "shuffle the corpus each epoch" step:
    * vary `seed` per epoch for a fresh permutation. One range-partitioned
    * sort (Spark samples key ranges, so output partitions stay balanced);
    * downstream writers consume partitions in order. */
  def shuffled(df: DataFrame, id: Column, seed: Long): DataFrame =
    df.orderBy(hashUnit(id, seed).asc, id.asc)

  /** Target-mixture downsampling: given desired corpus proportions (e.g.
    * web 0.6 / code 0.3 / books 0.1), compute the per-source keep rates
    * that realize the target mixture while keeping as much data as
    * possible, then sample deterministically. The binding source is the
    * one with the least data relative to its target weight — it is kept
    * whole (rate 1) and every other source is downsampled to match:
    * `rate_s = C·w_s / n_s` with `C = min_s n_s/w_s`. Sources absent from
    * `weights` are dropped.
    *
    * SCALE: one tiny groupBy (|sources| groups) collected to the driver to
    * derive the rates, then the same map-side (id, seed) hash filter as
    * [[stratifiedSample]] — retry/recompute-stable, no wide shuffle.
    * Returns the filtered frame plus a `rates` map for logging/oracles. */
  def mixtureSample(
      df: DataFrame,
      id: Column,
      source: Column,
      weights: Map[String, Double],
      seed: Long): (DataFrame, Map[String, Double]) = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "weights must be positive")
    val total = weights.values.sum
    val norm = weights.map { case (k, w) => k -> w / total }
    val counts = df.groupBy(source.cast("string").as("__src")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val missing = norm.keySet.filterNot(counts.contains)
    require(missing.isEmpty, s"no rows for mixture sources: ${missing.mkString(", ")}")
    val c = norm.map { case (k, w) => counts(k) / w }.min
    val rates = norm.map { case (k, w) => k -> math.min(1.0, c * w / counts(k)) }
    (stratifiedSample(df, id, source, rates, seed, default = 0.0), rates)
  }

  /** Epoch-sharded variant: assigns each row a shard (for N parallel loader
    * workers) plus its position key within the shard, without any global
    * sort — `shard = floor(u * n)`, sort within shard downstream. This is
    * the scale path when one total order is not required. */
  def shardAssign(df: DataFrame, id: Column, nShards: Int, seed: Long,
      shardCol: String = "shard"): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    df.withColumn(shardCol,
      least(floor(hashUnit(id, seed) * nShards), lit(nShards - 1L)).cast("int"))
  }

  /** Deterministic per-group cap: keep at most `k` rows per group — the
    * "cap documents per domain/source" mix-building step. The kept rows
    * are the k smallest `hashUnit(id, seed)` in each group (ties by id),
    * so the selection is seeded, retry-stable, and nested (a k=10 cap is
    * a subset of the same seed's k=20 cap).
    *
    * Scale shape: NOT a row_number window — a window funnels each hot
    * group through a single task (a 100M-row domain = one 100M-row
    * partition). Instead the k winners come from ONE hash aggregation
    * with the bounded mergeable top-k Aggregator (Udfs.topKMin): partial
    * buffers are ≤k per partition regardless of group size, then a slim
    * (group, id) winner set joins back to the input (broadcast when it
    * fits — |groups|·k rows). */
  def cappedPerGroup(
      df: DataFrame,
      id: String,
      group: Column,
      k: Int,
      seed: Long = 7L): DataFrame = {
    require(k > 0, "k must be positive")
    val topk = udaf(graft.functions.Udfs.topKMin(k))
    val winners = df
      .select(group.as("__g"), col(id).cast("long").as("__id"))
      .withColumn("__u", hashUnit(col("__id"), seed))
      .groupBy(col("__g"))
      .agg(topk(col("__u"), col("__id")).as("__w"))
      .select(explode(col("__w")).as("__p"))
      .select(col("__p._2").as("__kid"))
    df.join(winners, df(id).cast("long") === winners("__kid"), "left_semi")
  }

  /** Quantile-bucket assignment (quality bands, curriculum tiers, length
    * strata): adds `bucketCol` ∈ [0, n) with bucket boundaries at the
    * 1/n..(n-1)/n quantiles of `value`.
    *
    * The scale-correct shape: ONE aggregation computes the n−1 thresholds
    * (exact `percentile` by default — matches any engine's interpolated
    * quantile; `approx = true` switches to the t-digest sketch for
    * 100 TB inputs where exact percentile's per-group buffer is the
    * bottleneck), collected as plan literals, then a map-side when-chain
    * assigns buckets. `ntile(n)` gives the same bands only by globally
    * sorting the corpus in ONE task — the window trap this avoids.
    * Ties/duplicated thresholds degrade gracefully (empty buckets). */
  def bucketByQuantiles(
      df: DataFrame,
      value: Column,
      n: Int,
      bucketCol: String = "bucket",
      approx: Boolean = false): DataFrame = {
    require(n >= 2, "need at least 2 buckets")
    val probs = (1 until n).map(_.toDouble / n)
    val probsLit = array(probs.map(lit): _*)
    val v = value.cast("double")
    // aggregate over the double-cast value so the threshold row is
    // uniformly Array[Double] regardless of the input column's numeric
    // type (approx_percentile returns the INPUT type — a Float/Short
    // column would otherwise MatchError here)
    val thrCol =
      if (approx) approx_percentile(v, probsLit, lit(10000))
      else percentile(v, probsLit)
    val row = df.agg(thrCol.as("t")).head()
    require(!row.isNullAt(0),
      "bucketByQuantiles: no non-null values to compute quantile thresholds from")
    val thresholds = row.getSeq[Double](0)
    val expr = thresholds.zipWithIndex.foldLeft(Option.empty[Column]) {
      case (acc, (t, i)) =>
        val cond = v <= lit(t)
        Some(acc.fold(when(cond, lit(i)))(_.when(cond, lit(i))))
    }.fold(lit(n - 1))(_.otherwise(lit(n - 1)))
    df.withColumn(bucketCol, when(v.isNull, lit(null)).otherwise(expr))
  }

  // --------------------------- DSIR importance weights (hashed n-grams)

  /** Unigrams followed by bigrams of a token array — the DSIR feature set. */
  private[graft] def ngramFeatures(ts: Column): Column =
    graft.functions.ibisfn.let1(ts) { w =>
      concat(w,
        when(size(w) < 2, array().cast("array<string>")).otherwise(
          transform(sequence(lit(0), size(w) - 2),
            i => concat_ws(" ", element_at(w, i + 1), element_at(w, i + 2)))))
    }

  /** md5-derived feature-hash bucket in [0, buckets) — the engine-portable
    * sibling of [[hashUnit]] (`"<seed>:<gram>"`, first 7 hex chars). */
  private def gramBucket(g: Column, seed: Long, buckets: Int): Column =
    conv(substring(md5(concat(lit(seed.toString), lit(":"), g).cast("binary")), 1, 7), 16, 10)
      .cast("long") % buckets

  /** DSIR-style importance log-weights (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): score each document
    * by how much likelier its hashed n-gram features (unigrams + bigrams)
    * are under the TARGET distribution than under the RAW corpus
    * distribution:
    *
    *   logw(d) = Σ_g [ ln p̂_T(b(g)) − ln p̂_R(b(g)) ]
    *
    * where b() hashes grams into `buckets` buckets and both distributions
    * are Laplace-smoothed bucket frequencies — p̂(b) = (c_b + α)/(N + αB).
    * The target slice is the rows where `isTarget` holds (e.g. a trusted
    * in-domain subset); high logw = looks like the target.
    *
    * SCALE: ONE aggregation over the exploded gram stream (≤`buckets`
    * groups on the wire — the gram universe never shuffles as strings,
    * only its bucket ids), collected as a `buckets`-entry log-ratio array
    * of PLAN LITERALS; scoring is then a pure map-side ordered fold. Two
    * corpus scans total (stats + score), no wide join — the same
    * broadcast-a-tiny-model shape as bm25Score/unigramLogProb. */
  def dsirLogWeights(
      df: DataFrame,
      text: String,
      isTarget: Column,
      buckets: Int = 256,
      alpha: Double = 0.5,
      seed: Long = 11L,
      scoreCol: String = "dsir_logw"): DataFrame = {
    require(buckets > 0 && buckets <= 65536, "buckets must be in (0, 65536]")
    require(alpha > 0, "alpha must be positive (Laplace smoothing)")
    val ex = df.select(isTarget.cast("boolean").as("__t"),
        explode(ngramFeatures(Dedup.tokens(col(text)))).as("__g"))
      .select(col("__t"), gramBucket(col("__g"), seed, buckets).as("__b"))
    val rows = ex.groupBy("__b").agg(
        sum(when(col("__t"), 1L).otherwise(0L)).as("__tc"),
        count(lit(1)).as("__rc"))
      .collect()
    val tCnt = Array.fill(buckets)(0L)
    val rCnt = Array.fill(buckets)(0L)
    rows.foreach { r =>
      val b = r.getLong(0).toInt
      tCnt(b) = r.getLong(1); rCnt(b) = r.getLong(2)
    }
    val nT = tCnt.sum.toDouble
    val nR = rCnt.sum.toDouble
    require(nT > 0, "target slice has no grams to estimate from")
    // per-bucket log-ratio literals; ln of smoothed frequencies — the same
    // IEEE arithmetic an oracle engine reproduces from the same counts
    val lr = (0 until buckets).map { b =>
      math.log((tCnt(b) + alpha) / (nT + alpha * buckets)) -
        math.log((rCnt(b) + alpha) / (nR + alpha * buckets))
    }
    val lrArr = array(lr.map(lit): _*)
    val score = graft.functions.ibisfn.let1(ngramFeatures(Dedup.tokens(col(text)))) { gs =>
      aggregate(gs, lit(0.0),
        (acc, g) => acc + element_at(lrArr, (gramBucket(g, seed, buckets) + 1).cast("int")))
    }
    df.withColumn(scoreCol, score)
  }

  /** DSIR selection: Gumbel-top-`n` resampling over [[dsirLogWeights]] —
    * sample without replacement ∝ exp(logw/temperature) by taking the top
    * n of `logw/temperature + Gumbel(hashUnit(id, seed+1))` (the standard
    * Gumbel-top-k trick; temperature → 0 approaches deterministic top-n
    * by weight). Seeded and retry-stable like everything here. The
    * selection is one TakeOrdered (no global sort materialized). */
  def dsirSample(
      df: DataFrame,
      id: Column,
      text: String,
      isTarget: Column,
      n: Int,
      buckets: Int = 256,
      alpha: Double = 0.5,
      seed: Long = 11L,
      temperature: Double = 1.0): DataFrame = {
    require(n > 0, "n must be positive")
    require(temperature > 0, "temperature must be positive")
    val scored = dsirLogWeights(df, text, isTarget, buckets, alpha, seed)
    // clamp u away from 0: Spark's log(0) yields null, which would sort the
    // row to the end instead of giving it an extreme Gumbel draw
    val u = greatest(hashUnit(id, seed + 1), lit(1e-12))
    val gumbel = -log(-log(u))
    scored.orderBy((col("dsir_logw") / temperature + gumbel).desc, id.asc).limit(n)
  }
}
