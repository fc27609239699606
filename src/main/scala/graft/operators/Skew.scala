package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys at cluster scale (SURVEY.md "Optimize for
  * scale": skewed keys → salting or AQE skew-join).
  *
  * AQE's skew-join handles most cases by splitting oversized partitions at
  * runtime — prefer it (it's on in our session builders). Explicit salting
  * remains necessary when (a) a single join key is so hot that even split
  * partitions hold one un-splittable key group, or (b) an aggregation has a
  * hot group key (AQE cannot split a hash-agg group).
  */
object Skew {

  /** Salted equi-join: the probe (large, skewed) side gets a uniform random
    * salt in [0, buckets); the build side is replicated `buckets` times with
    * an exploded salt column; the join key becomes (key, salt) so one hot
    * key spreads over `buckets` reducers.
    *
    * SCALE GUARD: salting is the LAST resort for join skew, not the first.
    * AQE's skew-join split plus a broadcastable build side already eliminate
    * the common cases, and replicating the build ×buckets is pure overhead
    * there — the SF100 control pair measured the salted plan 13× slower than
    * the plain join on a deliberate 90%-hot key (BENCH_LARGE.md). So this
    * helper bails out to a plain join whenever Catalyst's size estimate says
    * the build side fits the broadcast threshold (the planner then picks a
    * broadcast join and no reducer ever sees the hot key). The salted path
    * remains for the genuinely pathological shape: a hot key against a
    * build side too big to broadcast. For aggregation skew — which AQE
    * cannot split — use [[saltedAgg]]. */
  def saltedJoin(
      probe: DataFrame, build: DataFrame,
      probeKey: String, buildKey: String,
      buckets: Int, how: String = "inner"): DataFrame = {
    val threshold = probe.sparkSession.conf
      .get("spark.sql.autoBroadcastJoinThreshold", "10485760") match {
        case "-1" => -1L
        case s    => org.apache.spark.network.util.JavaUtils.byteStringAsBytes(s)
      }
    val estimate = build.queryExecution.optimizedPlan.stats.sizeInBytes
    val fitsBroadcast =
      if (threshold < 0) false
      else if (estimate <= threshold) true
      else {
        // Catalyst's estimate for a filtered scan is file-size based and
        // can run orders of magnitude high (the round-4 bench caught the
        // guard missing a 1000-row build side under a 2 GB scan estimate).
        // One count() job settles it — trivial next to the ×buckets
        // build-side explosion a wrong salting choice costs (measured 17×
        // slower than the plain broadcast join at SF100).
        val rowWidth = build.schema.map(_.dataType.defaultSize + 8).sum + 16L
        build.count() * rowWidth <= threshold
      }
    if (fitsBroadcast)
      // explicit hint: the same bad stats that inflated the estimate would
      // otherwise push the planner to a shuffle join
      probe.join(broadcast(build), probe(probeKey) === build(buildKey), how)
    else {
      val salted = probe.withColumn("__salt", (rand(42L) * buckets).cast("int"))
      val replicated = build.withColumn("__salt",
        explode(sequence(lit(0), lit(buckets - 1))))
      salted
        .join(replicated,
          salted(probeKey) === replicated(buildKey) && salted("__salt") === replicated("__salt"),
          how)
        .drop("__salt")
    }
  }

  /** Two-phase aggregation for hot group keys: phase 1 aggregates on
    * (key, salt) — spreading a hot key over `buckets` partial groups —
    * phase 2 merges the partials on key alone. Caller supplies the partial
    * and final agg columns (they differ for non-decomposable metrics:
    * count → sum of partial counts, avg → sum/sum, …). */
  def saltedAgg(
      df: DataFrame, keys: Seq[String], buckets: Int,
      partial: Seq[Column], merge: Seq[Column]): DataFrame = {
    val keyCols = keys.map(col)
    df.withColumn("__salt", (rand(42L) * buckets).cast("int"))
      .groupBy((keyCols :+ col("__salt")): _*)
      .agg(partial.head, partial.tail: _*)
      .groupBy(keyCols: _*)
      .agg(merge.head, merge.tail: _*)
  }

  /** Measure-before-mitigating: the top-k hottest values of a (join or
    * group) key column with approximate counts, in ONE pass with bounded
    * memory — the Misra-Gries sketch ships ≤`capacity` counters per
    * partition instead of shuffling the key universe. Counts undercount by
    * at most n/(capacity+1); a key that matters at skew scale dwarfs that
    * bound. Use the result to decide: hot key fits broadcast? → plain
    * join; hot GROUP key? → [[saltedAgg]]; un-splittable joint hot key
    * against a beyond-broadcast build? → [[saltedJoin]]. */
  def hotKeys(df: DataFrame, key: Column, k: Int, capacity: Int = 4096): DataFrame = {
    require(k > 0 && capacity >= k, "need k > 0 and capacity >= k")
    val mg = udaf(graft.functions.Udfs.misraGries(capacity))
    df.select(key.cast("string").as("__k"))
      .agg(mg(col("__k")).as("__hh"))
      .select(explode(col("__hh")).as(Seq("key", "approx_count")))
      .orderBy(col("approx_count").desc, col("key").asc)
      .limit(k)
  }
}
