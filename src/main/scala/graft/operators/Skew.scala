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
    * key spreads over `buckets` reducers. Build-side blowup is ×buckets —
    * use for large-but-not-broadcastable build sides; if the build side
    * fits in memory, `broadcast()` beats salting outright. */
  def saltedJoin(
      probe: DataFrame, build: DataFrame,
      probeKey: String, buildKey: String,
      buckets: Int, how: String = "inner"): DataFrame = {
    val salted = probe.withColumn("__salt", (rand(42L) * buckets).cast("int"))
    val replicated = build.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted
      .join(replicated,
        salted(probeKey) === replicated(buildKey) && salted("__salt") === replicated("__salt"),
        how)
      .drop("__salt")
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
}
