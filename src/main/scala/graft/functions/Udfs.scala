package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** UDF surface mapping (SURVEY.md §2.4; reference ibis/expr/operations/udf.py):
  *
  *   - `@udf.scalar.builtin`  → the function already exists in Spark's
  *     catalog: call it with `expr(...)`/`call_function` — zero wrapper cost.
  *   - `@udf.scalar.python`   → a Scala closure `udf(...)`; the JVM closure
  *     is the fast path here (the reference needs Arrow batching only
  *     because its UDFs live in a Python worker process).
  *   - `@udf.agg`             → `Aggregator[IN, BUF, OUT]` registered via
  *     `functions.udaf` — distributed partial aggregation with an explicit
  *     mergeable buffer, the Spark-native equivalent of a custom reduction.
  *
  * The showcase Aggregator below computes SAMPLE excess kurtosis — an op the
  * reference's PySpark backend cannot compile (compilers/pyspark.py:73) —
  * with a single-pass, merge-anywhere central-moment buffer (Pébay's
  * pairwise-update formulas), i.e. it scales like any built-in agg: partial
  * buffers per partition, one shuffle to merge.
  */
object Udfs {

  /** Mergeable central-moment state: count, mean, and 2nd..4th central
    * moment sums. */
  final case class Moments(n: Long, mean: Double, m2: Double, m3: Double, m4: Double)

  private def mergeMoments(a: Moments, b: Moments): Moments = {
    if (a.n == 0) b
    else if (b.n == 0) a
    else {
      val na = a.n.toDouble; val nb = b.n.toDouble; val n = na + nb
      val d = b.mean - a.mean
      val d2 = d * d
      Moments(
        a.n + b.n,
        a.mean + d * nb / n,
        a.m2 + b.m2 + d2 * na * nb / n,
        a.m3 + b.m3 + d * d2 * na * nb * (na - nb) / (n * n) +
          3.0 * d * (na * b.m2 - nb * a.m2) / n,
        a.m4 + b.m4 + d2 * d2 * na * nb * (na * na - na * nb + nb * nb) / (n * n * n) +
          6.0 * d2 * (na * na * b.m2 + nb * nb * a.m2) / (n * n) +
          4.0 * d * (na * b.m3 - nb * a.m3) / n)
    }
  }

  /** Sample (bias-corrected, excess) kurtosis:
    * G2 = ((n+1)·g2 + 6)·(n-1)/((n-2)(n-3)) with g2 = n·m4/m2² − 3.
    * Null for n < 4 (the statistic is undefined). */
  val kurtosisSample: Aggregator[java.lang.Double, Moments, java.lang.Double] =
    new Aggregator[java.lang.Double, Moments, java.lang.Double] {
      def zero: Moments = Moments(0L, 0.0, 0.0, 0.0, 0.0)
      def reduce(buf: Moments, x: java.lang.Double): Moments =
        if (x == null) buf
        else mergeMoments(buf, Moments(1L, x.doubleValue(), 0.0, 0.0, 0.0))
      def merge(a: Moments, b: Moments): Moments = mergeMoments(a, b)
      def finish(m: Moments): java.lang.Double =
        if (m.n < 4 || m.m2 == 0.0) null
        else {
          val n = m.n.toDouble
          val g2 = n * m.m4 / (m.m2 * m.m2) - 3.0
          ((n + 1) * g2 + 6.0) * (n - 1) / ((n - 2) * (n - 3))
        }
      def bufferEncoder: Encoder[Moments] = Encoders.product[Moments]
      def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE
    }

  /** Mergeable co-moment state for correlation: counts, means, and the
    * centered sums Sxx/Syy/Sxy (Pébay pairwise updates — same shape as
    * [[Moments]], two variables). */
  final case class CoMoments(n: Long, mx: Double, my: Double,
      sxx: Double, syy: Double, sxy: Double)

  private def mergeCoMoments(a: CoMoments, b: CoMoments): CoMoments = {
    if (a.n == 0) b
    else if (b.n == 0) a
    else {
      val na = a.n.toDouble; val nb = b.n.toDouble; val n = na + nb
      val dx = b.mx - a.mx; val dy = b.my - a.my
      CoMoments(
        a.n + b.n,
        a.mx + dx * nb / n,
        a.my + dy * nb / n,
        a.sxx + b.sxx + dx * dx * na * nb / n,
        a.syy + b.syy + dy * dy * na * nb / n,
        a.sxy + b.sxy + dx * dy * na * nb / n)
    }
  }

  /** Sample Pearson correlation — ibis `Correlation(how="sample")`, which
    * the reference's PySpark backend REFUSES to compile
    * (compilers/pyspark.py:313-330 raises for how="sample"): r =
    * Sxy/√(Sxx·Syy), null for n < 2 or a zero-variance side. Pairs with a
    * null on either side are skipped (SQL CORR semantics). Single pass,
    * merge-anywhere buffer → partial aggregation + one shuffle, like any
    * built-in. */
  val corrSample: Aggregator[(java.lang.Double, java.lang.Double), CoMoments, java.lang.Double] =
    new Aggregator[(java.lang.Double, java.lang.Double), CoMoments, java.lang.Double] {
      def zero: CoMoments = CoMoments(0L, 0.0, 0.0, 0.0, 0.0, 0.0)
      def reduce(buf: CoMoments, xy: (java.lang.Double, java.lang.Double)): CoMoments =
        if (xy._1 == null || xy._2 == null) buf
        else mergeCoMoments(buf,
          CoMoments(1L, xy._1.doubleValue(), xy._2.doubleValue(), 0.0, 0.0, 0.0))
      def merge(a: CoMoments, b: CoMoments): CoMoments = mergeCoMoments(a, b)
      def finish(m: CoMoments): java.lang.Double =
        if (m.n < 2 || m.sxx == 0.0 || m.syy == 0.0) null
        else m.sxy / math.sqrt(m.sxx * m.syy)
      def bufferEncoder: Encoder[CoMoments] = Encoders.product[CoMoments]
      def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE
    }

  /** Misra-Gries heavy-hitter sketch over a string key column: a bounded
    * map of at most `capacity` counters, single pass, merge-anywhere — the
    * classic answer to "top tokens over 100 TB" when the key universe is
    * too large to shuffle (a groupBy(token) exchanges every distinct key;
    * this exchanges ≤ capacity counters per partition). Guarantees: every
    * key with true count > n/(capacity+1) is present, and each reported
    * count undercounts by at most n/(capacity+1). When capacity ≥ the
    * number of distinct keys the counts are EXACT — the regime the oracle
    * query pins; the error bound is spec-tested in the lossy regime.
    * Merge = pointwise sum, then decrement all by the (capacity+1)-largest
    * count and drop ≤0 (Agarwal et al.'s mergeable-summaries rule, which
    * preserves the error bound — a plain top-k truncation would not). */
  def misraGries(capacity: Int): Aggregator[String, Map[String, Long], Map[String, Long]] =
    new Aggregator[String, Map[String, Long], Map[String, Long]] {
      def zero: Map[String, Long] = Map.empty
      def reduce(buf: Map[String, Long], key: String): Map[String, Long] = {
        if (key == null) buf
        else buf.get(key) match {
          case Some(c) => buf.updated(key, c + 1)
          case None if buf.size < capacity => buf.updated(key, 1L)
          case None => // decrement-all: drop zeros, the arriving key is absorbed
            buf.map { case (k, c) => k -> (c - 1) }.filter(_._2 > 0)
        }
      }
      def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
        val summed = b.foldLeft(a) { case (m, (k, c)) => m.updated(k, m.getOrElse(k, 0L) + c) }
        if (summed.size <= capacity) summed
        else {
          val cut = summed.values.toSeq.sorted(Ordering[Long].reverse)(capacity)
          summed.map { case (k, c) => k -> (c - cut) }.filter(_._2 > 0)
        }
      }
      def finish(m: Map[String, Long]): Map[String, Long] = m
      def bufferEncoder: Encoder[Map[String, Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
      def outputEncoder: Encoder[Map[String, Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
    }

  /** Mergeable bounded top-k: keep the k smallest (key, id) pairs seen,
    * ties broken by id — the order-statistic primitive a per-group cap
    * needs WITHOUT a window (a window over a hot group funnels the whole
    * group through one task; this is an aggregation whose partial buffers
    * are bounded by k, so partials combine map-side and the hot group
    * costs k rows per partition, not its full size). Buffer kept sorted;
    * inserts into a full buffer that lose to the current max are O(1)
    * rejections. */
  def topKMin(k: Int): Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] =
    new Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
      private val ord = Ordering.Tuple2[Double, Long]
      def zero: Seq[(Double, Long)] = Vector.empty
      def reduce(buf: Seq[(Double, Long)], x: (Double, Long)): Seq[(Double, Long)] =
        if (buf.size < k) (buf :+ x).sorted(ord)
        else if (ord.lt(x, buf.last)) (buf.init :+ x).sorted(ord)
        else buf
      def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
        (a ++ b).sorted(ord).take(k)
      def finish(r: Seq[(Double, Long)]): Seq[(Double, Long)] = r
      def bufferEncoder: Encoder[Seq[(Double, Long)]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
      def outputEncoder: Encoder[Seq[(Double, Long)]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
    }

  /** Scalar closure UDF example (the `@udf.scalar.python` analogue):
    * URL-safe slug. Prefer built-in functions when one exists — a closure
    * UDF is opaque to Catalyst (no pushdown through it, no codegen). */
  val slugify: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udf { (s: String) =>
      if (s == null) null
      else s.toLowerCase.replaceAll("[^a-z0-9]+", "-").replaceAll("(^-|-$)", "")
    }

  /** Register both on a session (ibis's create-function surface). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.udf.register("kurtosis_sample", org.apache.spark.sql.functions.udaf(kurtosisSample))
    spark.udf.register("corr_sample", org.apache.spark.sql.functions.udaf(corrSample))
    spark.udf.register("heavy_hitters", org.apache.spark.sql.functions.udaf(misraGries(256)))
    spark.udf.register("slugify", slugify)
  }
}
