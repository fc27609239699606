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
}
