package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Value identity of the fused sketch expression (exts/ShingleMinhash)
  * with the declarative HOF pipeline it replaces, per hash kind —
  * tokenization edge cases included (punctuation runs, unicode case,
  * short-of-k docs, empty strings, duplicate shingles). */
class SketchFusionSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    "The quick brown fox jumps over the lazy dog",
    "the quick BROWN fox--jumps,,, over!!! the lazy dog",
    "short doc",
    "x",
    "",
    "   ,,,;;;   ",
    "a b a b a b a b a b",
    "Äpfel über STRAßE çödé 日本語 テスト 123 456",
    "data model training data model training data model",
    "one two three four five six seven eight nine ten"
  ).zipWithIndex.map { case (t, i) => (i.toLong, t) }

  private def fusedVsHof(kind: String, hashFn: org.apache.spark.sql.Column =>
      org.apache.spark.sql.Column): Unit = {
    val df = docs.toDF("doc", "text")
    val k = 3; val numHashes = 32
    val e = graft.exts.ShingleMinhash(
      org.apache.spark.sql.GraftSqlBridge.expression(col("text")),
      k, kind, Dedup.minhashParams(numHashes, 42L), Dedup.MinhashPrime)
    val fused = df.select(col("doc"),
        org.apache.spark.sql.GraftSqlBridge.column(e).as("s"))
      .select(col("doc"), col("s.sh").as("sh"), col("s.sig").as("sig"))
    val hof = df.select(col("doc"),
        Dedup.shingleHashSet(Dedup.tokens(col("text")), k, hashFn).as("sh"))
      .withColumn("sig", Dedup.minhashSignature(col("sh"), numHashes))
    val f = fused.orderBy("doc").collect()
    val h = hof.orderBy("doc").collect()
    assert(f.length == h.length)
    f.zip(h).foreach { case (a, b) =>
      assert(a.getSeq[Long](1) == b.getSeq[Long](1),
        s"sh mismatch for doc ${a.getLong(0)} ($kind)")
      assert(a.getSeq[Long](2) == b.getSeq[Long](2),
        s"sig mismatch for doc ${a.getLong(0)} ($kind)")
    }
  }

  test("fused sketch == declarative pipeline (murmur)") {
    fusedVsHof("murmur", Dedup.murmurHash)
  }
  test("fused sketch == declarative pipeline (md5_28)") {
    fusedVsHof("md5_28", Dedup.md5Hash28)
  }

  test("fused sketch == declarative pipeline on real documents (sf0.001)") {
    val df = spark.read.parquet(s"$sfDir/documents.parquet").limit(200)
    val k = 3; val numHashes = 32
    val e = graft.exts.ShingleMinhash(
      org.apache.spark.sql.GraftSqlBridge.expression(col("text")),
      k, "md5_28", Dedup.minhashParams(numHashes, 42L), Dedup.MinhashPrime)
    val fused = df.select(col("doc_id"),
        org.apache.spark.sql.GraftSqlBridge.column(e).as("s"))
      .select(col("doc_id"), col("s.sh").as("sh"), col("s.sig").as("sig"))
    val hof = df.select(col("doc_id"),
        Dedup.shingleHashSet(Dedup.tokens(col("text")), k, Dedup.md5Hash28).as("sh"))
      .withColumn("sig", Dedup.minhashSignature(col("sh"), numHashes))
    val f = fused.orderBy("doc_id").collect()
    val h = hof.orderBy("doc_id").collect()
    assert(f.length == h.length && f.nonEmpty)
    f.zip(h).foreach { case (a, b) =>
      assert(a.getSeq[Long](1) == b.getSeq[Long](1))
      assert(a.getSeq[Long](2) == b.getSeq[Long](2))
    }
  }

  test("minhashLsh end-to-end result unchanged by the fused path (vs custom-lambda path)") {
    val df = spark.read.parquet(s"$sfDir/documents.parquet").limit(300)
    // identical hash function as a FRESH lambda — not `eq` to md5Hash28, so
    // it takes the declarative path; results must match the fused run
    val customMd5: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      t => conv(substring(md5(t.cast("binary")), 1, 7), 16, 10).cast("long")
    val fused = Dedup.minhashLsh(df, "doc_id", "text", tokenHash = Dedup.md5Hash28)
      .orderBy("doc_a", "doc_b").collect()
    val hof = Dedup.minhashLsh(df, "doc_id", "text", tokenHash = customMd5)
      .orderBy("doc_a", "doc_b").collect()
    assert(fused.length == hof.length && fused.nonEmpty)
    fused.zip(hof).foreach { case (a, b) => assert(a == b) }
  }
}
