package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Connected components (large-star/small-star) checked against a
  * driver-side union-find reference on random graphs plus the adversarial
  * shapes (chains, stars, cliques, duplicate/reversed/self-loop edges). */
class DedupCcSpec extends SparkSpec {
  import spark.implicits._

  /** Reference: classic union-find with path compression. */
  private def ufComponents(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // normalize every node to its component MIN (find roots are already
    // mins because union always parents the larger root under the smaller)
    parent.keys.map(k => k -> find(k)).toMap
  }

  private def ccOf(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Dedup.connectedComponents(edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap

  test("empty and single-edge graphs") {
    assert(ccOf(Seq.empty) == Map.empty)
    assert(ccOf(Seq((5L, 9L))) == Map(5L -> 5L, 9L -> 5L))
    // self-loops alone produce no components (no distinct pair evidence)
    assert(ccOf(Seq((3L, 3L))) == Map.empty)
  }

  test("chain, star, clique, and two components") {
    val chain = (1L to 20L).sliding(2).map(s => (s(0), s(1))).toSeq
    assert(ccOf(chain) == (1L to 20L).map(_ -> 1L).toMap)
    val star = (2L to 30L).map(i => (i, 1L))
    assert(ccOf(star) == (1L to 30L).map(_ -> 1L).toMap)
    val clique = for (i <- 1L to 8L; j <- (i + 1) to 8L) yield (i, j)
    assert(ccOf(clique) == (1L to 8L).map(_ -> 1L).toMap)
    val two = Seq((1L, 2L), (2L, 3L), (10L, 11L))
    assert(ccOf(two) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("duplicate, reversed, and self-loop edges are tolerated") {
    val messy = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 2L), (3L, 2L))
    assert(ccOf(messy) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("random graphs match union-find (property)") {
    val rnd = new Random(4242)
    for (trial <- 1 to 12) {
      val n = 10 + rnd.nextInt(60)
      val m = 1 + rnd.nextInt(2 * n)
      val edges = Seq.fill(m)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val expect = ufComponents(edges)
      val got = ccOf(edges)
      assert(got == expect, s"trial $trial: n=$n m=$m")
    }
  }

  test("string node ids work (min = lexicographic)") {
    val got = Dedup.connectedComponents(
      Seq(("b", "c"), ("c", "a"), ("x", "y")).toDF("s", "d"), "s", "d")
      .as[(String, String)].collect().toMap
    assert(got == Map("a" -> "a", "b" -> "a", "c" -> "a", "x" -> "x", "y" -> "x"))
  }

  test("nearDupClusters assigns every document; nearDedup keeps cluster minima") {
    // three exact-duplicate texts + a near-dup chain + singletons
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "the quick brown fox jumps over the lazy dog again and once"),
      (10L, "completely different content about spark and scala engines here"),
      (11L, "completely different content about spark and scala engines here"),
      (20L, "a unique snowflake document with no duplicate partner at all")
    ).toDF("doc_id", "text")
    val clustered = Dedup.nearDupClusters(docs, "doc_id", "text",
      threshold = 0.5)
    val m = clustered.select("doc_id", "cluster").as[(Long, Long)].collect().toMap
    assert(m.keySet == Set(1L, 2L, 3L, 10L, 11L, 20L))
    assert(m(1L) == 1L && m(2L) == 1L && m(3L) == 1L)
    assert(m(10L) == 10L && m(11L) == 10L)
    assert(m(20L) == 20L)
    val kept = Dedup.nearDedup(docs, "doc_id", "text", threshold = 0.5)
    assert(kept.columns.toSeq == Seq("doc_id", "text"))
    assert(kept.select("doc_id").as[Long].collect().toSet == Set(1L, 10L, 20L))
  }
}
