package graft.queries

import graft.operators.{Dedup, Similarity}

/** Generated DuckDB oracle SQL for the sketch/ANN operators.
  *
  * These pipelines were rows-only in round 1 because their hashes were
  * engine-specific (Spark murmur/xxhash64). Every constant the engine bakes
  * into its plan — minhash (a,b) parameter pairs, random hyperplanes, IVF
  * centroids — is ALSO deterministic Scala data, so the oracle SQL is
  * generated here from the same constants, and the corpus queries switch the
  * token hash to an md5-derived number (`Dedup.md5Hash28`/`md5Hash64`) that
  * DuckDB reproduces exactly. The operators keep their fast murmur/xxhash64
  * defaults (exercised rows-only by q64); hash collisions affect both
  * engines identically, so cross-engine equality is exact, not approximate.
  */
object SketchOracles {

  /** DuckDB mirror of Dedup.tokens (same pattern the q66/q71 oracles use). */
  private val Words =
    "LIST_FILTER(STRING_SPLIT_REGEX(LOWER(text), '[^a-z0-9]+'), x -> x != '')"

  /** DuckDB mirror of Dedup.md5Hash28 (28-bit hex prefix of md5). */
  private def md528(e: String): String =
    s"CAST(CONCAT('0x', SUBSTRING(MD5($e), 1, 7)) AS BIGINT)"

  /** DuckDB mirror of Dedup.md5Hash64: two 32-bit hex halves packed into a
    * SIGNED 64-bit value (via HUGEINT, since DuckDB << overflow-checks). */
  private def md564(e: String): String =
    s"""CAST(CAST(CAST(CONCAT('0x', SUBSTRING(MD5($e), 1, 8)) AS BIGINT) AS HUGEINT) * 4294967296
       | + CAST(CONCAT('0x', SUBSTRING(MD5($e), 9, 8)) AS BIGINT)
       | - CASE WHEN CAST(CONCAT('0x', SUBSTRING(MD5($e), 1, 8)) AS BIGINT) >= 2147483648
       |        THEN CAST('18446744073709551616' AS HUGEINT) ELSE CAST(0 AS HUGEINT) END
       | AS BIGINT)""".stripMargin.replaceAll("\n", "")

  /** DuckDB mirror of Dedup.shingleHashSet(tokens(text), k, md5Hash28) for
    * k=3: md5-28 per token, polynomial 31-combine of consecutive triples,
    * whole-doc fallback below k tokens, distinct. */
  private def shingleSetCte(docFilter: String): String =
    s"""d AS (SELECT doc_id AS doc, $Words AS w FROM documents$docFilter),
       |th AS (SELECT doc, LIST_TRANSFORM(w, t -> ${md528("t")}) AS t FROM d),
       |shs AS (SELECT doc, LIST_DISTINCT(CASE
       |    WHEN LEN(t) = 0 THEN [CAST(7 AS BIGINT)]
       |    WHEN LEN(t) = 1 THEN [7*31 + t[1]]
       |    WHEN LEN(t) = 2 THEN [(7*31 + t[1])*31 + t[2]]
       |    ELSE LIST_TRANSFORM(GENERATE_SERIES(1, LEN(t)-2),
       |           i -> t[i]*961 + t[i+1]*31 + t[i+2])
       |  END) AS sh FROM th)""".stripMargin

  /** CTE chain ending in `pairs(doc_a, doc_b, jaccard)` — the full
    * minhash-LSH pipeline (signature minima with the engine's exact (a,b)
    * parameters, banding on the signature slices, bucket self-join,
    * exact-jaccard verify), composable into downstream oracles (q65's
    * direct listing, q65c's connected-components dedup). */
  private def minhashPairsCtes(numHashes: Int, bands: Int, threshold: Double,
      docFilter: String = ""): String = {
    val p = Dedup.MinhashPrime
    val params = Dedup.minhashParams(numHashes, 42L)
    val rows = numHashes / bands
    val mins = params.zipWithIndex.map { case ((a, b), j) =>
      // reduce x mod p BEFORE the multiply (shingle hashes are ~38-bit
      // polynomial combines; a*(x%p) stays under 2^62, same as the engine)
      s"LIST_MIN(LIST_TRANSFORM(sh, x -> (${a} * (x % ${p}) + ${b}) % ${p})) AS m$j"
    }.mkString(",\n    ")
    val banded = (0 until bands).map { bnd =>
      val key = (0 until rows).map(r => s"m${bnd * rows + r}").mkString(", ")
      s"SELECT doc, $bnd AS band, [$key] AS bucket FROM sigs"
    }.mkString("\n    UNION ALL ")
    s"""${shingleSetCte(docFilter)},
       |sigs AS (SELECT doc, sh,
       |    $mins
       |  FROM shs WHERE LEN(sh) > 0),
       |banded AS (
       |    $banded),
       |cand AS (
       |  SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
       |  FROM banded a JOIN banded b
       |    ON a.band = b.band AND a.bucket = b.bucket AND a.doc < b.doc),
       |pairs AS (
       |  SELECT doc_a, doc_b,
       |    ROUND(LEN(LIST_INTERSECT(sa.sh, sb.sh))
       |      / CAST(LEN(LIST_DISTINCT(sa.sh || sb.sh)) AS DOUBLE), 6) AS jaccard
       |  FROM cand
       |  JOIN sigs sa ON sa.doc = doc_a
       |  JOIN sigs sb ON sb.doc = doc_b
       |  WHERE LEN(LIST_INTERSECT(sa.sh, sb.sh))
       |      / CAST(LEN(LIST_DISTINCT(sa.sh || sb.sh)) AS DOUBLE) >= $threshold)""".stripMargin
  }

  /** Oracle for q65: the minhash-LSH near-dup pair listing. */
  def minhashLsh(numHashes: Int, bands: Int, threshold: Double): String =
    s"""WITH
       |${minhashPairsCtes(numHashes, bands, threshold)}
       |SELECT doc_a, doc_b, jaccard FROM pairs ORDER BY doc_a, doc_b""".stripMargin

  /** Mirror of [[Dedup.connectedComponents]] min-label semantics as a
    * recursive-CTE suffix over a `pairs(doc_a, doc_b, …)` CTE: symmetrize
    * the edges, transitively close reachability (UNION dedup terminates
    * it), take MIN over reached labels → `comp(id, component)`. */
  private val ccCtes: String =
    s"""sym AS (
       |  SELECT doc_a AS a, doc_b AS b FROM pairs
       |  UNION SELECT doc_b, doc_a FROM pairs),
       |reach(id, r) AS (
       |  SELECT a, a FROM sym
       |  UNION
       |  SELECT reach.id, sym.b FROM reach JOIN sym ON sym.a = reach.r),
       |comp AS (SELECT id, MIN(r) AS component FROM reach GROUP BY id)""".stripMargin

  /** Oracle for q65c: cluster-aware near-dedup — minhash-LSH pairs closed
    * into components, keep each component's minimum doc plus all
    * untouched singletons. */
  def nearDedup(numHashes: Int, bands: Int, threshold: Double): String =
    s"""WITH RECURSIVE
       |${minhashPairsCtes(numHashes, bands, threshold)},
       |$ccCtes
       |SELECT d.doc_id FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
       |WHERE c.component IS NULL OR c.component = d.doc_id
       |ORDER BY doc_id""".stripMargin

  /** Oracle for q71b: the full curation pipeline end-to-end — quality
    * gate (all four q71 criteria), exact keep-first dedup on the
    * token-stream md5, minhash-LSH near-dedup closed into components
    * (keep min id), seeded deterministic sample, context-window packing.
    * Every stage replays the engine's arithmetic exactly; the minhash
    * stage runs over the exact survivor set via the docFilter hook. */
  def fullPipeline(numHashes: Int, bands: Int, threshold: Double,
      maxDocId: Long, seed: Long, frac: Double, budget: Long): String = {
    val stops = "['the','a','an','and','or','of','to','in','is','are','was','it','for','on','with','as','at','by','that','this','be','from']"
    val quality =
      s"""((CASE WHEN LEN(w) BETWEEN 10 AND 100000 THEN 1.0 ELSE 0.0 END)
         | + (CASE WHEN LEN(LIST_FILTER(w, x -> LIST_CONTAINS($stops, x))) / CAST(LEN(w) AS DOUBLE) > 0.01 THEN 1.0 ELSE 0.0 END)
         | + (CASE WHEN (LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[[:punct:]]', '', 'g'))) / CAST(LENGTH(text) AS DOUBLE) < 0.2 THEN 1.0 ELSE 0.0 END)
         | + (CASE WHEN (LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[0-9]', '', 'g'))) / CAST(LENGTH(text) AS DOUBLE) < 0.3 THEN 1.0 ELSE 0.0 END)) / 4.0""".stripMargin
    s"""WITH RECURSIVE
       |qd AS (
       |  SELECT doc_id, text, $Words AS w FROM documents WHERE doc_id < $maxDocId),
       |qual AS (SELECT doc_id, w FROM qd WHERE $quality >= 1.0),
       |ck AS (
       |  SELECT doc_id, w, ROW_NUMBER() OVER (
       |    PARTITION BY MD5(ARRAY_TO_STRING(w, ' ')) ORDER BY doc_id) AS rn
       |  FROM qual),
       |survivors AS (SELECT doc_id, w FROM ck WHERE rn = 1),
       |${minhashPairsCtes(numHashes, bands, threshold,
            " WHERE doc_id IN (SELECT doc_id FROM survivors)")},
       |$ccCtes,
       |kept AS (
       |  SELECT s.doc_id, s.w FROM survivors s LEFT JOIN comp c ON c.id = s.doc_id
       |  WHERE c.component IS NULL OR c.component = s.doc_id),
       |sampled AS (
       |  SELECT doc_id, w FROM kept
       |  WHERE CAST(CONCAT('0x', SUBSTRING(MD5('$seed:' || CAST(doc_id AS VARCHAR)), 1, 7)) AS BIGINT)
       |    / 268435456.0 < $frac),
       |packed AS (
       |  SELECT doc_id, CAST(LEN(w) AS INT) AS n_tokens,
       |    COALESCE(SUM(CAST(LEN(w) AS BIGINT)) OVER (ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pack_offset
       |  FROM sampled)
       |SELECT doc_id, n_tokens,
       |  CAST(pack_offset AS BIGINT) AS pack_offset,
       |  CAST(FLOOR(pack_offset / $budget.0) AS BIGINT) AS pack_id
       |FROM packed ORDER BY doc_id""".stripMargin
  }

  /** Oracle for q66b: connected components over the exact unigram-jaccard
    * pair graph (the q66 edge definition), min-label clusters. */
  def jaccardClusters(maxDocId: Long, threshold: Double): String =
    s"""WITH RECURSIVE
       |jd AS (
       |  SELECT doc_id, lang,
       |    LIST_DISTINCT($Words) AS w
       |  FROM documents WHERE doc_id < $maxDocId),
       |pairs AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM jd a JOIN jd b ON a.lang = b.lang AND a.doc_id < b.doc_id
       |  WHERE LEN(LIST_INTERSECT(a.w, b.w)) / CAST(LEN(LIST_DISTINCT(a.w || b.w)) AS DOUBLE) >= $threshold),
       |$ccCtes
       |SELECT id AS doc_id, component AS cluster FROM comp ORDER BY doc_id""".stripMargin

  /** Oracle for q65b: corpus decontamination against a derived blocklist.
    * Corpus = all documents; blocklist = every 7th document, its text
    * untouched when doc_id % 14 == 0 (→ exact-stage hits) and suffixed
    * with ' zzz' otherwise (→ near-stage hits at jaccard ≈0.97). Removal
    * = exact token-stream-md5 matches ∪ LSH-banded candidates verified at
    * >= threshold — the union is order-insensitive, so staging
    * differences with the engine (which anti-joins exact first) cannot
    * diverge. */
  def decontaminate(numHashes: Int, bands: Int, threshold: Double): String = {
    val p = Dedup.MinhashPrime
    val params = Dedup.minhashParams(numHashes, 42L)
    val rows = numHashes / bands
    val mins = params.zipWithIndex.map { case ((a, b), j) =>
      s"LIST_MIN(LIST_TRANSFORM(sh, x -> (${a} * (x % ${p}) + ${b}) % ${p})) AS m$j"
    }.mkString(",\n    ")
    val banded = (0 until bands).map { bnd =>
      val key = (0 until rows).map(r => s"m${bnd * rows + r}").mkString(", ")
      s"SELECT side, doc, $bnd AS band, [$key] AS bucket FROM sigs"
    }.mkString("\n    UNION ALL ")
    s"""WITH
       |corp0 AS (SELECT doc_id AS doc, text FROM documents),
       |blk0 AS (SELECT doc_id AS doc,
       |    CASE WHEN doc_id % 14 = 0 THEN text ELSE text || ' zzz' END AS text
       |  FROM documents WHERE doc_id % 7 = 0),
       |sides AS (SELECT 'c' AS side, doc, text FROM corp0
       |  UNION ALL SELECT 'b', doc, text FROM blk0),
       |d AS (SELECT side, doc, $Words AS w FROM sides),
       |keys AS (SELECT side, doc, MD5(ARRAY_TO_STRING(w, ' ')) AS k FROM d),
       |th AS (SELECT side, doc, LIST_TRANSFORM(w, t -> ${md528("t")}) AS t FROM d),
       |shs AS (SELECT side, doc, LIST_DISTINCT(CASE
       |    WHEN LEN(t) = 0 THEN [CAST(7 AS BIGINT)]
       |    WHEN LEN(t) = 1 THEN [7*31 + t[1]]
       |    WHEN LEN(t) = 2 THEN [(7*31 + t[1])*31 + t[2]]
       |    ELSE LIST_TRANSFORM(GENERATE_SERIES(1, LEN(t)-2),
       |           i -> t[i]*961 + t[i+1]*31 + t[i+2])
       |  END) AS sh FROM th),
       |sigs AS (SELECT side, doc, sh,
       |    $mins
       |  FROM shs WHERE LEN(sh) > 0),
       |banded AS (
       |    $banded),
       |exact_rm AS (SELECT DISTINCT c.doc FROM keys c
       |  JOIN keys b ON b.side = 'b' AND c.side = 'c' AND c.k = b.k),
       |cand AS (
       |  SELECT DISTINCT a.doc AS cdoc, b.doc AS bdoc
       |  FROM banded a JOIN banded b
       |    ON a.side = 'c' AND b.side = 'b'
       |   AND a.band = b.band AND a.bucket = b.bucket),
       |near_rm AS (
       |  SELECT DISTINCT cdoc AS doc FROM cand
       |  JOIN sigs sa ON sa.side = 'c' AND sa.doc = cdoc
       |  JOIN sigs sb ON sb.side = 'b' AND sb.doc = bdoc
       |  WHERE LEN(LIST_INTERSECT(sa.sh, sb.sh))
       |      / CAST(LEN(LIST_DISTINCT(sa.sh || sb.sh)) AS DOUBLE) >= $threshold)
       |SELECT doc AS doc_id FROM corp0
       |WHERE doc NOT IN (SELECT doc FROM exact_rm)
       |  AND doc NOT IN (SELECT doc FROM near_rm)
       |ORDER BY doc_id""".stripMargin
  }

  /** Oracle for q67: simhash over md5-64 token hashes — 64 ±1 bit-lanes,
    * sign-packed signature (via HUGEINT), 16-bit quadrant banding, Hamming
    * verify. */
  def simhashPairs(maxHamming: Int): String = {
    val lanes = (0 until 64).map { b =>
      s"COALESCE(LIST_SUM(LIST_TRANSFORM(t, h -> CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END)), 0) AS lane$b"
    }.mkString(",\n    ")
    val pack = (0 until 64).map { b =>
      s"CASE WHEN lane$b > 0 THEN CAST('${java.math.BigInteger.ONE.shiftLeft(b)}' AS HUGEINT) ELSE CAST(0 AS HUGEINT) END"
    }.mkString(" + ")
    s"""WITH
       |d AS (SELECT doc_id AS doc, $Words AS w FROM documents),
       |th AS (SELECT doc, LIST_TRANSFORM(w, t -> ${md564("t")}) AS t FROM d),
       |lanes AS (SELECT doc,
       |    $lanes
       |  FROM th),
       |sigs AS (SELECT doc,
       |    CAST(($pack)
       |      - CASE WHEN lane63 > 0 THEN CAST('18446744073709551616' AS HUGEINT)
       |             ELSE CAST(0 AS HUGEINT) END AS BIGINT) AS sig
       |  FROM lanes),
       |banded AS (
       |  SELECT doc, sig, q, (sig >> (q * 16)) & 65535 AS bucket
       |  FROM sigs CROSS JOIN (SELECT UNNEST(GENERATE_SERIES(0, 3)) AS q)),
       |cand AS (
       |  SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b, a.sig AS sig_a, b.sig AS sig_b
       |  FROM banded a JOIN banded b
       |    ON a.q = b.q AND a.bucket = b.bucket AND a.doc < b.doc)
       |SELECT doc_a, doc_b, CAST(BIT_COUNT(XOR(sig_a, sig_b)) AS INT) AS hamming
       |FROM cand WHERE BIT_COUNT(XOR(sig_a, sig_b)) <= $maxHamming
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  /** Hyperplane-bucket SQL expression over column `v` — the engine's exact
    * plane matrix (same LCG seed), coefficients cycled by element index. */
  private def bucketExpr(v: String, planes: Int, dim: Int, seed: Long): String = {
    val mat = Similarity.randomPlanes(planes, dim, seed)
    mat.zipWithIndex.map { case (plane, i) =>
      val arr = plane.map(_.toString).mkString("[", ", ", "]")
      s"""(CASE WHEN LIST_SUM(LIST_TRANSFORM($v,
         | (x, ix) -> CAST(x AS DOUBLE) * ($arr)[((ix - 1) % $dim) + 1])) >= 0
         | THEN ${1L << i} ELSE 0 END)""".stripMargin.replaceAll("\n", "")
    }.mkString(" + ")
  }

  private val CosDouble =
    "LIST_COSINE_SIMILARITY(LIST_TRANSFORM(cv, x -> CAST(x AS DOUBLE)), LIST_TRANSFORM(pv, x -> CAST(x AS DOUBLE)))"

  /** Oracle for q69: LSH top-k — bucket both sides with the plane literals,
    * bucket-equi-join, rank by cosine within probe. */
  def lshTopK(probeFilter: String, k: Int, planes: Int, dim: Int, seed: Long): String = {
    s"""WITH
       |corpus AS (SELECT vec_id AS neighbor_id, embedding AS cv,
       |    ${bucketExpr("embedding", planes, dim, seed)} AS bucket FROM embeddings),
       |probes AS (SELECT vec_id AS probe_id, embedding AS pv,
       |    ${bucketExpr("embedding", planes, dim, seed)} AS bucket
       |  FROM embeddings WHERE $probeFilter),
       |scored AS (
       |  SELECT probe_id, neighbor_id, ROUND($CosDouble, 6) AS cosine
       |  FROM corpus JOIN probes USING (bucket)),
       |ranked AS (
       |  SELECT probe_id, neighbor_id, cosine,
       |    ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY cosine DESC, neighbor_id) - 1 AS rank
       |  FROM scored)
       |SELECT probe_id, neighbor_id, cosine, CAST(rank AS INT) AS rank
       |FROM ranked WHERE rank < $k ORDER BY probe_id, rank""".stripMargin
  }

  /** Oracle for q70: near-dup pairs — same bucket, cosine above threshold. */
  def embeddingNearDups(planes: Int, dim: Int, seed: Long, threshold: Double): String = {
    s"""WITH
       |b AS (SELECT vec_id, embedding,
       |    ${bucketExpr("embedding", planes, dim, seed)} AS bucket FROM embeddings),
       |pairs AS (
       |  SELECT a.vec_id AS doc_a, b2.vec_id AS doc_b,
       |    LIST_COSINE_SIMILARITY(LIST_TRANSFORM(a.embedding, x -> CAST(x AS DOUBLE)),
       |      LIST_TRANSFORM(b2.embedding, x -> CAST(x AS DOUBLE))) AS cos
       |  FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id)
       |SELECT doc_a, doc_b, ROUND(cos, 6) AS cosine
       |FROM pairs WHERE cos >= $threshold ORDER BY doc_a, doc_b""".stripMargin
  }

  /** Oracle for q70b: SemDeDup-style semantic dedup — nearest-centroid
    * cell assignment (the ivfTopK LIST_SORT argmin), within-cell cosine
    * pairs at >= threshold, recursive-CTE transitive closure, keep each
    * component's minimum vec_id plus all untouched singletons. */
  def semanticDedup(centroids: Seq[Seq[Double]], threshold: Double): String = {
    val cells = centroids.zipWithIndex.map { case (c, i) =>
      val arr = c.map(_.toString).mkString("[", ", ", "]")
      s"""{'d': SQRT(LIST_SUM(LIST_TRANSFORM(embedding,
         | (x, ix) -> (CAST(x AS DOUBLE) - ($arr)[ix]) * (CAST(x AS DOUBLE) - ($arr)[ix])))),
         | 'cell': $i}""".stripMargin.replaceAll("\n", "")
    }.mkString("[", ", ", "]")
    s"""WITH RECURSIVE
       |a AS (SELECT vec_id, embedding, LIST_SORT($cells)[1].cell AS cell FROM embeddings),
       |pairs AS (
       |  SELECT x.vec_id AS doc_a, y.vec_id AS doc_b
       |  FROM a x JOIN a y ON x.cell = y.cell AND x.vec_id < y.vec_id
       |  WHERE LIST_COSINE_SIMILARITY(LIST_TRANSFORM(x.embedding, v -> CAST(v AS DOUBLE)),
       |        LIST_TRANSFORM(y.embedding, v -> CAST(v AS DOUBLE))) >= $threshold),
       |$ccCtes
       |SELECT e.vec_id FROM embeddings e LEFT JOIN comp c ON c.id = e.vec_id
       |WHERE c.component IS NULL OR c.component = e.vec_id
       |ORDER BY vec_id""".stripMargin
  }

  /** Oracle for q73: IVF — nearest-cell assignment against the literal
    * centroid set (argmin by (distance, cell), the engine's array_sort
    * tie-break), probes explode their nProbe nearest cells. */
  def ivfTopK(probeFilter: String, centroids: Seq[Seq[Double]], k: Int, nProbe: Int): String = {
    val cells = centroids.zipWithIndex.map { case (c, i) =>
      val arr = c.map(_.toString).mkString("[", ", ", "]")
      s"""{'d': SQRT(LIST_SUM(LIST_TRANSFORM(embedding,
         | (x, ix) -> (CAST(x AS DOUBLE) - ($arr)[ix]) * (CAST(x AS DOUBLE) - ($arr)[ix])))),
         | 'cell': $i}""".stripMargin.replaceAll("\n", "")
    }.mkString("[", ", ", "]")
    s"""WITH
       |assigned AS (SELECT vec_id, embedding, LIST_SORT($cells) AS cells FROM embeddings),
       |corpus AS (SELECT vec_id AS neighbor_id, embedding AS cv, cells[1].cell AS cell FROM assigned),
       |probes AS (
       |  SELECT vec_id AS probe_id, embedding AS pv,
       |    UNNEST([${(1 to nProbe).map(i => s"cells[$i].cell").mkString(", ")}]) AS cell
       |  FROM assigned WHERE $probeFilter),
       |scored AS (
       |  SELECT probe_id, neighbor_id, ROUND($CosDouble, 6) AS cosine
       |  FROM corpus JOIN probes USING (cell)),
       |ranked AS (
       |  SELECT probe_id, neighbor_id, cosine,
       |    ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY cosine DESC, neighbor_id) - 1 AS rank
       |  FROM scored)
       |SELECT probe_id, neighbor_id, cosine, CAST(rank AS INT) AS rank
       |FROM ranked WHERE rank < $k ORDER BY probe_id, rank""".stripMargin
  }

  /** Oracle for q73b: one Lloyd k-means update from a literal centroid
    * set — argmin assignment (the same LIST_SORT struct ordering as
    * ivfTopK), then exact DECIMAL(38,10) per-dimension sums divided by
    * counts, matching Similarity.kmeansStep bit-for-bit; first two means
    * and the full-centroid digest are value-checked at 6 dp. */
  def kmeansStep(centroids: Seq[Seq[Double]], dim: Int): String = {
    val cells = centroids.zipWithIndex.map { case (c, i) =>
      val arr = c.map(_.toString).mkString("[", ", ", "]")
      s"""{'d': SQRT(LIST_SUM(LIST_TRANSFORM(v,
         | (x, ix) -> (CAST(x AS DOUBLE) - ($arr)[ix]) * (CAST(x AS DOUBLE) - ($arr)[ix])))),
         | 'cell': $i}""".stripMargin.replaceAll("\n", "")
    }.mkString("[", ", ", "]")
    def mean(j: Int) =
      s"CAST(SUM(CAST(CAST(v[${j + 1}] AS DOUBLE) AS DECIMAL(38,10))) AS DOUBLE) / COUNT(*)"
    val digest = (0 until dim).map(j => s"m$j").mkString(" + ")
    s"""WITH a AS (
       |  SELECT embedding AS v, LIST_SORT($cells)[1].cell AS cell FROM embeddings),
       |g AS (
       |  SELECT cell, COUNT(*) AS n,
       |    ${(0 until dim).map(j => s"${mean(j)} AS m$j").mkString(",\n    ")}
       |  FROM a GROUP BY 1)
       |SELECT CAST(cell AS INT) AS cell, n, ROUND(m0, 6) AS c0, ROUND(m1, 6) AS c1,
       |  ROUND($digest, 6) AS digest
       |FROM g ORDER BY cell""".stripMargin
  }

  /** Oracle for q72: every stub output is an md5-derived deterministic
    * value over the payload bytes (= the utf-8 text), so the whole
    * multimodal pipeline — metadata, probed dims, perceptual hash, both
    * feature-extraction paths, frame sampling — mirrors exactly. */
  def multimodal(durationMs: Long, everyMs: Long): String = {
    val nFrames = math.max(durationMs / everyMs, 1L)
    s"""SELECT doc_id,
       |  CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT) AS size_bytes,
       |  CAST((${md528("text")} % 1920) + 1 AS INT) AS width,
       |  ${md564("text")} AS phash,
       |  ROUND((${md528("text || '0'")} % 1000) / 500.0 - 1.0, 6) AS feat0,
       |  ROUND(CAST(CAST((${md528("text || '0'")} % 1000) / 500.0 - 1.0 AS REAL) AS DOUBLE), 6) AS featb0,
       |  CAST($nFrames AS BIGINT) AS n_frames
       |FROM documents WHERE doc_id < 20 ORDER BY doc_id""".stripMargin
  }
}
