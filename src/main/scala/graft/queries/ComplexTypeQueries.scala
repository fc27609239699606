package graft.queries

import org.apache.spark.sql.functions._

import graft.api.{SortKey, Table}
import graft.functions.ibisfn
import graft.operators.Dedup
import Tables._

/** Nested-type corpus (SURVEY.md §2.4 arrays/maps/structs/JSON + §2.1
  * TableUnnest): higher-order array functions stay codegen'd — no explode
  * unless the operator's semantics are row-generating. */
object ComplexTypeQueries {

  private def docsWithWords(s: org.apache.spark.sql.SparkSession, dir: String) =
    Table(documents(s, dir))
      .filter(col("doc_id") < 10)
      .mutate("w" -> split(col("text"), " "))

  val defs: Seq[QueryDef] = Seq(

    // Array basics: length/index (ibis 0-based, negative-from-end)/slice/
    // contains/position/distinct (arrays.py:33-180).
    QueryDef("q50_array_basics", (s, dir) => {
      docsWithWords(s, dir)
        .mutate(
          "n_words" -> size(col("w")),
          "first_w" -> ibisfn.arrayIndex0(col("w"), 0),
          "last_w" -> ibisfn.arrayIndex0(col("w"), -1),
          "slice13" -> array_join(ibisfn.arraySlice0(col("w"), 1, 3), " "),
          "has_spark" -> array_contains(col("w"), "spark"),
          "pos_data" -> ibisfn.arrayPosition0(col("w"), lit("data")),
          "nd_words" -> size(array_distinct(col("w"))),
          "sorted3" -> array_join(slice(array_sort(array_distinct(col("w"))), 1, 3), ","))
        .selectNames("doc_id", "n_words", "first_w", "last_w", "slice13",
          "has_spark", "pos_data", "nd_words", "sorted3")
        .sort(SortKey.asc(col("doc_id")))
        .df
    }, Some("""
      SELECT doc_id, CAST(LEN(w) AS INT) AS n_words,
        w[1] AS first_w, w[-1] AS last_w,
        ARRAY_TO_STRING(w[2:4], ' ') AS slice13,
        LIST_CONTAINS(w, 'spark') AS has_spark,
        CAST(COALESCE(LIST_POSITION(w, 'data') - 1, -1) AS BIGINT) AS pos_data,
        CAST(LEN(LIST_DISTINCT(w)) AS INT) AS nd_words,
        ARRAY_TO_STRING(LIST_SORT(LIST_DISTINCT(w))[1:3], ',') AS sorted3
      FROM (SELECT doc_id, STRING_SPLIT(text, ' ') AS w FROM documents WHERE doc_id < 10)
      ORDER BY doc_id""")),

    // Higher-order functions: transform / filter / aggregate (ArrayMap,
    // ArrayFilter, ArraySum/Mean — arrays.py:93-117,301-316).
    QueryDef("q51_array_higher_order", (s, dir) => {
      docsWithWords(s, dir)
        .mutate(
          "lens" -> array_join(transform(col("w"), x => length(x).cast("string")), ","),
          "n_long" -> size(filter(col("w"), x => length(x) > 4)),
          "total_chars" -> aggregate(col("w"), lit(0L), (acc, x) => acc + length(x)),
          "mean_len" -> round(ibisfn.arrayMean(transform(col("w"), x => length(x).cast("double"))), 6),
          "idx_even" -> size(filter(col("w"), (x, i) => i % 2 === 0)))
        .selectNames("doc_id", "lens", "n_long", "total_chars", "mean_len", "idx_even")
        .sort(SortKey.asc(col("doc_id")))
        .df
    }, Some("""
      SELECT doc_id,
        ARRAY_TO_STRING(LIST_TRANSFORM(w, x -> CAST(LENGTH(x) AS VARCHAR)), ',') AS lens,
        CAST(LEN(LIST_FILTER(w, x -> LENGTH(x) > 4)) AS INT) AS n_long,
        CAST(LIST_AGGREGATE(LIST_TRANSFORM(w, x -> CAST(LENGTH(x) AS BIGINT)), 'sum') AS BIGINT) AS total_chars,
        ROUND(LIST_AGGREGATE(LIST_TRANSFORM(w, x -> CAST(LENGTH(x) AS DOUBLE)), 'sum') / LEN(w), 6) AS mean_len,
        CAST((LEN(w) + 1) // 2 AS INT) AS idx_even
      FROM (SELECT doc_id, STRING_SPLIT(text, ' ') AS w FROM documents WHERE doc_id < 10)
      ORDER BY doc_id""")),

    // Array set ops on deduped token sets (sizes — order-independent).
    QueryDef("q52_array_setops", (s, dir) => {
      val stop = array(lit("the"), lit("data"), lit("spark"))
      docsWithWords(s, dir)
        .mutate("dw" -> array_distinct(col("w")))
        .mutate(
          "n_union" -> size(array_union(col("dw"), array(lit("xx_a"), lit("xx_b")))),
          "n_intersect" -> size(array_intersect(col("dw"), stop)),
          "n_except" -> size(array_except(col("dw"), stop)),
          "n_flat" -> size(flatten(array(ibisfn.arraySlice0(col("w"), 0, 5), ibisfn.arraySlice0(col("w"), 5, 5)))),
          "n_repeat" -> size(ibisfn.arrayRepeat(ibisfn.arraySlice0(col("w"), 0, 3), 3)))
        .selectNames("doc_id", "n_union", "n_intersect", "n_except", "n_flat", "n_repeat")
        .sort(SortKey.asc(col("doc_id")))
        .df
    }, Some("""
      SELECT doc_id,
        CAST(LEN(LIST_DISTINCT(dw || ['xx_a', 'xx_b'])) AS INT) AS n_union,
        CAST(LEN(LIST_INTERSECT(dw, ['the', 'data', 'spark'])) AS INT) AS n_intersect,
        CAST(LEN(LIST_FILTER(dw, x -> NOT LIST_CONTAINS(['the', 'data', 'spark'], x))) AS INT) AS n_except,
        CAST(LEN(w[1:5] || w[6:10]) AS INT) AS n_flat,
        CAST(3 * LEN(w[1:3]) AS INT) AS n_repeat
      FROM (SELECT doc_id, w, LIST_DISTINCT(w) AS dw
            FROM (SELECT doc_id, STRING_SPLIT(text, ' ') AS w FROM documents WHERE doc_id < 10))
      ORDER BY doc_id""")),

    // IntegerRange: ibis exclusive-stop semantics (arrays.py:258).
    QueryDef("q53_sequences", (s, dir) => {
      Table(nation(s, dir))
        .mutate("r" -> ibisfn.integerRange(lit(0), col("n_nationkey"), lit(3)))
        .mutate(
          "range_len" -> size(col("r")),
          "range_sum" -> coalesce(aggregate(col("r"), lit(0L), (a, x) => a + x), lit(0L)),
          "range_str" -> array_join(transform(col("r"), _.cast("string")), ","))
        .selectNames("n_nationkey", "range_len", "range_sum", "range_str")
        .sort(SortKey.asc(col("n_nationkey")))
        .df
    }, Some("""
      SELECT n_nationkey, CAST(LEN(r) AS INT) AS range_len,
        CAST(COALESCE(LIST_AGGREGATE(r, 'sum'), 0) AS BIGINT) AS range_sum,
        COALESCE(ARRAY_TO_STRING(LIST_TRANSFORM(r, x -> CAST(x AS VARCHAR)), ','), '') AS range_str
      FROM (SELECT n_nationkey, RANGE(0, CAST(n_nationkey AS BIGINT), 3) AS r FROM nation)
      ORDER BY n_nationkey""")),

    // Vector-column stats via higher-order aggregate over array<float>
    // (all in-expression — the embedding never explodes).
    QueryDef("q54_vector_stats", (s, dir) => {
      Table(embeddings(s, dir))
        .filter(col("vec_id") < 20)
        .mutate(
          "dim" -> size(col("embedding")),
          "vmin" -> round(array_min(col("embedding")).cast("double"), 4),
          "vmax" -> round(array_max(col("embedding")).cast("double"), 4),
          "vsum" -> round(aggregate(col("embedding"), lit(0.0), (a, x) => a + x.cast("double")), 4),
          "vnorm" -> round(graft.operators.Similarity.norm(col("embedding")), 4))
        .selectNames("vec_id", "label", "dim", "vmin", "vmax", "vsum", "vnorm")
        .sort(SortKey.asc(col("vec_id")))
        .df
    }, Some("""
      SELECT vec_id, label, CAST(LEN(embedding) AS INT) AS dim,
        ROUND(CAST(LIST_AGGREGATE(embedding, 'min') AS DOUBLE), 4) AS vmin,
        ROUND(CAST(LIST_AGGREGATE(embedding, 'max') AS DOUBLE), 4) AS vmax,
        ROUND(LIST_AGGREGATE(LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)), 'sum'), 4) AS vsum,
        ROUND(SQRT(LIST_AGGREGATE(LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')), 4) AS vnorm
      FROM embeddings WHERE vec_id < 20 ORDER BY vec_id""")),

    // Structs: StructColumn build + StructField access + unpack
    // (structs.py:15-35, relations.py:3262).
    QueryDef("q55_struct", (s, dir) => {
      val n = Table(nation(s, dir))
        .mutate("info" -> struct(col("n_name").as("name"), col("n_regionkey").as("rk"),
          struct(col("n_nationkey").as("id")).as("nested")))
      n.mutate(
          "s_name" -> col("info").getField("name"),
          "s_rk" -> col("info").getField("rk"),
          "s_id" -> col("info").getField("nested").getField("id"))
        .selectNames("n_nationkey", "s_name", "s_rk", "s_id")
        .sort(SortKey.asc(col("n_nationkey")))
        .df
    }, Some("""
      SELECT n_nationkey, n_name AS s_name, n_regionkey AS s_rk, n_nationkey AS s_id
      FROM nation ORDER BY n_nationkey""")),

    // Maps: construction, get-with-default, contains, keys/values
    // (maps.py; MapGet default semantics via try_element_at+coalesce).
    QueryDef("q56_map", (s, dir) => {
      val n = Table(nation(s, dir))
        .mutate("m" -> map_from_arrays(
          array(lit("name"), lit("region")),
          array(col("n_name"), col("n_regionkey").cast("string"))))
      n.mutate(
          "m_name" -> ibisfn.mapGet(col("m"), lit("name"), lit("?")),
          "m_missing" -> ibisfn.mapGet(col("m"), lit("zzz"), lit("fallback")),
          "m_has" -> map_contains_key(col("m"), lit("region")),
          "m_size" -> size(col("m")),
          "m_keys" -> array_join(array_sort(map_keys(col("m"))), ","),
          "m_vals" -> array_join(array_sort(map_values(col("m"))), ","))
        .selectNames("n_nationkey", "m_name", "m_missing", "m_has", "m_size", "m_keys", "m_vals")
        .sort(SortKey.asc(col("n_nationkey")))
        .df
    }, Some("""
      SELECT n_nationkey,
        n_name AS m_name,
        'fallback' AS m_missing,
        TRUE AS m_has,
        2 AS m_size,
        'name,region' AS m_keys,
        ARRAY_TO_STRING(LIST_SORT([n_name, CAST(n_regionkey AS VARCHAR)]), ',') AS m_vals
      FROM nation ORDER BY n_nationkey""")),

    // JSON: JSONGetItem + type-guarded unwrap (json.py:14,51-87 — bool is
    // NOT an int, floats with fraction rejected by UnwrapJSONInt64).
    QueryDef("q57_json", (s, dir) => {
      Table(events(s, dir))
        .filter(col("event_id") < 40)
        .mutate(
          "k_str" -> ibisfn.jsonGetItem(col("props"), "k"),
          "k_int" -> ibisfn.unwrapJsonInt(col("props"), "k"),
          "k_float" -> ibisfn.unwrapJsonFloat(col("props"), "k"),
          "k_bool" -> ibisfn.unwrapJsonBool(col("props"), "k"),
          "missing" -> ibisfn.jsonGetItem(col("props"), "nope"))
        .selectNames("event_id", "k_str", "k_int", "k_float", "k_bool", "missing")
        .sort(SortKey.asc(col("event_id")))
        .df
    }, Some("""
      SELECT event_id,
        JSON_EXTRACT_STRING(props, '$.k') AS k_str,
        CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) AS k_int,
        CAST(JSON_EXTRACT_STRING(props, '$.k') AS DOUBLE) AS k_float,
        CAST(NULL AS BOOLEAN) AS k_bool,
        JSON_EXTRACT_STRING(props, '$.nope') AS missing
      FROM events WHERE event_id < 40 ORDER BY event_id""")),

    // Bucket (histograms.py:18) lowered to a searched case, plus value_counts
    // over the buckets.
    QueryDef("q58_bucket", (s, dir) => {
      Table(orders(s, dir))
        .mutate("bucket" -> ibisfn.bucket(col("o_totalprice"),
          Seq(0, 50000, 100000, 200000, 400000), includeOver = true))
        .groupBy(col("bucket"))
        .count("n")
        .sort(SortKey.asc(col("bucket")))
        .df
    }, Some("""
      SELECT CASE
          WHEN o_totalprice >= 0 AND o_totalprice < 50000 THEN 0
          WHEN o_totalprice >= 50000 AND o_totalprice < 100000 THEN 1
          WHEN o_totalprice >= 100000 AND o_totalprice < 200000 THEN 2
          WHEN o_totalprice >= 200000 AND o_totalprice < 400000 THEN 3
          WHEN o_totalprice >= 400000 THEN 4
        END AS bucket, COUNT(*) AS n
      FROM orders GROUP BY 1 ORDER BY 1"""))
  )
}
