SELECT * FROM (SELECT t0.c_nationkey, count(1) AS n FROM customer AS t0 GROUP BY t0.c_nationkey) AS __g1 WHERE (n > CAST(2 AS BIGINT)) ORDER BY c_nationkey ASC NULLS FIRST
