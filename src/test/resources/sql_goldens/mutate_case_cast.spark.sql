SELECT CAST(t0.c_custkey AS INT) AS k, CASE WHEN (t0.c_acctbal > CAST(0 AS DOUBLE)) THEN 'pos' ELSE 'neg' END AS sign FROM customer AS t0
