SELECT abs(t0.c_acctbal) AS a, round(t0.c_acctbal, 1) AS r, (t0.c_custkey % CAST(7 AS BIGINT)) AS m FROM customer AS t0 ORDER BY m ASC NULLS FIRST, a ASC NULLS FIRST LIMIT 10
