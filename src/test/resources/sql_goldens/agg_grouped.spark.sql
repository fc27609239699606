SELECT t0.c_nationkey, count(1) AS n, sum(t0.c_acctbal) AS s FROM customer AS t0 GROUP BY t0.c_nationkey ORDER BY c_nationkey ASC NULLS FIRST
