SELECT t0.c_custkey FROM customer AS t0 WHERE (t0.c_acctbal > (SELECT avg(t1.c_acctbal) AS "avg(c_acctbal)" FROM customer AS t1)) ORDER BY c_custkey ASC NULLS FIRST LIMIT 10
