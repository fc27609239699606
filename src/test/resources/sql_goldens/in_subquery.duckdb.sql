SELECT t0.c_custkey FROM customer AS t0 WHERE (t0.c_nationkey IN (SELECT t1.n_nationkey FROM nation AS t1 WHERE (t1.n_regionkey = 1))) ORDER BY c_custkey ASC NULLS FIRST LIMIT 10
