SELECT t0.n_name FROM nation AS t0 WHERE exists (SELECT 1 FROM customer AS t1 WHERE ((t1.c_nationkey = t0.n_nationkey) AND (t1.c_acctbal > CAST(9000 AS DOUBLE)))) ORDER BY n_name ASC NULLS FIRST
