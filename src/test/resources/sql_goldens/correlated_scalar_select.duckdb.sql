SELECT t0.n_name, (SELECT count(1) FROM customer AS t1 WHERE (t1.c_nationkey = t0.n_nationkey)) AS n_cust FROM nation AS t0 ORDER BY n_name ASC NULLS FIRST LIMIT 10
