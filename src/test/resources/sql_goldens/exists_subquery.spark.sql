SELECT t0.n_name FROM nation AS t0 WHERE exists (SELECT 1 FROM region AS t1 WHERE (t1.r_regionkey = 0)) ORDER BY n_name ASC NULLS FIRST LIMIT 5
