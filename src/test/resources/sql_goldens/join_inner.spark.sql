SELECT t0.n_name, t1.r_name FROM nation AS t0 JOIN region AS t1 ON (t0.n_regionkey = t1.r_regionkey) ORDER BY n_name ASC NULLS FIRST
