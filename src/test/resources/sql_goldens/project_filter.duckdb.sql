SELECT t0.n_name, (t0.n_regionkey + 1) AS r1 FROM nation AS t0 WHERE (t0.n_nationkey > 5)
