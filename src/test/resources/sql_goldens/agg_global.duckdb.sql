SELECT count(1) AS n, max(t0.n_nationkey) AS mx FROM nation AS t0
