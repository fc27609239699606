SELECT upper(t0.n_name) AS u, length(t0.n_name) AS l, substring(t0.n_name, 1, 3) AS pre FROM nation AS t0 ORDER BY u ASC NULLS FIRST
