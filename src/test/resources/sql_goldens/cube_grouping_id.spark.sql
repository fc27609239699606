SELECT t0.n_regionkey, count(1) AS n, grouping_id() AS gid FROM nation AS t0 GROUP BY GROUPING SETS ((t0.n_regionkey), ()) ORDER BY n_regionkey ASC NULLS FIRST, gid ASC NULLS FIRST
