SELECT t0.c_custkey, coalesce(nullif(c_mktsegment, 'BUILDING'), 'none') AS seg, (t0.c_acctbal IS NULL) AS no_bal FROM customer AS t0 ORDER BY c_custkey ASC NULLS FIRST LIMIT 5
