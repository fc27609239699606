SELECT t0.c_custkey, t0.c_acctbal FROM customer AS t0 ORDER BY c_acctbal DESC NULLS LAST, c_custkey ASC NULLS FIRST LIMIT 10
