SELECT count(DISTINCT t0.o_custkey) AS nd FROM orders AS t0
