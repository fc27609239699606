SELECT (t0.id * CAST(2 AS BIGINT)) AS even FROM (VALUES (1), (2), (3), (4), (5)) AS t0(id)
