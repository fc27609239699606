SELECT (t0.id * CAST(2 AS BIGINT)) AS even FROM VALUES (1L), (2L), (3L), (4L), (5L) AS t0(id)
