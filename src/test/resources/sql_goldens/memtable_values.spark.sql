SELECT * FROM (SELECT t0._1 AS id, t0._2 AS tag, t0._3 AS d FROM VALUES (1L, 'a', DATE '2024-01-02'), (2L, 'b', DATE '2024-05-06') AS t0(_1, _2, _3)) AS __g1 WHERE (id > CAST(0 AS BIGINT))
