package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._

import graft.operators.AsofJoin

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val left = Seq(
    (1L, "u1", ts("2024-01-01 10:00:00")),
    (2L, "u1", ts("2024-01-01 12:00:00")),
    (3L, "u2", ts("2024-01-01 09:00:00")),
    (4L, "u3", ts("2024-01-01 09:00:00"))
  ).toDF("id", "user", "t")

  private lazy val right = Seq(
    ("u1", ts("2024-01-01 09:30:00"), 10.0),
    ("u1", ts("2024-01-01 11:59:00"), 20.0),
    ("u2", ts("2024-01-01 09:00:00"), 30.0), // equal timestamp → inclusive match
    ("u2", ts("2024-01-01 10:00:00"), 40.0)  // after left → never matches
  ).toDF("ruser", "rt", "rv")

  test("asof picks most recent right row at or before left time, per key") {
    val out = AsofJoin(left, right, col("t"), col("rt"), by = Seq("user" -> "ruser"))
      .orderBy("id").collect()
    assert(out.map(r => (r.getLong(0), Option(r.get(4)))).toSeq == Seq(
      (1L, Some(10.0)),   // 10:00 → 09:30 row
      (2L, Some(20.0)),   // 12:00 → 11:59 row
      (3L, Some(30.0)),   // equal ts matches (inclusive)
      (4L, None)))        // u3 has no right rows → left-outer null
  }

  test("tolerance nulls out matches older than the bound") {
    val out = AsofJoin(left, right, col("t"), col("rt"),
      by = Seq("user" -> "ruser"), tolerance = Some("INTERVAL 10 MINUTES"))
      .orderBy("id").collect()
    assert(out.map(r => Option(r.get(4))).toSeq ==
      Seq(None, Some(20.0), Some(30.0), None)) // 30min-old match dropped, 1min kept
  }

  test("all left rows survive (left-outer semantics)") {
    val out = AsofJoin(left, right, col("t"), col("rt"), by = Seq("user" -> "ruser"))
    assert(out.count() == left.count())
  }

  // The compact and window plans have subtly different null-key semantics
  // (AsofJoin scaladoc: the equi-join never matches null keys; a window
  // partition groups them) — so the cross-strategy contract is pinned on
  // non-null-key data, where the two plans and a direct reference model
  // must agree exactly. Right-side (key, time) pairs are kept unique:
  // at duplicate timestamps the tie-break is documented as
  // strategy-dependent and would be a false property failure.
  test("forward direction picks the next right row at-or-after, both strategies") {
    for (strategy <- Seq("compact", "window")) {
      val out = AsofJoin(left, right, col("t"), col("rt"),
          by = Seq("user" -> "ruser"), strategy = strategy, direction = "forward")
        .orderBy("id").collect()
      // u1@10:00 → next click 11:59 (20.0); u1@12:00 → none after;
      // u2@09:00 → equal timestamp matches inclusively (30.0);
      // u3 has no right rows at all
      assert(out.map(r => (r.getLong(0), Option(r.get(4)))).toSeq == Seq(
        (1L, Some(20.0)), (2L, None), (3L, Some(30.0)), (4L, None)),
        s"strategy=$strategy")
    }
  }

  test("property: forward direction agrees with the reference model (750 seeded cases)") {
    val rnd = new scala.util.Random(20260814L)
    for (round <- 1 to 3) {
      val tol = Seq(None, Some("5"), Some("50"))(round % 3)
      val nKeys = 1 + rnd.nextInt(8)
      val leftRows = (1 to 250).map(i =>
        (s"k${rnd.nextInt(nKeys + 2)}", rnd.nextInt(1000).toLong, i.toLong))
      val rightRows = Seq.fill(300)((s"k${rnd.nextInt(nKeys)}", rnd.nextInt(1000).toLong))
        .distinct.map { case (k, t) => (k, t, rnd.nextInt(1000000).toDouble) }
      val l = leftRows.toDF("k", "t", "lid")
      val r = rightRows.toDF("rk", "rt", "rv")
      val expected: Map[Long, Option[(Long, Double)]] = leftRows.map { case (k, t, lid) =>
        val cands = rightRows.filter { case (rk, rt, _) =>
          rk == k && rt >= t && tol.forall(x => rt - t <= x.toLong) }
        lid -> (if (cands.isEmpty) None
                else { val m = cands.minBy(_._2); Some((m._2, m._3)) })
      }.toMap
      for (strategy <- Seq("compact", "window")) {
        val got = AsofJoin(l, r, col("t"), col("rt"), by = Seq("k" -> "rk"),
            tolerance = tol, strategy = strategy, direction = "forward")
          .collect()
          .map(row => row.getLong(2) ->
            (if (row.isNullAt(4)) None else Some((row.getLong(3), row.getDouble(4)))))
          .toMap
        assert(got.size == leftRows.size, s"round $round $strategy lost left rows")
        val bad = expected.collect {
          case (lid, exp) if got(lid) != exp => (lid, exp, got(lid))
        }
        assert(bad.isEmpty,
          s"round $round, strategy=$strategy, tol=$tol: ${bad.take(5).mkString("; ")}")
      }
    }
  }

  test("nearest direction picks the closer side, ties to backward") {
    val l = Seq((1L, "k", 100L), (2L, "k", 10L), (3L, "k", 205L), (4L, "k", 150L))
      .toDF("id", "k", "t")
    val r = Seq(("k", 90L, 1.0), ("k", 120L, 2.0), ("k", 200L, 3.0))
      .toDF("rk", "rt", "rv")
    val out = AsofJoin(l, r, col("t"), col("rt"), by = Seq("k" -> "rk"),
        direction = "nearest")
      .orderBy("id").collect().map(x => (x.getLong(0), x.getDouble(4))).toSeq
    // id1 t=100: back 90 (d10) vs fwd 120 (d20) → 1.0
    // id2 t=10: nothing before → fwd 90 → 1.0
    // id3 t=205: back 200 (d5), nothing after → 3.0
    // id4 t=150: back 120 (d30) vs fwd 200 (d50) → 2.0
    assert(out == Seq((1L, 1.0), (2L, 1.0), (3L, 3.0), (4L, 2.0)))
    // exact tie → backward side
    val tie = AsofJoin(Seq((9L, "k", 105L)).toDF("id", "k", "t"), r,
      col("t"), col("rt"), by = Seq("k" -> "rk"), direction = "nearest")
      .collect().head.getDouble(4)
    assert(tie == 1.0) // 90 (d15) vs 120 (d15) → backward
    // tolerance bounds BOTH sides
    val tol = AsofJoin(l, r, col("t"), col("rt"), by = Seq("k" -> "rk"),
        direction = "nearest", tolerance = Some("7"))
      .orderBy("id").collect().map(x => (x.getLong(0), Option(x.get(4)))).toSeq
    assert(tol == Seq((1L, None), (2L, None), (3L, Some(3.0)), (4L, None)))
  }

  test("property: nearest direction agrees with the reference model (750 seeded cases)") {
    val rnd = new scala.util.Random(20260815L)
    for (round <- 1 to 3) {
      val tol = Seq(None, Some("5"), Some("50"))(round % 3)
      val nKeys = 1 + rnd.nextInt(8)
      val leftRows = (1 to 250).map(i =>
        (s"k${rnd.nextInt(nKeys + 2)}", rnd.nextInt(1000).toLong, i.toLong))
      val rightRows = Seq.fill(300)((s"k${rnd.nextInt(nKeys)}", rnd.nextInt(1000).toLong))
        .distinct.map { case (k, t) => (k, t, rnd.nextInt(1000000).toDouble) }
      val l = leftRows.toDF("k", "t", "lid")
      val r = rightRows.toDF("rk", "rt", "rv")
      val expected: Map[Long, Option[(Long, Double)]] = leftRows.map { case (k, t, lid) =>
        val cands = rightRows.filter { case (rk, rt, _) =>
          rk == k && tol.forall(x => math.abs(rt - t) <= x.toLong) }
        lid -> (if (cands.isEmpty) None
                else {
                  // min |delta|, tie → backward (rt <= t), then largest rt
                  val m = cands.minBy { case (_, rt, _) =>
                    (math.abs(rt - t), if (rt <= t) 0 else 1) }
                  Some((m._2, m._3))
                })
      }.toMap
      val got = AsofJoin(l, r, col("t"), col("rt"), by = Seq("k" -> "rk"),
          tolerance = tol, direction = "nearest")
        .collect()
        .map(row => row.getLong(2) ->
          (if (row.isNullAt(4)) None else Some((row.getLong(3), row.getDouble(4)))))
        .toMap
      assert(got.size == leftRows.size, s"round $round lost left rows")
      val bad = expected.collect {
        case (lid, exp) if got(lid) != exp => (lid, exp, got(lid))
      }
      assert(bad.isEmpty, s"round $round, tol=$tol: ${bad.take(5).mkString("; ")}")
    }
  }

  test("property: compact and window strategies agree with the reference model (1500 seeded cases)") {
    val rnd = new scala.util.Random(20260813L)
    for (round <- 1 to 6) {
      val tol = Seq(None, Some("5"), Some("50"))(round % 3)
      val nKeys = 1 + rnd.nextInt(8)
      // left keys range over nKeys+2 so some keys have no right rows at all
      val leftRows = (1 to 250).map(i =>
        (s"k${rnd.nextInt(nKeys + 2)}", rnd.nextInt(1000).toLong, i.toLong))
      val rightRows = Seq.fill(300)((s"k${rnd.nextInt(nKeys)}", rnd.nextInt(1000).toLong))
        .distinct.map { case (k, t) => (k, t, rnd.nextInt(1000000).toDouble) }
      val l = leftRows.toDF("k", "t", "lid")
      val r = rightRows.toDF("rk", "rt", "rv")

      val expected: Map[Long, Option[(Long, Double)]] = leftRows.map { case (k, t, lid) =>
        val cands = rightRows.filter { case (rk, rt, _) =>
          rk == k && rt <= t && tol.forall(x => t - rt <= x.toLong) }
        lid -> (if (cands.isEmpty) None
                else { val m = cands.maxBy(_._2); Some((m._2, m._3)) })
      }.toMap

      for (strategy <- Seq("compact", "window")) {
        val got = AsofJoin(l, r, col("t"), col("rt"), by = Seq("k" -> "rk"),
            tolerance = tol, strategy = strategy)
          .collect()
          .map(row => row.getLong(2) ->
            (if (row.isNullAt(4)) None else Some((row.getLong(3), row.getDouble(4)))))
          .toMap
        assert(got.size == leftRows.size, s"round $round $strategy lost left rows")
        val bad = expected.collect {
          case (lid, exp) if got(lid) != exp => (lid, exp, got(lid))
        }
        assert(bad.isEmpty,
          s"round $round, strategy=$strategy, tol=$tol: ${bad.take(5).mkString("; ")}")
      }
    }
  }
}
